"""Scalar / aggregate column-expression helpers (no Python UDFs)."""
