"""Structured Streaming redesign of the reference's incremental
Airflow pipeline (SURVEY §2.9)."""
