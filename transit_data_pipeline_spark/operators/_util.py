"""Shared plan-shaping helpers used across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pin(df: DataFrame) -> DataFrame:
    """Materialize a multiply-consumed frame once and cut its lineage
    (eager ``localCheckpoint``). Catalyst shares no common subtrees
    across join/aggregate branches, so a frame referenced k times in
    one plan re-executes its lineage k times — for the shingle frame
    (corpus scan → normalize → explode → md5) that is k full corpus
    passes at 100 TB (guide §1.2: fix the algorithm, §5: cache only
    what is reused AND expensive). Eager on purpose: a lazy
    localCheckpoint first materialized inside an AQE map stage
    (submitMapStage) never truncates — measured 5-6× regression on the
    dedup component family when tried lazily (OPTIMIZATION_r10.md).
    Blocks are freed by the ContextCleaner once the last consumer's
    plan is dropped.

    Failure posture: localCheckpoint blocks live only on executors and
    are NOT recomputable (lineage is truncated) — an executor/block
    loss mid-query fails the stage and the retry re-runs the whole
    query. Acceptable for idempotent batch analytics (the posture
    functions/ranking.py documents for the two-phase rank); on
    clusters, graceful decommissioning block migration
    (``spark.storage.decommission.rddBlocks.enabled``) covers planned
    node departure.

    NOT ``persist()``: a lazy persist measured slightly faster on some
    composers, but persist registers in the CacheManager keyed by the
    CANONICAL plan — a later invocation of the same query in the same
    session silently reuses the first invocation's cached
    intermediates, which corrupts any best-of-N timing and amounts to
    cross-run result caching (prohibited). localCheckpoint is RDD-
    level: every invocation materializes fresh."""
    return df.localCheckpoint()
