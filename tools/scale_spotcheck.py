"""Engine-side ×N spot-check for the oracle-bounded dedup queries
(VERDICT r8 item 3): dedup_components, dedup_cluster_stats,
dedup_keep_best, dedup_semdedup — the four whose single-node DuckDB
ground truth is recursive-CTE / all-pairs quadratic and cannot run at
×64 (tools/scale_verify.py BOUNDS).

The evidence chain replaces the infeasible oracle with a DERIVED one:
the ×N corpus (tools/scale_probe.build_xn) duplicates every document
N times with shifted ids and IDENTICAL content, and each bounded
query's semantics are functions of content only, so the exact ×N
ground truth follows from the strict-verified ×1 output by a closed
per-row law:

* dedup_components — copies of a doc are exact duplicates
  (Jaccard 1 → LSH candidates → verified edges), so each ×1
  component becomes ONE ×N component of N× the size; the canonical
  (min member id) is unchanged because every copy id exceeds its
  base id. Expected ×N row for doc d:
  (canonical1(d % n), N · size1(d % n)).
* dedup_cluster_stats — the size histogram maps row-for-row:
  (s, c, d, share, s>1) → (N·s, c, N·d, share, TRUE). corpus_share
  is bit-identical when N is a power of two (numerator and
  denominator both scale by 2^k — exact IEEE rescaling).
* dedup_keep_best — quality_score is a content-only expression, so
  every copy scores identically and the (quality DESC, doc_id ASC)
  argmax stays the ×1 winner's base copy. Expected ×N row for doc d:
  (canonical1(d % n), quality1(d % n), d == canonical1(d % n)).
* dedup_semdedup — K grows ∝ n and the k-means geometry changes, so
  no per-row law exists; the check is the invariant suite instead:
  row count is N·n, only base copies survive (every non-base copy is
  dominated by the identical lower-id copy in the same cluster —
  assignment is a deterministic function of the embedding), and at
  most one keeper exists per base vector. Precondition asserted: no
  zero-quantized embedding (a zero vector's dot is never > 0, so its
  copies could all survive).

Every comparison runs INSIDE Spark (joins + mismatch counts); only
scalar counts and the tiny histogram cross the driver boundary.

Usage:  python tools/scale_spotcheck.py [--factor N] [query ...]
        (default ×64 over all four; writes SPOTCHECK_x{N}.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scale_probe import SF, build_xn  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def _mismatch_report(df, conds: dict) -> list[str]:
    """One pass: count rows violating each named condition. A
    condition that evaluates to NULL (e.g. an equality against a NULL
    column) counts as a VIOLATION — ~NULL is NULL and would slip past
    a bare F.when (ADVICE r9), so each condition is coalesced to
    False first."""
    agg = df.agg(
        *[
            F.count(
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(1))
            ).alias(name)
            for name, cond in conds.items()
        ]
    ).first()
    return [f"{k}: {agg[k]} mismatching rows" for k in conds if agg[k]]


def _id_shift(df, idc: str) -> int:
    """The per-copy id shift build_xn uses: MAX(id)+1 on the BASE
    table. Copy k of base row b has id b + k*shift, so `id % shift`
    recovers b exactly even when base ids have gaps or start at 1 —
    deriving the modulus from COUNT(*) only coincides with this for
    0-based contiguous ids (ADVICE r9)."""
    return df.agg(F.max(idc)).first()[0] + 1


def check_components(spark, xdir: str, factor: int, base: str = SF) -> list[str]:
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.dedup import dedup_components

    docs = table(spark, base, "documents")
    n, shift = docs.count(), _id_shift(docs, "doc_id")
    b1 = dedup_components(spark, base).select(
        F.col("doc_id").alias("base_id"),
        F.col("canonical_doc_id").alias("canon1"),
        F.col("component_size").alias("size1"),
    )
    got = dedup_components(spark, xdir)
    problems = []
    n_got = got.count()
    if n_got != factor * n:
        problems.append(f"row count {n_got} != {factor}*{n}")
    joined = got.join(
        b1, got["doc_id"] % F.lit(shift) == b1["base_id"], "left"
    )
    problems += _mismatch_report(
        joined,
        {
            "base row exists": F.col("base_id").isNotNull(),
            "canonical == x1 canonical": F.col("canonical_doc_id")
            == F.col("canon1"),
            f"size == {factor} * x1 size": F.col("component_size")
            == F.lit(factor) * F.col("size1"),
        },
    )
    return problems


def check_cluster_stats(spark, xdir: str, factor: int, base: str = SF) -> list[str]:
    from transit_data_pipeline_spark.operators.dedup import (
        dedup_cluster_stats,
    )

    cols = (
        "component_size",
        "n_components",
        "docs_in_size",
        "corpus_share",
        "is_duplicate_cluster",
    )
    want = {
        (
            factor * r["component_size"],
            r["n_components"],
            factor * r["docs_in_size"],
            r["corpus_share"],
            True,
        )
        for r in dedup_cluster_stats(spark, base).collect()
    }
    got = {
        tuple(r[c] for c in cols)
        for r in dedup_cluster_stats(spark, xdir).collect()
    }
    if got != want:
        return [
            f"histogram law violated: unexpected={sorted(got - want)} "
            f"missing={sorted(want - got)}"
        ]
    return []


def check_keep_best(spark, xdir: str, factor: int, base: str = SF) -> list[str]:
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.curation import (
        dedup_keep_best,
    )

    docs = table(spark, base, "documents")
    n, shift = docs.count(), _id_shift(docs, "doc_id")
    b1 = dedup_keep_best(spark, base).select(
        F.col("doc_id").alias("base_id"),
        F.col("canonical_doc_id").alias("canon1"),
        F.col("quality_score").alias("q1"),
    )
    got = dedup_keep_best(spark, xdir)
    problems = []
    n_got = got.count()
    if n_got != factor * n:
        problems.append(f"row count {n_got} != {factor}*{n}")
    joined = got.join(
        b1, got["doc_id"] % F.lit(shift) == b1["base_id"], "left"
    )
    problems += _mismatch_report(
        joined,
        {
            "base row exists": F.col("base_id").isNotNull(),
            "canonical == x1 winner": F.col("canonical_doc_id")
            == F.col("canon1"),
            "quality bitwise-equal": F.col("quality_score").eqNullSafe(
                F.col("q1")
            ),
            "kept iff the winner's base copy": F.col("is_kept")
            == (F.col("doc_id") == F.col("canon1")),
        },
    )
    return problems


def check_semdedup(spark, xdir: str, factor: int, base: str = SF) -> list[str]:
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.dedup import (
        SEM_Q,
        dedup_semdedup,
    )

    e = table(spark, base, "embeddings")
    n = e.count()
    # Precondition: no zero-quantized embedding (see module doc).
    zero_q = e.filter(
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.abs(
                    (x.cast("double") * F.lit(SEM_Q)).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        == 0
    ).count()
    if zero_q:
        return [f"precondition: {zero_q} zero-quantized base vectors"]
    shift = _id_shift(e, "vec_id")
    got = dedup_semdedup(spark, xdir)
    problems = []
    n_got = got.count()
    if n_got != factor * n:
        problems.append(f"row count {n_got} != {factor}*{n}")
    kept_nonbase = got.filter(
        F.col("keep") & (F.col("vec_id") >= F.lit(shift))
    ).count()
    if kept_nonbase:
        problems.append(
            f"{kept_nonbase} non-base copies survived (identical "
            "lower-id copy in the same cluster must dominate them)"
        )
    multi = (
        got.groupBy((F.col("vec_id") % F.lit(shift)).alias("b"))
        .agg(F.sum(F.col("keep").cast("int")).alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    if multi:
        problems.append(f"{multi} base vectors with >1 surviving copy")
    return problems


CHECKS = {
    "dedup_components": check_components,
    "dedup_cluster_stats": check_cluster_stats,
    "dedup_keep_best": check_keep_best,
    "dedup_semdedup": check_semdedup,
}


def main() -> int:
    args = sys.argv[1:]
    factor = 64
    if args and args[0] == "--factor":
        factor = int(args[1])
        args = args[2:]
    if factor & (factor - 1):
        print(
            f"factor {factor} is not a power of two — corpus_share "
            "bit-equality (cluster_stats) would not hold",
            file=sys.stderr,
        )
        return 2
    names = args or list(CHECKS)

    from pyspark.sql import SparkSession

    from transit_data_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    (
        SparkSession.builder.appName("tdps-scale-spotcheck")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark = get_spark("tdps-scale-spotcheck")
    xdir = build_xn(spark, factor)

    results = {}
    failed = False
    for name in names:
        t0 = time.monotonic()
        try:
            problems = CHECKS[name](spark, xdir, factor)
        except Exception as e:  # noqa: BLE001 — report and continue
            problems = [f"EXC {type(e).__name__}: {e}"]
        dt = time.monotonic() - t0
        ok = not problems
        failed |= not ok
        results[name] = {
            "ok": ok,
            "factor": factor,
            "seconds": round(dt, 1),
            "problems": problems,
        }
        print(
            f"{name}: {'OK' if ok else 'FAIL'} ({dt:.1f}s)"
            + ("" if ok else f" — {problems}"),
            flush=True,
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SPOTCHECK_x{factor}.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
