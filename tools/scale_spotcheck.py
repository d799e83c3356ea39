"""Engine-side ×N spot-check for the oracle-bounded queries:
dedup_components, dedup_cluster_stats, dedup_keep_best,
dedup_semdedup (VERDICT r8 item 3), plus contrastive_pair_mining and
embedding_knn_outliers (r10 tier run) — the six whose single-node
DuckDB ground truth is recursive-CTE / all-pairs quadratic and cannot
run at ×64 (tools/scale_verify.py BOUNDS).

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


def check_contrastive(spark, xdir: str, factor: int, base: str = SF) -> list[str]:
    """Derived-oracle law for `contrastive_pair_mining`'s POSITIVE row
    (r10 — its DuckDB oracle is Σdf²-quadratic and bounded at ×8,
    tools/scale_verify.py BOUNDS): positives are content-determined
    (LSH candidacy and exact Jaccard are functions of the shingle
    sets), so under ×N duplication every ×1 positive pair {a,b}
    yields N² copy-cross pairs with the SAME jaccard, and every doc
    contributes C(N,2) within-copy pairs at jaccard 1. Hence

        P_N      = N²·P₁ + n·N(N−1)/2
        mean_N   = float(N²·S₁ + n·N(N−1)/2) / P_N

    with S₁ the DECIMAL(18,4) jaccard sum over the ×1 positives —
    decimal addition is order-exact, and the final cast-to-double /
    divide is the same IEEE op on both sides, so the comparison is
    EXACT. The negative row is id-dependent (md5 bucket shuffle over
    shifted ids), so it only gets invariants: cross-source negatives
    are never positives, hence mean < the 0.5 verify threshold."""
    from decimal import Decimal

    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.dedup import (
        DEC_J,
        contrastive_pair_mining,
        dedup_lsh_verified,
    )

    n = table(spark, base, "documents").count()
    b1 = (
        dedup_lsh_verified(spark, base)
        .agg(
            F.count(F.lit(1)).alias("p1"),
            F.sum(F.col("jaccard").cast(DEC_J)).alias("s1"),
        )
        .first()
    )
    p1, s1 = b1["p1"], b1["s1"] if b1["s1"] is not None else Decimal(0)
    same = n * factor * (factor - 1) // 2
    want_pairs = factor * factor * p1 + same
    want_mean = float(Decimal(factor * factor) * s1 + Decimal(same)) / want_pairs
    rows = {
        r["label"]: r for r in contrastive_pair_mining(spark, xdir).collect()
    }
    problems = []
    if "pos" not in rows:
        return [f"no pos row (labels: {sorted(rows)})"]
    pos = rows["pos"]
    if pos["n_pairs"] != want_pairs:
        problems.append(
            f"pos pairs {pos['n_pairs']} != N²·{p1} + {same} = {want_pairs}"
        )
    if pos["mean_jaccard"] != want_mean:
        problems.append(
            f"pos mean {pos['mean_jaccard']!r} != derived {want_mean!r}"
        )
    neg = rows.get("neg")
    if neg is not None:
        if not (0 < neg["n_pairs"] <= factor * n // 2):
            problems.append(f"neg pairs {neg['n_pairs']} out of [1, N·n/2]")
        if not (0.0 <= neg["mean_jaccard"] < 0.5):
            problems.append(
                f"neg mean {neg['mean_jaccard']} not in [0, 0.5) — a "
                "negative with jaccard >= 0.5 should have been a positive"
            )
    return problems


def check_knn_outliers(spark, xdir: str, factor: int, base: str = SF) -> list[str]:
    """×N invariant for `embedding_knn_outliers` (r10 — its oracle's
    within-cluster all-pairs 1-NN is quadratic on the copy-saturated
    corpus and bounded at ×8): cluster assignment is a deterministic
    function of the embedding, so all N identical copies of a vector
    co-assign and every vector's 1-NN distance is EXACTLY 0. The
    top-15 therefore degenerates to the tiebreak — nn_d2 0, ranks
    1..15, vec_ids = the 15 smallest ids (base ids sort below every
    shifted copy id). Degenerate but sharp: any drift in assignment
    determinism, the distance arithmetic, or the NULLS-LAST tiebreak
    breaks it loudly."""
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.similarity import (
        embedding_knn_outliers,
    )

    base_ids = [
        r[0]
        for r in table(spark, base, "embeddings")
        .select("vec_id")
        .orderBy("vec_id")
        .limit(15)
        .collect()
    ]
    rows = embedding_knn_outliers(spark, xdir).orderBy("rnk").collect()
    problems = []
    if len(rows) != 15:
        problems.append(f"row count {len(rows)} != 15")
    if [r["rnk"] for r in rows] != list(range(1, len(rows) + 1)):
        problems.append(f"ranks not 1..15: {[r['rnk'] for r in rows]}")
    bad_d2 = [r["nn_d2"] for r in rows if r["nn_d2"] != 0]
    if bad_d2:
        problems.append(
            f"{len(bad_d2)} rows with nn_d2 != 0 (every ×N vector has "
            f"an identical co-clustered copy): {bad_d2[:5]}"
        )
    got_ids = [r["vec_id"] for r in rows]
    if got_ids != base_ids[: len(rows)]:
        problems.append(
            f"tie-broken ids {got_ids} != 15 smallest base ids {base_ids}"
        )
    return problems


CHECKS = {
    "dedup_components": check_components,
    "dedup_cluster_stats": check_cluster_stats,
    "dedup_keep_best": check_keep_best,
    "dedup_semdedup": check_semdedup,
    "contrastive_pair_mining": check_contrastive,
    "embedding_knn_outliers": check_knn_outliers,
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
