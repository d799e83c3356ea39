"""Statistics & audit wave: isotonic calibration (PAV), Gini source
concentration, Spearman rank correlation, difference-in-differences,
Merkle corpus manifests, and a seasonal-naive forecast backtest.

These extend the experimentation/calibration families
(`model_calibration_bins`, `quality_decile_calibration`,
`ab_test_zscore`, `quantile_pinball_eval`) with the remaining pieces a
training-data platform's measurement stack needs: a *monotone* fit for
classifier calibration (PAV — the standard post-hoc calibrator),
inequality audits of the token budget (which sources concentrate their
mass in a few giant documents), a tie-aware rank correlation (robust to
the heavy-tailed monetary columns), the canonical quasi-experimental
estimator (DiD), tamper-evident data-versioning manifests (reproducible
corpus snapshots), and forecast-accuracy scoring against the
seasonal-naive baseline (MASE's denominator, per Hyndman & Koehler).

Determinism strategy (the repo-wide oracle contract): every aggregate
is either an exact integer/decimal sum or a SINGLE double operation on
exact operands, written in the same order on both engines; ranks and
bins carry explicit tiebreakers. No Python UDFs anywhere — every
operator is pure column expressions inside codegen.

Scale notes: the PAV minimax runs on the 20-row binned aggregate (the
only full-data pass is the same NTILE window `quality_decile_
calibration` already pays; its quadratic part is 20×20). Gini needs
per-source ranks — one partitioned sort, no global shuffle. Spearman
mid-ranks run per distinct value through the shared two-phase range
rank (functions/ranking.py) — distributed at any cardinality. DiD and
the forecast backtest are plain two-level
aggregates. The Merkle manifest is two bounded hash-aggregation levels
(256-leaf chunks, then per-source chunk chains) — at extreme corpus
sizes add a third level; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from ..functions.ranking import two_phase_rank
from .events import SQL_EVENT_TIME
from .registry import register
from .textops import SQL_TOKENS, quality_score_col, tokens_col

# ---------------------------------------------------------------------------
# isotonic_calibration_pav
# ---------------------------------------------------------------------------

#: Number of score bins for the isotonic fit (quality-score ventiles).
ISO_BINS = 20

#: Shared DuckDB CTE chain: quality-scored docs → ventile bins with
#: exact (n, sum-of-keep) per bin (keep = the corpus filter's rule).
_SQL_ISO_BINNED = f"""
tok AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
feat AS (
  SELECT doc_id,
    len(w) AS n_tokens,
    CAST(len(list_filter(w, t -> t IN
      ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE)
      / len(w) AS stopword_ratio,
    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio
  FROM tok
),
scored AS (
  SELECT doc_id,
    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      + LEAST(1.0, stopword_ratio * 4.0) * 0.2
      + type_token_ratio * 0.4 AS q,
    CASE WHEN n_tokens >= 10 AND stopword_ratio > 0.0 THEN 1 ELSE 0 END
      AS keep
  FROM feat
),
binned AS (
  SELECT bin, COUNT(*) AS n, CAST(SUM(keep) AS BIGINT) AS s,
         MIN(q) AS min_score, MAX(q) AS max_score
  FROM (SELECT q, keep,
               NTILE({ISO_BINS}) OVER (ORDER BY q, doc_id) AS bin
        FROM scored)
  GROUP BY bin
),
cum AS (
  SELECT bin, n, s, min_score, max_score,
    SUM(n) OVER (ORDER BY bin) AS cn,
    SUM(s) OVER (ORDER BY bin) AS cs
  FROM binned
)
"""


@register(
    "isotonic_calibration_pav",
    ops=("W8", "A5", "J10", "A9"),
    doc="Isotonic-regression calibration (pool-adjacent-violators) of "
    "the shared quality-filter rule against the quality score: docs "
    "are ventiled by THE quality formula (same NTILE recipe as "
    "quality_decile_calibration), and the per-bin keep rate is "
    "replaced by the best monotone non-decreasing fit via the PAV "
    "minimax identity iso(i) = max_{j<=i} min_{k>=i} wavg(y, bins "
    "j..k) (Barlow et al. 1972; the closed form every PAV pooling "
    "produces). The minimax runs entirely on the 20-row bin "
    "aggregate — prefix sums via one window, the (j,k) grid is a "
    "broadcast self-join of 20 rows, so the quadratic part is 210 "
    "cells regardless of corpus size; the only full-data pass is "
    "the binning window. Weighted averages are single double "
    "divisions of exact integer sums — bitwise deterministic. The "
    "standard post-hoc calibrator for quality-classifier scores "
    "before threshold selection at 100 TB.",
    oracle=f"""
WITH {_SQL_ISO_BINNED},
pairs AS (
  SELECT j.bin AS j, k.bin AS k,
    CAST(k.cs - (j.cs - j.s) AS DOUBLE) / (k.cn - (j.cn - j.n)) AS avg_jk
  FROM cum j JOIN cum k ON j.bin <= k.bin
),
iso AS (
  SELECT bin, MAX(min_avg) AS iso_rate
  FROM (
    SELECT i.bin, p.j, MIN(p.avg_jk) AS min_avg
    FROM cum i JOIN pairs p ON p.j <= i.bin AND p.k >= i.bin
    GROUP BY i.bin, p.j
  )
  GROUP BY bin
)
SELECT c.bin, CAST(c.n AS BIGINT) AS n_docs, c.min_score, c.max_score,
  CAST(c.s AS DOUBLE) / c.n AS observed_rate,
  iso.iso_rate
FROM cum c JOIN iso ON c.bin = iso.bin
""",
)
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    stop = "'the', 'a', 'of', 'and', 'to', 'in', 'is'"
    sr = (
        F.size(
            F.expr(f"filter(split(trim(text), '\\\\s+'), t -> t IN ({stop}))")
        ).cast("double")
        / F.size(w)
    )
    scored = d.select(
        "doc_id",
        quality_score_col().alias("q"),
        F.when((F.size(w) >= 10) & (sr > 0.0), 1).otherwise(0).alias("keep"),
    )
    # Corpus-scaled NTILE via the distributed two-phase range rank +
    # exact NTILE reconstruction — no single-partition window; the
    # downstream PAV grid is <= ISO_BINS rows either way.
    from ..functions.ranking import ntile_from_rank

    binned = (
        two_phase_rank(
            scored, ("q", "doc_id"), rank_col="_rn", n_col="_nd"
        )
        .withColumn(
            "bin", ntile_from_rank(F.col("_rn"), F.col("_nd"), ISO_BINS)
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("keep").cast("long").alias("s"),
            F.min("q").alias("min_score"),
            F.max("q").alias("max_score"),
        )
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin", "n", "s", "min_score", "max_score",
        F.sum("n").over(wc).alias("cn"),
        F.sum("s").over(wc).alias("cs"),
    )
    # All frames below are <= ISO_BINS rows; broadcast every join so the
    # minimax grid never shuffles.
    j = cum.select(
        F.col("bin").alias("j"),
        (F.col("cs") - F.col("s")).alias("ps"),
        (F.col("cn") - F.col("n")).alias("pn"),
    )
    k = cum.select(
        F.col("bin").alias("k"), F.col("cs").alias("kcs"), F.col("cn").alias("kcn")
    )
    pairs = j.join(F.broadcast(k), F.col("j") <= F.col("k")).select(
        "j", "k",
        (
            (F.col("kcs") - F.col("ps")).cast("double")
            / (F.col("kcn") - F.col("pn"))
        ).alias("avg_jk"),
    )
    bins_i = cum.select(F.col("bin").alias("i"))
    inner = (
        bins_i.join(
            F.broadcast(pairs),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("min_avg"))
    )
    iso = inner.groupBy("i").agg(F.max("min_avg").alias("iso_rate"))
    return (
        cum.join(F.broadcast(iso), cum["bin"] == iso["i"])
        .select(
            "bin",
            F.col("n").cast("bigint").alias("n_docs"),
            "min_score",
            "max_score",
            (F.col("s").cast("double") / F.col("n")).alias("observed_rate"),
            "iso_rate",
        )
    )


# ---------------------------------------------------------------------------
# gini_token_concentration
# ---------------------------------------------------------------------------


@register(
    "gini_token_concentration",
    ops=("W4", "A3", "A9"),
    doc="Token-budget inequality audit per source: Gini coefficient of "
    "the per-document token counts via the rank identity "
    "G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) on ascending ranks "
    "(doc_id tiebreak), plus the Lorenz tail shares (bottom-half and "
    "top-decile token share). Every Σ is exact integer arithmetic; "
    "each output is ONE double division — bitwise deterministic. A "
    "source with gini→1 packs its mass into a few giant documents "
    "(dedup/chunking treats it differently than a flat source). One "
    "per-source sort (partitioned window), no global shuffle; at "
    "100 TB the ranks can come from per-source histogram bins "
    "instead of exact sorts with bounded Gini error.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, CAST(len({SQL_TOKENS}) AS BIGINT) AS x
  FROM documents
),
ranked AS (
  SELECT source, x,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id) AS i,
    COUNT(*) OVER (PARTITION BY source) AS n
  FROM tok
)
SELECT source,
  CAST(MAX(n) AS BIGINT) AS n_docs,
  CAST(SUM(x) AS BIGINT) AS total_tokens,
  CAST(2 * SUM(i * x) - (MAX(n) + 1) * SUM(x) AS DOUBLE)
    / CAST(MAX(n) * SUM(x) AS DOUBLE) AS gini,
  CAST(SUM(CASE WHEN i <= n // 2 THEN x ELSE 0 END) AS DOUBLE)
    / CAST(SUM(x) AS DOUBLE) AS bottom_half_share,
  CAST(SUM(CASE WHEN i > n - n // 10 THEN x ELSE 0 END) AS DOUBLE)
    / CAST(SUM(x) AS DOUBLE) AS top_decile_share
FROM ranked
GROUP BY source
""",
)
def gini_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "doc_id", "source", F.size(tokens_col()).cast("long").alias("x")
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    ranked = tok.select(
        "source",
        "x",
        F.row_number().over(w).cast("long").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    # The Lorenz-share thresholds use the window-provided per-source n
    # (constant within the group), so the conditional sums stay plain
    # row-level CASE expressions — no nested aggregates.
    n_half = F.floor(F.col("n") / 2)
    n_top = F.col("n") - F.floor(F.col("n") / 10)
    return ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum("x").cast("bigint").alias("total_tokens"),
        (
            (2 * F.sum(F.col("i") * F.col("x")) - (F.max("n") + 1) * F.sum("x"))
            .cast("double")
            / (F.max("n") * F.sum("x")).cast("double")
        ).alias("gini"),
        (
            F.sum(F.when(F.col("i") <= n_half, F.col("x")).otherwise(0))
            .cast("double")
            / F.sum("x").cast("double")
        ).alias("bottom_half_share"),
        (
            F.sum(F.when(F.col("i") > n_top, F.col("x")).otherwise(0))
            .cast("double")
            / F.sum("x").cast("double")
        ).alias("top_decile_share"),
    )


# ---------------------------------------------------------------------------
# spearman_rank_corr
# ---------------------------------------------------------------------------


@register(
    "spearman_rank_corr",
    ops=("W4", "A3", "J1", "A9"),
    doc="Tie-aware Spearman rank correlation between order value and "
    "total line-item quantity (per-order): mid-ranks r = RANK() + "
    "(ties−1)/2 (half-integers, exact in double and in DECIMAL(18,4)), "
    "then Pearson on ranks via the repo's exact-decimal sufficient "
    "statistics (functions/numeric.dcorr). Reported beside the plain "
    "Pearson on raw values — a large gap flags the heavy right tail "
    "monetary columns have. Mid-ranks are computed per DISTINCT "
    "value on the value-level aggregate via the distributed two-"
    "phase range rank (functions/ranking.two_phase_rank) and joined "
    "back — no single-partition window over per-order rows. The "
    "join is the standard orders⨝lineitem FK aggregate.",
    oracle=f"""
WITH per_order AS (
  SELECT o.o_orderkey, o.o_totalprice AS x,
         CAST(SUM(l.l_quantity) AS DOUBLE) AS y
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT x, y,
    RANK() OVER (ORDER BY x) + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0
      AS rx,
    RANK() OVER (ORDER BY y) + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0
      AS ry
  FROM per_order
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
  {N.sql_dcorr('rx', 'ry')} AS spearman_rho,
  {N.sql_dcorr('x', 'y')} AS pearson_r
FROM ranked
""",
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # Pinned: three consumers (both midrank value aggregates and the
    # final rank join) would otherwise re-run the orders⋈lineitem
    # aggregate — measured 4.4 → 3.1 s at sf0.1 from this alone.
    per_order = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("y"))
        .select(F.col("o_totalprice").alias("x"), "y")
        .localCheckpoint(eager=False)
    )

    def midranks(col: str, out: str) -> DataFrame:
        # Mid-rank per DISTINCT value: RANK() + (ties-1)/2 ==
        # cum_count - c + (c+1)/2 on the value-level aggregate, so the
        # global sort is bounded by distinct-value cardinality and runs
        # as the distributed two-phase range rank — no single-partition
        # window over per-order rows. Joined back on the value.
        per_v = per_order.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        cumd = two_phase_rank(
            per_v, (F.col(col),), cum={"cumv": F.col("c")}
        )
        mid = (
            F.col("cumv") - F.col("c") + (F.col("c") + F.lit(1)) / 2.0
        )
        return cumd.select(col, mid.alias(out))

    ranked = per_order.join(midranks("x", "rx"), "x").join(
        midranks("y", "ry"), "y"
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        N.dcorr("rx", "ry").alias("spearman_rho"),
        N.dcorr("x", "y").alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# did_estimator
# ---------------------------------------------------------------------------

#: Pre/post cutoff splitting the events fixture's single month.
DID_CUTOFF = "2024-01-16"


@register(
    "did_estimator",
    ops=("A5", "A7", "A9", "P5"),
    doc="Difference-in-differences over the events stream: users split "
    "into treated/control by the stateless md5 parity recipe (same "
    "as ab_test_zscore — reproducible on any cluster layout), "
    "periods split at a fixed calendar cutoff, outcome = mean "
    "purchase value per cell. DiD = (T.post − T.pre) − (C.post − "
    "C.pre) removes both the group level and the common time trend "
    "— the canonical quasi-experimental estimator when the split "
    "isn't randomized. Cell means are exact decimal sums / exact "
    "counts; the estimate is three double subtractions in a fixed "
    "order — bitwise deterministic. One hash aggregate over 4 "
    "cells; scales trivially.",
    oracle=f"""
WITH cells AS (
  SELECT
    CASE WHEN (instr('0123456789abcdef',
                substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
         THEN 1 ELSE 0 END AS treated,
    CASE WHEN {SQL_EVENT_TIME} >= TIMESTAMP '{DID_CUTOFF}'
         THEN 1 ELSE 0 END AS post,
    value
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT treated, post, COUNT(*) AS n, {N.sql_davg('value')} AS m
  FROM cells GROUP BY 1, 2
),
wide AS (
  SELECT
    MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t_pre,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c_post,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN m END) AS m_t_pre,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN m END) AS m_t_post,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN m END) AS m_c_pre,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN m END) AS m_c_post
  FROM agg
)
SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre,
  CAST(n_t_post AS BIGINT) AS n_t_post,
  CAST(n_c_pre AS BIGINT) AS n_c_pre,
  CAST(n_c_post AS BIGINT) AS n_c_post,
  m_t_pre, m_t_post, m_c_pre, m_c_post,
  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did_estimate
FROM wide
""",
)
def did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    treated = (
        F.when(
            (
                F.expr(
                    "instr('0123456789abcdef',"
                    " substring(md5(cast(user_id as string)), 1, 1)) - 1"
                )
                % 2
            )
            == 0,
            1,
        )
        .otherwise(0)
        .alias("treated")
    )
    post = (
        F.when(F.col("event_time") >= F.lit(DID_CUTOFF).cast("timestamp"), 1)
        .otherwise(0)
        .alias("post")
    )
    agg = (
        e.filter(F.col("event_type") == "purchase")
        .select(treated, post, "value")
        .groupBy("treated", "post")
        .agg(F.count(F.lit(1)).alias("n"), N.davg("value").alias("m"))
    )

    def cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    wide = agg.agg(
        cell(1, 0, "n").cast("bigint").alias("n_t_pre"),
        cell(1, 1, "n").cast("bigint").alias("n_t_post"),
        cell(0, 0, "n").cast("bigint").alias("n_c_pre"),
        cell(0, 1, "n").cast("bigint").alias("n_c_post"),
        cell(1, 0, "m").alias("m_t_pre"),
        cell(1, 1, "m").alias("m_t_post"),
        cell(0, 0, "m").alias("m_c_pre"),
        cell(0, 1, "m").alias("m_c_post"),
    )
    return wide.withColumn(
        "did_estimate",
        (F.col("m_t_post") - F.col("m_t_pre"))
        - (F.col("m_c_post") - F.col("m_c_pre")),
    )


# ---------------------------------------------------------------------------
# corpus_merkle_manifest
# ---------------------------------------------------------------------------

#: Leaves per Merkle chunk (bounds every collect_list to 256 hex hashes
#: = 8 KiB — executor-safe regardless of corpus size).
MERKLE_CHUNK = 256


@register(
    "corpus_merkle_manifest",
    ops=("W4", "A1", "F10"),
    doc="Tamper-evident corpus manifest (data versioning for "
    "reproducible training runs): per source, leaf = md5(text), "
    "leaves ordered by (leaf, doc_id) and grouped into 256-leaf "
    "chunks (row_number window), chunk hash = md5(concat of its "
    "leaves in order), root = md5(concat of chunk hashes in chunk "
    "order). Two bounded aggregation levels — every collect_list is "
    "≤ 256 fixed-width strings, so no executor ever materializes a "
    "source's full corpus (add a third level at extreme scale). Any "
    "single-document change flips the root; two snapshots with equal "
    "roots are bit-identical per source. Content-ordered (not "
    "id-ordered) so the manifest is invariant to ingest order — the "
    "property a distributed rebuild needs.",
    oracle=f"""
WITH leaves AS (
  SELECT source, md5(text) AS leaf, doc_id,
    (ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text), doc_id)
      - 1) // {MERKLE_CHUNK} AS chunk
  FROM documents
),
chunks AS (
  SELECT source, chunk,
    md5(string_agg(leaf, '' ORDER BY leaf, doc_id)) AS chunk_hash,
    COUNT(*) AS n_leaves
  FROM leaves GROUP BY source, chunk
)
SELECT source,
  CAST(SUM(n_leaves) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  md5(string_agg(chunk_hash, '' ORDER BY chunk)) AS root_hash
FROM chunks GROUP BY source
""",
)
def corpus_merkle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = Window.partitionBy("source").orderBy("leaf", "doc_id")
    leaves = d.select(
        "source", F.md5("text").alias("leaf"), "doc_id"
    ).withColumn(
        "chunk",
        ((F.row_number().over(w) - 1) / MERKLE_CHUNK).cast("long"),
    )
    chunk_concat = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("leaf", "doc_id"))),
            lambda s: s["leaf"],
        ),
        "",
    )
    chunks = leaves.groupBy("source", "chunk").agg(
        F.md5(chunk_concat).alias("chunk_hash"),
        F.count(F.lit(1)).alias("n_leaves"),
    )
    root_concat = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("chunk", "chunk_hash"))),
            lambda s: s["chunk_hash"],
        ),
        "",
    )
    return chunks.groupBy("source").agg(
        F.sum("n_leaves").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.md5(root_concat).alias("root_hash"),
    )


# ---------------------------------------------------------------------------
# forecast_backtest_suite
# ---------------------------------------------------------------------------


@register(
    "forecast_backtest_suite",
    ops=("W1", "A3", "A9", "F5"),
    doc="Forecast-accuracy backtest of the seasonal-naive model "
    "(ŷ_d = y_{d−7}) on daily 1996 order counts, per order priority: "
    "MAE, RMSE, WAPE, and MASE (MAE relative to the one-step naive "
    "ŷ_d = y_{d−1} — Hyndman & Koehler 2006's scale-free yardstick; "
    "MASE < 1 beats the naive walk). All error sums are exact "
    "integers (counts of orders); each reported metric is a single "
    "double division/sqrt — bitwise deterministic. The lag features "
    "come from one partitioned window over the ~365-row daily "
    "aggregate, so the backtest costs one groupBy of the fact table "
    "no matter the scale. sMAPE is deliberately omitted: its per-row "
    "double ratios would need an ordered fold to stay deterministic.",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         COUNT(*) AS y
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
lagged AS (
  SELECT o_orderpriority, d, y,
    LAG(y, 7) OVER (PARTITION BY o_orderpriority ORDER BY d) AS f,
    LAG(y, 1) OVER (PARTITION BY o_orderpriority ORDER BY d) AS f1
  FROM daily
)
SELECT o_orderpriority,
  CAST(COUNT(f) AS BIGINT) AS n_days,
  CAST(SUM(ABS(y - f)) AS DOUBLE) / COUNT(f) AS mae,
  SQRT(CAST(SUM((y - f) * (y - f)) AS DOUBLE) / COUNT(f)) AS rmse,
  CAST(SUM(ABS(y - f)) AS DOUBLE)
    / CAST(SUM(CASE WHEN f IS NOT NULL THEN y END) AS DOUBLE) AS wape,
  (CAST(SUM(ABS(y - f)) AS DOUBLE) / COUNT(f))
    / (CAST(SUM(CASE WHEN f IS NOT NULL THEN ABS(y - f1) END) AS DOUBLE)
       / COUNT(f)) AS mase
FROM lagged
GROUP BY o_orderpriority
""",
)
def forecast_backtest_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority", F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("d")
    lagged = daily.select(
        "o_orderpriority",
        "y",
        F.lag("y", 7).over(w).alias("f"),
        F.lag("y", 1).over(w).alias("f1"),
    )
    err = F.abs(F.col("y") - F.col("f"))
    n = F.count("f")
    sum_err = F.sum(err)
    mase_den = F.sum(
        F.when(F.col("f").isNotNull(), F.abs(F.col("y") - F.col("f1")))
    )
    return lagged.groupBy("o_orderpriority").agg(
        n.cast("bigint").alias("n_days"),
        (sum_err.cast("double") / n).alias("mae"),
        F.sqrt(
            F.sum((F.col("y") - F.col("f")) * (F.col("y") - F.col("f"))).cast(
                "double"
            )
            / n
        ).alias("rmse"),
        (
            sum_err.cast("double")
            / F.sum(F.when(F.col("f").isNotNull(), F.col("y"))).cast("double")
        ).alias("wape"),
        (
            (sum_err.cast("double") / n)
            / (mase_den.cast("double") / n)
        ).alias("mase"),
    )


#: Number of propensity strata (Cochran's classic five subclasses).
PROP_STRATA = 5


@register(
    "propensity_strata_att",
    ops=("J1", "A5", "A9", "P5", "A11"),
    doc="Propensity-score stratification ATT (Rosenbaum & Rubin 1983; "
    "five subclasses per Cochran 1968): treatment = urgent/high "
    "order priority, outcome = order price, covariate cells = "
    "customer market-segment × nation. The propensity inside a "
    "cell is the exact rational n_treated/n, so the stratum id is "
    "pure int64 arithmetic ((n_t·5) div n, capped) — no float "
    "boundary hazard. Cells without both a treated and a control "
    "order are trimmed (positivity), then strata aggregate "
    "decimal-exact outcome sums and the ATT folds the per-stratum "
    "n_t·(mean_t − mean_c) terms in stratum order over a ≤5-element "
    "sorted list — bitwise deterministic end to end. Two hash "
    "aggregates over the order→customer equi-join (customer side "
    "is the broadcastable dim); everything after runs on ≤125 "
    "cells.",
    oracle=f"""
WITH unit AS (
  SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         THEN 1 ELSE 0 END AS treated,
    o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT seg, nat, COUNT(*) AS n, SUM(treated) AS n_t,
    SUM(CASE WHEN treated = 1
             THEN CAST(y AS DECIMAL(18,4)) ELSE 0 END) AS s_t,
    SUM(CASE WHEN treated = 0
             THEN CAST(y AS DECIMAL(18,4)) ELSE 0 END) AS s_c
  FROM unit GROUP BY 1, 2
),
kept AS (
  SELECT *, LEAST((n_t * {PROP_STRATA}) // n, {PROP_STRATA - 1}) AS stratum
  FROM cells WHERE n_t > 0 AND n_t < n
),
strata AS (
  SELECT stratum,
    COUNT(*) AS n_cells,
    SUM(n_t) AS n_treated,
    SUM(n - n_t) AS n_control,
    CAST(SUM(s_t) AS DOUBLE) / SUM(n_t) AS mean_treated,
    CAST(SUM(s_c) AS DOUBLE) / SUM(n - n_t) AS mean_control
  FROM kept GROUP BY 1
),
att AS (
  SELECT list_reduce(
           list(n_treated * (mean_treated - mean_control) ORDER BY stratum),
           (x, y) -> x + y) / SUM(n_treated) AS att_overall
  FROM strata
)
SELECT CAST(s.stratum AS BIGINT) AS stratum,
  CAST(s.n_cells AS BIGINT) AS n_cells,
  CAST(s.n_treated AS BIGINT) AS n_treated,
  CAST(s.n_control AS BIGINT) AS n_control,
  s.mean_treated, s.mean_control,
  s.mean_treated - s.mean_control AS stratum_diff,
  a.att_overall
FROM strata s, att a
""",
)
def propensity_strata_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", spread=True)
    c = table(spark, sf_dir, "customer")
    unit = o.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("treated"),
        F.col("o_totalprice").alias("y"),
    )
    dec = F.col("y").cast(N.DEC)
    cells = unit.groupBy("seg", "nat").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("treated").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, dec).otherwise(F.lit(0).cast(N.DEC))).alias("s_t"),
        F.sum(F.when(F.col("treated") == 0, dec).otherwise(F.lit(0).cast(N.DEC))).alias("s_c"),
    )
    kept = cells.filter(
        (F.col("n_t") > 0) & (F.col("n_t") < F.col("n"))
    ).withColumn(
        "stratum",
        F.least(
            F.expr(f"(n_t * {PROP_STRATA}) DIV n"),
            F.lit(PROP_STRATA - 1).cast("bigint"),
        ),
    )
    strata = kept.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_t").alias("n_treated"),
        F.sum(F.col("n") - F.col("n_t")).alias("n_control"),
        (F.sum("s_t").cast("double") / F.sum("n_t")).alias("mean_treated"),
        (
            F.sum("s_c").cast("double") / F.sum(F.col("n") - F.col("n_t"))
        ).alias("mean_control"),
    )
    att = strata.agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "stratum",
                                (
                                    F.col("n_treated")
                                    * (
                                        F.col("mean_treated")
                                        - F.col("mean_control")
                                    )
                                ).alias("term"),
                            )
                        )
                    ),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.sum("n_treated")
        ).alias("att_overall")
    )
    return strata.crossJoin(F.broadcast(att)).select(
        "stratum",
        F.col("n_cells").cast("bigint").alias("n_cells"),
        F.col("n_treated").cast("bigint").alias("n_treated"),
        F.col("n_control").cast("bigint").alias("n_control"),
        "mean_treated",
        "mean_control",
        (F.col("mean_treated") - F.col("mean_control")).alias("stratum_diff"),
        "att_overall",
    )


#: Holm step-down critical values: z* = Φ⁻¹(1 − 0.025/j) for j
#: remaining hypotheses, precomputed with Python's stdlib NormalDist
#: and embedded as string-cast literals (strtod parses identically in
#: both engines — a bare decimal literal would become DECIMAL in
#: DuckDB and double-round).
import statistics as _statistics  # noqa: E402

HOLM_ALPHA = 0.05
_HOLM_MAX_M = 25
_HOLM_CRIT = {
    j: _statistics.NormalDist().inv_cdf(1 - (HOLM_ALPHA / 2) / j)
    for j in range(1, _HOLM_MAX_M + 1)
}


def _holm_crit_sql(j: str) -> str:
    clauses = " ".join(
        f"WHEN {jj} THEN CAST('{v!r}' AS DOUBLE)"
        for jj, v in _HOLM_CRIT.items()
    )
    return f"(CASE {j} {clauses} END)"


#: Shared oracle CTEs producing the per-nation Welch z table (used by
#: the Holm step-down AND the Benjamini-Hochberg step-up readouts —
#: one definition so the two multiple-testing oracles can't drift).
_AB_Z_CTES = """unit AS (
  SELECT c.c_nationkey AS nation,
    CASE WHEN (instr('0123456789abcdef',
                substring(md5(CAST(c.c_custkey AS VARCHAR)), 1, 1)) - 1)
              % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
    o.o_totalprice AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT nation, variant, COUNT(*) AS n,
    SUM(CAST(y AS DECIMAL(18,4))) AS s,
    -- 19×18 forces DuckDB onto int128 while keeping Spark's exact
    -- DECIMAL(37,8) product type (see functions/numeric.sql_dstddev)
    SUM(CAST(y AS DECIMAL(19,4)) * CAST(y AS DECIMAL(18,4))) AS s2
  FROM unit GROUP BY 1, 2
),
wide AS (
  SELECT nation,
    MAX(CASE WHEN variant = 'A' THEN n END) AS na,
    MAX(CASE WHEN variant = 'B' THEN n END) AS nb,
    -- VARCHAR round-trip: DuckDB's int128-decimal→double cast
    -- double-rounds; strtod on the decimal string is correctly
    -- rounded (matches Spark's BigDecimal.doubleValue bitwise).
    MAX(CASE WHEN variant = 'A'
        THEN CAST(CAST(s AS VARCHAR) AS DOUBLE) END) AS sa,
    MAX(CASE WHEN variant = 'B'
        THEN CAST(CAST(s AS VARCHAR) AS DOUBLE) END) AS sb,
    MAX(CASE WHEN variant = 'A'
        THEN CAST(CAST(s2 AS VARCHAR) AS DOUBLE) END) AS sa2,
    MAX(CASE WHEN variant = 'B'
        THEN CAST(CAST(s2 AS VARCHAR) AS DOUBLE) END) AS sb2
  FROM cells GROUP BY 1
  HAVING MAX(CASE WHEN variant = 'A' THEN n END) >= 2
     AND MAX(CASE WHEN variant = 'B' THEN n END) >= 2
),
z AS (
  SELECT nation, na, nb,
    (sa / na - sb / nb)
      / sqrt((sa2 - sa * sa / na) / (na - 1) / na
             + (sb2 - sb * sb / nb) / (nb - 1) / nb) AS z
  FROM wide
)"""


def _ab_z_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Welch z table (Spark twin of _AB_Z_CTES), shared by
    the Holm step-down and Benjamini-Hochberg step-up readouts."""
    o = table(spark, sf_dir, "orders", spread=True)
    c = table(spark, sf_dir, "customer")
    unit = o.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_nationkey").alias("nation"),
        F.when(
            F.expr(
                "(instr('0123456789abcdef', "
                "substring(md5(cast(c_custkey as string)), 1, 1)) - 1) % 2"
            )
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        F.col("o_totalprice").alias("y"),
    )
    dy = F.col("y").cast("decimal(18,4)")
    # The square stays exact at decimal(18,4)² → (37,8) in Spark; the
    # oracle spells DECIMAL(19,4) to push DuckDB onto int128 (its
    # (18,4)² keeps 18 digits and overflows) — both sums are exact, so
    # the doubles agree bitwise.
    dy2 = F.col("y").cast("decimal(18,4)")
    cells = unit.groupBy("nation", "variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dy).alias("s"),
        F.sum(dy2 * dy2).alias("s2"),
    )

    def pick(v, col, cast=None):
        e = F.max(F.when(F.col("variant") == v, F.col(col)))
        return e.cast("double") if cast else e

    wide = (
        cells.groupBy("nation")
        .agg(
            pick("A", "n").alias("na"),
            pick("B", "n").alias("nb"),
            pick("A", "s", True).alias("sa"),
            pick("B", "s", True).alias("sb"),
            pick("A", "s2", True).alias("sa2"),
            pick("B", "s2", True).alias("sb2"),
        )
        .filter((F.col("na") >= 2) & (F.col("nb") >= 2))
    )
    z = wide.select(
        "nation",
        "na",
        "nb",
        (
            (F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"))
            / F.sqrt(
                (F.col("sa2") - F.col("sa") * F.col("sa") / F.col("na"))
                / (F.col("na") - 1)
                / F.col("na")
                + (F.col("sb2") - F.col("sb") * F.col("sb") / F.col("nb"))
                / (F.col("nb") - 1)
                / F.col("nb")
            )
        ).alias("z"),
    )
    return z


@register(
    "holm_stepdown_ab_tests",
    ops=("A4", "A9", "W4", "P5", "J3"),
    doc="Family-wise-error-controlled A/B readout (Holm 1979 step-"
    "down): a Welch z-statistic per NATION (md5-split variants over "
    "order prices, variances from decimal-exact sufficient "
    "statistics), then the 25-test family is ranked by |z| and "
    "tested against shrinking critical values Φ⁻¹(1−α/2j) — "
    "precomputed stdlib literals, no erf in either engine — with "
    "the step-down stop (a failure blocks all later rejections) as "
    "a prefix-min window over the rank. Reports the naive per-test "
    "verdict beside the Holm one — the multiple-testing damage "
    "audit every experimentation platform needs. One broadcast dim "
    "join + one hash aggregate; the stepdown runs on ≤25 rows.",
    oracle=f"""
WITH {_AB_Z_CTES},
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (ORDER BY abs(z) DESC, nation) AS k,
    COUNT(*) OVER () AS m
  FROM z
),
tested AS (
  SELECT *,
    {_holm_crit_sql("(m - k + 1)")} AS crit,
    CASE WHEN abs(z) >= {_holm_crit_sql("(m - k + 1)")}
         THEN 1 ELSE 0 END AS pass
  FROM ranked
)
SELECT nation, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  z, CAST(k AS BIGINT) AS abs_rank, crit,
  abs(z) >= {_holm_crit_sql("1")} AS reject_naive,
  MIN(pass) OVER (ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
    AS reject_holm
FROM tested
""",
)
def holm_stepdown_ab_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = _ab_z_frame(spark, sf_dir)
    wrank = Window.orderBy(F.abs(F.col("z")).desc(), "nation")
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = z.select(
        "*",
        F.row_number().over(wrank).alias("k"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    tested = ranked.select(
        "*",
        F.expr(_holm_crit_sql("(m - k + 1)")).alias("crit"),
        F.when(
            F.abs(F.col("z")) >= F.expr(_holm_crit_sql("(m - k + 1)")), 1
        )
        .otherwise(0)
        .alias("pass"),
    )
    wpre = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return tested.select(
        "nation",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "z",
        F.col("k").cast("bigint").alias("abs_rank"),
        "crit",
        (F.abs(F.col("z")) >= F.expr(_holm_crit_sql("1"))).alias(
            "reject_naive"
        ),
        (F.min("pass").over(wpre) == 1).alias("reject_holm"),
    )


#: Permutation-test replicas. Each replica re-assigns every UNIT (not
#: row) to a pseudo-variant by hashing (unit, replica) — the standard
#: Fisher randomization test, made cluster-deterministic by replacing
#: the RNG with a keyed md5 draw.
_PERM_REPS = 128


@register(
    "permutation_test_means",
    ops=("A3", "A9", "J10", "A12"),
    doc="Seeded permutation test for the A/B difference in per-"
    "customer spend: the observed split is the md5-parity variant "
    "(same unit hash as holm_stepdown_ab_tests), the null "
    "distribution is 128 re-randomizations, each re-hashing every "
    "customer with the replica id as salt. p = (1 + #extreme) / "
    "(R + 1), the standard add-one permutation p-value. The corpus-"
    "scale pass happens ONCE (per-customer decimal-exact totals); "
    "the replica explosion runs on the unit frame (units × 128 — "
    "linear in units, never in facts), one hash aggregate per "
    "replica keyed by (rep, variant). Every mean is a single "
    "division of an exact decimal sum, so the double comparisons "
    "match DuckDB bitwise. At 100 TB: same two aggregates; the "
    "replica fan-out stays unit-bounded, the permutation-null "
    "machinery every experimentation platform wants but usually "
    "monte-carlos nondeterministically.",
    oracle=f"""
WITH unit AS (
  SELECT o_custkey AS u,
    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS y
  FROM orders GROUP BY 1
),
obs AS (
  SELECT
    CAST(CAST(SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(CAST(u AS VARCHAR)), 1, 1)) - 1) % 2 = 0
        THEN y END) AS VARCHAR) AS DOUBLE)
      / SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(CAST(u AS VARCHAR)), 1, 1)) - 1) % 2 = 0
        THEN 1 ELSE 0 END)
    - CAST(CAST(SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(CAST(u AS VARCHAR)), 1, 1)) - 1) % 2 = 1
        THEN y END) AS VARCHAR) AS DOUBLE)
      / SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(CAST(u AS VARCHAR)), 1, 1)) - 1) % 2 = 1
        THEN 1 ELSE 0 END) AS diff_obs,
    COUNT(*) AS n_units
  FROM unit
),
reps AS (SELECT r FROM range(1, {_PERM_REPS} + 1) t(r)),
null_dist AS (
  SELECT r.r,
    CAST(CAST(SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(concat(CAST(u.u AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 1, 1)) - 1) % 2 = 0
        THEN u.y END) AS VARCHAR) AS DOUBLE)
      / SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(concat(CAST(u.u AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 1, 1)) - 1) % 2 = 0
        THEN 1 ELSE 0 END)
    - CAST(CAST(SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(concat(CAST(u.u AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 1, 1)) - 1) % 2 = 1
        THEN u.y END) AS VARCHAR) AS DOUBLE)
      / SUM(CASE WHEN (instr('0123456789abcdef',
          substring(md5(concat(CAST(u.u AS VARCHAR), ':', CAST(r.r AS VARCHAR))), 1, 1)) - 1) % 2 = 1
        THEN 1 ELSE 0 END) AS diff_r
  FROM unit u CROSS JOIN reps r
  GROUP BY 1
)
SELECT o.n_units, CAST({_PERM_REPS} AS BIGINT) AS n_reps, o.diff_obs,
  CAST(SUM(CASE WHEN ABS(n.diff_r) >= ABS(o.diff_obs)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
  (1.0 + SUM(CASE WHEN ABS(n.diff_r) >= ABS(o.diff_obs)
             THEN 1 ELSE 0 END)) / (1.0 + {_PERM_REPS}) AS p_value,
  (1.0 + SUM(CASE WHEN ABS(n.diff_r) >= ABS(o.diff_obs)
             THEN 1 ELSE 0 END)) / (1.0 + {_PERM_REPS}) < 0.05
    AS reject_05
FROM null_dist n CROSS JOIN obs o
GROUP BY 1, 2, 3
""",
)
def permutation_test_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    unit = o.groupBy(F.col("o_custkey").alias("u")).agg(
        F.sum(F.col("o_totalprice").cast(N.DEC)).alias("y")
    )

    def split_diff(df: DataFrame, keycol, extra_group=None):
        par = (
            F.instr(
                F.lit("0123456789abcdef"), F.substring(F.md5(keycol), 1, 1)
            )
            - 1
        ) % 2
        grouped = df.groupBy(*extra_group) if extra_group else df.groupBy()
        return grouped.agg(
            (
                F.sum(F.when(par == 0, F.col("y"))).cast("double")
                / F.sum(F.when(par == 0, 1).otherwise(0))
                - F.sum(F.when(par == 1, F.col("y"))).cast("double")
                / F.sum(F.when(par == 1, 1).otherwise(0))
            ).alias("diff"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    obs = split_diff(unit, F.col("u").cast("string")).select(
        F.col("diff").alias("diff_obs"), F.col("n_rows").alias("n_units")
    )
    reps = spark.range(1, _PERM_REPS + 1).select(
        F.col("id").cast("int").alias("r")
    )
    exploded = unit.crossJoin(F.broadcast(reps))
    null_dist = split_diff(
        exploded,
        F.concat(
            F.col("u").cast("string"), F.lit(":"), F.col("r").cast("string")
        ),
        extra_group=["r"],
    ).select("r", F.col("diff").alias("diff_r"))
    extreme = F.sum(
        F.when(F.abs(F.col("diff_r")) >= F.abs(F.col("diff_obs")), 1).otherwise(0)
    )
    p = (F.lit(1.0) + extreme) / F.lit(1.0 + _PERM_REPS)
    return (
        null_dist.crossJoin(F.broadcast(obs))
        .groupBy("n_units", F.lit(_PERM_REPS).cast("bigint").alias("n_reps"), "diff_obs")
        .agg(
            extreme.cast("bigint").alias("n_extreme"),
            p.alias("p_value"),
            (p < 0.05).alias("reject_05"),
        )
    )


#: BH step-up critical values Φ⁻¹(1 − α·k/(2m)) for every family size
#: m ≤ 25 and rank k ≤ m — stdlib-precomputed literals (like
#: _HOLM_CRIT) so neither engine evaluates an inverse normal CDF.
_BH_ALPHA = 0.05
_BH_CRIT = {
    (m, k): _statistics.NormalDist().inv_cdf(1 - (_BH_ALPHA * k) / (2 * m))
    for m in range(1, _HOLM_MAX_M + 1)
    for k in range(1, m + 1)
}
_BH_VALUES_SQL = ", ".join(
    f"({m}, {k}, CAST('{v!r}' AS DOUBLE))" for (m, k), v in _BH_CRIT.items()
)


@register(
    "bh_fdr_control",
    ops=("A4", "A9", "W4", "P5", "J3"),
    doc="False-discovery-rate-controlled A/B readout (Benjamini-"
    "Hochberg 1995 step-UP), the power-preserving dual of "
    "holm_stepdown_ab_tests built on the SAME per-nation Welch z "
    "table (_ab_z_frame — one definition, two multiple-testing "
    "procedures): tests ranked by |z| are compared against "
    "Φ⁻¹(1−α·k/(2m)) and every rank up to the LARGEST passing one "
    "is rejected (step-up), vs Holm's first-failure cutoff. "
    "Critical values for every (m ≤ 25, k ≤ m) are stdlib-"
    "precomputed literals joined as a broadcast grid, so no erf in "
    "either engine. Emits naive / BH verdicts side by side; the "
    "procedure runs on ≤25 rows after one broadcast-dim join + one "
    "hash aggregate over the fact table.",
    oracle=f"""
WITH {_AB_Z_CTES},
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (ORDER BY abs(z) DESC, nation) AS k,
    COUNT(*) OVER () AS m
  FROM z
),
crit AS (SELECT * FROM (VALUES {_BH_VALUES_SQL}) t(m, k, v)),
tested AS (
  SELECT r.nation, r.na, r.nb, r.z, r.k, c.v AS crit_bh,
    CASE WHEN abs(r.z) >= c.v THEN r.k ELSE 0 END AS pass_k
  FROM ranked r JOIN crit c ON r.m = c.m AND r.k = c.k
)
SELECT nation, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  z, CAST(k AS BIGINT) AS abs_rank, crit_bh,
  abs(z) >= CAST('{_BH_CRIT[(1, 1)]!r}' AS DOUBLE) AS reject_naive,
  k <= MAX(pass_k) OVER () AS reject_bh
FROM tested
""",
)
def bh_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = _ab_z_frame(spark, sf_dir)
    wrank = Window.orderBy(F.abs(F.col("z")).desc(), "nation")
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = z.select(
        "*",
        F.row_number().over(wrank).alias("k"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    crit = spark.createDataFrame(
        [(m, k, v) for (m, k), v in _BH_CRIT.items()],
        "m int, k int, v double",
    )
    tested = ranked.join(
        F.broadcast(crit), ["m", "k"]
    ).select(
        "nation",
        "na",
        "nb",
        "z",
        "k",
        F.col("v").alias("crit_bh"),
        F.when(F.abs(F.col("z")) >= F.col("v"), F.col("k"))
        .otherwise(0)
        .alias("pass_k"),
    )
    return tested.select(
        "nation",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "z",
        F.col("k").cast("bigint").alias("abs_rank"),
        "crit_bh",
        (F.abs(F.col("z")) >= F.lit(_BH_CRIT[(1, 1)])).alias("reject_naive"),
        (F.col("k") <= F.max("pass_k").over(wall)).alias("reject_bh"),
    )


#: z² for the 95% Wilson interval — stdlib literal (1.959963...²).
_WILSON_Z2 = 3.841458820694124


@register(
    "wilson_ci_conversion",
    ops=("A2", "A9", "A5", "P8"),
    doc="Wilson score intervals (Wilson 1927 — the binomial CI that "
    "behaves at small n and extreme rates, unlike the Wald "
    "interval) for per-event-type user conversion: denominator = "
    "users who ever viewed, numerator = those who also did the "
    "target action. Center and half-width are closed-form in n, x, "
    "z² (a stdlib literal) — one sqrt, identical operation order "
    "on both engines. One distinct-user conditional aggregate over "
    "events; the interval math runs on ≤5 rows. The uncertainty "
    "readout funnels/SRM checks should always carry.",
    oracle=f"""
WITH ue AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased,
    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signed_up,
    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked
  FROM events GROUP BY 1
),
tall AS (
  SELECT 'purchase' AS target,
    CAST(SUM(viewed) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN viewed = 1 AND purchased = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS x
  FROM ue
  UNION ALL
  SELECT 'signup',
    CAST(SUM(viewed) AS BIGINT),
    CAST(SUM(CASE WHEN viewed = 1 AND signed_up = 1 THEN 1 ELSE 0 END)
         AS BIGINT)
  FROM ue
  UNION ALL
  SELECT 'click',
    CAST(SUM(viewed) AS BIGINT),
    CAST(SUM(CASE WHEN viewed = 1 AND clicked = 1 THEN 1 ELSE 0 END)
         AS BIGINT)
  FROM ue
)
SELECT target, n, x,
  CAST(x AS DOUBLE) / n AS rate,
  (CAST(x AS DOUBLE) / n + {_WILSON_Z2!r} / (2.0 * n)) / (1.0 + {_WILSON_Z2!r} / n)
    - sqrt({_WILSON_Z2!r}) / (1.0 + {_WILSON_Z2!r} / n)
      * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n
             + {_WILSON_Z2!r} / (4.0 * n * n)) AS wilson_lo,
  (CAST(x AS DOUBLE) / n + {_WILSON_Z2!r} / (2.0 * n)) / (1.0 + {_WILSON_Z2!r} / n)
    + sqrt({_WILSON_Z2!r}) / (1.0 + {_WILSON_Z2!r} / n)
      * sqrt((CAST(x AS DOUBLE) / n) * (1.0 - CAST(x AS DOUBLE) / n) / n
             + {_WILSON_Z2!r} / (4.0 * n * n)) AS wilson_hi
FROM tall
""",
)
def wilson_ci_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    flags = e.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(c)
            for t, c in (
                ("view", "viewed"),
                ("purchase", "purchased"),
                ("signup", "signed_up"),
                ("click", "clicked"),
            )
        ]
    )

    def arm(target: str, col: str) -> DataFrame:
        return flags.agg(
            F.lit(target).alias("target"),
            F.sum("viewed").cast("bigint").alias("n"),
            F.sum(
                F.when((F.col("viewed") == 1) & (F.col(col) == 1), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("x"),
        )

    tall = (
        arm("purchase", "purchased")
        .unionByName(arm("signup", "signed_up"))
        .unionByName(arm("click", "clicked"))
    )
    p = F.col("x").cast("double") / F.col("n")
    z2 = F.lit(_WILSON_Z2)
    n = F.col("n")
    center = (p + z2 / (2.0 * n)) / (F.lit(1.0) + z2 / n)
    half = (
        F.sqrt(z2)
        / (F.lit(1.0) + z2 / n)
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (4.0 * n * n))
    )
    return tall.select(
        "target",
        "n",
        "x",
        p.alias("rate"),
        (center - half).alias("wilson_lo"),
        (center + half).alias("wilson_hi"),
    )


@register(
    "skewness_exact_moments",
    ops=("A4", "A3", "A9"),
    doc="Distribution-shape audit: population skewness per order "
    "status from EXACT third-moment sufficient statistics — prices "
    "are 2-dp values, so DECIMAL(9,2) terms keep x, x², x³ exact "
    "through the sums (x³ peaks at precision 29, inside both "
    "engines' int128 paths; Spark's builtin skewness() is a "
    "partition-order-dependent streaming fold and can never match "
    "an oracle bitwise — this one is order-free by construction). "
    "One hash aggregate; the g1 formula is evaluated in the same "
    "operation order on both engines. Extends the mergeable-"
    "moments family (moments_partial_merge) to the third moment.",
    oracle="""
WITH s AS (
  SELECT o_orderstatus,
    COUNT(*) AS n,
    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS VARCHAR)
         AS DOUBLE) AS s1,
    -- width 19 on one operand forces DuckDB onto int128 (its 9x9
    -- multiply takes an int64 fast path that overflows; see
    -- functions/numeric.sql_dstddev)
    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))
                  * CAST(o_totalprice AS DECIMAL(9,2))) AS VARCHAR)
         AS DOUBLE) AS s2,
    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))
                  * CAST(o_totalprice AS DECIMAL(9,2))
                  * CAST(o_totalprice AS DECIMAL(9,2))) AS VARCHAR)
         AS DOUBLE) AS s3
  FROM orders GROUP BY 1
)
SELECT o_orderstatus,
  CAST(n AS BIGINT) AS n,
  s1 / n AS mean,
  s2 / n - (s1 / n) * (s1 / n) AS pop_variance,
  (s3 / n - 3.0 * (s1 / n) * (s2 / n)
    + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
    / ((s2 / n - (s1 / n) * (s1 / n))
       * sqrt(s2 / n - (s1 / n) * (s1 / n))) AS skewness
FROM s
""",
)
def skewness_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(9,2)")
    s = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
        F.sum(d * d * d).cast("double").alias("s3"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    skew = (
        F.col("s3") / F.col("n")
        - 3.0 * mean * (F.col("s2") / F.col("n"))
        + 2.0 * mean * mean * mean
    ) / (var * F.sqrt(var))  # var^1.5 via sqrt: pow() is libm, sqrt is IEEE
    return s.select(
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        mean.alias("mean"),
        var.alias("pop_variance"),
        skew.alias("skewness"),
    )
