"""ML data-preparation operators — the pre-training / feature-prep
surface a large-scale training pipeline needs between curation and
the trainer: document chunking, Gopher-style quality rules,
deterministic hash-based dataset splits, outlier winsorization,
per-group feature standardization, and k-means semantic clustering
over embeddings.

Reference scope note: the reference pipeline stops at a flat feature
table + XGBoost (`train_delay_model.py`); these operators extend the
engine for the LLM-training-data workload (SURVEY.md §6 "beyond the
reference"), like :mod:`.curation` and :mod:`.dedup`.

Scale design:
  * chunking / quality rules are pure column expressions (split,
    higher-order filter/transform lambdas) — whole-stage codegen, no
    shuffle, embarrassingly parallel at 100 TB;
  * hash split is a stateless md5 of the key — reproducible on any
    cluster layout, no global sort (contrast W5's row_number split,
    which needs one);
  * winsorize / z-score decorrelate the per-group statistics into a
    tiny aggregate joined back broadcast-style (SURVEY §2 J6/J8
    pattern) — two narrow shuffles on the group key;
  * k-means quantizes float32 components to integer 2^-20 grid so
    every cross-engine sum is EXACT (long arithmetic) — partition
    merge order stops mattering, the same property
    :mod:`..functions.numeric` buys for decimal sums. Assignment is
    a broadcast cross-join against K centroid rows, the update is one
    (cluster, dim) hash agg — both linear in rows at fixed K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from .registry import register
from .textops import SQL_TOKENS, STOPWORDS, _sql_list, tokens_col

#: Chunking geometry: 32-token windows every 24 tokens (8-token overlap).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

#: Quantization grid for exact k-means arithmetic: float32 component
#: → trunc(x · 2^20) fits |x| ≤ 8e3 in a long with 6 decimal digits
#: of resolution; (q_a − q_b)² ≤ ~1e14 and 64-dim sums ≤ ~6.4e15 stay
#: exact in both long and double.
KMEANS_Q = 1_048_576.0
KMEANS_K = 8
KMEANS_DIM = 64


@register(
    "doc_chunking",
    ops=("P1", "F7", "F10"),
    doc="Sliding-window document chunking (32-token windows, stride "
    "24) — the tokenize-and-pack precursor: sequence+explode over "
    "token offsets, slice per window. Pure codegen, no shuffle.",
    oracle=f"""
WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
starts AS (
  SELECT doc_id, w, len(w) AS n, UNNEST(generate_series(0, len(w) - 1, {CHUNK_STRIDE})) AS s
  FROM tok
)
SELECT
  doc_id,
  s AS chunk_start,
  len(list_slice(w, s + 1, LEAST(s + {CHUNK_TOKENS}, n))) AS n_chunk_tokens,
  array_to_string(list_slice(w, s + 1, LEAST(s + {CHUNK_TOKENS}, n)), ' ') AS chunk_text
FROM starts
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    t = d.select("doc_id", tokens_col().alias("w")).withColumn("n", F.size("w"))
    t = t.select(
        "doc_id",
        "w",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.expr(f"slice(w, s + 1, {CHUNK_TOKENS})")
    return t.select(
        "doc_id",
        F.col("s").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@register(
    "text_gopher_rules",
    ops=("P5", "P7", "A3"),
    doc="Gopher-style document quality rules: token-count bounds, "
    "mean token length band, minimum stopword hits, alphabetic-word "
    "fraction — each rule a column, plus the composed keep flag. "
    "All higher-order-function lambdas inside codegen (no UDFs).",
    oracle=f"""
WITH tok AS (SELECT doc_id, lang, text, {SQL_TOKENS} AS w FROM documents)
SELECT
  doc_id,
  lang,
  len(w) AS n_tokens,
  CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / len(w) AS mean_token_len,
  len(list_filter(w, t -> t IN ({_sql_list(STOPWORDS)}))) AS n_stopwords,
  CAST(len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) AS DOUBLE) / len(w)
    AS frac_alpha,
  (len(w) BETWEEN 10 AND 1000)
    AND (CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / len(w) BETWEEN 2.0 AND 12.0)
    AND len(list_filter(w, t -> t IN ({_sql_list(STOPWORDS)}))) >= 2
    AND CAST(len(list_filter(w, t -> regexp_full_match(t, '[a-z]+'))) AS DOUBLE) / len(w) >= 0.8
    AS keep
FROM tok
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    t = d.select("doc_id", "lang", "text", w.alias("w"))
    n = F.size("w")
    mean_len = (
        F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit(""))).cast(
            "double"
        )
        / n
    )
    n_stop = F.size(F.filter(F.col("w"), lambda t_: t_.isin(*STOPWORDS)))
    frac_alpha = (
        F.size(F.filter(F.col("w"), lambda t_: t_.rlike("^[a-z]+$"))).cast("double")
        / n
    )
    keep = (
        n.between(10, 1000)
        & mean_len.between(2.0, 12.0)
        & (n_stop >= 2)
        & (frac_alpha >= 0.8)
    )
    return t.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        n_stop.cast("long").alias("n_stopwords"),
        frac_alpha.alias("frac_alpha"),
        keep.alias("keep"),
    )


#: Shared hex-digit → value spelling (identical in Spark SQL and DuckDB).
_HEXPOS = (
    "instr('0123456789abcdef', substring(md5(cast(doc_id as string)), {i}, 1)) - 1"
)
_BUCKET_SQL = f"(({_HEXPOS.format(i=1)}) * 16 + ({_HEXPOS.format(i=2)}))"


@register(
    "hash_split_3way",
    ops=("W5", "F12", "P5"),
    doc="Deterministic train/val/test split by md5(doc_id) bucket "
    "(256 buckets → 75/12.5/12.5). Stateless per-row hash: "
    "reproducible on any cluster layout with NO global sort — the "
    "scale-path alternative to the reference's ORDER BY RANDOM() "
    "sampling (`train_delay_model.py:123-124`) and the row_number "
    "split (`ml_feature_engineering.sql:468-519`).",
    oracle=f"""
SELECT
  doc_id,
  CAST({_BUCKET_SQL} AS BIGINT) AS bucket,
  CASE
    WHEN {_BUCKET_SQL} < 192 THEN 'train'
    WHEN {_BUCKET_SQL} < 224 THEN 'val'
    ELSE 'test'
  END AS split
FROM documents
""",
)
def hash_split_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SQL)
    return d.select(
        "doc_id",
        bucket.cast("long").alias("bucket"),
        F.when(bucket < 192, F.lit("train"))
        .when(bucket < 224, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "winsorize_clip",
    ops=("A8", "P7", "J6"),
    doc="Per-group winsorization: exact p05/p95 per order priority "
    "(decorrelated into a 5-row aggregate, broadcast back), values "
    "clipped to the band, per-group clip counts + winsorized mean. "
    "The outlier-capping step of a feature-prep pipeline.",
    oracle=f"""
WITH b AS (
  SELECT o_orderpriority AS priority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY 1
)
SELECT
  b.priority,
  b.p05,
  b.p95,
  COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN o_totalprice < b.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
  CAST(SUM(CASE WHEN o_totalprice > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
  {N.sql_davg("LEAST(GREATEST(o_totalprice, b.p05), b.p95)")} AS winsorized_mean
FROM orders o JOIN b ON o.o_orderpriority = b.priority
GROUP BY 1, 2, 3
""",
)
def winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bands = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    joined = o.join(
        F.broadcast(bands), o["o_orderpriority"] == bands["priority"]
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    return joined.groupBy("priority", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_totalprice") < F.col("p05"), 1).otherwise(0)
        ).alias("n_clipped_low"),
        F.sum(
            F.when(F.col("o_totalprice") > F.col("p95"), 1).otherwise(0)
        ).alias("n_clipped_high"),
        N.davg(clipped).alias("winsorized_mean"),
    )


@register(
    "zscore_normalize",
    ops=("J6", "A3", "A4"),
    doc="Per-group z-score standardization: deterministic mean/stddev "
    "per order priority (exact decimal sufficient statistics, "
    "`functions/numeric.py`), joined back broadcast-style, per-row "
    "z = (x − μ)/σ. The feature-scaling step of D6 re-expressed as a "
    "decorrelated join (SURVEY §2 J6/J8).",
    oracle=f"""
WITH s AS (
  SELECT o_orderpriority AS priority,
         {N.sql_davg("o_totalprice")} AS mu,
         {N.sql_dstddev("o_totalprice")} AS sigma
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey, s.priority, o.o_totalprice,
       (o.o_totalprice - s.mu) / s.sigma AS zscore
FROM orders o JOIN s ON o.o_orderpriority = s.priority
""",
)
def zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    stats = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        N.davg("o_totalprice").alias("mu"),
        N.dstddev("o_totalprice").alias("sigma"),
    )
    return (
        o.join(F.broadcast(stats), o["o_orderpriority"] == stats["priority"])
        .select(
            "o_orderkey",
            "priority",
            "o_totalprice",
            ((F.col("o_totalprice") - F.col("mu")) / F.col("sigma")).alias("zscore"),
        )
    )


def _q_col(vec):
    """float32 array → long array on the 2^-20 grid (exact in both
    engines: multiply by a power of two is exact, cast truncates)."""
    return F.transform(
        vec, lambda x: (x.cast("double") * F.lit(KMEANS_Q)).cast("long")
    )


_SQL_QVEC = (
    "list_transform(embedding, "
    f"x -> CAST(trunc(CAST(x AS DOUBLE) * {KMEANS_Q!r}) AS BIGINT))"
)


def _sqdist(a, b):
    """Σ (aᵢ−bᵢ)² as a sequential left fold over doubles."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Perf note (measured at sf0.1, ×2 reps): UNROLLING the 64-dim fold
# into flat `getItem` arithmetic is a LOSS (2–6× slower across the
# similarity suite) — the giant generated class pays a janino compile
# per query that dwarfs any per-row gain, while the higher-order fold
# evaluates at roughly the same per-row cost once the join strategy is
# right. Keep the folds; fix join strategy/shuffles instead.


def _lloyd_assign(e: DataFrame, centroids: DataFrame, keep: tuple = ()) -> DataFrame:
    """One Lloyd assignment round as a PURE MAP — zero shuffle.

    Packs the K centroids into a single broadcast row (array of
    (cid, c) structs, array_sort = sorted by the unique cid), then
    per-vector argmin = ``array_min`` over struct(dist, cid):
    lexicographic struct ordering IS (dist, cid) ordering, so ties
    break to the smaller cid exactly like the ROW_NUMBER oracle
    (`_sql_assign`). The old crossJoin+window argmin shuffled n×K
    rows carrying the 64-dim arrays through a sort — measured 1.7×
    slower at sf0.1 and strictly worse at scale. The packed centroid
    row is K×dim doubles: broadcast-sized while K = max(8, n/250)
    stays under ~1M clusters (≈512 MB row); beyond that shard the
    centroid array. dist stays the sequential-fold `_sqdist` — on the
    quantized grid round-1 sums are exact integers, and round-2
    (double centroids) needs the fold's left-to-right order to match
    DuckDB's list_reduce bitwise.
    """
    packed = centroids.agg(
        F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cs")
    )
    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda s: F.struct(
                _sqdist(F.col("v"), s["c"]).alias("dist"), s["cid"].alias("cid")
            ),
        )
    )
    return e.crossJoin(F.broadcast(packed)).select(
        "vec_id", best["cid"].alias("cid"), *keep
    )


def _sql_sqdist(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


def _sql_assign(evec: str, cvec: str, e: str, c: str) -> str:
    """One Lloyd assignment round as SQL: nearest centroid per vector,
    ties broken by centroid id."""
    return f"""
SELECT vec_id, cid, v FROM (
  SELECT {e}.vec_id, {c}.cid, {e}.v,
         ROW_NUMBER() OVER (
           PARTITION BY {e}.vec_id
           ORDER BY {_sql_sqdist(evec, cvec)}, {c}.cid
         ) AS rn
  FROM {e}, {c}
) WHERE rn = 1
"""


@register(
    "kmeans_semantic_clusters",
    ops=("J10", "A3", "W4"),
    doc="Deterministic k-means over embeddings (K=8, 2 Lloyd "
    "iterations, centroids seeded from the first K vectors): the "
    "semantic-clustering primitive behind cluster-balanced sampling "
    "and SemDeDup-style semantic dedup. Components quantized to the "
    "2^-20 integer grid so every sum is EXACT long arithmetic — "
    "assignment is reproducible on any partition layout. Assignment "
    "= map-only argmin against the packed broadcast centroid row "
    "(`_lloyd_assign` — zero shuffle); update = one (cluster, dim) "
    "hash agg; both linear in corpus size at fixed K.",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform({_SQL_QVEC}, q -> CAST(q AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {KMEANS_K}),
a1 AS ({_sql_assign("e.v", "c0.c", "e", "c0")}),
c1 AS (
  SELECT cid, list(comp ORDER BY dim) AS c FROM (
    SELECT cid, dim, CAST(SUM(v[dim]) AS DOUBLE) / COUNT(*) AS comp
    FROM a1, generate_series(1, {KMEANS_DIM}) AS t(dim)
    GROUP BY cid, dim
  ) GROUP BY cid
),
a2 AS ({_sql_assign("e.v", "c1.c", "e", "c1")})
SELECT
  a2.cid AS cluster_id,
  COUNT(*) AS n_members,
  ROUND(MAX(c1.c[1]) / {KMEANS_Q!r}, 6) AS centroid_d1
FROM a2 JOIN c1 ON a2.cid = c1.cid
GROUP BY 1
""",
)
def kmeans_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.transform(_q_col(F.col("embedding")), lambda q: q.cast("double")).alias("v")
    )
    c0 = (
        e.filter(F.col("vec_id") < KMEANS_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
    )

    a1 = _lloyd_assign(e, c0, keep=("v",))
    comps = a1.select(
        "cid", F.posexplode(F.col("v")).alias("dim0", "qv")
    ).groupBy("cid", (F.col("dim0") + 1).alias("dim")).agg(
        (F.sum("qv").cast("double") / F.count(F.lit(1))).alias("comp")
    )
    c1 = comps.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "comp"))),
            lambda s: s["comp"],
        ).alias("c")
    )
    a2 = _lloyd_assign(e, c1)
    return (
        a2.join(F.broadcast(c1), "cid")
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.max(F.element_at("c", 1)) / F.lit(KMEANS_Q), 6).alias(
                "centroid_d1"
            ),
        )
    )


#: Token capacity of one packed training sequence.
PACK_CAP = 2048


@register(
    "pack_sequences",
    ops=("W11", "A3", "F7"),
    doc="Sequence-packing planner: documents stream into fixed "
    "2048-token training sequences in deterministic (lang, doc_id) "
    "order; a doc belongs to the pack where its first token lands "
    "(running-sum window → integer shard). Per-pack occupancy stats "
    "out. One window sort per language partition — partition-parallel "
    "at 100 TB, no global sort.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, len({SQL_TOKENS}) AS n_tokens FROM documents
),
cum AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM tok
)
SELECT lang,
       CAST(trunc(CAST(cum_tokens - n_tokens AS DOUBLE) / {PACK_CAP}) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_in_pack
FROM cum
GROUP BY 1, 2
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tokens_col()).cast("long").alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    pack = (
        ((F.col("cum_tokens") - F.col("n_tokens")).cast("double") / F.lit(PACK_CAP))
        .cast("long")
    )
    return t.groupBy("lang", pack.alias("pack_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_in_pack"),
    )


@register(
    "vocab_heavy_hitters",
    ops=("A1", "W4", "O1"),
    doc="Per-language top-5 tokens (vocabulary heavy hitters): "
    "explode → (lang, token) hash count → per-lang rank with a token "
    "tiebreaker. The exact companion to the Count-Min sketch "
    "(`sketches.py`) — at 100 TB run the sketch first, then this "
    "exact pass over sketch-flagged candidates only.",
    oracle=f"""
WITH tok AS (
  SELECT lang, UNNEST({SQL_TOKENS}) AS token FROM documents
),
cnt AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY 1, 2)
SELECT lang, token, n, rnk FROM (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
  FROM cnt
) WHERE rnk <= 5
""",
)
def vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select("lang", F.explode(tokens_col()).alias("token"))
    cnt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "token", "n", F.col("rnk").cast("long").alias("rnk"))
    )


@register(
    "per_source_cap",
    ops=("W4", "A1", "F12"),
    doc="Deterministic per-source document capping (the training-mix "
    "guardrail that stops one domain from dominating the corpus): rank "
    "docs inside each source by a keyed md5 draw (a seeded shuffle "
    "that is reproducible on any partitioning — no ORDER BY RANDOM()), "
    "keep the first 400 per source. The window sorts per-source "
    "partitions in parallel; at 100 TB a pre-filter on the hash draw "
    "(keep_frac ≈ cap/n_source, slightly over-sampled) would bound the "
    "sorted volume per source before the exact rank — same two-phase "
    "screen-then-exact pattern as the dedup operators. Output is the "
    "per-source audit row: available vs kept counts plus a kept-id "
    "checksum proving BOTH sides selected identical documents.",
    oracle="""
WITH ranked AS (
  SELECT lang, doc_id,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM documents
)
SELECT lang, COUNT(*) AS n_avail,
       CAST(SUM(CASE WHEN rn <= 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn <= 400 THEN doc_id END) AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY lang
""",
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    draw = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(draw, "doc_id")
    ranked = d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_avail"),
        F.sum(F.when(F.col("rn") <= 400, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") <= 400, F.col("doc_id")))
        .cast("long")
        .alias("kept_id_sum"),
    )


#: PQ layout: 16-dim vectors → 4 subspaces × 4 dims, 8-entry codebooks.
PQ_M, PQ_DSUB, PQ_K = 4, 4, 8


@register(
    "similarity_pq_codes",
    ops=("J10", "A3", "A9"),
    doc="Product quantization: each embedding splits into 4 subvectors; "
    "each subvector is coded against an 8-entry per-subspace codebook "
    "(seeded from the first 8 vectors' subvectors — deterministic, "
    "exact integer arithmetic via the shared 2^20 quantization), "
    "giving a 4-byte code per 16-dim vector (16× compression) plus "
    "the exact reconstruction error. Assignment is ONE aggregate "
    "(min_by over the exploded subspace×codebook grid, map-side "
    "combine) — at 100 TB the codebook broadcast is KB-sized and the "
    "code table replaces the raw vectors for first-stage ANN scans.",
    oracle=f"""
WITH e AS (
  SELECT vec_id, {_SQL_QVEC} AS v FROM embeddings
),
sub AS (
  SELECT vec_id, j, v[(4 * j + 1):(4 * j + 4)] AS sv
  FROM e, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS j)
),
cb AS (
  SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < {PQ_K}
),
assigned AS (
  SELECT vec_id, j, cid, dist FROM (
    SELECT s.vec_id, s.j, c.cid,
           {_sql_sqdist("s.sv", "c.cv")} AS dist,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.j
             ORDER BY {_sql_sqdist("s.sv", "c.cv")}, c.cid) AS rn
    FROM sub s JOIN cb c ON s.j = c.j
  ) WHERE rn = 1
)
SELECT vec_id,
  MAX(CASE WHEN j = 0 THEN cid END) AS code_0,
  MAX(CASE WHEN j = 1 THEN cid END) AS code_1,
  MAX(CASE WHEN j = 2 THEN cid END) AS code_2,
  MAX(CASE WHEN j = 3 THEN cid END) AS code_3,
  ROUND(SUM(dist) / {KMEANS_Q!r} / {KMEANS_Q!r}, 6) AS recon_err
FROM assigned
GROUP BY vec_id
""",
)
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id",
        F.transform(_q_col(F.col("embedding")), lambda q: q.cast("double")).alias("v"),
    )
    js = spark.range(PQ_M).select(F.col("id").cast("int").alias("j"))
    sub = e.crossJoin(F.broadcast(js)).select(
        "vec_id",
        "j",
        F.slice("v", F.col("j") * PQ_DSUB + 1, PQ_DSUB).alias("sv"),
    )
    cb = sub.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("j").alias("cj"), F.col("sv").alias("cv")
    )
    scored = sub.join(F.broadcast(cb), F.col("j") == F.col("cj")).select(
        "vec_id",
        "j",
        "cid",
        _sqdist(F.col("sv"), F.col("cv")).alias("dist"),
    )
    best = scored.groupBy("vec_id", "j").agg(
        F.min_by("cid", F.struct(F.col("dist"), F.col("cid"))).alias("cid"),
        F.min("dist").alias("dist"),
    )
    return best.groupBy("vec_id").agg(
        F.max(F.when(F.col("j") == 0, F.col("cid"))).alias("code_0"),
        F.max(F.when(F.col("j") == 1, F.col("cid"))).alias("code_1"),
        F.max(F.when(F.col("j") == 2, F.col("cid"))).alias("code_2"),
        F.max(F.when(F.col("j") == 3, F.col("cid"))).alias("code_3"),
        F.round(
            F.sum("dist") / F.lit(KMEANS_Q) / F.lit(KMEANS_Q), 6
        ).alias("recon_err"),
    )


#: ADC search query set (the first 8 vectors, = the codebook seeds).
_ADC_NQ = 8


@register(
    "similarity_adc_topk",
    ops=("J10", "A3", "W4", "O1"),
    doc="PQ asymmetric-distance (ADC) top-k search: queries build a "
    "per-subspace distance table to the 8-entry codebooks (256 rows, "
    "broadcast), the database is scanned as 4-byte PQ codes (the "
    "whole point at 100 TB: the first-stage scan reads ~1/16th the "
    "bytes of raw vectors), approximate distance = sum of 4 table "
    "lookups, then exact top-5 per query with an in_exact_top5 "
    "quality flag against the full-precision distances. All "
    "arithmetic on the shared 2^20 integer grid, so both engines "
    "rank identically with zero float ambiguity.",
    oracle=f"""
WITH e AS (
  SELECT vec_id, {_SQL_QVEC} AS v FROM embeddings
),
sub AS (
  SELECT vec_id, j, v[(4 * j + 1):(4 * j + 4)] AS sv
  FROM e, range(0, {PQ_M}) t(j)
),
cb AS (
  SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < {PQ_K}
),
codes AS (
  SELECT vec_id, j, cid AS code FROM (
    SELECT s.vec_id, s.j, c.cid,
      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
        ORDER BY {_sql_sqdist("s.sv", "c.cv")}, c.cid) AS rn
    FROM sub s JOIN cb c ON s.j = c.j
  ) WHERE rn = 1
),
qsub AS (
  SELECT vec_id AS query_id, j, sv AS qv FROM sub WHERE vec_id < {_ADC_NQ}
),
dtab AS (
  SELECT q.query_id, q.j, c.cid, {_sql_sqdist("q.qv", "c.cv")} AS d
  FROM qsub q JOIN cb c ON q.j = c.j
),
adc AS (
  SELECT t.query_id, co.vec_id, CAST(SUM(t.d) AS BIGINT) AS adc_dist
  FROM codes co JOIN dtab t ON co.j = t.j AND co.code = t.cid
  WHERE t.query_id <> co.vec_id
  GROUP BY t.query_id, co.vec_id
),
ranked AS (
  SELECT query_id, vec_id AS neighbor_id, adc_dist,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY adc_dist, vec_id) AS adc_rank
  FROM adc
),
pairs AS (
  SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
    CAST({_sql_sqdist("q.v", "x.v")} AS BIGINT) AS dist
  FROM (SELECT * FROM e WHERE vec_id < {_ADC_NQ}) q, e x
  WHERE q.vec_id <> x.vec_id
),
exact AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY dist, neighbor_id) AS xrank
  FROM pairs
)
SELECT r.query_id, r.adc_rank, r.neighbor_id, r.adc_dist,
  x.neighbor_id IS NOT NULL AS in_exact_top5
FROM (SELECT * FROM ranked WHERE adc_rank <= 5) r
LEFT JOIN (SELECT * FROM exact WHERE xrank <= 5) x
  ON r.query_id = x.query_id AND r.neighbor_id = x.neighbor_id
""",
)
def similarity_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id",
        F.transform(_q_col(F.col("embedding")), lambda q: q.cast("double")).alias("v"),
    )
    js = spark.range(PQ_M).select(F.col("id").cast("int").alias("j"))
    sub = e.crossJoin(F.broadcast(js)).select(
        "vec_id", "j", F.slice("v", F.col("j") * PQ_DSUB + 1, PQ_DSUB).alias("sv")
    )
    cb = sub.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("j").alias("cj"), F.col("sv").alias("cv")
    )
    # Database → codes: nearest codebook entry per (vector, subspace).
    codes = (
        sub.join(F.broadcast(cb), F.col("j") == F.col("cj"))
        .select(
            "vec_id", "j", "cid", _sqdist(F.col("sv"), F.col("cv")).alias("cdist")
        )
        .groupBy("vec_id", "j")
        .agg(F.min_by("cid", F.struct(F.col("cdist"), F.col("cid"))).alias("code"))
    )
    # Query-side distance table: 8 queries × 4 subspaces × 8 entries.
    dtab = (
        sub.filter(F.col("vec_id") < _ADC_NQ)
        .select(F.col("vec_id").alias("query_id"), "j", "sv")
        .join(F.broadcast(cb), F.col("j") == F.col("cj"))
        .select("query_id", "j", "cid", _sqdist(F.col("sv"), F.col("cv")).alias("d"))
    )
    adc = (
        codes.join(
            F.broadcast(dtab),
            (codes["j"] == dtab["j"]) & (codes["code"] == dtab["cid"]),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("bigint").alias("adc_dist"))
    )
    aw = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    ranked = (
        adc.withColumn("adc_rank", F.row_number().over(aw))
        .filter(F.col("adc_rank") <= 5)
        .select("query_id", "adc_rank", F.col("vec_id").alias("neighbor_id"), "adc_dist")
    )
    # Exact full-precision top-5 for the quality flag.
    q = e.filter(F.col("vec_id") < _ADC_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("xn"),
            _sqdist(F.col("qv"), F.col("v")).cast("bigint").alias("dist"),
        )
    )
    xw = Window.partitionBy("query_id").orderBy("dist", "xn")
    exact = (
        pairs.withColumn("xrank", F.row_number().over(xw))
        .filter(F.col("xrank") <= 5)
        .select(F.col("query_id").alias("xq"), "xn")
    )
    return ranked.join(
        F.broadcast(exact),
        (ranked["query_id"] == exact["xq"]) & (ranked["neighbor_id"] == exact["xn"]),
        "left",
    ).select(
        "query_id",
        "adc_rank",
        "neighbor_id",
        "adc_dist",
        F.col("xn").isNotNull().alias("in_exact_top5"),
    )


# --- feature relevance + vectorization ------------------------------

#: md5 hex digit i (1-based) of an expression, as 0..15 — portable to
#: DuckDB verbatim (both engines share instr/substring/md5).
_HEX_OF = "instr('0123456789abcdef', substring(md5({e}), {i}, 1)) - 1"

#: Hashing-trick geometry: 64 buckets, sign bit from the 3rd hex digit.
HASH_BUCKETS = 64


@register(
    "chi2_feature_relevance",
    ops=("A1", "J10", "W12"),
    doc="Chi-square feature relevance between order priority and order "
    "status: full contingency grid (distinct×distinct broadcast cross "
    "of two tiny dims, zero-filled cells), margins via window sums "
    "over the 15-row grid, per-cell (O·N − R·C)²/(N·R·C) computed "
    "from EXACT integer margins (the double division is per-row IEEE, "
    "deterministic), per-priority contribution summed in decimal. The "
    "feature-selection screen of D6 the reference leaves to sklearn "
    "(`train_delay_model.py:210-260`). One fact-table agg shuffles; "
    "everything after runs on a 15-row frame. Long margins are exact "
    "to N ≈ 3e9 rows; swap to decimal(38) margins beyond.",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS p, o_orderstatus AS st, COUNT(*) AS o
  FROM orders GROUP BY 1, 2
),
grid AS (
  SELECT pp.p, ss.st
  FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) pp
  CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) ss
),
full_g AS (
  SELECT g.p, g.st, COALESCE(c.o, 0) AS o
  FROM grid g LEFT JOIN cells c ON c.p = g.p AND c.st = g.st
),
m AS (
  SELECT p, st, o,
         CAST(SUM(o) OVER (PARTITION BY p) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY st) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM full_g
)
SELECT p AS priority,
  CAST(MAX(r) AS BIGINT) AS row_total,
  COUNT(*) AS n_cells,
  CAST(SUM(CAST(
    (CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE))
      / (CAST(n AS DOUBLE) * r * c)
    AS DECIMAL(18,10))) AS DOUBLE) AS chi2_contrib
FROM m
GROUP BY p
""",
)
def chi2_feature_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("st")
    ).agg(F.count(F.lit(1)).alias("o"))
    grid = (
        o.select(F.col("o_orderpriority").alias("p"))
        .distinct()
        .crossJoin(F.broadcast(o.select(F.col("o_orderstatus").alias("st")).distinct()))
    )
    full_g = grid.join(cells, ["p", "st"], "left").withColumn(
        "o", F.coalesce(F.col("o"), F.lit(0)).cast("long")
    )
    m = full_g.select(
        "p",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("p")).alias("r"),
        F.sum("o").over(Window.partitionBy("st")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    dev = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    contrib = dev * dev / (
        F.col("n").cast("double") * F.col("r") * F.col("c")
    )
    return m.groupBy(F.col("p").alias("priority")).agg(
        F.max("r").cast("long").alias("row_total"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(contrib.cast("decimal(18,10)")).cast("double").alias("chi2_contrib"),
    )


@register(
    "feature_hashing",
    ops=("F10", "A1", "A2"),
    doc="Hashing-trick vectorization (Weinberger et al.): every "
    "whitespace token hashes to one of 64 buckets via two md5 hex "
    "digits, a third digit supplies the ± sign, and the corpus "
    "collapses to per-bucket signed counts — the fixed-width, "
    "vocabulary-free featurizer used when a 100 TB corpus can't "
    "afford a vocabulary build. Stateless per-row hash (same md5 "
    "spelling as hash_split_3way) → explode + one hash agg; no "
    "vocabulary table, no global sort.",
    oracle=f"""
WITH tok AS (SELECT unnest({SQL_TOKENS}) AS w FROM documents),
h AS (
  SELECT w,
         (({_HEX_OF.format(e='w', i=1)}) * 16 + ({_HEX_OF.format(e='w', i=2)}))
           % {HASH_BUCKETS} AS bucket,
         CASE WHEN ({_HEX_OF.format(e='w', i=3)}) < 8 THEN 1 ELSE -1 END AS sgn
  FROM tok
)
SELECT bucket,
  COUNT(*) AS n_tokens,
  COUNT(DISTINCT w) AS n_distinct_tokens,
  CAST(SUM(sgn) AS BIGINT) AS signed_count
FROM h
GROUP BY bucket
""",
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(F.explode(tokens_col()).alias("w"))
    h1 = F.expr(_HEX_OF.format(e="w", i=1))
    h2 = F.expr(_HEX_OF.format(e="w", i=2))
    h3 = F.expr(_HEX_OF.format(e="w", i=3))
    h = tok.select(
        "w",
        ((h1 * 16 + h2) % HASH_BUCKETS).alias("bucket"),
        F.when(h3 < 8, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    return h.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct_tokens"),
        F.sum("sgn").cast("long").alias("signed_count"),
    )


@register(
    "mutual_information",
    ops=("A1", "J10", "W12"),
    doc="Mutual information between order priority and status, the "
    "information-theoretic twin of chi2_feature_relevance (same "
    "contingency grid, margins from the same 15-row window pass): "
    "MI = Σ (o/N)·ln(o·N/(R·C)) over observed cells. The ln result "
    "is rounded to 4 decimals BEFORE the exact-decimal multiply-"
    "accumulate (ln is the one non-IEEE-pinned op between JVM and "
    "libm — same recipe as text_bigram_perplexity), o·N and R·C are "
    "exact bigints, so the score is bitwise reproducible. Output in "
    "nats, per priority, with the per-priority cell count.",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS p, o_orderstatus AS st, COUNT(*) AS o
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT p, st, o,
         CAST(SUM(o) OVER (PARTITION BY p) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY st) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT p AS priority,
  COUNT(*) AS n_cells,
  CAST(SUM(CAST(
    o * ROUND(LN(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)), 4)
    AS DECIMAL(28,8))) AS DOUBLE) / MAX(n) AS mi_contrib_nats
FROM m
GROUP BY p
""",
)
def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("st")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = cells.select(
        "p",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("p")).alias("r"),
        F.sum("o").over(Window.partitionBy("st")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    term = F.col("o") * F.round(
        F.log(
            F.col("o").cast("double")
            * F.col("n")
            / (F.col("r").cast("double") * F.col("c"))
        ),
        4,
    )
    return m.groupBy(F.col("p").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            F.sum(term.cast("decimal(28,8)")).cast("double") / F.max("n")
        ).alias("mi_contrib_nats"),
    )


@register(
    "robust_scale_iqr",
    ops=("A8", "A3", "P8"),
    doc="Robust (median/IQR) feature scaling — the outlier-resistant "
    "alternative to zscore_normalize: per-event-type exact "
    "median/quartiles, scaled value (v − median)/IQR with a NULLIF "
    "guard for degenerate IQR=0 groups, and per-type outlier counts "
    "at |scaled| > 3. Aggregate outputs stick to comparisons and "
    "min/max (no double re-summation), so cross-engine bitwise "
    "equality holds without decimal routing. Two passes: one exact-"
    "percentile agg (dimension-sized result, broadcast back) + one "
    "scan — same shape at 100 TB.",
    oracle="""
WITH q AS (
  SELECT event_type,
    quantile_cont(value, 0.25) AS p25,
    quantile_cont(value, 0.5) AS med,
    quantile_cont(value, 0.75) AS p75
  FROM events GROUP BY 1
),
s AS (
  SELECT e.event_type, q.p25, q.med, q.p75,
    (e.value - q.med) / NULLIF(q.p75 - q.p25, 0) AS scaled
  FROM events e JOIN q USING (event_type)
)
SELECT event_type, p25, med, p75,
  (p75 - p25) AS iqr,
  COUNT(*) AS n_events,
  COUNT(CASE WHEN abs(scaled) > 3 THEN 1 END) AS n_outliers,
  MIN(scaled) AS scaled_min,
  MAX(scaled) AS scaled_max
FROM s
GROUP BY 1, 2, 3, 4, 5
""",
)
def robust_scale_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events", spread=True)
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.5)").alias("med"),
        F.expr("percentile(value, 0.75)").alias("p75"),
    )
    scaled = (F.col("value") - F.col("med")) / F.nullif(
        F.col("p75") - F.col("p25"), F.lit(0)
    )
    s = e.join(F.broadcast(q), "event_type").select(
        "event_type", "p25", "med", "p75", scaled.alias("scaled")
    )
    return s.groupBy("event_type", "p25", "med", "p75").agg(
        (F.col("p75") - F.col("p25")).alias("iqr"),
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.abs(F.col("scaled")) > 3, 1)).alias("n_outliers"),
        F.min("scaled").alias("scaled_min"),
        F.max("scaled").alias("scaled_max"),
    )


#: Leave-one-out target-encoding smoothing strength.
TE_SMOOTH_M = 10.0


@register(
    "target_encode_loo",
    ops=("J1", "A5", "A9", "P8"),
    doc="Leave-one-out target encoding with prior smoothing — the "
    "high-cardinality-categorical feature transform: each order's "
    "market segment is encoded as the segment's target rate computed "
    "WITHOUT the row itself (LOO kills the self-leakage that makes "
    "naive target encoding overfit), shrunk toward the global prior "
    "by m=10 virtual samples. Target = high-value order flag. "
    "Integer sufficient statistics (n, Σy) per segment + one global "
    "prior broadcast back; the per-row encode is pure arithmetic — "
    "two dimension-sized aggregates and one scan at any scale.",
    oracle=f"""
WITH base AS (
  SELECT o.o_orderkey, c.c_mktsegment AS segment,
    CASE WHEN o.o_totalprice > 150000 THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
seg AS (
  SELECT segment, COUNT(*) AS n_seg, CAST(SUM(y) AS BIGINT) AS sum_y
  FROM base GROUP BY 1
),
prior AS (
  SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p FROM base
)
SELECT b.o_orderkey, b.segment, b.y,
  (CAST(s.sum_y - b.y AS DOUBLE) + {TE_SMOOTH_M!r} * pr.p)
    / (CAST(s.n_seg - 1 AS DOUBLE) + {TE_SMOOTH_M!r}) AS te_loo
FROM base b JOIN seg s ON b.segment = s.segment, prior pr
""",
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", spread=True)
    c = table(spark, sf_dir, "customer")
    base = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        "o_orderkey",
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("y"),
    )
    seg = base.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.sum("y").cast("bigint").alias("sum_y"),
    )
    prior = base.agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("p")
    )
    return (
        base.join(F.broadcast(seg), "segment")
        .crossJoin(F.broadcast(prior))
        .select(
            "o_orderkey",
            "segment",
            "y",
            (
                ((F.col("sum_y") - F.col("y")).cast("double") + F.lit(TE_SMOOTH_M) * F.col("p"))
                / ((F.col("n_seg") - 1).cast("double") + F.lit(TE_SMOOTH_M))
            ).alias("te_loo"),
        )
    )


@register(
    "woe_encoding",
    ops=("A5", "A9", "J1", "P8"),
    doc="Weight-of-evidence categorical encoding (the credit-scoring "
    "standard): per market segment, WoE = ln(share-of-positives / "
    "share-of-negatives) with 0.5 Laplace smoothing, plus each "
    "segment's information-value contribution. ln is the one "
    "libm-dependent op, so WoE is rounded to 4 decimals before any "
    "downstream arithmetic (the engine-wide recipe for "
    "transcendentals); counts are exact integers from one aggregate.",
    oracle="""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
    CASE WHEN o.o_totalprice > 150000 THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
seg AS (
  SELECT segment,
    CAST(SUM(y) AS BIGINT) AS n_pos,
    CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS pos_t, CAST(SUM(n_neg) AS BIGINT) AS neg_t
  FROM seg
)
SELECT s.segment, s.n_pos, s.n_neg,
  ROUND(LN(((s.n_pos + 0.5) / (t.pos_t + 0.5))
         / ((s.n_neg + 0.5) / (t.neg_t + 0.5))), 4) AS woe,
  ROUND(((s.n_pos + 0.5) / (t.pos_t + 0.5) - (s.n_neg + 0.5) / (t.neg_t + 0.5))
        * ROUND(LN(((s.n_pos + 0.5) / (t.pos_t + 0.5))
                 / ((s.n_neg + 0.5) / (t.neg_t + 0.5))), 4), 6) AS iv_contrib
FROM seg s, tot t
""",
)
def woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", spread=True)
    c = table(spark, sf_dir, "customer")
    base = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("y"),
    )
    seg = base.groupBy("segment").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    tot = seg.agg(
        F.sum("n_pos").cast("bigint").alias("pos_t"),
        F.sum("n_neg").cast("bigint").alias("neg_t"),
    )
    ps = (F.col("n_pos") + 0.5) / (F.col("pos_t") + 0.5)
    ns = (F.col("n_neg") + 0.5) / (F.col("neg_t") + 0.5)
    woe = F.round(F.log(ps / ns), 4)
    return seg.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        F.round((ps - ns) * woe, 6).alias("iv_contrib"),
    )


#: Total sample budget for the Neyman allocation demo.
NEYMAN_BUDGET = 1000


@register(
    "neyman_allocation",
    ops=("A3", "A4", "A9"),
    doc="Neyman-optimal stratified sampling allocation: sample budget "
    "split across event-type strata ∝ N_h·σ_h (minimum-variance "
    "allocation for a fixed budget — the statistically right way to "
    "size per-stratum samples, vs proportional allocation which "
    "over-samples low-variance strata). σ_h from exact decimal "
    "sufficient statistics; the Σ N_h·σ_h normalizer folds in sorted "
    "stratum order so the double sum is bitwise reproducible. "
    "Dimension-sized output from one corpus aggregate.",
    oracle=f"""
WITH strata AS (
  SELECT event_type, COUNT(*) AS n_h,
    {N.sql_dstddev("value")} AS sigma_h
  FROM events GROUP BY 1
),
norm AS (
  SELECT list_reduce(list(n_h * sigma_h ORDER BY event_type),
                     (x, y) -> x + y) AS denom
  FROM strata
)
SELECT s.event_type, CAST(s.n_h AS BIGINT) AS n_h,
  ROUND(s.sigma_h, 6) AS sigma_h,
  CAST(s.n_h AS DOUBLE) * s.sigma_h / n.denom AS alloc_share,
  CAST(ROUND({NEYMAN_BUDGET} * s.n_h * s.sigma_h / n.denom, 0) AS BIGINT)
    AS alloc_n,
  CAST(s.n_h AS DOUBLE) / (SELECT SUM(n_h) FROM strata) AS proportional_share
FROM strata s, norm n
""",
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events", spread=True)
    strata = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        N.dstddev("value").alias("sigma_h"),
    )
    norm = strata.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("event_type", (F.col("n_h") * F.col("sigma_h")).alias("w"))
                    )
                ),
                lambda s: s["w"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("denom"),
        F.sum("n_h").alias("n_total"),
    )
    share = F.col("n_h").cast("double") * F.col("sigma_h") / F.col("denom")
    return strata.crossJoin(F.broadcast(norm)).select(
        "event_type",
        F.col("n_h").cast("bigint").alias("n_h"),
        F.round("sigma_h", 6).alias("sigma_h"),
        share.alias("alloc_share"),
        F.round(F.lit(NEYMAN_BUDGET) * F.col("n_h") * F.col("sigma_h") / F.col("denom"), 0)
        .cast("bigint")
        .alias("alloc_n"),
        (F.col("n_h").cast("double") / F.col("n_total")).alias("proportional_share"),
    )


#: Weighted-reservoir sample size.
WRS_K = 25


@register(
    "weighted_reservoir_sample",
    ops=("O2", "W4", "F12", "A9"),
    doc="Weighted sampling WITHOUT replacement via the "
    "Efraimidis–Spirakis A-Res keys: each document draws a keyed-"
    "hash uniform u and competes with key ln(u)/w (order-isomorphic "
    "to the classic u^(1/w)), the k largest keys win — one "
    "distributed top-k (sort+limit, no global row_number), no "
    "rejection loop, no driver-side reservoir, and inclusion "
    "probabilities proportional to weight w = n_chars. The "
    "replacement-free complement to quality_weighted_sampling's "
    "Bernoulli thinning; ln is rounded to 6 dp (the shared "
    "cross-engine recipe) and ties break on doc_id, so the sampled "
    "set is bitwise-reproducible on any partitioning.",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars AS w,
    ROUND(LN((CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) + 0.5)
             / 4294967296), 6) / n_chars AS k
  FROM documents
),
ranked AS (
  SELECT doc_id, source, w, ROUND(k, 6) AS k,
         ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rnk
  FROM keyed
),
tot AS (SELECT SUM(n_chars) AS w_all FROM documents)
SELECT rnk, doc_id, source, w,
       k AS sample_key,
       ROUND(CAST(w AS DOUBLE) / t.w_all, 8) AS weight_share
FROM ranked, tot t WHERE rnk <= {WRS_K}
""",
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    ).cast("double") + 0.5
    keyed = d.select(
        "doc_id",
        "source",
        F.col("n_chars").alias("w"),
        (F.round(F.log(u / F.lit(4294967296)), 6) / F.col("n_chars")).alias(
            "k"
        ),
    )
    tot = d.agg(F.sum("n_chars").alias("w_all"))
    # Top-k as sort+limit (TakeOrderedAndProject — no global window
    # over the corpus); the row_number runs on the k-row result only.
    winners = keyed.orderBy(F.col("k").desc(), "doc_id").limit(WRS_K)
    w_rnk = Window.orderBy(F.col("k").desc(), "doc_id")
    return (
        winners.withColumn("rnk", F.row_number().over(w_rnk))
        .crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "doc_id",
            "source",
            "w",
            F.round("k", 6).alias("sample_key"),
            F.round(F.col("w").cast("double") / F.col("w_all"), 8).alias(
                "weight_share"
            ),
        )
    )


#: Epoch-shuffle geometry: W shards, two epochs compared.
EPOCH_SHARDS = 16


def _epoch_shard_sql(epoch: int) -> str:
    """Shard id for one epoch: first md5 hex digit of (epoch, doc_id)
    — one uniform 0..15 draw, identical spelling in Spark SQL and
    DuckDB (md5/substring/instr behave the same)."""
    return (
        "(instr('0123456789abcdef', substring(md5("
        f"'ep{epoch}:' || cast(doc_id as string)), 1, 1)) - 1)"
    )


@register(
    "epoch_shuffle_plan",
    ops=("F12", "A1", "A9", "P5"),
    doc="Deterministic per-epoch global reshuffle for training: each "
    "epoch e assigns every document to shard md5('ep'||e||':'||doc_id) "
    "— a stateless per-row hash, so the 'shuffle' needs NO global "
    "sort, no driver state, and reproduces identically on any "
    "cluster layout (the scale answer to 'ORDER BY RANDOM(seed)' "
    "epoch shuffling, which needs a total order over the corpus). "
    "Reports, per epoch-1 shard: document count (load balance) and "
    "the fraction of documents that stayed in the same shard as "
    "epoch 0 — the reshuffle-quality check (expected ≈ 1/W; a "
    "broken seed shows up as frac_stayed ≈ 1.0). Both epoch "
    "assignments are columns of one row — no self-join.",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         {_epoch_shard_sql(0)} AS shard0,
         {_epoch_shard_sql(1)} AS shard1
  FROM documents
)
SELECT shard1 AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN shard0 = shard1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_stayed,
  CAST(SUM(CASE WHEN shard0 = shard1 THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS frac_stayed
FROM s GROUP BY 1
""",
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    s = d.select(
        "doc_id",
        F.expr(_epoch_shard_sql(0)).alias("shard0"),
        F.expr(_epoch_shard_sql(1)).alias("shard1"),
    )
    stayed = F.sum(F.when(F.col("shard0") == F.col("shard1"), 1).otherwise(0))
    return s.groupBy(F.col("shard1").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        stayed.cast("bigint").alias("n_stayed"),
        (stayed.cast("double") / F.count(F.lit(1))).alias("frac_stayed"),
    )


#: Group-aware cross-validation: folds over orders keyed by customer.
KFOLD_K = 5

_KFOLD_SQL = (
    "((instr('0123456789abcdef', substring(md5('gkf:' || "
    "cast(o_custkey as string)), 1, 1)) - 1) * 16 "
    "+ (instr('0123456789abcdef', substring(md5('gkf:' || "
    f"cast(o_custkey as string)), 2, 1)) - 1)) % {KFOLD_K}"
)


@register(
    "group_kfold_split",
    ops=("W5", "A2", "A3", "A12"),
    doc="Group-aware k-fold assignment (sklearn GroupKFold semantics, "
    "hash-deterministic): every ORDER lands in the fold of its "
    "CUSTOMER — md5(custkey) mod K — so no customer ever straddles "
    "folds and per-entity leakage between train and validation is "
    "structurally impossible. The leakage audit is computed, not "
    "assumed: max folds-per-customer is aggregated and reported on "
    "every row (must be 1). Stateless per-row hash → identical on "
    "any layout, no global sort; one hash-agg by fold + one by "
    "customer.",
    oracle=f"""
WITH f AS (
  SELECT o_orderkey, o_custkey, o_totalprice, {_KFOLD_SQL} AS fold
  FROM orders
),
leak AS (
  SELECT MAX(nf) AS max_folds_per_customer FROM (
    SELECT o_custkey, COUNT(DISTINCT fold) AS nf FROM f GROUP BY 1
  )
)
SELECT fold,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
  l.max_folds_per_customer
FROM f, leak l
GROUP BY fold, l.max_folds_per_customer
""",
)
def group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders", spread=True)
    f = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.expr(_KFOLD_SQL).alias("fold"),
    )
    leak = (
        f.groupBy("o_custkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .agg(F.max("nf").alias("max_folds_per_customer"))
    )
    return (
        f.crossJoin(F.broadcast(leak))
        .groupBy("fold", "max_folds_per_customer")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            "fold", "n_orders", "n_customers", "total_price",
            "max_folds_per_customer",
        )
    )


#: Batch size for length-bucketed packing.
PACK_BATCH = 16

#: Pow-2-ish token-length bucket edges (upper bounds, last is open).
PACK_EDGES = (16, 32, 64, 128, 256, 512)


def _len_bucket_sql(n: str) -> str:
    """Bucket id 0..len(PACK_EDGES) via explicit CASE (no libm log2 —
    identical spelling in Spark SQL and DuckDB)."""
    clauses = " ".join(
        f"WHEN {n} <= {e} THEN {i}" for i, e in enumerate(PACK_EDGES)
    )
    return f"(CASE {clauses} ELSE {len(PACK_EDGES)} END)"


@register(
    "length_bucket_packing",
    ops=("W4", "A3", "A9", "F10"),
    doc="Length-bucketed batch packing audit — the dataloader recipe "
    "that keeps padding waste bounded when batching variable-length "
    "documents for training: docs land in pow-2-ish token-length "
    "buckets (explicit CASE thresholds, no float log), are ordered "
    "longest-first inside each bucket (deterministic doc_id "
    "tiebreaker), and are cut into batches of 16; every batch pads "
    "its members to the batch max. Reports per bucket: docs, "
    "batches, real vs padded token totals and the padding overhead "
    "— the number a curriculum/batching change is judged by. All "
    "token math is exact int64; the per-bucket windows partition by "
    "bucket id (bounded fan-in, no global sort).",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, len({SQL_TOKENS}) AS n_tokens FROM documents
),
b AS (
  SELECT doc_id, n_tokens, {_len_bucket_sql("n_tokens")} AS bucket,
    (ROW_NUMBER() OVER (PARTITION BY {_len_bucket_sql("n_tokens")}
                        ORDER BY n_tokens DESC, doc_id) - 1)
      // {PACK_BATCH} AS batch_id
  FROM tok
),
batches AS (
  SELECT bucket, batch_id, COUNT(*) AS n_in_batch,
    SUM(n_tokens) AS real_tokens,
    COUNT(*) * MAX(n_tokens) AS padded_tokens
  FROM b GROUP BY 1, 2
)
SELECT bucket,
  CAST(SUM(n_in_batch) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_batches,
  CAST(SUM(real_tokens) AS BIGINT) AS real_tokens,
  CAST(SUM(padded_tokens) AS BIGINT) AS padded_tokens,
  CAST(SUM(padded_tokens - real_tokens) AS DOUBLE)
    / SUM(padded_tokens) AS pad_overhead
FROM batches GROUP BY 1
""",
)
def length_bucket_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "doc_id", F.size(tokens_col()).alias("n_tokens")
    ).withColumn("bucket", F.expr(_len_bucket_sql("n_tokens")))
    w = Window.partitionBy("bucket").orderBy(
        F.col("n_tokens").desc(), "doc_id"
    )
    b = tok.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / PACK_BATCH).cast("bigint"),
    )
    batches = b.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_in_batch"),
        F.sum("n_tokens").alias("real_tokens"),
        (F.count(F.lit(1)) * F.max("n_tokens")).alias("padded_tokens"),
    )
    return batches.groupBy("bucket").agg(
        F.sum("n_in_batch").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
        F.sum("real_tokens").cast("bigint").alias("real_tokens"),
        F.sum("padded_tokens").cast("bigint").alias("padded_tokens"),
        (
            F.sum(F.col("padded_tokens") - F.col("real_tokens")).cast("double")
            / F.sum("padded_tokens")
        ).alias("pad_overhead"),
    )


#: T5-style span corruption plan: ~15% of tokens masked in mean-
#: length-3 spans (Raffel et al. 2020, public). n_spans = round(n/20)
#: computed in EXACT integer arithmetic ((n+10) div 20, half-up) so
#: both engines agree; span j lives inside its own stride-sized cell,
#: offset by a keyed md5 draw — non-overlap by construction, no RNG.
_SPAN_LEN = 3
_SPAN_EVERY = 20  # 1 span per 20 tokens ≈ 15% corruption at len 3


@register(
    "span_corruption_plan",
    ops=("F7", "F10", "A3", "A9"),
    doc="Deterministic T5-style span-corruption plan over documents: "
    "per doc, n_spans = greatest(1, (n+10) div 20) mean-3-token "
    "spans; each span's start is a keyed md5 draw inside its own "
    "stride cell (j·stride + hash mod (stride−2)), so spans never "
    "overlap and every worker computes the identical plan — the "
    "denoising-objective precursor that usually hides inside the "
    "tokenizer pipeline, lifted into an auditable relational plan. "
    "Emits one row per span (start, length, sentinel id) plus the "
    "doc's token count and realized corruption rate. Pure codegen "
    "(sequence+explode+md5), no shuffle, embarrassingly parallel at "
    "any scale.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, len({SQL_TOKENS}) AS n FROM documents
  WHERE len({SQL_TOKENS}) >= {_SPAN_LEN}
),
planned AS (
  SELECT doc_id, n,
    GREATEST(1, (n + {_SPAN_EVERY // 2}) // {_SPAN_EVERY}) AS n_spans,
    n // GREATEST(1, (n + {_SPAN_EVERY // 2}) // {_SPAN_EVERY}) AS stride
  FROM tok
),
spans AS (
  SELECT doc_id, n, n_spans, stride,
    UNNEST(generate_series(0, n_spans - 1)) AS j
  FROM planned
)
SELECT doc_id,
  CAST(j AS BIGINT) AS span_idx,
  CAST(j * stride
    + CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
                                          CAST(j AS VARCHAR))), 1, 8))
           AS BIGINT) % GREATEST(stride - {_SPAN_LEN} + 1, 1)
    AS BIGINT) AS span_start,
  CAST(LEAST({_SPAN_LEN}, n) AS BIGINT) AS span_len,
  CAST(n AS BIGINT) AS n_tokens,
  CAST(n_spans AS BIGINT) AS n_spans,
  CAST(n_spans * {_SPAN_LEN} AS DOUBLE) / n AS corruption_rate,
  concat('<extra_id_', CAST(j AS VARCHAR), '>') AS sentinel
FROM spans
""",
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    t = d.select(
        "doc_id", F.size(tokens_col()).cast("bigint").alias("n")
    ).filter(F.col("n") >= _SPAN_LEN)
    planned = t.select(
        "doc_id",
        "n",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"(n + {_SPAN_EVERY // 2}) div {_SPAN_EVERY}"),
        ).alias("n_spans"),
    ).withColumn("stride", F.expr("n div n_spans"))
    spans = planned.select(
        "doc_id",
        "n",
        "n_spans",
        "stride",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("j"),
    )
    draw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % F.greatest(F.col("stride") - _SPAN_LEN + 1, F.lit(1).cast("bigint"))
    )
    return spans.select(
        "doc_id",
        F.col("j").cast("bigint").alias("span_idx"),
        (F.col("j") * F.col("stride") + draw).cast("bigint").alias("span_start"),
        F.least(F.lit(_SPAN_LEN).cast("bigint"), F.col("n")).alias("span_len"),
        F.col("n").alias("n_tokens"),
        F.col("n_spans").cast("bigint").alias("n_spans"),
        (
            (F.col("n_spans") * _SPAN_LEN).cast("double") / F.col("n")
        ).alias("corruption_rate"),
        F.concat(
            F.lit("<extra_id_"), F.col("j").cast("string"), F.lit(">")
        ).alias("sentinel"),
    )
