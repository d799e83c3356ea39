"""Deduplication operators over `documents` / `embeddings` — the
LLM-training-data surface (BASELINE.json north star): exact hash
dedup, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
near-dup.

Scale design notes (the point of each plan shape at 100 TB):
  * exact dedup = hash-groupBy on a fingerprint → one shuffle keyed by
    the hash, perfectly partitionable;
  * n-gram Jaccard generates candidates through a shingle-equality
    self-join (docs sharing ≥1 shingle), never an O(n²) cross join;
  * MinHash banding buckets collapse the candidate space to
    same-band-hash groups — the join is an equi-join on
    (band_id, band_hash), AQE handles skewed buckets;
  * SimHash blocks on the top bits so Hamming checks stay within
    blocks;
  * embedding near-dup keeps the quadratic check only as the verify
    stage (here: all pairs, since the table is dimension-sized; the
    LSH-bucketed scale path is operators/similarity.py).

All hashing is md5-based and evaluated identically in Spark
(`conv(substr(md5(x),1,k),16,10)`) and DuckDB
(`CAST('0x'||substr(md5(x),1,k) AS BIGINT)`), verified bit-equal.
"""

from __future__ import annotations

import math as _math
import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import vectors as V
from .registry import register

# --- shared fragments -------------------------------------------------------

#: Normalized text (lowercase, whitespace collapsed).
SQL_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"


def _norm_col():
    return F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))


#: Word 3-gram shingles. Spark arrays are 0-based, DuckDB lists 1-based.
SPARK_SHINGLES = (
    "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
)
SQL_SHINGLES = (
    "[w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in generate_series(1, len(w)-2)]"
)

SQL_DOC_SHINGLES = f"""
  SELECT doc_id, unnest(list_distinct({SQL_SHINGLES})) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
  WHERE len(w) >= 3
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return (
        d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .filter(F.size("w") >= 3)
        .select("doc_id", F.explode(F.array_distinct(F.expr(SPARK_SHINGLES))).alias("sh"))
    )


# _pin lives in operators/_util.py (shared across modules — ADVICE
# r10); re-exported here because the dedup family popularized it and
# sibling modules/tests import it from this namespace.
from ._util import _pin  # noqa: E402


# MinHash parameters: 16 permutations h_i(x) = (a_i·x + b_i) mod p over
# the md5-derived 32-bit shingle hash, banded 4×4 for LSH.
_P = 2147483647
_RNG = random.Random(20240813)
MINHASH_A = [_RNG.randrange(1, _P) for _ in range(16)]
MINHASH_B = [_RNG.randrange(0, _P) for _ in range(16)]
N_BANDS, ROWS_PER_BAND = 4, 4

SPARK_SHINGLE_HASH = "cast(conv(substr(md5(sh),1,8),16,10) as bigint) % 2147483647"
SQL_SHINGLE_HASH = "CAST('0x' || substr(md5(sh),1,8) AS BIGINT) % 2147483647"


@register(
    "dedup_exact",
    ops=("A1", "A3", "S4"),
    doc="Exact dedup: hash-groupBy on the normalized-text MD5 "
    "fingerprint, deterministic canonical pick (min doc_id) — one "
    "shuffle keyed by the hash.",
    oracle=f"""
WITH fp AS (SELECT doc_id, md5({SQL_NORM}) AS fingerprint FROM documents)
SELECT fingerprint,
  MIN(doc_id) AS canonical_doc_id,
  COUNT(*) AS n_copies,
  COUNT(*) - 1 AS n_dropped
FROM fp
GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return (
        d.select("doc_id", F.md5(_norm_col()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    ops=("J1", "A1", "A9"),
    doc="N-gram Jaccard near-dup: word-3-gram shingles, candidates from "
    "a shingle-equality self-join (no cross join), exact "
    "|∩|/(|A|+|B|−|∩|) ≥ 0.2. Guarded: refuses corpora whose "
    "estimated join blow-up (Σ_shingle df²) exceeds max_join_rows "
    "instead of running Σdf² work for hours — the error points to "
    "dedup_lsh_verified, the near-linear scale path.",
    oracle=f"""
WITH sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
  CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.2
""",
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_join_rows: int = 100_000_000
) -> DataFrame:
    # Scale note: the shingle equi-join costs Σ_sh df² — inherent to
    # EXACT pairwise Jaccard on duplicate-heavy corpora (every true
    # near-dup pair must surface; a ×8-duplicated probe corpus has
    # quadratically many true pairs, so no exact plan escapes it).
    # Prefix filtering was measured and rejected: at t=0.2 the prefix
    # is ~80% of each doc's shingles, so it pruned <2× while adding
    # three shuffles. The 100 TB path is dedup_minhash_lsh (stays
    # near-linear on the same probe); this operator is the exact
    # verifier you run on LSH candidates or bounded corpora.
    # Pinned: the guard aggregate materializes the shingle frame
    # anyway (eager .first()), and the frame then feeds the sizes
    # aggregate plus both self-join sides — 4 consumers; the pin turns
    # 4 corpus shingle passes into 1 (r10, guide §1.2/§5).
    sh = _pin(_doc_shingles(spark, sf_dir))
    # Blast-radius guard: one LINEAR pass estimates the join's output
    # (Σ df² bounds Σ C(df,2) intermediate rows). Refusing up front
    # costs one cheap agg; not refusing can cost hours of Σdf² work on
    # an adversarial (duplicate-saturated) corpus. Measured: 5.4e4 at
    # sf0.01, 2.8e6 at sf0.1 — the default admits ~35× sf0.1 and
    # rejects the ×8-duplicated probe (~1.8e8).
    est = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * F.col("df")).alias("s2"))
        .first()[0]
    )
    if est is not None and est > max_join_rows:
        raise ValueError(
            f"dedup_ngram_jaccard: estimated shingle-join blow-up "
            f"Σdf²={est:,} exceeds max_join_rows={max_join_rows:,}; "
            "exact all-pairs Jaccard is quadratic on this corpus — "
            "use dedup_lsh_verified (banded MinHash candidates + exact "
            "verify) or raise max_join_rows explicitly."
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", "n_inter", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


def _minhash_signature(
    spark: SparkSession, sf_dir: str, sh: DataFrame | None = None
) -> DataFrame:
    """(doc_id, m_0..m_15): min over shingles of each permuted hash —
    one groupBy with 16 MIN aggregates, no row explosion. Pass a
    (pinned) shingle frame via ``sh`` when the caller also consumes
    the shingles, so the corpus pass is shared."""
    if sh is None:
        sh = _doc_shingles(spark, sf_dir)
    sh = sh.withColumn("h", F.expr(SPARK_SHINGLE_HASH))
    aggs = [
        F.min(F.expr(f"(h * {MINHASH_A[i]}L + {MINHASH_B[i]}L) % {_P}L")).alias(f"m_{i}")
        for i in range(16)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


_SQL_MINHASH_SIG = f"""
  SELECT doc_id,
    {", ".join(f"MIN((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {_P}) AS m_{i}" for i in range(16))}
  FROM (SELECT doc_id, {SQL_SHINGLE_HASH} AS h FROM ({SQL_DOC_SHINGLES}))
  GROUP BY doc_id
"""


def _band_exprs() -> list[str]:
    """band_j = md5 of the 4 signature components in band j (same text
    in Spark SQL and DuckDB)."""
    out = []
    for j in range(N_BANDS):
        cols = ", ".join(f"m_{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        out.append(f"md5(concat_ws(',', {cols}))")
    return out


@register(
    "dedup_minhash_lsh",
    ops=("J1", "A1", "W4"),
    doc="MinHash+LSH near-dup: 16-permutation signatures, 4×4 banding, "
    "candidate pairs from the band-hash equi-join, estimated Jaccard = "
    "matching signature components / 16, threshold ≥ 0.5.",
    oracle=f"""
WITH sig AS ({_SQL_MINHASH_SIG}),
bands AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT doc_id,
      unnest([{", ".join(str(j) for j in range(N_BANDS))}]) AS band_id,
      unnest([{", ".join(_band_exprs())}]) AS band_hash
    FROM sig
  )
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
  ({" + ".join(f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16))}) AS sig_matches,
  CAST({" + ".join(f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16))} AS DOUBLE) / 16.0 AS est_jaccard
FROM cand c
JOIN sig sa ON c.doc_a = sa.doc_id
JOIN sig sb ON c.doc_b = sb.doc_id
WHERE ({" + ".join(f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16))}) >= 8
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pinned: the signature frame feeds the band explode AND both
    # sides of the candidate verify join — 3 consumers, so without the
    # pin the shingle+signature lineage (a full corpus pass) executes
    # 3× in one plan (r10, guide §1.2/§5).
    sig = _pin(_minhash_signature(spark, sf_dir))
    band_id = F.explode(
        F.arrays_zip(
            F.array(*[F.lit(j) for j in range(N_BANDS)]).alias("band_id"),
            F.array(*[F.expr(e) for e in _band_exprs()]).alias("band_hash"),
        )
    )
    bands = sig.select("doc_id", band_id.alias("z")).select(
        "doc_id", F.col("z.band_id").alias("band_id"), F.col("z.band_hash").alias("band_hash")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"m_{i}").alias(f"a_{i}") for i in range(16)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"m_{i}").alias(f"b_{i}") for i in range(16)])
    matches = None
    for i in range(16):
        term = F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            matches.alias("sig_matches"),
            (matches.cast("double") / 16.0).alias("est_jaccard"),
        )
        .filter(F.col("sig_matches") >= 8)
    )


def _verified_pairs(sh: DataFrame, thr: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs with exact Jaccard >= thr
    from a shingle frame: banded MinHash candidates (band-hash
    equi-join), exact verify on the candidates only.

    The one construction shared by dedup_lsh_verified, the curation
    funnel and contrastive mining. `sh` is consumed FOUR times
    (signature build, per-doc sizes, and both sides of the candidate-
    restricted intersection join) — callers must pass a pinned frame
    (:func:`_pin`) or a persisted one, or the corpus shingle pass
    re-executes once per consumer."""
    hashed = sh.withColumn("h", F.expr(SPARK_SHINGLE_HASH))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"(h * {MINHASH_A[i]}L + {MINHASH_B[i]}L) % {_P}L")
            ).alias(f"m_{i}")
            for i in range(16)
        ]
    )
    zipped = F.explode(
        F.arrays_zip(
            F.array(*[F.lit(j) for j in range(N_BANDS)]).alias("band_id"),
            F.array(*[F.expr(e) for e in _band_exprs()]).alias("band_hash"),
        )
    )
    bands = sig.select("doc_id", zipped.alias("z")).select(
        "doc_id",
        F.col("z.band_id").alias("band_id"),
        F.col("z.band_hash").alias("band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("sh").alias("sh_b"))
    inter = (
        cand.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= thr)
    )


def _symmetric_edges(pairs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) pairs → symmetric (src, dst) edge list in ONE
    pass: posexplode of a two-struct array instead of
    ``pairs.union(pairs.swapped)``, whose two branches each re-execute
    the full pair-mining lineage (Catalyst does not share common
    subtrees across union branches) — one corpus-scale LSH pass saved
    per materialization."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


@register(
    "dedup_lsh_verified",
    ops=("J1", "A1", "A9"),
    doc="The composed 100 TB near-dup plan: MinHash-LSH banding "
    "generates candidate pairs (near-linear — band-hash equi-join), "
    "then EXACT Jaccard is computed on candidates only (shingle "
    "equi-join restricted to the candidate set), threshold ≥ 0.5. "
    "This replaces the quadratic full-pairwise dedup_ngram_jaccard "
    "for unbounded corpora: the exact verify touches Σ|cand| pairs "
    "instead of Σdf². The oracle is the FULL exact pairwise Jaccard — "
    "a green row certifies the banding lost no true pair at this "
    "threshold (banding recall for j≥0.85 pairs is ≥94.8% per pair "
    "a-priori and exact dups are always caught; SCALING.md records "
    "the measured candidate-set growth).",
    oracle=f"""
WITH sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
  CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
""",
)
def dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Phase 1 (LSH candidates, same banding as dedup_minhash_lsh) and
    # phase 2 (exact Jaccard on candidates only — the shingle join is
    # keyed by (doc, shingle) restricted to candidate docs, so cost is
    # Σ_cand(|A|+|B|), not Σ_sh df²) both live in _verified_pairs.
    # The shingle frame is pinned: _verified_pairs consumes it 4 times
    # (signature, sizes, both intersection sides) — r10 measured 4
    # corpus shingle passes → 1 (guide §1.2).
    sh = _pin(_doc_shingles(spark, sf_dir))
    return _verified_pairs(sh, 0.5)


@register(
    "dedup_simhash",
    ops=("A5", "J1"),
    doc="SimHash near-dup: 32-bit md5-derived token hashes, per-bit "
    "weight sums → 32-bit simhash; candidate pairs block on the top "
    "8 bits; Hamming distance via bit_count(xor) ≤ 2.",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
  FROM documents
),
th AS (SELECT doc_id, CAST('0x' || substr(md5(t),1,8) AS BIGINT) AS h FROM tok),
bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
  GROUP BY 1, 2
),
sim AS (
  SELECT doc_id,
         SUM(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
  FROM bits GROUP BY 1
),
blocked AS (SELECT doc_id, simhash, simhash >> 24 AS block FROM sim)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM blocked a JOIN blocked b
  ON a.block = b.block AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("t"),
    )
    th = tok.select(
        "doc_id", F.expr("cast(conv(substr(md5(t),1,8),16,10) as bigint)").alias("h")
    )
    bits = (
        th.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.when(F.expr("(h >> b) & 1") == 1, 1).otherwise(-1)
            ).alias("w")
        )
    )
    sim = bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("w") > 0, F.expr("shiftleft(1L, b)")).otherwise(0)).alias(
            "simhash"
        )
    )
    # Pinned: both sides of the block self-join — without the pin the
    # whole token→bit→simhash aggregate chain executes twice.
    blocked = _pin(sim.withColumn("block", F.expr("simhash >> 24")))
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.expr("cast(bit_count(a.simhash ^ b.simhash) as int)")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
    )


@register(
    "dedup_embedding_cosine",
    ops=("J10", "A3"),
    doc="Embedding near-dup: cosine ≥ 0.4 over all id-ordered pairs, "
    "computed as a chunk-grid BLAS screen → exact verify. Vectors are "
    "hashed into B blocks; the B(B+1)/2 block-pair grid is a tiny "
    "literal frame, each vector ships to the B grid groups touching "
    "its block (n·B shuffled rows — no driver collect, no broadcast "
    "of the corpus), and each group runs one matmul over its pair of "
    "blocks, keeping pairs above threshold−1e-6 (the float-summation-"
    "order error bound is ~1e-13, so no true pair can be lost). Phase "
    "2 recomputes the sequential-fold cosine on only those candidates, "
    "so results are bitwise identical to the naive all-pairs plan. At "
    "cluster scale B = ceil(n/rows_per_block) bounds per-task memory; "
    "total work stays O(n²/B·B)=O(n²) matmul flops but distributed "
    "over B² tasks with no single-node materialization. Guarded: "
    "refuses corpora beyond max_vectors (exact all-pairs cosine is "
    "quadratic by definition); the error routes to similarity_lsh_ann/"
    "similarity_ivf_ann, the bucket-restricted scale paths.",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  ROUND({V.sql_cosine("a.embedding", "b.embedding")}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {V.sql_cosine("a.embedding", "b.embedding")} >= 0.4
""",
)
def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, max_vectors: int = 200_000
) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Blast-radius guard (same contract as dedup_ngram_jaccard): one
    # cheap count refuses corpora whose n²·dim screen flops can't
    # finish in bounded time — 200k × 64-dim ≈ 2.6e12 flops is minutes
    # at BLAS rate; past that the quadratic screen is the wrong tool.
    n = e.count()
    if n > max_vectors:
        raise ValueError(
            f"dedup_embedding_cosine: {n:,} vectors exceeds "
            f"max_vectors={max_vectors:,}; exact all-pairs cosine is "
            "O(n²) — use similarity_lsh_ann / similarity_ivf_ann "
            "(bucket-restricted) or raise max_vectors explicitly."
        )
    # Chunk grid: B blocks → B(B+1)/2 block-pair tasks. At test scale
    # B=8 gives 36 groups (≈ one per core); on a cluster pick
    # B = ceil(n / rows_per_block) so two blocks of vectors fit in one
    # task's memory.
    B = 8
    blocked = e.withColumn("blk", (F.col("vec_id") % B).cast("int"))
    grid = spark.createDataFrame(
        [(i, j) for i in range(B) for j in range(B) if i <= j], "ba int, bb int"
    )
    lo = blocked.join(F.broadcast(grid), blocked.blk == grid.ba).select(
        "ba", "bb", F.lit(0).alias("side"), "vec_id", "embedding"
    )
    hi = blocked.join(
        F.broadcast(grid), (blocked.blk == grid.bb) & (grid.ba != grid.bb)
    ).select("ba", "bb", F.lit(1).alias("side"), "vec_id", "embedding")

    def screen(pdf: pd.DataFrame) -> pd.DataFrame:
        diag = pdf["ba"].iat[0] == pdf["bb"].iat[0]
        a = pdf if diag else pdf[pdf["side"] == 0]
        b = pdf if diag else pdf[pdf["side"] == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({"vec_a": [], "vec_b": []}, dtype="int64")
        a_ids = a["vec_id"].to_numpy()
        b_ids = b["vec_id"].to_numpy()
        a_mat = np.array(list(a["embedding"]), dtype=np.float64)
        b_mat = np.array(list(b["embedding"]), dtype=np.float64)
        a_norm = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_norm = np.sqrt((b_mat * b_mat).sum(axis=1))
        sims = (a_mat @ b_mat.T) / np.outer(a_norm, b_norm)
        ia, ib = np.nonzero(sims >= 0.4 - 1e-6)
        x, y = a_ids[ia], b_ids[ib]
        if diag:
            keep = x < y  # each unordered pair appears in both orders
            return pd.DataFrame({"vec_a": x[keep], "vec_b": y[keep]})
        # Cross-block: blocks are disjoint, each unordered pair appears
        # exactly once — normalize to id order.
        return pd.DataFrame(
            {"vec_a": np.minimum(x, y), "vec_b": np.maximum(x, y)}
        )

    cand = (
        lo.unionByName(hi)
        .groupBy("ba", "bb")
        .applyInPandas(screen, "vec_a long, vec_b long")
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = V.cosine(F.col("ea"), F.col("eb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(cos >= 0.4)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )


@register(
    "dedup_levenshtein",
    ops=("J1", "P5"),
    doc="Edit-distance near-dup: candidates blocked on (prefix, length "
    "bucket) — an equi-join, no cross join — then exact Levenshtein "
    "over the normalized 64-char head, threshold ≤ 8. Blocking is the "
    "declared contract (as in every scalable edit-distance dedup): "
    "pairs differing in their first 4 characters are out of scope.",
    oracle=f"""
WITH heads AS (
  SELECT doc_id,
         substr({SQL_NORM}, 1, 64) AS head,
         substr({SQL_NORM}, 1, 4) AS block,
         length({SQL_NORM}) // 32 AS len_bucket
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.head, b.head) AS edit_distance
FROM heads a
JOIN heads b ON a.block = b.block AND a.len_bucket = b.len_bucket
            AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 8
""",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    heads = d.select(
        "doc_id",
        F.substring(_norm_col(), 1, 64).alias("head"),
        F.substring(_norm_col(), 1, 4).alias("block"),
        (F.length(_norm_col()).cast("long") / F.lit(32)).cast("long").alias("len_bucket"),
    )
    a, b = heads.alias("a"), heads.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 8)
    )


def _min_label_components(edges, max_iters: int = 20):
    """Connected components over a symmetric ``(src, dst)`` edge frame
    → ``(doc_id, comp)`` labels, comp = component minimum id.

    Min-label propagation with pointer-jumping acceleration: every
    round updates each node's label to the min over itself and its
    neighbors' labels; from round 3 on, a pointer-jump step
    (``comp ← comp(comp)``, the DataFrame form of the large-star/
    small-star contraction) squares the propagation distance, so a
    path of diameter d resolves in O(log d) rounds instead of d —
    round 20 covers diameters past 10^5 where plain propagation stops
    at 20. Near-dup cliques (diameter 1-2) converge in rounds 0-2
    before jumping ever engages, keeping the common-case plan the
    plain propagation one. Labels only decrease, so the total-label
    sum is a monotone convergence metric (one scalar per round, no
    driver data transfer); at the fixpoint both endpoints of every
    edge carry equal labels, which by induction is the component min.

    Every round's frame is ``localCheckpoint``-ed (eager): the round
    is materialized AND its lineage cut, so a later cache eviction can
    never cascade recomputation back through superseded rounds whose
    storage was already released. Superseded round frames are freed by
    the ContextCleaner once unreferenced — no session-lifetime pin.

    The convergence scalar rides the SAME materialization job via
    ``observe()`` (r11, VERDICT r10 item 3): the old spelling ran a
    separate ``agg(sum).first()`` job per round — 2 serialized
    driver-synchronized jobs per round instead of 1. CollectMetrics
    aggregates on the data flowing through the checkpoint action, so
    the sum is byte-identical to the standalone aggregate.
    """
    from pyspark.sql import Observation

    obs0 = Observation()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
        .observe(obs0, F.sum("comp").alias("s"))
    ).localCheckpoint()
    prev_sum = obs0.get["s"]
    for it in range(max_iters):
        neigh = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "comp"
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("doc_id")
            .agg(F.min("comp").alias("comp"))
        )
        if it >= 3:  # long-diameter graph: engage pointer jumping
            hop = new_labels.select(
                F.col("doc_id").alias("comp"), F.col("comp").alias("comp2")
            )
            new_labels = new_labels.join(hop, "comp").select(
                "doc_id", F.col("comp2").alias("comp")
            )
        obs = Observation()
        new_labels = new_labels.observe(
            obs, F.sum("comp").alias("s")
        ).localCheckpoint()
        cur_sum = obs.get["s"]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


@register(
    "dedup_components",
    ops=("J1", "A1", "A11"),
    doc="Near-dup cluster resolution: the verified pair graph "
    "(exact Jaccard ≥ 0.5 on LSH candidates, dedup_lsh_verified) is "
    "collapsed into connected components by deterministic min-label "
    "propagation — every doc gets the component's minimum doc_id as "
    "its canonical, plus the component size. Labels only decrease, so "
    "the total-label sum is a monotone convergence metric (one scalar "
    "per iteration, no driver data transfer); near-dup clusters have "
    "tiny diameters, so iterations ≈ 2-3. Adversarial diameters are "
    "covered by the pointer-jumping step in _min_label_components "
    "(O(log d) rounds — the large-star/small-star contraction in "
    "DataFrame form), property-tested on a diameter-59 path graph. "
    "Oracle: recursive-CTE reachability → MIN label per node.",
    oracle=f"""
WITH RECURSIVE sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT doc_id AS a, doc_id AS b FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
comp AS (
  SELECT a AS doc_id, MIN(b) AS canonical_doc_id FROM reach GROUP BY a
),
csizes AS (
  SELECT canonical_doc_id, COUNT(*) AS component_size FROM comp GROUP BY 1
)
SELECT c.doc_id, c.canonical_doc_id, s.component_size
FROM comp c JOIN csizes s ON c.canonical_doc_id = s.canonical_doc_id
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_lsh_verified(spark, sf_dir).select("doc_a", "doc_b")
    docs = table(spark, sf_dir, "documents").select("doc_id")
    # One-pass symmetrization (posexplode of both orientations) — the
    # union-of-swapped spelling re-executed the whole LSH-verify
    # lineage once per branch when the cache materialized (r10).
    edges = _symmetric_edges(pairs)
    edges = edges.cache()

    # Propagate labels over the EDGE SUBGRAPH only: a doc in no
    # verified pair is a singleton whose label can never change, so
    # iterating over the full corpus is pure waste. The subgraph is
    # O(near-dup pairs) — at 100 TB it is orders of magnitude smaller
    # than the corpus, and every iteration is a small-frame join (AQE
    # broadcasts it) instead of a corpus-wide shuffle. Edges are
    # symmetric, so `src` alone enumerates every non-singleton vertex.
    labels = _min_label_components(edges)

    edges.unpersist()  # final labels frame is checkpointed (materialized)
    # Component sizes come from the subgraph (every member of a >1
    # component touches an edge); singletons default to 1. The only
    # corpus-sized work left is one map-side pass: docs left-joined
    # against two subgraph-sized frames — no corpus shuffle at all.
    csizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("component_size"))
    return (
        docs.join(labels, "doc_id", "left")
        .join(csizes, "comp", "left")
        .select(
            "doc_id",
            F.coalesce("comp", "doc_id").alias("canonical_doc_id"),
            F.coalesce("component_size", F.lit(1)).alias("component_size"),
        )
    )


@register(
    "dedup_incremental_snapshot",
    ops=("J2", "S4", "P5"),
    doc="Incremental snapshot dedup: a new crawl batch (doc_id % 5 = "
    "0) checked against the existing corpus (the rest) by normalized "
    "md5 fingerprint — the daily-ingest version of exact dedup. One "
    "shuffle keyed by fingerprint; the corpus side carries only "
    "(fingerprint) so state is a fraction of corpus bytes. At 100 TB "
    "the corpus fingerprints live as a bucketed table so the join is "
    "shuffle-free on ingest.",
    oracle=f"""
WITH fp AS (
  SELECT doc_id, md5({SQL_NORM}) AS fingerprint FROM documents
),
corpus AS (
  SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 <> 0
)
SELECT f.doc_id, f.fingerprint,
       c.fingerprint IS NULL AS kept
FROM fp f LEFT JOIN corpus c ON f.fingerprint = c.fingerprint
WHERE f.doc_id % 5 = 0
""",
)
def dedup_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(_norm_col()).alias("fingerprint")
    )
    corpus = (
        d.filter(F.col("doc_id") % 5 != 0).select("fingerprint").distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    batch = d.filter(F.col("doc_id") % 5 == 0)
    return batch.join(corpus, "fingerprint", "left").select(
        "doc_id", "fingerprint", F.col("in_corpus").isNull().alias("kept")
    )


@register(
    "dedup_substring_spans",
    ops=("F10", "A2", "W11"),
    doc="Exact-substring span dedup (the ExactSubstr pass of Lee et "
    "al., 'Deduplicating Training Data Makes Language Models Better', "
    "ACL 2022 — cut duplicated SPANS out of documents instead of "
    "dropping whole near-dup docs): every 8-token window is "
    "fingerprinted (md5 of the joined tokens), windows whose "
    "fingerprint occurs in >= 2 distinct documents are duplicated "
    "text, and per document the overlapping hits are merged into "
    "maximal cut spans by a gaps-and-islands window (running max of "
    "span end). The paper uses a suffix array on one machine; the "
    "windowed-fingerprint form is the distributed equivalent at "
    "window-W granularity: window rows ≈ corpus tokens (one shuffle "
    "on the fingerprint), the duplicated-fingerprint table is "
    "collision-sized, and the island merge is partition-parallel per "
    "document. No UDFs, no driver state.",
    oracle="""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
  FROM tok WHERE len(w) >= 8
),
win AS (
  SELECT doc_id, i AS start_tok, i + 7 AS end_tok,
         md5(array_to_string(w[i:i+7], ' ')) AS h
  FROM pos
),
dup AS (
  SELECT h FROM win GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT win.doc_id, win.start_tok, win.end_tok FROM win JOIN dup USING (h)
),
isl AS (
  SELECT doc_id, start_tok, end_tok,
    CASE WHEN start_tok > COALESCE(MAX(end_tok) OVER (
      PARTITION BY doc_id ORDER BY start_tok, end_tok
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
    THEN 1 ELSE 0 END AS new_isl
  FROM hits
),
grp AS (
  SELECT doc_id, start_tok, end_tok,
         SUM(new_isl) OVER (
           PARTITION BY doc_id ORDER BY start_tok, end_tok
         ) AS isl_id
  FROM isl
)
SELECT doc_id, MIN(start_tok) AS span_start, MAX(end_tok) AS span_end,
       COUNT(*) AS n_windows
FROM grp GROUP BY doc_id, isl_id
""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 8)
    pos = tok.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(1), F.size("w") - 7)).alias("i"),
    )
    win = pos.select(
        "doc_id",
        F.col("i").cast("long").alias("start_tok"),
        (F.col("i") + 7).cast("long").alias("end_tok"),
        F.md5(F.concat_ws(" ", F.slice("w", F.col("i"), 8))).alias("h"),
    )
    dup = win.groupBy("h").agg(
        F.countDistinct("doc_id").alias("nd")
    ).filter(F.col("nd") >= 2).select("h")
    hits = win.join(dup, "h").select("doc_id", "start_tok", "end_tok")
    w_ord = Window.partitionBy("doc_id").orderBy("start_tok", "end_tok")
    prev_end = F.max("end_tok").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = hits.withColumn(
        "new_isl",
        F.when(
            F.col("start_tok") > F.coalesce(prev_end, F.lit(-1)), 1
        ).otherwise(0),
    )
    grp = isl.withColumn("isl_id", F.sum("new_isl").over(w_ord))
    return (
        grp.groupBy("doc_id", "isl_id")
        .agg(
            F.min("start_tok").alias("span_start"),
            F.max("end_tok").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


@register(
    "minhash_source_overlap",
    ops=("A2", "J1", "A9"),
    doc="Cross-source corpus overlap: one 16-component MinHash "
    "signature PER SOURCE (min over the union of the source's doc "
    "shingles — a single groupBy, signatures are 16 longs regardless "
    "of corpus size), pairwise estimated Jaccard from signature "
    "agreement, exact Jaccard carried alongside from the "
    "distinct-shingle self-join as the verifier. At 100 TB the "
    "signatures are the shippable artifact — O(sources) state, "
    "mergeable map-side; the exact join is the bounded-cardinality "
    "audit (per-shingle fanout ≤ n_sources).",
    oracle=f"""
WITH src_sh AS (
  SELECT DISTINCT source, sh FROM (
    SELECT source, unnest(list_distinct({SQL_SHINGLES})) AS sh
    FROM (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS w
          FROM documents)
    WHERE len(w) >= 3
  )
),
sig AS (
  SELECT source,
    {", ".join(f"MIN((h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {_P}) AS m_{i}" for i in range(16))},
    COUNT(*) AS n_shingles
  FROM (SELECT source, {SQL_SHINGLE_HASH} AS h FROM src_sh)
  GROUP BY source
),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM src_sh a JOIN src_sh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa.source AS source_a, sb.source AS source_b,
  sa.n_shingles AS n_shingles_a, sb.n_shingles AS n_shingles_b,
  COALESCE(i.n_common, 0) AS n_common,
  CAST(COALESCE(i.n_common, 0) AS DOUBLE)
    / (sa.n_shingles + sb.n_shingles - COALESCE(i.n_common, 0)) AS exact_jaccard,
  ({" + ".join(f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16))}) AS sig_matches,
  CAST({" + ".join(f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16))} AS DOUBLE) / 16.0 AS est_jaccard
FROM sig sa JOIN sig sb ON sa.source < sb.source
LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
""",
)
def minhash_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    src_sh = (
        d.select("source", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "source",
            F.explode(F.array_distinct(F.expr(SPARK_SHINGLES))).alias("sh"),
        )
        .distinct()
    )
    # Pinned: the per-source shingle set feeds the signature aggregate
    # AND both sides of the pairwise-intersection self-join — 3
    # consumers of the corpus pass (r10, guide §1.2/§5).
    src_sh = _pin(src_sh)
    hashed = src_sh.withColumn("h", F.expr(SPARK_SHINGLE_HASH))
    sig = hashed.groupBy("source").agg(
        *[
            F.min(
                F.expr(f"(h * {MINHASH_A[i]}L + {MINHASH_B[i]}L) % {_P}L")
            ).alias(f"m_{i}")
            for i in range(16)
        ],
        F.count(F.lit(1)).alias("n_shingles"),
    )
    inter = (
        src_sh.alias("a")
        .join(
            src_sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    matches = sum(
        F.when(F.col(f"sa.m_{i}") == F.col(f"sb.m_{i}"), 1).otherwise(0)
        for i in range(16)
    )
    pairs = (
        sig.alias("sa")
        .join(
            F.broadcast(sig.alias("sb")),
            F.col("sa.source") < F.col("sb.source"),
        )
        .join(
            inter.alias("i"),
            (F.col("i.source_a") == F.col("sa.source"))
            & (F.col("i.source_b") == F.col("sb.source")),
            "left",
        )
    )
    n_common = F.coalesce(F.col("i.n_common"), F.lit(0))
    return pairs.select(
        F.col("sa.source").alias("source_a"),
        F.col("sb.source").alias("source_b"),
        F.col("sa.n_shingles").alias("n_shingles_a"),
        F.col("sb.n_shingles").alias("n_shingles_b"),
        n_common.alias("n_common"),
        (
            n_common.cast("double")
            / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - n_common)
        ).alias("exact_jaccard"),
        matches.alias("sig_matches"),
        (matches.cast("double") / F.lit(16.0)).alias("est_jaccard"),
    )


@register(
    "dedup_graph_triangles",
    ops=("J1", "A1", "A9"),
    doc="Clustering-quality audit of the near-dup candidate graph: "
    "edges from the MinHash band join (doc_a < doc_b), wedges from "
    "the per-vertex degree, triangles from the ordered two-hop "
    "equi-join (a<b<c, each edge checked once) — global clustering "
    "coefficient = 3*triangles/wedges. Near-dup graphs are sparse "
    "(edges ~ duplicates, not docs²), so the two-hop join fans out "
    "by max component degree, not corpus size; a skew guard on "
    "degree would cap pathological hubs at 100 TB.",
    oracle=f"""
WITH sig AS ({_SQL_MINHASH_SIG}),
bands AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT doc_id,
      unnest([{", ".join(str(j) for j in range(N_BANDS))}]) AS band_id,
      unnest([{", ".join(_band_exprs())}]) AS band_hash
    FROM sig
  )
),
edges AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1)) AS BIGINT) // 2 FROM deg) AS n_wedges,
       t.n_triangles,
       ROUND(CASE WHEN (SELECT SUM(d * (d - 1)) FROM deg) > 0
             THEN 3.0 * t.n_triangles
                  / ((SELECT CAST(SUM(d * (d - 1)) AS BIGINT) // 2 FROM deg))
             ELSE 0.0 END, 6) AS clustering_coeff
FROM tri t
""",
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _minhash_signature(spark, sf_dir)
    band_col = F.explode(
        F.arrays_zip(
            F.array(*[F.lit(j) for j in range(N_BANDS)]).alias("band_id"),
            F.array(*[F.expr(e) for e in _band_exprs()]).alias("band_hash"),
        )
    )
    bands = sig.select("doc_id", band_col.alias("z")).select(
        "doc_id",
        F.col("z.band_id").alias("band_id"),
        F.col("z.band_hash").alias("band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .distinct()
    )
    # Pinned: the edge list feeds the degree union (2 consumers) and
    # all THREE legs of the triangle join — 5 consumers, so without
    # the pin the whole shingle→signature→band-join lineage executes
    # 5× in one plan (r10, guide §1.2/§5).
    edges = _pin(edges)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedge2 = deg.agg(F.sum(F.col("d") * (F.col("d") - 1)).alias("w2"))
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(wedge2))
        .select(
            "n_edges",
            F.expr("cast(w2 as bigint) div 2").alias("n_wedges"),
            "n_triangles",
            F.round(
                F.when(
                    F.col("w2") > 0,
                    F.lit(3.0)
                    * F.col("n_triangles")
                    / F.expr("cast(w2 as bigint) div 2"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


@register(
    "dedup_minhash_incremental",
    ops=("J1", "J2", "S4", "A3"),
    doc="Incremental NEAR-dup ingest (the LSH companion of "
    "dedup_incremental_snapshot's exact-fingerprint check): a new "
    "crawl batch (doc_id % 7 = 3) is screened against the indexed "
    "corpus by banded MinHash — band-hash equi-join to the index, "
    "candidates scored by matching signature components, near-dup at "
    "est. Jaccard >= 0.5. The index side is 4 band hashes per doc "
    "(fixed-size state, bucketed by band hash at 100 TB so a daily "
    "batch joins shuffle-free against the standing index); batch "
    "docs with no band collision never join anything.",
    oracle=f"""
WITH sig AS ({{sig}}),
batch AS (SELECT * FROM sig WHERE doc_id % 7 = 3),
idx AS (SELECT * FROM sig WHERE doc_id % 7 <> 3),
bband AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT doc_id,
      unnest([{{band_ids}}]) AS band_id,
      unnest([{{band_hashes}}]) AS band_hash
    FROM batch)
),
iband AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT doc_id,
      unnest([{{band_ids}}]) AS band_id,
      unnest([{{band_hashes}}]) AS band_hash
    FROM idx)
),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_doc, i.doc_id AS index_doc
  FROM bband b JOIN iband i
    ON b.band_id = i.band_id AND b.band_hash = i.band_hash
),
scored AS (
  SELECT c.batch_doc,
    COUNT(*) AS n_candidates,
    MAX({{matches}}) AS best_sig_matches
  FROM cand c
  JOIN sig sa ON c.batch_doc = sa.doc_id
  JOIN sig sb ON c.index_doc = sb.doc_id
  GROUP BY c.batch_doc
)
SELECT b.doc_id,
  CAST(COALESCE(s.n_candidates, 0) AS BIGINT) AS n_candidates,
  CAST(COALESCE(s.best_sig_matches, 0) AS INTEGER) AS best_sig_matches,
  COALESCE(s.best_sig_matches, 0) >= 8 AS is_neardup
FROM batch b LEFT JOIN scored s ON b.doc_id = s.batch_doc
""".format(
        sig=_SQL_MINHASH_SIG,
        band_ids=", ".join(str(j) for j in range(N_BANDS)),
        band_hashes=", ".join(_band_exprs()),
        matches=" + ".join(
            f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16)
        ),
    ),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pinned: sig has FIVE consumers (batch/index band explodes, both
    # score-join sides, and the final batch frame) — without the pin
    # the corpus shingle+signature pass executes five times (r10).
    sig = _pin(_minhash_signature(spark, sf_dir))
    batch_sig = sig.filter(F.col("doc_id") % 7 == 3)
    index_sig = sig.filter(F.col("doc_id") % 7 != 3)

    def bands(frame: DataFrame) -> DataFrame:
        return frame.select(
            "doc_id",
            F.posexplode(F.array(*[F.expr(e) for e in _band_exprs()])).alias(
                "band_id", "band_hash"
            ),
        )

    cand = (
        bands(batch_sig)
        .withColumnRenamed("doc_id", "batch_doc")
        .join(
            bands(index_sig).withColumnRenamed("doc_id", "index_doc"),
            ["band_id", "band_hash"],
        )
        .select("batch_doc", "index_doc")
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"a.m_{i}") == F.col(f"b.m_{i}"), 1).otherwise(0)
        for i in range(16)
    )
    scored = (
        cand.join(sig.alias("a"), F.col("batch_doc") == F.col("a.doc_id"))
        .join(sig.alias("b"), F.col("index_doc") == F.col("b.doc_id"))
        .groupBy("batch_doc")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max(matches).alias("best_sig_matches"),
        )
    )
    out = batch_sig.select("doc_id").join(
        scored, F.col("doc_id") == F.col("batch_doc"), "left"
    ).select(
        "doc_id",
        F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
        F.coalesce("best_sig_matches", F.lit(0)).cast("int").alias("best_sig_matches"),
        (F.coalesce("best_sig_matches", F.lit(0)) >= 8).alias("is_neardup"),
    )
    return out


@register(
    "dedup_containment",
    ops=("J1", "A3", "A9"),
    doc="Asymmetric containment dedup (Broder's containment coefficient "
    "|A∩B|/|A|): catches SUB-document duplication — a short doc wholly "
    "quoted inside a long one scores near 1.0 containment while its "
    "symmetric Jaccard stays low, so Jaccard-threshold dedup misses "
    "it. Candidates come from the same banded-MinHash join as "
    "dedup_lsh_verified (linear candidate generation); exact shingle "
    "intersection runs on candidates only; pairs kept at containment "
    ">= 0.8 in either direction.",
    oracle=f"""
WITH sig AS ({{sig}}),
bands AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT doc_id,
      unnest([{{band_ids}}]) AS band_id,
      unnest([{{band_hashes}}]) AS band_hash
    FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sh AS ({{shingles}}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS n_inter,
  CAST(i.n_inter AS DOUBLE) / za.n_sh AS containment_a,
  CAST(i.n_inter AS DOUBLE) / zb.n_sh AS containment_b
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / za.n_sh >= 0.8
   OR CAST(i.n_inter AS DOUBLE) / zb.n_sh >= 0.8
""".format(
        sig=_SQL_MINHASH_SIG,
        band_ids=", ".join(str(j) for j in range(N_BANDS)),
        band_hashes=", ".join(_band_exprs()),
        shingles=SQL_DOC_SHINGLES,
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sh is pinned below and feeds the signature too — one corpus
    # shingle pass for all 4 consumers (sig, sizes, both join sides).
    sh = _pin(_doc_shingles(spark, sf_dir))
    sig = _minhash_signature(spark, sf_dir, sh=sh)
    zipped = F.explode(
        F.arrays_zip(
            F.array(*[F.lit(j) for j in range(N_BANDS)]).alias("band_id"),
            F.array(*[F.expr(e) for e in _band_exprs()]).alias("band_hash"),
        )
    )
    bands = sig.select("doc_id", zipped.alias("z")).select(
        "doc_id",
        F.col("z.band_id").alias("band_id"),
        F.col("z.band_hash").alias("band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("sh").alias("sh_b"))
    inter = (
        cand.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    ca = F.col("n_inter").cast("double") / F.col("n_sh_a")
    cb = F.col("n_inter").cast("double") / F.col("n_sh_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
        .filter((F.col("containment_a") >= 0.8) | (F.col("containment_b") >= 0.8))
    )


DEC_J = "decimal(18,4)"  #: calibration-mean decimal (matches oracle cast)


@register(
    "lsh_threshold_sweep",
    ops=("J1", "A3", "A9"),
    doc="LSH estimator calibration: every banded-MinHash candidate "
    "pair bucketed by its matching-signature count, each bucket "
    "reporting pair volume, the implied estimate (matches/16) and "
    "the decimal-exact mean TRUE Jaccard from a candidates-only "
    "shingle intersection — the curve that tells you which "
    "est-Jaccard threshold actually delivers a target precision "
    "before you commit a 100 TB dedup run. Exact verification cost "
    "is bounded by candidate volume (the LSH guarantee), and the "
    "output is 17 rows.",
    oracle=f"""
WITH sig AS ({{sig}}),
bands AS (
  SELECT doc_id, band_id, band_hash FROM (
    SELECT doc_id,
      unnest([{{band_ids}}]) AS band_id,
      unnest([{{band_hashes}}]) AS band_hash
    FROM sig)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
    ({{matches}}) AS sig_matches
  FROM cand c
  JOIN sig sa ON c.doc_a = sa.doc_id
  JOIN sig sb ON c.doc_b = sb.doc_id
),
sh AS ({{shingles}}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT s.sig_matches,
    CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
      / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)) AS jaccard
  FROM scored s
  LEFT JOIN inter i ON s.doc_a = i.doc_a AND s.doc_b = i.doc_b
  JOIN sizes za ON za.doc_id = s.doc_a
  JOIN sizes zb ON zb.doc_id = s.doc_b
)
SELECT CAST(sig_matches AS INTEGER) AS sig_matches,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(sig_matches AS DOUBLE) / 16.0 AS est_jaccard,
  CAST(SUM(CAST(jaccard AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
    AS mean_true_jaccard
FROM pairs GROUP BY sig_matches
""".format(
        sig=_SQL_MINHASH_SIG,
        band_ids=", ".join(str(j) for j in range(N_BANDS)),
        band_hashes=", ".join(_band_exprs()),
        matches=" + ".join(
            f"CASE WHEN sa.m_{i} = sb.m_{i} THEN 1 ELSE 0 END" for i in range(16)
        ),
        shingles=SQL_DOC_SHINGLES,
    ),
)
def lsh_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sh pinned (feeds sig + sizes + both verify sides = 4 consumers);
    # sig pinned on top (feeds bands + both score sides = 3 consumers,
    # each of which would otherwise re-run the signature aggregate).
    sh = _pin(_doc_shingles(spark, sf_dir))
    sig = _pin(_minhash_signature(spark, sf_dir, sh=sh))
    zipped = F.explode(
        F.arrays_zip(
            F.array(*[F.lit(j) for j in range(N_BANDS)]).alias("band_id"),
            F.array(*[F.expr(e) for e in _band_exprs()]).alias("band_hash"),
        )
    )
    bands = sig.select("doc_id", zipped.alias("z")).select(
        "doc_id",
        F.col("z.band_id").alias("band_id"),
        F.col("z.band_hash").alias("band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    matches = sum(
        F.when(F.col(f"sa.m_{i}") == F.col(f"sb.m_{i}"), 1).otherwise(0)
        for i in range(16)
    )
    scored = (
        cand.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", matches.alias("sig_matches"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("sh").alias("sh_b"))
    inter = (
        cand.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    jac = F.coalesce("n_inter", F.lit(0)).cast("double") / (
        F.col("n_sh_a") + F.col("n_sh_b") - F.coalesce("n_inter", F.lit(0))
    )
    pairs = (
        scored.join(inter, ["doc_a", "doc_b"], "left")
        .join(F.broadcast(za), "doc_a")
        .join(F.broadcast(zb), "doc_b")
        .select("sig_matches", jac.alias("jaccard"))
    )
    return pairs.groupBy(
        F.col("sig_matches").cast("int").alias("sig_matches")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.first("sig_matches").cast("double") / 16.0).alias("est_jaccard"),
        (
            F.sum(F.col("jaccard").cast(DEC_J)).cast("double") / F.count(F.lit(1))
        ).alias("mean_true_jaccard"),
    )



# --- SemDeDup: semantic dedup scoped to k-means clusters --------------------

#: Cosine-compare quantization grid (2^-10). Unit-norm embeddings give
#: Σq² ≈ 2^20 per vector, so 100·dot² and τ²num·na·nb stay < 2^47 —
#: exact long arithmetic in both engines.
SEM_Q = 1024.0
#: τ = 0.4 on the quantized grid, compared as 25·dot² ≥ 4·na·nb.
SEM_TAU_NUM2, SEM_TAU_DEN2 = 4, 25

_SQL_SEMQ = (
    "list_transform(embedding, "
    f"x -> CAST(trunc(CAST(x AS DOUBLE) * {SEM_Q!r}) AS BIGINT))"
)

#: Target cluster population: K = max(KMEANS_K, ceil(n / SEM_TARGET)),
#: so within-cluster pairwise work is ≈ n·SEM_TARGET/2 — LINEAR in n.
#: (Verified by the ×8 probe: with K pinned the pair count grows n²/K;
#: growing K ∝ n flattened 66 s back to ~linear.)
SEM_TARGET = 250


@register(
    "dedup_semdedup",
    ops=("J10", "J2", "W4", "A3"),
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic "
    "dedup scoped to k-means clusters. Reuses the deterministic "
    "2-round Lloyd assignment from kmeans_semantic_clusters (K=8, "
    "centroids seeded from the first K vectors), then drops any "
    "vector whose cosine similarity to a LOWER-id vector in the SAME "
    "cluster is ≥ τ=0.4. Cosine is compared in exact long arithmetic "
    "on a 2^-10 quantized grid (25·dot² ≥ 4·‖a‖²·‖b‖² with dot>0), so "
    "Spark and the oracle agree bitwise. This is the scale path the "
    "all-pairs dedup_embedding_cosine can't be: pairwise work is "
    "confined within clusters (O(Σ nᵢ²), with K grown ∝ n to bound "
    "nᵢ), the pair join is an equi-join on cluster id, and the "
    "centroid set stays broadcast-sized. K grows with the corpus "
    "(K = max(8, ⌈n/250⌉), centroids seeded from the K smallest "
    "vec_ids), so pairwise work is ≈ n·250/2 — linear in n.",
    oracle=None,  # set below — shares the kmeans CTE chain
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .mlprep import KMEANS_K, _lloyd_assign, _q_col

    e = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id",
        F.transform(_q_col(F.col("embedding")), lambda q: q.cast("double")).alias("v"),
        F.transform(
            F.col("embedding"),
            lambda x: (x.cast("double") * F.lit(SEM_Q)).cast("long"),
        ).alias("q"),
    )
    # One cheap count sizes K (vec_ids are dense from 0 in every
    # fixture layout; the oracle computes the same K from COUNT(*)).
    n = e.count()
    k = max(KMEANS_K, -(-n // SEM_TARGET))
    c0 = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )

    a1 = _lloyd_assign(e, c0, keep=("v",))
    comps = (
        a1.select("cid", F.posexplode(F.col("v")).alias("dim0", "qv"))
        .groupBy("cid", (F.col("dim0") + 1).alias("dim"))
        .agg((F.sum("qv").cast("double") / F.count(F.lit(1))).alias("comp"))
    )
    c1 = comps.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "comp"))),
            lambda s: s["comp"],
        ).alias("c")
    )
    norm2 = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    # Checkpoint the final assignment (n skinny rows): one Lloyd-chain
    # execution feeds all three consumers, and the map-only assign has
    # no exchanges left for ReusedExchange to share. (The old note
    # about checkpointing being 1.5× slower predates the map-only
    # assignment.)
    m = (
        _lloyd_assign(e, c1, keep=("q",))
        .select("vec_id", "cid", "q", norm2.alias("nq"))
        .localCheckpoint()
    )
    a = m.select(
        F.col("vec_id").alias("vec_a"), "cid",
        F.col("q").alias("qa"), F.col("nq").alias("na"),
    )
    b = m.select(
        F.col("vec_id").alias("vec_b"), "cid",
        F.col("q").alias("qb"), F.col("nq").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # Broadcast-sized corpora: hint the probe side so the pair join
    # stays a 32-way map join instead of a K-partition SortMergeJoin
    # (the checkpoint's origin stats overestimate m, K=8 → 8 tasks).
    # At scale the equi-join on cid takes over; K ∝ n keeps tasks
    # balanced.
    if n <= 50_000:
        b = F.broadcast(b)
    dominated = (
        a.join(b, "cid")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(SEM_TAU_DEN2) * F.col("dot") * F.col("dot")
                >= F.lit(SEM_TAU_NUM2) * F.col("na") * F.col("nb")
            )
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        m.join(dominated, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").alias("cluster_id"),
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"),
        )
    )


def _semdedup_oracle() -> str:
    from .mlprep import KMEANS_DIM, KMEANS_K, _SQL_QVEC, _sql_assign

    sql_dot = (
        "list_reduce(list_transform(generate_series(1, "
        f"{KMEANS_DIM}), i -> a.q[i] * b.q[i]), (x, y) -> x + y)"
    )
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform({_SQL_QVEC}, q -> CAST(q AS DOUBLE)) AS v,
         {_SQL_SEMQ} AS q
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, v AS c FROM e
  WHERE vec_id < (SELECT GREATEST({KMEANS_K},
                                  (COUNT(*) + {SEM_TARGET - 1}) // {SEM_TARGET})
                  FROM e)
),
a1 AS ({_sql_assign("e.v", "c0.c", "e", "c0")}),
c1 AS (
  SELECT cid, list(comp ORDER BY dim) AS c FROM (
    SELECT cid, dim, CAST(SUM(v[dim]) AS DOUBLE) / COUNT(*) AS comp
    FROM a1, generate_series(1, {KMEANS_DIM}) AS t(dim)
    GROUP BY cid, dim
  ) GROUP BY cid
),
a2 AS ({_sql_assign("e.v", "c1.c", "e", "c1")}),
m AS (
  SELECT a2.vec_id, a2.cid, e.q,
         list_reduce(list_transform(e.q, x -> x * x), (x, y) -> x + y) AS nq
  FROM a2 JOIN e USING (vec_id)
),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {sql_dot} > 0
    AND {SEM_TAU_DEN2} * {sql_dot} * {sql_dot}
        >= {SEM_TAU_NUM2} * a.nq * b.nq
)
SELECT m.vec_id, m.cid AS cluster_id, (d.vec_id IS NULL) AS keep
FROM m LEFT JOIN dup d ON m.vec_id = d.vec_id
"""


from .registry import _REGISTRY as _REG  # noqa: E402  (oracle backfill)

_REG["dedup_semdedup"].oracle = _semdedup_oracle()


@register(
    "contrastive_pair_mining",
    ops=("J1", "J2", "W4", "A3"),
    doc="Contrastive-pair mining for embedding-model training: "
    "positives are verified near-dup pairs (exact Jaccard ≥ 0.5 on "
    "LSH candidates — the dedup_lsh_verified plan, re-used as a "
    "miner); negatives pair documents that land adjacent in a keyed-"
    "md5 shuffle within 64 hash buckets, keeping only cross-source "
    "pairs not already positive (anti-join). Both labels report pair "
    "count, distinct docs touched, and decimal-exact mean Jaccard "
    "(verified on the mined pairs only — linear in pairs, never "
    "all-pairs). Every stage is an equi-join or a bucket-local "
    "window, so mining cost tracks candidate volume at 100 TB.",
    oracle=f"""
WITH sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
posint AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pos AS (
  SELECT i.doc_a, i.doc_b
  FROM posint i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
),
ranked AS (
  SELECT doc_id, source,
    CAST('0x' || substr(md5('cpm:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bkt,
    ROW_NUMBER() OVER (
      PARTITION BY CAST('0x' || substr(md5('cpm:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64
      ORDER BY md5('cpm:' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS rn
  FROM documents
),
negraw AS (
  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
         GREATEST(a.doc_id, b.doc_id) AS doc_b
  FROM ranked a JOIN ranked b
    ON a.bkt = b.bkt AND b.rn = a.rn + 1 AND a.rn % 2 = 1
  WHERE a.source <> b.source
),
neg AS (
  SELECT n.doc_a, n.doc_b FROM negraw n
  ANTI JOIN pos p ON n.doc_a = p.doc_a AND n.doc_b = p.doc_b
),
pairs AS (
  SELECT doc_a, doc_b, 'pos' AS label FROM pos
  UNION ALL
  SELECT doc_a, doc_b, 'neg' AS label FROM neg
),
inter AS (
  SELECT p.label, p.doc_a, p.doc_b, COUNT(b.sh) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  LEFT JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY 1, 2, 3
),
jac AS (
  SELECT i.label, i.doc_a, i.doc_b,
    CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) AS j
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
)
SELECT label,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(CAST(j AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS mean_jaccard
FROM jac
GROUP BY 1
""",
)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One pinned shingle frame for the whole query: positives mining
    # consumes it 4× (inside _verified_pairs) and the verify stage
    # 3× more — one corpus pass instead of seven (r10, guide §1.2).
    sh = _pin(_doc_shingles(spark, sf_dir))
    # Positives: the LSH-verified near-dup pairs (identical result to
    # the exact pairwise set — certified by dedup_lsh_verified's gate).
    # Pinned: pos feeds the negative anti-join AND the pair union —
    # without the pin the whole LSH-verify pipeline executes twice.
    pos = _pin(_verified_pairs(sh, 0.5).select("doc_a", "doc_b"))
    d = table(spark, sf_dir, "documents", spread=True)
    key = F.md5(F.concat(F.lit("cpm:"), F.col("doc_id").cast("string")))
    bkt = F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % 64
    ranked = d.select(
        "doc_id", "source", bkt.alias("bkt"), key.alias("k")
    ).withColumn(
        "rn", F.row_number().over(Window.partitionBy("bkt").orderBy("k", "doc_id"))
    )
    a = ranked.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"), "bkt", "rn"
    )
    b = ranked.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"),
        F.col("bkt").alias("bkt_b"), F.col("rn").alias("rn_b"),
    )
    negraw = (
        a.join(b, (F.col("bkt") == F.col("bkt_b")) & (F.col("rn_b") == F.col("rn") + 1))
        .filter((F.col("rn") % 2 == 1) & (F.col("src_a") != F.col("src_b")))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
    )
    neg = negraw.join(pos, ["doc_a", "doc_b"], "left_anti")
    pairs = pos.withColumn("label", F.lit("pos")).unionByName(
        neg.withColumn("label", F.lit("neg"))
    )
    # Exact Jaccard on the mined pairs only — reuses the pinned sh.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("sh").alias("sh_b"))
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_a") == F.col("sh_b")),
            "left",
        )
        .groupBy("label", "doc_a", "doc_b")
        .agg(F.count(F.col("sh_b")).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "label",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter"))
            ).alias("j"),
        )
    )
    return jac.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (
            F.sum(F.col("j").cast(DEC_J)).cast("double") / F.count(F.lit(1))
        ).alias("mean_jaccard"),
    )


@register(
    "simhash_eval_pr",
    ops=("J1", "A1", "A9", "P8"),
    doc="Blocking-quality evaluation harness: SimHash candidates "
    "(top-8-bit block, Hamming ≤ 2 — the dedup_simhash plan) scored "
    "against exact-Jaccard ≥ 0.5 ground truth as TP/FP/FN with "
    "precision/recall/F1 — the measurement every near-dup pipeline "
    "needs before trusting a blocking scheme at 100 TB. Truth is "
    "the shingle-equi-join exact pass (bounded corpora); predictions "
    "and truth meet in one full-outer pair join.",
    oracle=f"""
WITH sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
posint AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM posint i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
),
tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
  FROM documents
),
th AS (SELECT doc_id, CAST('0x' || substr(md5(t),1,8) AS BIGINT) AS h FROM tok),
bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS w
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
  GROUP BY 1, 2
),
sim AS (
  SELECT doc_id,
         SUM(CASE WHEN w > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
  FROM bits GROUP BY 1
),
blocked AS (SELECT doc_id, simhash, simhash >> 24 AS block FROM sim),
pred AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a JOIN blocked b
    ON a.block = b.block AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
),
conf AS (
  SELECT
    COUNT(CASE WHEN t.doc_a IS NOT NULL AND p.doc_a IS NOT NULL THEN 1 END) AS tp,
    COUNT(CASE WHEN t.doc_a IS NULL THEN 1 END) AS fp,
    COUNT(CASE WHEN p.doc_a IS NULL THEN 1 END) AS fn
  FROM truth t FULL JOIN pred p
    ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
  CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0) AS precision_,
  CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0) AS recall_
FROM conf
""",
)
def simhash_eval_pr(
    spark: SparkSession, sf_dir: str, max_join_rows: int = 100_000_000
) -> DataFrame:
    pred = dedup_simhash(spark, sf_dir).select("doc_a", "doc_b")
    # Exact-Jaccard ground truth (same construction as the
    # dedup_lsh_verified ORACLE — the full pairwise pass, Spark-side).
    # Ground truth is inherently quadratic: this harness is for
    # bounded evaluation SAMPLES, and carries the same Σdf²
    # blast-radius guard as dedup_ngram_jaccard.
    # Pinned: guard agg + sizes + both truth-join sides (4 consumers).
    sh = _pin(_doc_shingles(spark, sf_dir))
    est = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.sum(F.col("df") * F.col("df")).alias("s2"))
        .first()[0]
    )
    if est is not None and est > max_join_rows:
        raise ValueError(
            f"simhash_eval_pr: estimated truth-join blow-up Σdf²={est:,} "
            f"exceeds max_join_rows={max_join_rows:,}; evaluate blocking "
            "quality on a bounded sample (exact ground truth is quadratic "
            "by definition), or raise max_join_rows explicitly."
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("s"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("s"))
    posint = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    truth = (
        posint.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    t = truth.withColumn("in_t", F.lit(1))
    p = pred.withColumn("in_p", F.lit(1))
    conf = t.join(p, ["doc_a", "doc_b"], "full").agg(
        F.count(F.when(F.col("in_t").isNotNull() & F.col("in_p").isNotNull(), 1))
        .cast("bigint")
        .alias("tp"),
        F.count(F.when(F.col("in_t").isNull(), 1)).cast("bigint").alias("fp"),
        F.count(F.when(F.col("in_p").isNull(), 1)).cast("bigint").alias("fn"),
    )
    return conf.select(
        "tp",
        "fp",
        "fn",
        (F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))).alias("precision_"),
        (F.col("tp").cast("double") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))).alias("recall_"),
    )


@register(
    "doc_ngram_novelty",
    ops=("A1", "A9", "J1"),
    doc="Corpus-order novelty curve: for each document (in doc_id "
    "ingest order), the fraction of its distinct 3-gram shingles "
    "never seen in any earlier document — the dataset-freshness "
    "signal that drives dedup-aware data selection (a doc whose "
    "novelty → 0 adds nothing to training). First-seen owner = "
    "min(doc_id) per shingle: one shingle-keyed aggregate joined "
    "back to the shingle stream — two shuffles on the shingle key, "
    "linear at any corpus size.",
    oracle=f"""
WITH sh AS ({SQL_DOC_SHINGLES}),
first_seen AS (SELECT sh, MIN(doc_id) AS owner FROM sh GROUP BY 1)
SELECT s.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(COUNT(CASE WHEN f.owner = s.doc_id THEN 1 END) AS BIGINT) AS n_novel,
  CAST(COUNT(CASE WHEN f.owner = s.doc_id THEN 1 END) AS DOUBLE) / COUNT(*)
    AS novelty_ratio
FROM sh s JOIN first_seen f USING (sh)
GROUP BY 1
""",
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pinned: first-owner aggregate + the join-back side (2 consumers).
    sh = _pin(_doc_shingles(spark, sf_dir))
    first_seen = sh.groupBy("sh").agg(F.min("doc_id").alias("owner"))
    novel = F.count(F.when(F.col("owner") == F.col("doc_id"), 1))
    return (
        sh.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty_ratio"),
        )
    )


@register(
    "dedup_cluster_stats",
    ops=("A1", "A9", "A11"),
    doc="Near-dup cluster census — the report a dedup run ships: "
    "component-size histogram (how many singletons / pairs / big "
    "cliques), documents-in-duplicate-clusters mass, and the corpus "
    "shrink factor if each cluster keeps one canonical. Composes "
    "dedup_components; the census itself is two tiny aggregates over "
    "the component frame.",
    oracle=f"""
WITH RECURSIVE sh AS ({SQL_DOC_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc_id
  JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_inter) >= 0.5
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT doc_id AS a, doc_id AS b FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
comp AS (SELECT a AS doc_id, MIN(b) AS canon FROM reach GROUP BY a),
csizes AS (SELECT canon, COUNT(*) AS component_size FROM comp GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM comp)
SELECT component_size,
  CAST(COUNT(*) AS BIGINT) AS n_components,
  CAST(COUNT(*) * component_size AS BIGINT) AS docs_in_size,
  CAST(COUNT(*) * component_size AS DOUBLE) / t.n_docs AS corpus_share,
  component_size > 1 AS is_duplicate_cluster
FROM csizes, tot t
GROUP BY component_size, t.n_docs
""",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_components(spark, sf_dir)
    csizes = comp.groupBy("canonical_doc_id").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    tot = comp.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        csizes.crossJoin(F.broadcast(tot))
        .groupBy("component_size", "n_docs")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_components"))
        .select(
            "component_size",
            "n_components",
            (F.col("n_components") * F.col("component_size"))
            .cast("bigint")
            .alias("docs_in_size"),
            (
                (F.col("n_components") * F.col("component_size")).cast("double")
                / F.col("n_docs")
            ).alias("corpus_share"),
            (F.col("component_size") > 1).alias("is_duplicate_cluster"),
        )
    )


# --- probabilistic record linkage (Fellegi–Sunter) -------------------

#: Field-level (m, u) probabilities → integer log2-odds weights ×1000
#: (computed once in Python and embedded as the SAME literal in both
#: engines — no runtime log in either plan, the repo's standard
#: libm-determinism discipline). Fields over the customer/supplier
#: pair: account-balance k$-bucket, entity-number 2-digit suffix,
#: balance cents.
_FS_MU = {
    "bal_bucket": (0.7, 0.1),
    "num_suffix": (0.9, 0.01),
    "cents": (0.8, 0.01),
}
_FS_W = {
    f: (
        round(_math.log2(m / u) * 1000),
        round(_math.log2((1.0 - m) / (1.0 - u)) * 1000),
    )
    for f, (m, u) in _FS_MU.items()
}
#: Decision threshold on the summed integer weight.
_FS_THR = 6000


@register(
    "fellegi_sunter_linkage",
    ops=("J1", "A5", "A9", "P5"),
    doc="Probabilistic record linkage (Fellegi & Sunter 1969): "
    "customer×supplier pairs blocked on nationkey (the blocking key "
    "bounds pair growth — at 100 TB you block on a higher-cardinality "
    "key and this stays an equi-join with broadcast-able dim side), "
    "each field comparison contributes its log2(m/u) agreement or "
    "log2((1-m)/(1-u)) disagreement weight, match = summed weight ≥ "
    "threshold. All weights are integer milli-bits embedded as "
    "literals (no runtime log), so the score arithmetic is exact and "
    "both engines classify identically. Reports per blocking group: "
    "pair count, matches, max score and mean score.",
    oracle=f"""
WITH pairs AS (
  SELECT c.c_nationkey AS nationkey,
    (CASE WHEN floor(c.c_acctbal / 1000) = floor(s.s_acctbal / 1000)
          THEN {_FS_W["bal_bucket"][0]} ELSE {_FS_W["bal_bucket"][1]} END)
    + (CASE WHEN right(c.c_name, 2) = right(s.s_name, 2)
            THEN {_FS_W["num_suffix"][0]} ELSE {_FS_W["num_suffix"][1]} END)
    + (CASE WHEN CAST(round(c.c_acctbal * 100) AS BIGINT) % 100
                 = CAST(round(s.s_acctbal * 100) AS BIGINT) % 100
            THEN {_FS_W["cents"][0]} ELSE {_FS_W["cents"][1]} END)
    AS score
  FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
)
SELECT nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(CASE WHEN score >= {_FS_THR} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_matches,
  CAST(MAX(score) AS BIGINT) AS max_score,
  CAST(SUM(score) AS DOUBLE) / COUNT(*) AS mean_score
FROM pairs GROUP BY 1
""",
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer", spread=True)
    s = table(spark, sf_dir, "supplier")

    def field(agree, name):
        w_a, w_d = _FS_W[name]
        return F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))

    cents = lambda col: (  # noqa: E731
        F.round(col * 100).cast("bigint") % 100
    )
    score = (
        field(
            F.floor(F.col("c_acctbal") / 1000)
            == F.floor(F.col("s_acctbal") / 1000),
            "bal_bucket",
        )
        + field(
            F.expr("right(c_name, 2)") == F.expr("right(s_name, 2)"),
            "num_suffix",
        )
        + field(cents(F.col("c_acctbal")) == cents(F.col("s_acctbal")), "cents")
    )
    pairs = c.join(
        F.broadcast(s), F.col("c_nationkey") == F.col("s_nationkey")
    ).select(F.col("c_nationkey").alias("nationkey"), score.alias("score"))
    return pairs.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("score") >= _FS_THR, 1).otherwise(0))
        .cast("bigint")
        .alias("n_matches"),
        F.max("score").cast("bigint").alias("max_score"),
        (F.sum("score").cast("double") / F.count(F.lit(1))).alias("mean_score"),
    )


#: Sorted-neighborhood window size: each record is compared with the
#: next _SN_WINDOW records in normalized-key order (Hernández &
#: Stolfo 1995, the classic merge/purge blocking scheme — public).
_SN_WINDOW = 3
_SN_KEY_LEN = 24
_SN_THRESHOLD = 0.5


@register(
    "dedup_sorted_neighborhood",
    ops=("W4", "J1", "A9", "P5"),
    doc="Sorted-neighborhood near-dup blocking (Hernández-Stolfo "
    "merge/purge): documents are ranked by a normalized key (first "
    f"{_SN_KEY_LEN} chars of the lowercased alphanumeric collapse), "
    f"and each doc is paired with its next {_SN_WINDOW} neighbors "
    "in key order (LEAD array — no self-join for candidate "
    "generation); candidates are then exactly verified by word-"
    "3-shingle Jaccard. Complements the hash-based blockers "
    "(minhash bands, simhash prefixes, pHash bands): sorted "
    "neighborhoods catch prefix-preserving near-dups those can "
    "miss, and candidate volume is EXACTLY w·n by construction — "
    "no collision skew. The sorted scan is range-partitioned with "
    "ghost-row boundary overlap (functions/ranking.sorted_neighbors"
    ") — no single-partition window at any corpus size; the verify "
    "join touches candidate pairs only. Ref dedup role: "
    "`load_gtfs_data.py:151` ON CONFLICT dedup, upgraded to fuzzy "
    "keys.",
    oracle=f"""
WITH sh AS ({SQL_DOC_SHINGLES}),
keyed AS (
  SELECT doc_id,
    substr(regexp_replace(lower(trim(text)), '[^a-z0-9]', '', 'g'),
           1, {_SN_KEY_LEN}) AS k
  FROM documents
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM keyed
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(b.rn - a.rn AS BIGINT) AS neighbor_offset
  FROM ranked a JOIN ranked b
    ON b.rn - a.rn BETWEEN 1 AND {_SN_WINDOW}
),
sizes AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY 1),
-- ca is MATERIALIZED to pin the join order: left free, the optimizer
-- may join sh to sh on the shingle alone first (Σdf² — quadratic per
-- shared shingle on duplicate-clique corpora) instead of expanding
-- the w·n-bounded candidate pairs first. Same algebra, same values.
ca AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b, sa.sh
  FROM cand c JOIN sh sa ON c.doc_a = sa.doc_id
),
inter AS (
  SELECT ca.doc_a, ca.doc_b, COUNT(*) AS ni
  FROM ca
  JOIN sh sb ON ca.doc_b = sb.doc_id AND ca.sh = sb.sh
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.neighbor_offset,
  CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_inter,
  CAST(COALESCE(pa.ns, 0) AS BIGINT) AS n_a,
  CAST(COALESCE(pb.ns, 0) AS BIGINT) AS n_b,
  CAST(COALESCE(i.ni, 0) AS DOUBLE)
    / NULLIF(COALESCE(pa.ns, 0) + COALESCE(pb.ns, 0) - COALESCE(i.ni, 0), 0)
    AS jaccard,
  COALESCE(CAST(COALESCE(i.ni, 0) AS DOUBLE)
    / NULLIF(COALESCE(pa.ns, 0) + COALESCE(pb.ns, 0) - COALESCE(i.ni, 0), 0)
    >= {_SN_THRESHOLD!r}, FALSE) AS is_dup
FROM cand c
LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
LEFT JOIN sizes pa ON c.doc_a = pa.doc_id
LEFT JOIN sizes pb ON c.doc_b = pb.doc_id
""",
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    # Pinned: sizes + both verify-join sides (3 consumers) — see _pin.
    sh = _pin(_doc_shingles(spark, sf_dir))
    keyed = d.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9]", ""),
            1,
            _SN_KEY_LEN,
        ).alias("k"),
    )
    # Scale-safe sorted scan: range-partitioned with ghost-row
    # boundary overlap (functions/ranking.sorted_neighbors) — the
    # LEAD window runs per range partition, each partition's first
    # _SN_WINDOW rows are duplicated into the previous partition so no
    # cross-boundary pair is lost. Exactly the serial-window pair set
    # under the (k, doc_id) total order, at any corpus size.
    from ..functions.ranking import sorted_neighbors

    frame, is_real, w = sorted_neighbors(
        keyed, ("k", "doc_id"), _SN_WINDOW
    )
    leads = F.array(
        *[F.lead("doc_id", o).over(w) for o in range(1, _SN_WINDOW + 1)]
    )
    cand = (
        frame.select("doc_id", leads.alias("nbrs"), is_real.alias("_real"))
        .filter(F.col("_real"))
        .select(
            F.col("doc_id").alias("doc_a"),
            F.posexplode("nbrs").alias("pos", "doc_b"),
        )
        .filter(F.col("doc_b").isNotNull())
        .select(
            "doc_a",
            "doc_b",
            (F.col("pos") + 1).cast("bigint").alias("neighbor_offset"),
        )
    )
    # cand is NOT pinned despite its two consumers (verify
    # intersection + final assembly): sorted_neighbors' internal
    # consistency checkpoint already materializes the range-sorted
    # frame once for both, so a pin here would only hide the
    # range-partitioning from the plan (tests/test_plans.py asserts
    # it) while saving a window+posexplode re-run over checkpointed
    # blocks.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("sb_id"), F.col("sh").alias("sh_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("sb_id")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy(cand["doc_a"].alias("ia"), cand["doc_b"].alias("ib"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    pa = sizes.select(F.col("doc_id").alias("pa_id"), F.col("ns").alias("ns_a"))
    pb = sizes.select(F.col("doc_id").alias("pb_id"), F.col("ns").alias("ns_b"))
    ni = F.coalesce(F.col("ni"), F.lit(0)).cast("bigint")
    na = F.coalesce(F.col("ns_a"), F.lit(0)).cast("bigint")
    nb = F.coalesce(F.col("ns_b"), F.lit(0)).cast("bigint")
    jac = ni.cast("double") / F.nullif(na + nb - ni, F.lit(0))
    return (
        cand.join(
            inter,
            (cand["doc_a"] == F.col("ia")) & (cand["doc_b"] == F.col("ib")),
            "left",
        )
        .join(pa, cand["doc_a"] == F.col("pa_id"), "left")
        .join(pb, cand["doc_b"] == F.col("pb_id"), "left")
        .select(
            "doc_a",
            "doc_b",
            "neighbor_offset",
            ni.alias("n_inter"),
            na.alias("n_a"),
            nb.alias("n_b"),
            jac.alias("jaccard"),
            F.coalesce(jac >= _SN_THRESHOLD, F.lit(False)).alias("is_dup"),
        )
    )
