"""Text-analysis operators over the `documents` table — the
training-data-pipeline surface (BASELINE.json north star): token
counting, quality scoring, language-ID heuristic, fingerprinting.

All pure column expressions (split/filter/transform lambdas run inside
codegen) — no Python UDFs, so these scale to 100 TB of documents with
zero serialization overhead. Score formulas are pure arithmetic (no
transcendentals) so Spark and the DuckDB oracle agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import numeric as N
from ._util import _pin
from .registry import register

#: Stopword list for ratio features (tiny on purpose; a real pipeline
#: would broadcast a dictionary — the plan shape is identical).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

#: Marker vocabularies for the n-gram/keyword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "los", "de"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("de", "le", "shi", "bu"),
}


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def tokens_col():
    """Whitespace tokenization as a column expression."""
    return F.split(F.trim(F.col("text")), r"\s+")


SQL_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"


def quality_score_col():
    """THE quality formula (weights + STOPWORDS), shared by
    text_quality_score, the curation funnel's stage 4, and the corpus
    data card — one definition so the documented same-formula/
    same-threshold invariant can't silently drift when the stop list
    or weights change."""
    w = tokens_col()
    stop = _sql_list(STOPWORDS)
    sr = (
        F.size(
            F.expr(f"filter(split(trim(text), '\\\\s+'), t -> t IN ({stop}))")
        ).cast("double")
        / F.size(w)
    )
    return (
        F.least(F.lit(1.0), F.size(w).cast("double") / 50.0) * 0.4
        + F.least(F.lit(1.0), sr * 4.0) * 0.2
        + (F.size(F.array_distinct(w)).cast("double") / F.size(w)) * 0.4
    )


@register(
    "text_token_stats",
    ops=("P1", "A3", "F10"),
    doc="Token counting: whitespace tokens, distinct tokens, char "
    "counts, mean token length — all codegen column expressions.",
    oracle=f"""
WITH tok AS (SELECT doc_id, lang, text, {SQL_TOKENS} AS w FROM documents)
SELECT doc_id, lang,
  length(text) AS n_chars,
  len(w) AS n_tokens,
  len(list_distinct(w)) AS n_distinct_tokens,
  CAST(length(replace(trim(text), ' ', '')) AS DOUBLE) / len(w) AS avg_token_len
FROM tok
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(w).alias("n_tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
        (
            F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit(""))).cast(
                "double"
            )
            / F.size(w)
        ).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    ops=("P5", "P7", "A3"),
    doc="Document quality scoring: length/stopword/diversity components "
    "combined with pure arithmetic (length-penalty, stopword ratio, "
    "type-token ratio) — the LLM-data quality-filter pattern.",
    oracle=f"""
WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
feat AS (
  SELECT doc_id,
    len(w) AS n_tokens,
    CAST(len(list_filter(w, t -> t IN ({_sql_list(STOPWORDS)}))) AS DOUBLE)
      / len(w) AS stopword_ratio,
    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio
  FROM tok
)
SELECT doc_id, n_tokens, stopword_ratio, type_token_ratio,
  LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
    + LEAST(1.0, stopword_ratio * 4.0) * 0.2
    + type_token_ratio * 0.4 AS quality_score,
  (n_tokens >= 10 AND stopword_ratio > 0.0) AS keep
FROM feat
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    stop_arr = ", ".join(f"'{s}'" for s in STOPWORDS)
    feat = d.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        (
            F.size(F.expr(f"filter(split(trim(text), '\\\\s+'), t -> t IN ({stop_arr}))")).cast(
                "double"
            )
            / F.size(w)
        ).alias("stopword_ratio"),
        (F.size(F.array_distinct(w)).cast("double") / F.size(w)).alias(
            "type_token_ratio"
        ),
    )
    nt = F.col("n_tokens").cast("double")
    sr = F.col("stopword_ratio")
    return feat.select(
        "doc_id",
        "n_tokens",
        "stopword_ratio",
        "type_token_ratio",
        (
            F.least(F.lit(1.0), nt / 50.0) * 0.4
            + F.least(F.lit(1.0), sr * 4.0) * 0.2
            + F.col("type_token_ratio") * 0.4
        ).alias("quality_score"),
        ((F.col("n_tokens") >= 10) & (sr > 0.0)).alias("keep"),
    )


@register(
    "text_langid",
    ops=("P5", "A3"),
    doc="Keyword-marker language identification: score each candidate "
    "language by marker-token hits, argmax with deterministic "
    "preference order; compared against the declared lang column.",
    oracle=f"""
WITH tok AS (SELECT doc_id, lang, {SQL_TOKENS} AS w FROM documents),
scores AS (
  SELECT doc_id, lang,
    {", ".join(f"len(list_filter(w, t -> t IN ({_sql_list(m)}))) AS hits_{lg}" for lg, m in LANG_MARKERS.items())}
  FROM tok
)
SELECT doc_id, lang AS declared_lang,
  CASE
    WHEN {" AND ".join(f"hits_{lg} = 0" for lg in LANG_MARKERS)} THEN 'und'
    {" ".join(f"WHEN hits_{lg} >= GREATEST({', '.join('hits_' + o for o in LANG_MARKERS)}) THEN '{lg}'" for lg in LANG_MARKERS)}
  END AS pred_lang,
  {", ".join(f"hits_{lg}" for lg in LANG_MARKERS)}
FROM scores
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    scores = d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        *[
            F.size(
                F.expr(
                    f"filter(split(trim(text), '\\\\s+'), t -> t IN ({_sql_list(m)}))"
                )
            )
            .cast("long")
            .alias(f"hits_{lg}")
            for lg, m in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    all_zero = None
    for lg in langs:
        c = F.col(f"hits_{lg}") == 0
        all_zero = c if all_zero is None else (all_zero & c)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.when(all_zero, "und")
    for lg in langs:
        pred = pred.when(F.col(f"hits_{lg}") >= best, lg)
    return scores.select(
        "doc_id",
        "declared_lang",
        pred.alias("pred_lang"),
        *[f"hits_{lg}" for lg in langs],
    )


@register(
    "text_fingerprint",
    ops=("F10", "P9"),
    doc="Document fingerprinting: whitespace-normalized lowercase MD5 "
    "plus a 16-bit shard bucket — the partition key a 100 TB dedup "
    "would shuffle on.",
    oracle="""
SELECT doc_id,
  md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
  CAST(CAST('0x' || substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 4) AS BIGINT) AS INT) AS shard_bucket
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = F.md5(norm)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.expr(
            "cast(cast(conv(substr(md5(lower(regexp_replace(trim(text), '\\\\s+', ' '))), 1, 4), 16, 10) as bigint) as int)"
        ).alias("shard_bucket"),
    )


#: GPT-2-style pre-tokenizer approximation: contractions, letter runs,
#: digit runs, punctuation runs, whitespace runs. Same pattern text in
#: Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
#: SQL string literal spelling (single quotes doubled).
_SQL_BPE = BPE_PATTERN.replace("'", "''")


@register(
    "text_bpe_token_count",
    ops=("A3", "P8", "F10"),
    doc="BPE-ish token counting: a GPT-2-style pre-tokenizer regex "
    "(contraction suffixes, letter/digit/punctuation runs) counts the "
    "segments a byte-pair encoder would start from — the standard "
    "fast token-budget estimator for training-data pipelines. Pure "
    "codegen column expressions; compared against whitespace tokens "
    "and chars-per-token.",
    oracle=f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{_SQL_BPE}')) AS n_bpe_tokens,
  len({SQL_TOKENS}) AS n_ws_tokens,
  CAST(length(text) AS DOUBLE)
    / NULLIF(len(regexp_extract_all(text, '{_SQL_BPE}')), 0) AS chars_per_token
FROM documents
""",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    n_bpe = F.size(F.expr(f"regexp_extract_all(text, \"{BPE_PATTERN}\", 0)"))
    return d.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.size(tokens_col()).cast("long").alias("n_ws_tokens"),
        (
            F.length("text").cast("double")
            / F.nullif(n_bpe.cast("long"), F.lit(0))
        ).alias("chars_per_token"),
    )


# --- PII scrub + decontamination: the remaining two stages every
# training-data pipeline runs between raw crawl and tokenizer.

#: Conservative patterns valid in BOTH Java regex (Spark) and RE2
#: (DuckDB): character classes and bounded repetition only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b555-[0-9]{4}\b"

#: The driver's `documents` fixture is clean word-salad, so the query
#: plants one deterministic email + phone per row (derived from
#: doc_id) before scanning — the detector provably fires on every row
#: and the redacted output is still fully deterministic.
_PII_AUGMENT = (
    "text || ' contact user' || doc_id || '@example.com or call "
    "555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'"
)
_SPARK_PII_AUGMENT = (
    "concat(text, ' contact user', doc_id, '@example.com or call 555-', "
    "lpad(cast(doc_id % 10000 as string), 4, '0'), ' now')"
)


@register(
    "text_pii_scrub",
    ops=("P1", "F10", "A1"),
    doc="PII detection + redaction: counts and masks email/phone "
    "matches per document, emitting match counts and the MD5 of the "
    "redacted text. Pure regexp column expressions (Java regex and "
    "RE2 agree on the conservative patterns used) — runs inside "
    "codegen, embarrassingly parallel, no shuffle at all until the "
    "driver collects. A real pipeline swaps in a longer pattern "
    "library; the plan shape is identical.",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_PII_AUGMENT} AS text FROM documents)
SELECT doc_id,
  len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
  len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phones,
  md5(regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                     '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5,
  length(regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                        '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_len
FROM aug
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    aug = d.select("doc_id", F.expr(_SPARK_PII_AUGMENT).alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
        PII_PHONE,
        "<PHONE>",
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).alias("redacted_len"),
    )


@register(
    "text_benchmark_contamination",
    ops=("J2", "J9", "A9"),
    doc="Benchmark decontamination: flags training documents whose "
    "word-3-gram shingles overlap a held-out benchmark set (here "
    "doc_id % 20 == 0 stands in for the benchmark corpus). The "
    "benchmark shingle set is dimension-sized at any training scale, "
    "so the overlap test is a broadcast semi-join against the "
    "benchmark shingles — the 100 TB train side never shuffles except "
    "for its own per-doc count. Frac is an exact int/int division so "
    "both engines round identically.",
    oracle="""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in generate_series(1, len(w)-2)]
  )) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents)
  WHERE len(w) >= 3
), bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
train AS (SELECT * FROM sh WHERE doc_id % 20 <> 0),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_contaminated
  FROM train t WHERE t.sh IN (SELECT sh FROM bench)
  GROUP BY 1
)
SELECT t.doc_id, COUNT(*) AS n_shingles,
  COALESCE(MAX(h.n_contaminated), 0) AS n_contaminated,
  COALESCE(MAX(h.n_contaminated), 0) / COUNT(*) AS contamination_frac,
  COALESCE(MAX(h.n_contaminated), 0) / COUNT(*) >= 0.2 AS contaminated
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
GROUP BY 1
""",
)
def text_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _doc_shingles

    sh = _doc_shingles(spark, sf_dir)
    bench = (
        sh.where(F.col("doc_id") % 20 == 0).select("sh").distinct()
    )
    train = sh.where(F.col("doc_id") % 20 != 0)
    hits = (
        train.join(F.broadcast(bench), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    frac = F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_shingles")
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        frac.alias("contamination_frac"),
        (frac >= 0.2).alias("contaminated"),
    )


@register(
    "text_repetition_filter",
    ops=("P5", "A9", "F10"),
    doc="Repetition-based quality filter (the Gopher-style duplicate "
    "n-gram signal): per document, the fraction of word bigrams that "
    "are repeats of an earlier bigram in the same document. Entirely "
    "array column expressions (transform/array_distinct) inside "
    "codegen — per-row work, no shuffle, linear at any corpus size.",
    oracle="""
WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
bg AS (
  SELECT doc_id, [w[i] || ' ' || w[i+1] for i in generate_series(1, len(w)-1)] AS b
  FROM tok WHERE len(w) >= 2
)
SELECT doc_id,
  len(b) AS n_bigrams,
  len(list_distinct(b)) AS n_distinct_bigrams,
  1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b) AS dup_bigram_frac,
  (1.0 - CAST(len(list_distinct(b)) AS DOUBLE) / len(b)) > 0.05 AS flagged
FROM bg
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    bg = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 2).select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"
        ).alias("b"),
    )
    dup_frac = F.lit(1.0) - F.size(F.array_distinct("b")).cast("double") / F.size("b")
    return bg.select(
        "doc_id",
        F.size("b").alias("n_bigrams"),
        F.size(F.array_distinct("b")).alias("n_distinct_bigrams"),
        dup_frac.alias("dup_bigram_frac"),
        (dup_frac > 0.05).alias("flagged"),
    )


#: Target language mix for the rebalancer (weights sum to 1).
MIX_WEIGHTS = (("en", 0.4), ("zh", 0.2), ("de", 0.15), ("es", 0.15), ("fr", 0.1))
#: Overall sampling budget as a fraction of the corpus.
MIX_BUDGET = 0.5


@register(
    "data_mix_rebalance",
    ops=("O2", "A9", "F12"),
    doc="Training-mix rebalancing: given target per-language weights "
    "and an overall budget, compute per-language keep fractions "
    "(water-filling, capped at 1.0) and select documents with the "
    "same keyed-md5 uniform used by the deterministic samplers — "
    "reproducible on any partitioning, no RNG state. The per-language "
    "plan is a dimension-sized aggregate joined back broadcast; the "
    "membership test is per-row.",
    oracle=f"""
WITH counts AS (SELECT lang, COUNT(*) AS n_avail FROM documents GROUP BY 1),
tot AS (SELECT SUM(n_avail) AS n FROM counts),
w(lang, target_weight) AS (VALUES {", ".join(f"('{lg}', {wt})" for lg, wt in MIX_WEIGHTS)}),
plan AS (
  SELECT c.lang, c.n_avail, w.target_weight,
    LEAST(1.0, CAST((SELECT n FROM tot) AS DOUBLE) * {MIX_BUDGET} * w.target_weight / c.n_avail) AS keep_frac
  FROM counts c JOIN w USING (lang)
),
draw AS (
  SELECT lang, doc_id,
    CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM documents
)
SELECT p.lang, p.n_avail, p.target_weight, p.keep_frac,
  COUNT(CASE WHEN d.u < p.keep_frac THEN 1 END) AS n_kept
FROM draw d JOIN plan p USING (lang)
GROUP BY 1, 2, 3, 4
""",
)
def data_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_avail"))
    total = d.agg(F.count(F.lit(1)).alias("n"))
    weights = F.create_map(
        *[x for lg, wt in MIX_WEIGHTS for x in (F.lit(lg), F.lit(wt))]
    )
    plan = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("target_weight", weights[F.col("lang")])
        .select(
            "lang",
            "n_avail",
            "target_weight",
            F.least(
                F.lit(1.0),
                F.col("n").cast("double")
                * MIX_BUDGET
                * F.col("target_weight")
                / F.col("n_avail"),
            ).alias("keep_frac"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(16**15))
    )
    draw = d.select("lang", u.alias("u"))
    return (
        draw.join(F.broadcast(plan), "lang")
        .groupBy("lang", "n_avail", "target_weight", "keep_frac")
        .agg(F.count(F.when(F.col("u") < F.col("keep_frac"), 1)).alias("n_kept"))
    )


@register(
    "text_bpe_pair_counts",
    ops=("A1", "F10", "O1"),
    doc="One distributed BPE-trainer step (Sennrich et al. 2016 "
    "byte-pair encoding, public algorithm): corpus → word-frequency "
    "table → adjacent symbol-pair counts → top-20 merge candidates. "
    "The word-frequency compression is the trick that makes BPE "
    "trainable at 100 TB: pair counting runs over DISTINCT words "
    "weighted by frequency (vocab-sized, bounded), never over the raw "
    "token stream, and every step is a codegen column expression "
    "(split/explode/transform 2-grams) + hash aggregate — one shuffle "
    "keyed by word, one keyed by pair, then a global top-k.",
    oracle="""
WITH words AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
  FROM documents
), wf AS (
  SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w
), pos AS (
  SELECT w, freq,
         unnest(generate_series(1, length(w) - 1)) AS i
  FROM wf WHERE length(w) >= 2
), pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, freq FROM pos
), agg AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM pairs GROUP BY pair
)
SELECT pair, pair_count FROM agg
ORDER BY pair_count DESC, pair
LIMIT 20
""",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    words = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("pair_count"))
    return agg.orderBy(F.desc("pair_count"), F.asc("pair")).limit(20)


@register(
    "text_bigram_perplexity",
    ops=("A3", "F10", "J1"),
    doc="LM-based quality filtering (the CCNet-style perplexity "
    "filter every large-corpus pipeline runs before training): an "
    "add-0.1-smoothed bigram model is fit on the corpus itself — "
    "bigram and unigram-context counts plus vocabulary size, all "
    "plain aggregates — and every document is scored by its mean "
    "negative log-probability; kept = score <= 3.4. The count tables "
    "are vocabulary-bounded (Zipf), orders of magnitude smaller than "
    "the corpus, so the two count shuffles and the score join scale; "
    "the vocab size is a broadcast scalar; no Python UDFs. Per-bigram "
    "log-probs are rounded to 4 decimals BEFORE averaging (ln is the "
    "one non-IEEE-pinned op between JVM and libm) and the per-doc "
    "mean uses dravg (half-up round of the exact decimal sum/count "
    "in integer arithmetic), so the score is bitwise reproducible "
    "on any partitioning — ROUND(double,4) of the mean is NOT, at "
    "ties (x8 campaign find) — same recipe as the trig "
    "columns in mlops. Swap the self-trained counts for a reference "
    "LM's n-gram table to reproduce CCNet exactly: the plan shape "
    "(count join -> score -> per-doc agg) is identical.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
),
bg AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id, unnest(list_zip(w[:len(w)-1], w[2:])) AS p FROM tok)
),
c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(n12) AS n1 FROM c12 GROUP BY 1),
v AS (
  SELECT COUNT(DISTINCT t) AS vocab
  FROM (SELECT unnest(w) AS t FROM tok)
),
scored AS (
  SELECT bg.doc_id,
         ROUND(-LN((c12.n12 + 0.1) / (c1.n1 + 0.1 * v.vocab)), 4) AS nll
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         {N.sql_dravg("nll")} AS avg_neg_logprob
  FROM scored GROUP BY 1
)
SELECT doc_id, n_bigrams, avg_neg_logprob,
       avg_neg_logprob <= 3.4 AS kept
FROM per_doc
""",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select("doc_id", tokens_col().alias("w"))
    bg = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
                " slice(w, 2, greatest(size(w) - 1, 0)),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = tok.select(F.explode("w").alias("t")).agg(
        F.countDistinct("t").alias("vocab")
    )
    prob = (F.col("n12") + 0.1) / (F.col("n1") + 0.1 * F.col("vocab"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", F.round(-F.log(prob), 4).alias("nll"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            N.dravg("nll").alias("avg_neg_logprob"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "avg_neg_logprob",
            (F.col("avg_neg_logprob") <= 3.4).alias("kept"),
        )
    )


@register(
    "text_tfidf_keywords",
    ops=("A3", "W4", "J1"),
    doc="Document keyword extraction: top-3 terms per document by "
    "tf-idf (idf = ln(N/df), both factors rounded to 4 decimals so "
    "JVM and libm ln agree bitwise — same recipe as the bigram LM). "
    "The df table is vocabulary-bounded and the per-doc ranking is "
    "one window over (doc_id), so the plan is two token-keyed "
    "shuffles plus a partition-parallel row_number — no UDFs, no "
    "driver loops. The standard labeling/routing primitive when a "
    "corpus needs topic-ish keys without an embedding model.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ROUND(LN(CAST(n.n_docs AS DOUBLE) / df.df), 4), 4)
           AS tf_idf
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, rnk, term, tf_idf FROM (
  SELECT doc_id, term, tf_idf,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY tf_idf DESC, term
         ) AS rnk
  FROM scored
) WHERE rnk <= 3
""",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 4)
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", F.round(F.col("tf") * idf, 4).alias("tf_idf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tf_idf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("rnk").cast("long").alias("rnk"), "term", "tf_idf")
    )


@register(
    "text_inverted_index",
    ops=("A2", "A1", "F10"),
    doc="Inverted-index build: token -> document frequency, collection "
    "frequency, and a bounded sorted posting sample (first 5 doc_ids "
    "as CSV). df is derived from the collected distinct-doc set "
    "(size(collect_set)) so the whole row is ONE hash aggregate "
    "keyed by term — no separate COUNT(DISTINCT) expand. Postings "
    "are per-term state bounded by the sample slice; full postings "
    "would partition by term range at 100 TB (standard sharded "
    "index build).",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
)
SELECT term,
       CAST(len(list_distinct(list(doc_id))) AS BIGINT) AS df,
       COUNT(*) AS cf,
       array_to_string(list_sort(list_distinct(list(doc_id)))[1:5], ',')
         AS sample_postings
FROM tok
GROUP BY term
HAVING len(list_distinct(list(doc_id))) >= 2
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    docs = F.array_sort(F.collect_set("doc_id"))
    return (
        tok.groupBy("term")
        .agg(
            F.size(docs).cast("bigint").alias("df"),
            F.count(F.lit(1)).alias("cf"),
            F.array_join(F.slice(docs, 1, 5), ",").alias("sample_postings"),
        )
        .filter(F.col("df") >= 2)
    )


#: BM25 constants and the fixed benchmark query.
BM25_K1, BM25_B = 1.2, 0.75
BM25_QUERY = ("window", "hash", "merge")


@register(
    "text_bm25_topk",
    ops=("A3", "W4", "O1"),
    doc="BM25 retrieval for a fixed 3-term query: Okapi BM25 with "
    "k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1) rounded to 4 "
    "decimals (the cross-engine ln recipe shared with tf-idf and "
    "the bigram LM), per-term scores summed through DECIMAL so the "
    "3-term addition order can't flip last bits. The term filter is "
    "applied BEFORE the tf aggregate, so only query-term postings "
    "shuffle — the plan cost is O(df(query)), not O(corpus), which "
    "is exactly how a distributed grep-rank should behave.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
dl AS (SELECT doc_id, len({SQL_TOKENS}) AS dl FROM documents),
stats AS (
  SELECT COUNT(*) AS n_docs,
         ROUND(CAST(SUM(len({SQL_TOKENS})) AS DOUBLE) / COUNT(*), 4) AS avgdl
  FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('window', 'hash', 'merge')
  GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         ROUND(
           ROUND(LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0), 4)
           * tf.tf / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl.dl / s.avgdl)), 4) AS term_score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats s
)
SELECT doc_id, rnk, score FROM (
  SELECT doc_id,
         CAST(SUM(CAST(term_score AS DECIMAL(18,4))) AS DOUBLE) AS score,
         ROW_NUMBER() OVER (
           ORDER BY CAST(SUM(CAST(term_score AS DECIMAL(18,4))) AS DOUBLE)
                    DESC, doc_id) AS rnk
  FROM scored GROUP BY doc_id
) WHERE rnk <= 20
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents", spread=True)
    dl = d.select("doc_id", F.size(tokens_col()).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.size(tokens_col())).cast("double") / F.count(F.lit(1)), 4
        ).alias("avgdl"),
    )
    tok = d.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = (
        tok.filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
        4,
    )
    term_score = F.round(
        idf
        * F.col("tf")
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        4,
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.col("term_score").cast("decimal(18,4)"))
        .cast("double")
        .alias("score")
    )
    # Scale-safe top-k (r10, guide §2.4): orderBy+limit plans as
    # TakeOrderedAndProject (per-partition top-20, merged on the
    # driver) instead of a global row_number window that single-
    # partition-sorts EVERY matching doc; the rank is then rebuilt by
    # the same total order over the 20 surviving rows — identical
    # output (the (score desc, doc_id) order is total).
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    top = agg.orderBy(F.col("score").desc(), "doc_id").limit(20)
    return top.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("rnk"),
        "score",
    )


#: Word 5-gram shingles for boilerplate detection (0-based Spark
#: arrays / 1-based DuckDB lists — same strings out of both).
_SPARK_SH5 = (
    "transform(sequence(0, size(w)-5), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))"
)
_SQL_SH5 = (
    "[w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] "
    "for i in generate_series(1, len(w)-4)]"
)


@register(
    "text_boilerplate_prune",
    ops=("A1", "A9", "J1", "F10"),
    doc="Boilerplate pruning (the CCNet/RefinedWeb repeated-paragraph "
    "filter re-cast at shingle granularity): a word 5-gram occurring "
    "in 2+ distinct documents is corpus boilerplate; each document "
    "reports what fraction of its distinct shingles are boilerplate "
    "and a keep flag at ratio <= 0.5. Two linear passes — explode "
    "distinct shingles, one df aggregate, one hash join back — no "
    "pairwise comparison anywhere, so cost is O(corpus tokens) and "
    "the df table is vocabulary-bounded (Zipf) at 100 TB.",
    oracle=f"""
WITH pairs AS (
  SELECT doc_id, unnest(list_distinct({_SQL_SH5})) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents)
  WHERE len(w) >= 5
),
df AS (
  SELECT sh, COUNT(*) AS n_docs FROM pairs GROUP BY sh
),
scored AS (
  SELECT p.doc_id,
    COUNT(*) AS n_shingles,
    SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS n_boiler
  FROM pairs p JOIN df d ON p.sh = d.sh
  GROUP BY p.doc_id
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
  CAST(n_boiler AS BIGINT) AS n_boiler,
  CAST(n_boiler AS DOUBLE) / n_shingles AS boiler_ratio,
  (CAST(n_boiler AS DOUBLE) / n_shingles) <= 0.5 AS keep
FROM scored
""",
)
def text_boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    pairs = (
        d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
        .filter(F.size("w") >= 5)
        .select("doc_id", F.explode(F.array_distinct(F.expr(_SPARK_SH5))).alias("sh"))
    )
    # pairs is distinct per (doc, shingle), so df = plain COUNT(*).
    df_counts = pairs.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        pairs.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("n_docs") >= 2).cast("int")).cast("bigint").alias("n_boiler"),
        )
    )
    ratio = F.col("n_boiler").cast("double") / F.col("n_shingles")
    return scored.select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        ratio.alias("boiler_ratio"),
        (ratio <= 0.5).alias("keep"),
    )


from .registry import _REGISTRY as _TXT_REGISTRY  # noqa: E402

#: BM25 oracle spliced in as the `bm` CTE (a CTE body may carry its
#: own WITH clause in DuckDB).
_BM25_ORACLE = _TXT_REGISTRY["text_bm25_topk"].oracle


@register(
    "retrieval_rrf_fusion",
    ops=("W4", "O1", "A9", "J5"),
    doc="Hybrid retrieval via reciprocal-rank fusion (the RAG-stack "
    "standard): BM25 top-20 and a length-normalized query-likelihood "
    "top-20 for the same 3-term query are fused by "
    "RRF(d) = Σ 1/(60 + rank_r(d)), full-outer-joined on doc so a "
    "doc ranked by either ranker participates. Both rankers' costs "
    "track query-term posting lists, the fusion join touches 40 "
    "rows — at 100 TB the fusion stage is free and each ranker "
    "scales independently.",
    oracle=f"""
WITH bm AS ({{bm}}),
tok AS (
  SELECT doc_id, unnest({SQL_TOKENS}) AS term FROM documents
),
dl AS (SELECT doc_id, len({SQL_TOKENS}) AS dl FROM documents),
qtf AS (
  SELECT doc_id, COUNT(*) AS tf_sum FROM tok
  WHERE term IN ({{terms}})
  GROUP BY doc_id
),
ql AS (
  SELECT doc_id, rnk FROM (
    SELECT q.doc_id,
      ROW_NUMBER() OVER (
        ORDER BY CAST(q.tf_sum AS DOUBLE) / d.dl DESC, q.doc_id) AS rnk
    FROM qtf q JOIN dl d USING (doc_id)
  ) WHERE rnk <= 20
),
fused AS (
  SELECT COALESCE(bm.doc_id, ql.doc_id) AS doc_id,
    bm.rnk AS bm_rank, ql.rnk AS ql_rank,
    COALESCE(1.0 / (60 + bm.rnk), 0.0)
      + COALESCE(1.0 / (60 + ql.rnk), 0.0) AS rrf_score
  FROM bm FULL OUTER JOIN ql ON bm.doc_id = ql.doc_id
)
SELECT doc_id, bm_rank, ql_rank, rrf_score, fused_rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank
  FROM fused
) WHERE fused_rank <= 10
""".format(
        bm=_BM25_ORACLE,
        terms=_sql_list(BM25_QUERY),
    ),
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    bm = text_bm25_topk(spark, sf_dir).select("doc_id", F.col("rnk").alias("bm_rank"))
    d = table(spark, sf_dir, "documents", spread=True)
    dl = d.select("doc_id", F.size(tokens_col()).alias("dl"))
    qtf = (
        d.select("doc_id", F.explode(tokens_col()).alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf_sum"))
    )
    # Scale-safe top-k (r10): orderBy+limit (TakeOrderedAndProject)
    # replaces a global row_number window over every query-matching
    # doc; the rank is rebuilt over the 20 survivors — identical under
    # the total (score desc, doc_id) order. The downstream fused frame
    # is ≤ 40 rows, so its rank window is already bounded.
    ql_ord = (
        (F.col("tf_sum").cast("double") / F.col("dl")).desc(),
        F.col("doc_id").asc(),
    )
    ql_w = Window.orderBy(*ql_ord)
    ql = (
        qtf.join(dl, "doc_id")
        .orderBy(*ql_ord)
        .limit(20)
        .withColumn("ql_rank", F.row_number().over(ql_w))
        .select("doc_id", "ql_rank")
    )
    fused = bm.join(ql, "doc_id", "full_outer").select(
        "doc_id",
        "bm_rank",
        "ql_rank",
        (
            F.coalesce(1.0 / (60 + F.col("bm_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("ql_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    fw = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(fw))
        .filter(F.col("fused_rank") <= 10)
        .select("doc_id", "bm_rank", "ql_rank", "rrf_score", "fused_rank")
    )



#: text_langid oracle, spliced as a CTE by the confusion-matrix op.
_LANGID_ORACLE = _TXT_REGISTRY["text_langid"].oracle


@register(
    "langid_confusion_matrix",
    ops=("A1", "A9", "J1"),
    doc="Language-ID evaluation: the marker-based predictor's "
    "confusion matrix against the declared lang column, with "
    "per-declared-language recall on the diagonal cells. The "
    "classifier evaluation every corpus pipeline runs before "
    "trusting a language filter; one aggregate over the per-doc "
    "predictions, output <= |langs|² rows.",
    oracle=f"""
WITH pred AS ({_LANGID_ORACLE}),
cells AS (
  SELECT declared_lang, pred_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY 1, 2
),
totals AS (
  SELECT declared_lang, SUM(n_docs) AS n_declared
  FROM cells GROUP BY declared_lang
)
SELECT c.declared_lang, c.pred_lang, CAST(c.n_docs AS BIGINT) AS n_docs,
  CAST(t.n_declared AS BIGINT) AS n_declared,
  CAST(c.n_docs AS DOUBLE) / t.n_declared AS cell_rate,
  c.declared_lang = c.pred_lang AS is_correct
FROM cells c JOIN totals t ON c.declared_lang = t.declared_lang
""",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_langid(spark, sf_dir)
    cells = pred.groupBy("declared_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = cells.groupBy("declared_lang").agg(
        F.sum("n_docs").alias("n_declared")
    )
    return cells.join(F.broadcast(totals), "declared_lang").select(
        "declared_lang",
        "pred_lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_declared").cast("bigint").alias("n_declared"),
        (F.col("n_docs").cast("double") / F.col("n_declared")).alias("cell_rate"),
        (F.col("declared_lang") == F.col("pred_lang")).alias("is_correct"),
    )


@register(
    "quality_decile_calibration",
    ops=("W8", "A9", "A3"),
    doc="Quality-filter calibration: documents deciled by THE shared "
    "quality formula (textops.quality_score_col — same definition the "
    "filter and the curation funnel use), each decile reporting its "
    "score range and the keep-rule hit rate. A filter whose keep rate "
    "doesn't rise monotonically with the score decile has a broken "
    "formula — this is the one-glance check. NTILE over a "
    "deterministically tiebroken order; one window + one aggregate.",
    oracle=f"""
WITH tok AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
feat AS (
  SELECT doc_id,
    len(w) AS n_tokens,
    CAST(len(list_filter(w, t -> t IN ({_sql_list(STOPWORDS)}))) AS DOUBLE)
      / len(w) AS stopword_ratio,
    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS type_token_ratio
  FROM tok
),
scored AS (
  SELECT doc_id, n_tokens, stopword_ratio,
    LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) * 0.4
      + LEAST(1.0, stopword_ratio * 4.0) * 0.2
      + type_token_ratio * 0.4 AS q
  FROM feat
),
deciled AS (
  SELECT doc_id, q, (n_tokens >= 10 AND stopword_ratio > 0.0) AS keep,
    NTILE(10) OVER (ORDER BY q, doc_id) AS decile
  FROM scored
)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
  MIN(q) AS min_score, MAX(q) AS max_score,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS keep_rate
FROM deciled GROUP BY decile
""",
)
def quality_decile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    stop = _sql_list(STOPWORDS)
    sr = (
        F.size(
            F.expr(f"filter(split(trim(text), '\\\\s+'), t -> t IN ({stop}))")
        ).cast("double")
        / F.size(w)
    )
    scored = d.select(
        "doc_id",
        quality_score_col().alias("q"),
        ((F.size(w) >= 10) & (sr > 0.0)).alias("keep"),
    )
    # NTILE(10) over the corpus (entity-scaled) via the distributed
    # two-phase range rank + exact NTILE formula — no single-partition
    # window; (q, doc_id) is a total order.
    from ..functions.ranking import ntile_from_rank, two_phase_rank

    deciled = two_phase_rank(
        scored, ("q", "doc_id"), rank_col="_rn", n_col="_nd"
    ).withColumn("decile", ntile_from_rank(F.col("_rn"), F.col("_nd"), 10))
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("q").alias("min_score"),
        F.max("q").alias("max_score"),
        (
            F.sum(F.col("keep").cast("int")).cast("double") / F.count(F.lit(1))
        ).alias("keep_rate"),
    )


@register(
    "tokenizer_fertility",
    ops=("A3", "A9", "F10"),
    doc="Tokenizer fertility audit: per (lang, source) corpus slice, "
    "the ratio of BPE-ish pre-tokens to whitespace words (fertility — "
    "how many subword tokens the tokenizer spends per word) and "
    "chars-per-BPE-token, from EXACT integer token totals (the "
    "division is one per-group double op, deterministic). The "
    "standard multi-lingual token-budget planner: a high-fertility "
    "slice burns training budget, a sub-1 slice signals whitespace-"
    "free noise. Pure codegen token counts + one hash agg.",
    oracle=f"""
SELECT lang, source,
  COUNT(*) AS n_docs,
  CAST(SUM(len(regexp_extract_all(text, '{_SQL_BPE}'))) AS BIGINT) AS total_bpe_tokens,
  CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS total_ws_tokens,
  CAST(SUM(len(regexp_extract_all(text, '{_SQL_BPE}'))) AS DOUBLE)
    / CAST(SUM(len({SQL_TOKENS})) AS DOUBLE) AS fertility,
  CAST(SUM(length(text)) AS DOUBLE)
    / CAST(SUM(len(regexp_extract_all(text, '{_SQL_BPE}'))) AS DOUBLE)
    AS chars_per_bpe_token
FROM documents
GROUP BY lang, source
""",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    n_bpe = F.size(F.expr(f'regexp_extract_all(text, "{BPE_PATTERN}", 0)')).cast("long")
    n_ws = F.size(tokens_col()).cast("long")
    per_doc = d.select(
        "lang", "source", n_bpe.alias("nb"), n_ws.alias("nw"),
        F.length("text").cast("long").alias("nc"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").cast("long").alias("total_bpe_tokens"),
        F.sum("nw").cast("long").alias("total_ws_tokens"),
        (F.sum("nb").cast("double") / F.sum("nw").cast("double")).alias("fertility"),
        (F.sum("nc").cast("double") / F.sum("nb").cast("double")).alias(
            "chars_per_bpe_token"
        ),
    )


# --- temperature sampling, script profile, taxonomy tagging -----------------

#: Temperature exponent for source-balanced sampling (τ = 0.5 →
#: p_i ∝ √n_i, the multilingual-LM sampling rule of Conneau & Lample
#: 2019, arXiv:1901.07291). √ is IEEE-correctly-rounded in both
#: engines; the normalizer folds the per-source terms in sorted
#: source order so the double sum is bitwise reproducible.
TEMP_BUDGET = 0.5  #: overall corpus keep fraction


@register(
    "data_mix_temperature",
    ops=("A1", "A9", "F12", "O2"),
    doc="Temperature-based mixture sampling: per-source sampling "
    "weights p_i ∝ n_i^0.5 (τ=0.5 upsamples low-resource sources, "
    "downsamples the head), normalized by a fold over the per-source "
    "√counts in sorted source order (deterministic double sum), then "
    "a keyed-md5 uniform draw selects documents at keep_frac = "
    "min(1, budget·N·p_i/n_i). The per-source plan is a "
    "dimension-sized aggregate; membership is a per-row hash test — "
    "one corpus scan + one broadcast join at any scale.",
    oracle=f"""
WITH counts AS (SELECT source, COUNT(*) AS n_avail FROM documents GROUP BY 1),
norm AS (
  SELECT list_reduce(list(sqrt(CAST(n_avail AS DOUBLE)) ORDER BY source),
                     (x, y) -> x + y) AS s,
         SUM(n_avail) AS n_total
  FROM counts
),
plan AS (
  SELECT c.source, c.n_avail,
    CAST(c.n_avail AS DOUBLE) / n.n_total AS raw_share,
    sqrt(CAST(c.n_avail AS DOUBLE)) / n.s AS temp_weight,
    LEAST(1.0, CAST(n.n_total AS DOUBLE) * {TEMP_BUDGET}
                 * (sqrt(CAST(c.n_avail AS DOUBLE)) / n.s) / c.n_avail)
      AS keep_frac
  FROM counts c, norm n
),
draw AS (
  SELECT source, doc_id,
    CAST(concat('0x', substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0 AS u
  FROM documents
)
SELECT p.source, p.n_avail, ROUND(p.raw_share, 9) AS raw_share,
  ROUND(p.temp_weight, 9) AS temp_weight, p.keep_frac,
  COUNT(CASE WHEN d.u < p.keep_frac THEN 1 END) AS n_kept
FROM draw d JOIN plan p USING (source)
GROUP BY 1, 2, 3, 4, 5
""",
)
def data_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_avail"))
    norm = counts.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("source", F.sqrt(F.col("n_avail").cast("double")).alias("r")))
                ),
                lambda s: s["r"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
        F.sum("n_avail").alias("n_total"),
    )
    rt = F.sqrt(F.col("n_avail").cast("double"))
    plan = counts.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_avail",
        F.round(F.col("n_avail").cast("double") / F.col("n_total"), 9).alias("raw_share"),
        F.round(rt / F.col("s"), 9).alias("temp_weight"),
        F.least(
            F.lit(1.0),
            F.col("n_total").cast("double")
            * F.lit(TEMP_BUDGET)
            * (rt / F.col("s"))
            / F.col("n_avail"),
        ).alias("keep_frac"),
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("bigint")
        / F.lit(1152921504606846976.0)
    )
    draw = d.select("source", "doc_id", u.alias("u"))
    return (
        draw.join(F.broadcast(plan), "source")
        .groupBy("source", "n_avail", "raw_share", "temp_weight", "keep_frac")
        .agg(F.count(F.when(F.col("u") < F.col("keep_frac"), 1)).alias("n_kept"))
    )


@register(
    "script_char_classes",
    ops=("P1", "P5", "A3", "F9"),
    doc="Character-class / script profile per document: letter, "
    "digit, whitespace, punctuation and non-ASCII ratios via "
    "regexp strip-and-measure (length of the class-only residue), "
    "plus a dominant-class verdict — the code/prose/noise router "
    "that decides which cleaning pipeline a crawled doc enters. "
    "Pure codegen regexp expressions, embarrassingly parallel.",
    oracle="""
WITH cls AS (
  SELECT doc_id, lang, length(text) AS n_chars,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_letter,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
    length(regexp_replace(text, '[^ \\t\\n]', '', 'g')) AS n_space,
    length(regexp_replace(text, '[A-Za-z0-9 \\t\\n]', '', 'g')) AS n_other
  FROM documents
)
SELECT doc_id, lang, n_chars,
  CAST(n_letter AS DOUBLE) / n_chars AS letter_ratio,
  CAST(n_digit AS DOUBLE) / n_chars AS digit_ratio,
  CAST(n_space AS DOUBLE) / n_chars AS space_ratio,
  CAST(n_other AS DOUBLE) / n_chars AS other_ratio,
  CASE WHEN n_letter >= n_digit AND n_letter >= n_other THEN 'prose'
       WHEN n_digit > n_letter AND n_digit >= n_other THEN 'numeric'
       ELSE 'symbolic' END AS char_class
FROM cls
""",
)
def script_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)

    def residue(pat: str):
        return F.length(F.regexp_replace(F.col("text"), pat, ""))

    cls = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        residue(r"[^A-Za-z]").alias("n_letter"),
        residue(r"[^0-9]").alias("n_digit"),
        residue("[^ \t\n]").alias("n_space"),
        residue("[A-Za-z0-9 \t\n]").alias("n_other"),
    )
    return cls.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("n_letter").cast("double") / F.col("n_chars")).alias("letter_ratio"),
        (F.col("n_digit").cast("double") / F.col("n_chars")).alias("digit_ratio"),
        (F.col("n_space").cast("double") / F.col("n_chars")).alias("space_ratio"),
        (F.col("n_other").cast("double") / F.col("n_chars")).alias("other_ratio"),
        F.when(
            (F.col("n_letter") >= F.col("n_digit"))
            & (F.col("n_letter") >= F.col("n_other")),
            F.lit("prose"),
        )
        .when(
            (F.col("n_digit") > F.col("n_letter"))
            & (F.col("n_digit") >= F.col("n_other")),
            F.lit("numeric"),
        )
        .otherwise(F.lit("symbolic"))
        .alias("char_class"),
    )


#: Tiny keyword taxonomy (category → trigger words). A production
#: pipeline broadcasts a dictionary of thousands of FlashText-style
#: triggers; the plan shape — broadcast list, per-row token-set
#: membership count, explode only matching (doc, category) pairs — is
#: identical at that size.
TAXONOMY = (
    ("engine", ("spark", "hash", "scan", "sort", "merge")),
    ("storage", ("table", "row", "part", "batch", "line")),
    ("query", ("key", "value", "agg", "window", "filter")),
)


@register(
    "keyword_tag_taxonomy",
    ops=("F10", "A1", "A3", "P5"),
    doc="Keyword-taxonomy tagging: each document is scored against a "
    "broadcast category→keywords dictionary by counting token hits "
    "(with multiplicity) inside a codegen filter lambda; only "
    "matching (doc, category) pairs survive. Per-category reach "
    "(docs tagged, total hits, hit rate) comes out of one hash agg. "
    "The dictionary is driver-side literal — no join against the "
    "corpus, one scan at any scale.",
    oracle=f"""
WITH tax(category, kws) AS (VALUES {", ".join(f"('{c}', {list(k)!r}::VARCHAR[])".replace('"', "'") for c, k in TAXONOMY)}),
tok AS (SELECT doc_id, {SQL_TOKENS} AS w FROM documents),
hits AS (
  SELECT t.doc_id, x.category,
         len(list_filter(t.w, tk -> list_contains(x.kws, tk))) AS n_hits
  FROM tok t CROSS JOIN tax x
)
SELECT category,
  COUNT(CASE WHEN n_hits > 0 THEN 1 END) AS n_docs_tagged,
  CAST(SUM(n_hits) AS BIGINT) AS total_hits,
  CAST(COUNT(CASE WHEN n_hits > 0 THEN 1 END) AS DOUBLE) / COUNT(*) AS doc_hit_rate
FROM hits
GROUP BY 1
""",
)
def keyword_tag_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    hits = d.select(
        "doc_id",
        *[
            F.size(
                F.expr(
                    f"filter(split(trim(text), '\\\\s+'), t -> t IN ({_sql_list(kws)}))"
                )
            ).alias(f"h_{cat}")
            for cat, kws in TAXONOMY
        ],
    )
    long = hits.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cat).alias("category"), F.col(f"h_{cat}").alias("n_hits")
                    )
                    for cat, _ in TAXONOMY
                ]
            )
        ).alias("x"),
    ).select("doc_id", "x.category", "x.n_hits")
    return long.groupBy("category").agg(
        F.count(F.when(F.col("n_hits") > 0, 1)).alias("n_docs_tagged"),
        F.sum("n_hits").cast("bigint").alias("total_hits"),
        (
            F.count(F.when(F.col("n_hits") > 0, 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("doc_hit_rate"),
    )


#: "Tokenizer vocabulary" size for the OOV audit: the top-V corpus
#: tokens by (count desc, token) — deterministic, stands in for a
#: shipped tokenizer's vocab file.
OOV_VOCAB_SIZE = 40


@register(
    "vocab_oov_rate",
    ops=("A1", "A9", "J9", "O1"),
    doc="Out-of-vocabulary audit: token stream joined (broadcast "
    "semi) against a top-V frequency vocabulary — per (lang, source) "
    "slice, the token-level and type-level OOV rates that decide "
    "whether a tokenizer's vocab transfers to a new corpus slice. "
    "The vocab is dimension-sized by construction (V entries); the "
    "audit is one scan + one hash agg.",
    oracle=f"""
WITH tok AS (
  SELECT lang, source, unnest({SQL_TOKENS}) AS t FROM documents
),
vocab AS (
  SELECT t FROM (
    SELECT t, COUNT(*) AS n FROM tok GROUP BY 1
    ORDER BY n DESC, t LIMIT {OOV_VOCAB_SIZE}
  )
),
marked AS (
  SELECT tok.lang, tok.source, tok.t, v.t IS NOT NULL AS in_vocab
  FROM tok LEFT JOIN vocab v ON tok.t = v.t
)
SELECT lang, source,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS BIGINT) AS n_oov,
  CAST(COUNT(CASE WHEN NOT in_vocab THEN 1 END) AS DOUBLE) / COUNT(*)
    AS oov_token_rate,
  CAST(COUNT(DISTINCT CASE WHEN NOT in_vocab THEN t END) AS BIGINT)
    AS n_oov_types
FROM marked
GROUP BY 1, 2
""",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select("lang", "source", F.explode(tokens_col()).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t")
        .limit(OOV_VOCAB_SIZE)
        .select("t")
    )
    marked = tok.join(
        F.broadcast(vocab.withColumnRenamed("t", "vt")),
        tok.t == F.col("vt"),
        "left",
    ).select("lang", "source", "t", F.col("vt").isNotNull().alias("in_vocab"))
    oov = F.count(F.when(~F.col("in_vocab"), 1))
    return marked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        oov.cast("bigint").alias("n_oov"),
        (oov.cast("double") / F.count(F.lit(1))).alias("oov_token_rate"),
        F.countDistinct(F.when(~F.col("in_vocab"), F.col("t")))
        .cast("bigint")
        .alias("n_oov_types"),
    )


#: Dirichlet prior strength for the log-odds-ratio comparison.
LOR_ALPHA = 0.5


@register(
    "source_distinctive_terms",
    ops=("A1", "A9", "W4", "O1"),
    doc="Distinctive vocabulary per source via log-odds-ratio with an "
    "informative Dirichlet prior (Monroe, Colaresi & Quinn 2008 — "
    "'Fightin' Words'): each source's token counts are compared "
    "against the rest of the corpus, the corpus-wide frequencies act "
    "as the prior, and terms are ranked by the variance-normalized "
    "log-odds z-score. Surfaces what makes each slice linguistically "
    "different — the eyeball tool for source curation. ln and sqrt "
    "go through the rounded-transcendental recipe; the count tables "
    "are vocabulary-bounded, so the whole analysis runs on frames "
    "orders of magnitude smaller than the corpus.",
    oracle=f"""
WITH tok AS (SELECT source, unnest({SQL_TOKENS}) AS t FROM documents),
cnt AS (SELECT source, t, COUNT(*) AS n FROM tok GROUP BY 1, 2),
corpus AS (SELECT t, SUM(n) AS n_all FROM cnt GROUP BY 1),
totals AS (SELECT source, SUM(n) AS n_src FROM cnt GROUP BY 1),
grand AS (SELECT SUM(n_all) AS n_grand FROM corpus),
scored AS (
  SELECT c.source, c.t,
    ROUND(
      ROUND(LN((c.n + {LOR_ALPHA} * co.n_all)
             / (ts.n_src + {LOR_ALPHA} * g.n_grand - c.n - {LOR_ALPHA} * co.n_all)), 4)
      - ROUND(LN((co.n_all - c.n + {LOR_ALPHA} * co.n_all)
             / (g.n_grand - ts.n_src + {LOR_ALPHA} * g.n_grand
                - (co.n_all - c.n) - {LOR_ALPHA} * co.n_all)), 4), 4) AS delta,
    ROUND(SQRT(1.0 / (c.n + {LOR_ALPHA} * co.n_all)
             + 1.0 / (co.n_all - c.n + {LOR_ALPHA} * co.n_all)), 4) AS sd
  FROM cnt c
  JOIN corpus co ON c.t = co.t
  JOIN totals ts ON c.source = ts.source
  CROSS JOIN grand g
),
ranked AS (
  SELECT source, t AS term, ROUND(delta / sd, 4) AS zscore,
    ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY ROUND(delta / sd, 4) DESC, t) AS rnk
  FROM scored
)
SELECT source, term, zscore, rnk FROM ranked WHERE rnk <= 5
""",
)
def source_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select("source", F.explode(tokens_col()).alias("t"))
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    corpus = cnt.groupBy("t").agg(F.sum("n").alias("n_all"))
    totals = cnt.groupBy("source").agg(F.sum("n").alias("n_src"))
    grand = corpus.agg(F.sum("n_all").alias("n_grand"))
    a = F.lit(LOR_ALPHA)
    joined = (
        cnt.join(corpus, "t")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
    )
    num1 = (F.col("n") + a * F.col("n_all"))
    den1 = (
        F.col("n_src") + a * F.col("n_grand") - F.col("n") - a * F.col("n_all")
    )
    rest = F.col("n_all") - F.col("n")
    num2 = rest + a * F.col("n_all")
    den2 = (
        F.col("n_grand") - F.col("n_src") + a * F.col("n_grand")
        - rest - a * F.col("n_all")
    )
    delta = F.round(
        F.round(F.log(num1 / den1), 4) - F.round(F.log(num2 / den2), 4), 4
    )
    sd = F.round(F.sqrt(1.0 / num1 + 1.0 / num2), 4)
    scored = joined.select(
        "source", F.col("t").alias("term"), F.round(delta / sd, 4).alias("zscore")
    )
    w = Window.partitionBy("source").orderBy(F.desc("zscore"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "vocab_zipf_fit",
    ops=("A3", "W4", "A9"),
    doc="Zipf's-law fit over the corpus vocabulary: regress "
    "ln(frequency) on ln(rank) (rank by frequency desc, term "
    "tiebreak) and report the fitted exponent — the one-number "
    "vocabulary-health check (natural text ≈ −1; synthetic or "
    "template-heavy corpora flatten toward 0). Both logs are "
    "rounded to 4 dp (the cross-engine ln recipe) and the OLS "
    "sufficient statistics are summed in DECIMAL, so slope and "
    "intercept are bitwise-deterministic. Everything after the "
    "token count runs on a vocabulary-sized frame.",
    oracle=f"""
WITH tok AS (SELECT unnest({SQL_TOKENS}) AS t FROM documents),
freq AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
ranked AS (
  SELECT ROUND(LN(ROW_NUMBER() OVER (ORDER BY n DESC, t)), 4) AS x,
         ROUND(LN(n), 4) AS y
  FROM freq
),
s AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(y AS DECIMAL(18,4)))
              AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(18,4)))
              AS VARCHAR) AS DOUBLE) AS sxx
  FROM ranked
)
SELECT k AS vocab_size,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) AS zipf_slope,
       ROUND((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k, 4)
         AS intercept
FROM s
""",
)
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import two_phase_rank

    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(F.explode(tokens_col()).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    # Vocabulary rank via the distributed two-phase range rank —
    # (n desc, t) is a total order, no single-partition window.
    ranked = two_phase_rank(
        freq, (F.col("n").desc(), "t"), rank_col="_rnk"
    ).select(
        F.round(F.log(F.col("_rnk").cast("double")), 4).alias("x"),
        F.round(F.log("n"), 4).alias("y"),
    )
    xd = F.col("x").cast("decimal(18,4)")
    yd = F.col("y").cast("decimal(18,4)")
    s = ranked.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,4)") * yd).cast("double").alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,4)") * xd).cast("double").alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("k").alias("vocab_size"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("k"), 4).alias(
            "intercept"
        ),
    )


#: Per-class planting expressions for the scrubber evaluation: class 0
#: and 2 MUST be detected, class 1 is the canonical obfuscation miss,
#: class 3 is a word-boundary decoy a sloppy pattern false-positives on.
_PII_EVAL_PLANT_SQL = """CASE doc_id % 4
  WHEN 0 THEN text || ' reach user' || doc_id || '@example.com today'
  WHEN 1 THEN text || ' reach user' || doc_id || ' at example dot com today'
  WHEN 2 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
  ELSE text || ' ref 555-12345 code' END"""
_PII_EVAL_PLANT_SPARK = """CASE doc_id % 4
  WHEN 0 THEN concat(text, ' reach user', doc_id, '@example.com today')
  WHEN 1 THEN concat(text, ' reach user', doc_id, ' at example dot com today')
  WHEN 2 THEN concat(text, ' call 555-', lpad(cast(doc_id % 10000 as string), 4, '0'))
  ELSE concat(text, ' ref 555-12345 code') END"""


@register(
    "pii_scrub_eval",
    ops=("P5", "A5", "A9", "F10"),
    doc="Scrubber-quality evaluation harness: plants four deterministic "
    "PII classes (clean email, obfuscated 'at … dot' email, clean "
    "phone, word-boundary phone decoy) and measures the production "
    "patterns' per-class detection rate against the known ground "
    "truth — classes 0/2 must hit 1.0 (recall), class 1 documents "
    "the canonical obfuscation miss, class 3 must stay 0.0 or the "
    "pattern is over-matching (precision). The red-team fixture "
    "every PII pipeline needs next to its scrubber "
    "(text_pii_scrub); pure codegen regex, no shuffle before the "
    "4-row rollup.",
    oracle=f"""
WITH planted AS (
  SELECT doc_id % 4 AS pii_class,
         {_PII_EVAL_PLANT_SQL} AS text
  FROM documents
),
det AS (
  SELECT pii_class,
         CASE WHEN len(regexp_extract_all(text, '{{EM}}')) > 0
                OR len(regexp_extract_all(text, '{{PH}}')) > 0
              THEN 1 ELSE 0 END AS detected
  FROM planted
)
SELECT pii_class,
       COUNT(*) AS n_docs,
       CAST(SUM(detected) AS BIGINT) AS n_detected,
       ROUND(CAST(SUM(detected) AS DOUBLE) / COUNT(*), 6) AS detection_rate,
       CASE WHEN pii_class IN (0, 2) THEN 1.0 ELSE 0.0 END AS expected_rate
FROM det GROUP BY pii_class
""".replace("{EM}", PII_EMAIL).replace("{PH}", PII_PHONE),
)
def pii_scrub_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    planted = d.select(
        (F.col("doc_id") % 4).alias("pii_class"),
        F.expr(_PII_EVAL_PLANT_SPARK).alias("text"),
    )
    detected = (
        (F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))) > 0)
        | (F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), F.lit(0))) > 0)
    ).cast("int")
    det = planted.select("pii_class", detected.alias("detected"))
    return det.groupBy("pii_class").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("detected").cast("bigint").alias("n_detected"),
        F.round(
            F.sum("detected").cast("double") / F.count(F.lit(1)), 6
        ).alias("detection_rate"),
        F.max(
            F.when(F.col("pii_class").isin(0, 2), 1.0).otherwise(0.0)
        ).alias("expected_rate"),
    )


#: Coverage thresholds (basis points) for the vocab sizing curve.
_VC_THRESHOLDS = (5000, 9000, 9500, 9900)


@register(
    "vocab_coverage_curve",
    ops=("W11", "W4", "A3", "O1"),
    doc="Tokenizer vocab-budget planner: the corpus vocabulary is "
    "ranked by frequency (token tiebreak) and, for each coverage "
    "target (50/90/95/99% of token mass), reports the SMALLEST "
    "vocabulary size reaching it plus the mass actually covered "
    "there — the curve that decides how many merges/entries a "
    "tokenizer needs before OOV fallback is rare (the complement of "
    "vocab_oov_rate's fixed-vocab audit). Threshold tests compare "
    "exact integers (cum·10000 ≥ bp·total — no float shares until "
    "the output column), so the curve is bitwise deterministic. The "
    "rank runs on the AGGREGATED vocabulary (sub-linear in corpus "
    "size) via the distributed two-phase range rank (functions/"
    "ranking.two_phase_rank) — range-partitioned, never a single-"
    "partition window, even at full-web vocab cardinality.",
    oracle=f"""
WITH tok AS (
  SELECT unnest({SQL_TOKENS}) AS t FROM documents
),
vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
ranked AS (
  SELECT c,
    ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk,
    SUM(c) OVER (ORDER BY c DESC, t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    SUM(c) OVER () AS total,
    COUNT(*) OVER () AS n_vocab
  FROM vocab
),
thr AS (SELECT UNNEST([{", ".join(str(t) for t in _VC_THRESHOLDS)}]) AS bp)
SELECT t.bp AS coverage_bp,
  CAST(MIN(r.rnk) AS BIGINT) AS vocab_size_needed,
  CAST(MAX(r.n_vocab) AS BIGINT) AS total_vocab,
  CAST(MAX(r.total) AS BIGINT) AS total_tokens,
  CAST(MIN_BY(r.cum, r.rnk) AS DOUBLE) / MAX(r.total) AS share_achieved
FROM thr t JOIN ranked r ON r.cum * 10000 >= t.bp * r.total
GROUP BY t.bp
""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import two_phase_rank

    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(F.explode(tokens_col()).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    # Distributed two-phase global rank over the vocabulary — (c desc,
    # t) is a total order, so rank/cum/total are bitwise equal to the
    # serial window without moving the vocab to one partition.
    ranked = two_phase_rank(
        vocab,
        (F.col("c").desc(), "t"),
        rank_col="rnk",
        cum={"cum": F.col("c")},
        totals={"total": F.col("c")},
        n_col="n_vocab",
    ).select("c", "rnk", "cum", "total", "n_vocab")
    thr = spark.createDataFrame(
        [(t,) for t in _VC_THRESHOLDS], "coverage_bp int"
    )
    return (
        F.broadcast(thr)
        .join(ranked, ranked["cum"] * 10000 >= F.col("coverage_bp") * ranked["total"])
        .groupBy("coverage_bp")
        .agg(
            F.min("rnk").cast("bigint").alias("vocab_size_needed"),
            F.max("n_vocab").cast("bigint").alias("total_vocab"),
            F.max("total").cast("bigint").alias("total_tokens"),
            (
                F.min_by("cum", "rnk").cast("double") / F.max("total")
            ).alias("share_achieved"),
        )
    )


#: Winnowing parameters: word 3-grams, window of 4 consecutive grams.
_WIN_NGRAM = 3
_WIN_W = 4


@register(
    "text_winnowing_fingerprints",
    ops=("W9", "A2", "F10"),
    doc="Winnowing document fingerprints (Schleimer, Wilkerson & "
    "Aiken, SIGMOD 2003 — the MOSS algorithm): word 3-grams are "
    "hashed (keyed md5, exact integers), and from every window of 4 "
    "consecutive gram hashes the minimum is selected; the DISTINCT "
    "selected hashes are the document's fingerprint set. Winnowing "
    "guarantees any shared run of ≥ w+k−1 tokens between two "
    "documents shares a fingerprint — the contamination/plagiarism "
    "detector that, unlike text_fingerprint's single rolling hash, "
    "is robust to position shifts. Per-doc windows partition by "
    "doc_id (no global sort); output is the per-doc fingerprint "
    "density plus the min fingerprint (the doc's winnowing "
    "signature).",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
),
grams AS (
  SELECT doc_id,
    UNNEST(generate_series(1, len(w) - {_WIN_NGRAM - 1})) AS pos,
    UNNEST([CAST(concat('0x',
      substr(md5(concat(w[i], ' ', w[i + 1], ' ', w[i + 2])), 1, 15))
      AS BIGINT) for i in generate_series(1, len(w) - {_WIN_NGRAM - 1})]) AS h
  FROM tok
  WHERE len(w) >= {_WIN_NGRAM}
),
mins AS (
  SELECT doc_id, pos,
    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
      AS win_min,
    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM grams
),
sel AS (
  SELECT doc_id, MAX(n_grams) AS n_grams,
    COUNT(DISTINCT win_min) AS n_fingerprints,
    MIN(win_min) AS min_fingerprint
  FROM mins
  WHERE pos + {_WIN_W - 1} <= n_grams
  GROUP BY doc_id
)
SELECT doc_id,
  CAST(n_grams AS BIGINT) AS n_grams,
  CAST(n_fingerprints AS BIGINT) AS n_fingerprints,
  CAST(n_fingerprints AS DOUBLE) / n_grams AS fingerprint_density,
  CAST(min_fingerprint AS BIGINT) AS min_fingerprint
FROM sel
""",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    tok = d.select("doc_id", w.alias("w")).filter(F.size("w") >= _WIN_NGRAM)
    gram = F.concat_ws(
        " ",
        F.expr("w[pos - 1]"),
        F.expr("w[pos]"),
        F.expr("w[pos + 1]"),
    )
    grams = (
        tok.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - (_WIN_NGRAM - 1))).alias(
                "pos"
            ),
            "w",
        )
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5(gram), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    wwin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WIN_W - 1)
    )
    mins = grams.select(
        "doc_id",
        "pos",
        F.min("h").over(wwin).alias("win_min"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n_grams"),
    )
    sel = mins.filter(F.col("pos") + (_WIN_W - 1) <= F.col("n_grams")).groupBy(
        "doc_id"
    ).agg(
        F.max("n_grams").cast("bigint").alias("n_grams"),
        F.countDistinct("win_min").cast("bigint").alias("n_fingerprints"),
        F.min("win_min").cast("bigint").alias("min_fingerprint"),
    )
    return sel.select(
        "doc_id",
        "n_grams",
        "n_fingerprints",
        (F.col("n_fingerprints").cast("double") / F.col("n_grams")).alias(
            "fingerprint_density"
        ),
        "min_fingerprint",
    )


#: Frequency-band upper bounds for the negative-sampling report.
NEG_BANDS = (1, 2, 4, 8, 16, 32, 64)


def _hex_u24_sql(expr: str) -> str:
    """Uniform in [0,1) from the first 6 hex digits of md5(expr) —
    24 bits assembled digit-by-digit (instr trick), identical
    spelling in Spark SQL and DuckDB; /2^24 is an exact double."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    )
    return f"(CAST({digits} AS DOUBLE) / 16777216)"


def _freq_band_sql(n: str) -> str:
    clauses = " ".join(
        f"WHEN {n} <= {e} THEN {i}" for i, e in enumerate(NEG_BANDS)
    )
    return f"(CASE {clauses} ELSE {len(NEG_BANDS)} END)"


@register(
    "negative_sampling_plan",
    ops=("A2", "A3", "A9", "F12", "P5"),
    doc="word2vec-style negative-sampling table plan: vocabulary "
    "unigram counts are reweighted by freq^0.75 (computed as "
    "sqrt(f·sqrt(f)) — IEEE sqrt is correctly rounded in both "
    "engines, so the non-integer power is STILL bitwise "
    "deterministic, unlike pow/exp which differ by ulps across "
    "libms), and each token is accepted with probability w/w_max "
    "via a stateless md5 uniform — a cluster-reproducible rejection "
    "sample of the negative table. Reports per frequency band: "
    "vocab size, accepted count, acceptance rate and the weight "
    "envelope. One explode + one vocab aggregate; everything after "
    "runs on the vocabulary frame (sub-linear in corpus rows).",
    oracle=f"""
WITH tok AS (
  SELECT unnest({SQL_TOKENS}) AS term FROM documents
),
vocab AS (
  SELECT term, COUNT(*) AS f,
    sqrt(COUNT(*) * sqrt(COUNT(*))) AS w
  FROM tok GROUP BY 1
),
mx AS (SELECT MAX(w) AS w_max FROM vocab),
dec AS (
  SELECT v.term, v.f, v.w,
    {_hex_u24_sql("'neg:' || v.term")} < v.w / m.w_max AS accepted,
    {_freq_band_sql("v.f")} AS band
  FROM vocab v, mx m
)
SELECT band,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN accepted THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
  CAST(SUM(f) AS BIGINT) AS total_freq,
  MIN(w) AS min_w,
  MAX(w) AS max_w,
  CAST(SUM(CASE WHEN accepted THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS accept_rate
FROM dec GROUP BY 1
""",
)
def negative_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    vocab = (
        d.select(F.explode(tokens_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
        .withColumn("w", F.sqrt(F.col("f") * F.sqrt(F.col("f"))))
    )
    mx = vocab.agg(F.max("w").alias("w_max"))
    dec = vocab.crossJoin(F.broadcast(mx)).select(
        "term",
        "f",
        "w",
        (
            F.expr(_hex_u24_sql("'neg:' || term"))
            < F.col("w") / F.col("w_max")
        ).alias("accepted"),
        F.expr(_freq_band_sql("f")).alias("band"),
    )
    return dec.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("accepted"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_accepted"),
        F.sum("f").cast("bigint").alias("total_freq"),
        F.min("w").alias("min_w"),
        F.max("w").alias("max_w"),
        (
            F.sum(F.when(F.col("accepted"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("accept_rate"),
    )


#: Collocation mining thresholds: minimum bigram count, result size.
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


@register(
    "pmi_collocations",
    ops=("A1", "A9", "O1", "F10"),
    doc="Collocation mining by pointwise mutual information (Church & "
    "Hanks 1990): adjacent-token bigrams vs their unigram marginals, "
    "PMI = ln(c_ab·N²/(M·c_a·c_b)) with the ln argument built as a "
    "ratio of two exact int64 products (one correctly-rounded "
    "division) and the ln itself going through the engine-rounded "
    "4 dp recipe. Bigrams below 5 occurrences are dropped (PMI's "
    "classic low-count pathology), and the top-20 is a sort+limit "
    "take-ordered (never a global row_number) with a full (pmi "
    "desc, a, b) tiebreak. One explode pass for bigrams + one for "
    "unigrams; everything after runs on the vocabulary/bigram "
    "aggregates.",
    oracle=f"""
WITH tok AS (
  SELECT {SQL_TOKENS} AS w FROM documents WHERE len({SQL_TOKENS}) >= 2
),
big AS (
  SELECT unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM tok
),
cb AS (SELECT a, b, COUNT(*) AS c_ab FROM big GROUP BY 1, 2),
uni AS (
  SELECT unnest({SQL_TOKENS}) AS term FROM documents
),
cu AS (SELECT term, COUNT(*) AS c FROM uni GROUP BY 1),
tot AS (
  SELECT (SELECT SUM(c) FROM cu) AS n_uni,
         (SELECT SUM(c_ab) FROM cb) AS m_big
),
scored AS (
  SELECT cb.a, cb.b, cb.c_ab,
    ROUND(LN(CAST(cb.c_ab * t.n_uni * t.n_uni AS DOUBLE)
             / CAST(t.m_big * ca.c * bb.c AS DOUBLE)), 4) AS pmi
  FROM cb
  JOIN cu ca ON cb.a = ca.term
  JOIN cu bb ON cb.b = bb.term
  CROSS JOIN tot t
  WHERE cb.c_ab >= {PMI_MIN_COUNT}
),
top AS (
  SELECT * FROM scored ORDER BY pmi DESC, a, b LIMIT {PMI_TOP_K}
)
SELECT ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rank,
  a AS term_a, b AS term_b,
  CAST(c_ab AS BIGINT) AS n_bigram, pmi
FROM top
""",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    tok = d.select(tokens_col().alias("w")).filter(F.size("w") >= 2)
    big = tok.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(element_at(w, i) AS a, "
                "element_at(w, i + 1) AS b))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    cb = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    cu = (
        d.select(F.explode(tokens_col()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cb.agg(F.sum("c_ab").alias("m_big")).crossJoin(
        cu.agg(F.sum("c").alias("n_uni"))
    )
    ca = cu.select(F.col("term").alias("a"), F.col("c").alias("c_a"))
    bb = cu.select(F.col("term").alias("b"), F.col("c").alias("c_b"))
    scored = (
        cb.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(ca, "a")
        .join(bb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    (
                        F.col("c_ab") * F.col("n_uni") * F.col("n_uni")
                    ).cast("double")
                    / (F.col("m_big") * F.col("c_a") * F.col("c_b")).cast(
                        "double"
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(F.col("pmi").desc(), "a", "b").limit(PMI_TOP_K)
    w = Window.orderBy(F.col("pmi").desc(), "a", "b")
    return top.select(
        F.row_number().over(w).alias("rank"),
        F.col("a").alias("term_a"),
        F.col("b").alias("term_b"),
        F.col("c_ab").cast("bigint").alias("n_bigram"),
        "pmi",
    )


#: Kneser-Ney absolute discount — 3/4 is exact in binary, so the
#: discounted numerators are single-rounding doubles in any engine.
_KN_D = 0.75
_KN_TOPK = 20


@register(
    "text_kneser_ney_bigram",
    ops=("A3", "A2", "F10", "J1", "W4"),
    doc="Interpolated Kneser-Ney bigram probabilities (Kneser & Ney "
    "1995 — the production n-gram smoothing, complementing "
    "text_bigram_perplexity's add-k filter): absolute discount "
    "D=0.75 off every bigram count, discount mass redistributed "
    "via the CONTINUATION unigram (how many distinct contexts a "
    "word follows — the famous 'San Francisco' correction where "
    "raw frequency overrates 'Francisco'). Every component is an "
    "exact integer aggregate (bigram counts, context totals, "
    "distinct continuation counts, bigram-type count); D is exact "
    "in binary, so p_KN is bitwise cross-engine with NO log/exp "
    "anywhere. Count tables are vocabulary-bounded (Zipf) — the "
    "corpus scan is the only size-dependent stage; emits the "
    f"top-{_KN_TOPK} bigrams with MLE vs KN side by side.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {SQL_TOKENS} AS w FROM documents
),
bg AS (
  SELECT p[1] AS w1, p[2] AS w2
  FROM (SELECT unnest(list_zip(w[:len(w)-1], w[2:])) AS p
        FROM tok WHERE len(w) >= 2)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
ctx AS (
  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n_fw
  FROM c12 GROUP BY 1
),
cont AS (SELECT w2, COUNT(*) AS n_bw FROM c12 GROUP BY 1),
types AS (SELECT COUNT(*) AS b FROM c12),
scored AS (
  SELECT c.w1, c.w2, c.c12, x.c1, x.n_fw, co.n_bw, t.b,
    CAST(c.c12 AS DOUBLE) / x.c1 AS p_mle,
    GREATEST(c.c12 - {_KN_D!r}, 0.0) / x.c1
      + ({_KN_D!r} * x.n_fw / x.c1) * (CAST(co.n_bw AS DOUBLE) / t.b)
      AS p_kn
  FROM c12 c
  JOIN ctx x ON c.w1 = x.w1
  JOIN cont co ON c.w2 = co.w2
  CROSS JOIN types t
)
SELECT w1, w2,
  CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
  CAST(n_fw AS BIGINT) AS n_cont_fw, CAST(n_bw AS BIGINT) AS n_cont_bw,
  CAST(b AS BIGINT) AS n_bigram_types,
  p_mle, p_kn
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY c12 DESC, w1, w2) AS rk
  FROM scored
) WHERE rk <= {_KN_TOPK}
""",
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    w = tokens_col()
    bg = (
        d.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(w, 1, size(w) - 1)").alias("w1"),
                    F.expr("slice(w, 2, size(w) - 1)").alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = c12.groupBy(F.col("w1").alias("xw1")).agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n_fw")
    )
    cont = c12.groupBy(F.col("w2").alias("cw2")).agg(
        F.count(F.lit(1)).alias("n_bw")
    )
    types = c12.agg(F.count(F.lit(1)).alias("b"))
    scored = (
        c12.join(ctx, F.col("w1") == F.col("xw1"))
        .join(cont, F.col("w2") == F.col("cw2"))
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n_fw",
            "n_bw",
            "b",
            (F.col("c12").cast("double") / F.col("c1")).alias("p_mle"),
            (
                F.greatest(F.col("c12") - _KN_D, F.lit(0.0)) / F.col("c1")
                + (F.lit(_KN_D) * F.col("n_fw") / F.col("c1"))
                * (F.col("n_bw").cast("double") / F.col("b"))
            ).alias("p_kn"),
        )
    )
    # Scale-safe top-k (r10): orderBy+limit plans as
    # TakeOrderedAndProject (distributed per-partition top-k) instead
    # of a global row_number window that single-partition-sorts every
    # bigram type; identical rows under the total (c12 desc, w1, w2)
    # order, and the rank column was never in the output.
    return (
        scored.orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(_KN_TOPK)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("n_fw").cast("bigint").alias("n_cont_fw"),
            F.col("n_bw").cast("bigint").alias("n_cont_bw"),
            F.col("b").cast("bigint").alias("n_bigram_types"),
            "p_mle",
            "p_kn",
        )
    )


#: ROUGE pairs come from the sorted-neighborhood blocking rank
#: (adjacent docs in normalized-key order) — deterministic pairing
#: with no RNG, same key recipe as dedup_sorted_neighborhood.
_ROUGE_KEY_LEN = 24


@register(
    "rouge_overlap_pairs",
    ops=("A3", "A9", "J1", "W4", "F10"),
    doc="ROUGE-1/ROUGE-2 overlap scoring (Lin 2004 — the generation-"
    "eval standard) between adjacent documents in normalized-key "
    "order (the sorted-neighborhood pairing, so the pair set is "
    "deterministic and w·n-bounded): per pair, unigram and bigram "
    "MULTISET overlaps Σ min(count_a, count_b) — integer "
    "aggregates — then precision/recall/F1 as single divisions. "
    "The eval-harness operator for comparing generated vs "
    "reference text at corpus scale: gram tables are one shuffle "
    "each, the overlap join touches paired docs only. NULLIF "
    "guards empty-gram docs identically on both engines.",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
    substr(regexp_replace(lower(trim(text)), '[^a-z0-9]', '', 'g'),
           1, {_ROUGE_KEY_LEN}) AS k
  FROM documents
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn FROM keyed
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ranked a JOIN ranked b ON b.rn = a.rn + 1
),
uni AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({SQL_TOKENS}) AS g FROM documents)
  GROUP BY 1, 2
),
bi AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (
    SELECT doc_id, p[1] || ' ' || p[2] AS g
    FROM (SELECT doc_id, unnest(list_zip(w[:len(w)-1], w[2:])) AS p
          FROM (SELECT doc_id, {SQL_TOKENS} AS w FROM documents)
          WHERE len(w) >= 2)
  )
  GROUP BY 1, 2
),
tot1 AS (SELECT doc_id, SUM(c) AS t FROM uni GROUP BY 1),
tot2 AS (SELECT doc_id, SUM(c) AS t FROM bi GROUP BY 1),
-- The A-side gram expansion is MATERIALIZED to pin the join order:
-- left free, the optimizer may join the two gram tables on the gram
-- alone first, which is Σdf² — quadratic per shared gram type — and
-- was measured exploding (60 GB spill, OOD) on a ×4 duplicate-clique
-- corpus while this shape runs it in under a second. Same algebra,
-- same values (verified identical at sf0.01).
pa1 AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, ua.g, ua.c
  FROM pairs p JOIN uni ua ON p.doc_a = ua.doc_id
),
ov1 AS (
  SELECT pa.doc_a, pa.doc_b, SUM(LEAST(pa.c, ub.c)) AS o
  FROM pa1 pa
  JOIN uni ub ON pa.doc_b = ub.doc_id AND pa.g = ub.g
  GROUP BY 1, 2
),
pa2 AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, ba.g, ba.c
  FROM pairs p JOIN bi ba ON p.doc_a = ba.doc_id
),
ov2 AS (
  SELECT pa.doc_a, pa.doc_b, SUM(LEAST(pa.c, bb.c)) AS o
  FROM pa2 pa
  JOIN bi bb ON pa.doc_b = bb.doc_id AND pa.g = bb.g
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
  CAST(COALESCE(o1.o, 0) AS BIGINT) AS rouge1_overlap,
  CAST(COALESCE(o2.o, 0) AS BIGINT) AS rouge2_overlap,
  CAST(COALESCE(o1.o, 0) AS DOUBLE) / NULLIF(t1b.t, 0) AS rouge1_recall,
  CAST(COALESCE(o1.o, 0) AS DOUBLE) / NULLIF(t1a.t, 0) AS rouge1_precision,
  CAST(COALESCE(o2.o, 0) AS DOUBLE) / NULLIF(t2b.t, 0) AS rouge2_recall,
  CAST(COALESCE(o2.o, 0) AS DOUBLE) / NULLIF(t2a.t, 0) AS rouge2_precision
FROM pairs p
LEFT JOIN ov1 o1 ON p.doc_a = o1.doc_a AND p.doc_b = o1.doc_b
LEFT JOIN ov2 o2 ON p.doc_a = o2.doc_a AND p.doc_b = o2.doc_b
LEFT JOIN tot1 t1a ON p.doc_a = t1a.doc_id
LEFT JOIN tot1 t1b ON p.doc_b = t1b.doc_id
LEFT JOIN tot2 t2a ON p.doc_a = t2a.doc_id
LEFT JOIN tot2 t2b ON p.doc_b = t2b.doc_id
""",
)
def rouge_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    keyed = d.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9]", ""),
            1,
            _ROUGE_KEY_LEN,
        ).alias("k"),
    )
    # Scale-safe adjacent pairing: range-partitioned with ghost-row
    # boundary overlap (functions/ranking.sorted_neighbors) — the
    # LEAD(1) window runs per range partition with the next
    # partition's first row duplicated in, so the pair set equals the
    # serial window's at any corpus size.
    from ..functions.ranking import sorted_neighbors

    frame, is_real, w = sorted_neighbors(keyed, ("k", "doc_id"), 1)
    pairs = (
        frame.select(
            F.col("doc_id").alias("doc_a"),
            F.lead("doc_id", 1).over(w).alias("doc_b"),
            is_real.alias("_real"),
        )
        .filter(F.col("_real"))
        .filter(F.col("doc_b").isNotNull())
        .drop("_real")
    )
    # NOT pinned (r10, measured): `pairs` has 3 consumers, but
    # sorted_neighbors' internal consistency checkpoint already
    # materializes the range-sorted frame once for all of them (a pin
    # would also hide the range-partitioning the plan suite asserts).
    # ONE gram frame (r11, VERDICT r10 item 7): unigrams and bigrams
    # carry a gram-length discriminator `n` in a single exploded,
    # PINNED frame. The old shape computed `uni` and `bi` separately
    # and consumed each 3× (both overlap-join sides + totals) — six
    # token-explode corpus passes per run; this is one explode pass,
    # one (doc, n, gram) aggregate, one materialization, and the
    # overlap join + totals serve both ROUGE orders via conditional
    # aggregation (guide §1.2/§2.3).
    toks = d.select("doc_id", tokens_col().alias("w"))
    grams = _pin(
        toks.select(
            "doc_id",
            F.explode(
                F.concat(
                    F.expr(
                        "transform(w, x -> struct(1 as n, x as g))"
                    ),
                    F.expr(
                        "CASE WHEN size(w) >= 2 THEN "
                        "transform(sequence(0, size(w) - 2), "
                        "i -> struct(2 as n, concat_ws(' ', w[i], w[i+1]) as g)) "
                        "ELSE array() END"
                    ),
                )
            ).alias("ng"),
        )
        .select("doc_id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ga = grams.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("g").alias("ga"),
        F.col("c").alias("ca"),
    )
    gb = grams.select(
        F.col("doc_id").alias("gb_id"),
        F.col("n").alias("nb"),
        F.col("g").alias("gb"),
        F.col("c").alias("cb"),
    )
    # One candidate-restricted overlap join serves both gram orders;
    # SUM over a WHEN with no otherwise keeps the per-order NULL
    # semantics of the old separate joins (a pair sharing bigrams but
    # not unigrams is impossible, the converse NULL matters).
    ov = (
        pairs.join(ga, "doc_a")
        .join(
            gb,
            (F.col("doc_b") == F.col("gb_id"))
            & (F.col("na") == F.col("nb"))
            & (F.col("ga") == F.col("gb")),
        )
        .groupBy(pairs["doc_a"].alias("u_a"), pairs["doc_b"].alias("u_b"))
        .agg(
            F.sum(F.when(F.col("na") == 1, F.least("ca", "cb"))).alias("ou"),
            F.sum(F.when(F.col("na") == 2, F.least("ca", "cb"))).alias("ob"),
        )
    )
    # Per-doc totals for both orders off the same pinned frame — one
    # aggregate, two join legs instead of four.
    tot = grams.groupBy("doc_id").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("t1"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("t2"),
    )
    o1 = F.coalesce(F.col("ou"), F.lit(0)).cast("bigint")
    o2 = F.coalesce(F.col("ob"), F.lit(0)).cast("bigint")
    return (
        pairs.join(
            ov,
            (pairs["doc_a"] == F.col("u_a")) & (pairs["doc_b"] == F.col("u_b")),
            "left",
        )
        .join(
            tot.select(
                F.col("doc_id").alias("ta_id"),
                F.col("t1").alias("t1a"),
                F.col("t2").alias("t2a"),
            ),
            pairs["doc_a"] == F.col("ta_id"),
            "left",
        )
        .join(
            tot.select(
                F.col("doc_id").alias("tb_id"),
                F.col("t1").alias("t1b"),
                F.col("t2").alias("t2b"),
            ),
            pairs["doc_b"] == F.col("tb_id"),
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            o1.alias("rouge1_overlap"),
            o2.alias("rouge2_overlap"),
            (o1.cast("double") / F.nullif(F.col("t1b"), F.lit(0))).alias(
                "rouge1_recall"
            ),
            (o1.cast("double") / F.nullif(F.col("t1a"), F.lit(0))).alias(
                "rouge1_precision"
            ),
            (o2.cast("double") / F.nullif(F.col("t2b"), F.lit(0))).alias(
                "rouge2_recall"
            ),
            (o2.cast("double") / F.nullif(F.col("t2a"), F.lit(0))).alias(
                "rouge2_precision"
            ),
        )
    )


@register(
    "regexp_functions_suite",
    ops=("F10", "P1", "A3", "P9"),
    doc="Regexp builtin family in one scan: regexp_count (vowel runs), "
    "regexp_extract (first word), regexp_substr-style longest token "
    "via extract_all + array ordering, rlike membership, and "
    "regexp_replace length delta (vowels stripped). Patterns are "
    "RE2-safe (no backreferences/lookarounds) so the Java-regex "
    "plan and the RE2-based DuckDB twin agree symbol for symbol. "
    "Pure codegen string work, embarrassingly parallel; the "
    "output is a per-language aggregate so the hash gate covers "
    "every row's extraction.",
    oracle="""
WITH per_doc AS (
  SELECT lang,
    len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_runs,
    regexp_extract(text, '^([a-z]+)', 1) AS first_word,
    CASE WHEN regexp_matches(text, 'qu') THEN 1 ELSE 0 END AS has_qu,
    length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
      AS n_vowels
  FROM documents
)
SELECT lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_vowel_runs) AS BIGINT) AS total_vowel_runs,
  CAST(SUM(has_qu) AS BIGINT) AS n_with_qu,
  CAST(SUM(n_vowels) AS BIGINT) AS total_vowels,
  MIN(first_word) AS min_first_word,
  MAX(first_word) AS max_first_word
FROM per_doc
GROUP BY 1
""",
)
def regexp_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    per_doc = d.select(
        "lang",
        F.regexp_count(F.col("text"), F.lit("[aeiou]+")).alias("n_vowel_runs"),
        F.regexp_extract(F.col("text"), "^([a-z]+)", 1).alias("first_word"),
        F.when(F.col("text").rlike("qu"), 1).otherwise(0).alias("has_qu"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
        ).alias("n_vowels"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_vowel_runs").cast("bigint").alias("total_vowel_runs"),
        F.sum("has_qu").cast("bigint").alias("n_with_qu"),
        F.sum("n_vowels").cast("bigint").alias("total_vowels"),
        F.min("first_word").alias("min_first_word"),
        F.max("first_word").alias("max_first_word"),
    )


@register(
    "string_functions_suite",
    ops=("F9", "F4", "F10", "A3"),
    doc="String builtin family over the part-name dimension: initcap "
    "normalization, lpad/rpad fixed-width keys, translate "
    "(vowel→digit substitution cipher as a keying transform), "
    "builtin levenshtein against a constant probe word, and "
    "split_part extraction — the surface a migration from "
    "PostgreSQL string pipelines needs 1:1 (ref TRIM/name handling "
    "`sql/analysis_queries.sql:214`). Aggregated per brand so the "
    "hash certifies every row's transforms; one scan, pure "
    "codegen.",
    oracle="""
WITH t AS (
  SELECT p_brand,
    upper(substr(p_name, 1, 1)) || substr(p_name, 2) AS capped,
    lpad(CAST(p_partkey AS VARCHAR), 12, '0') AS padded_key,
    translate(p_name, 'aeiou', '01234') AS ciphered,
    levenshtein(split_part(p_name, ' ', 1), 'steel') AS lev_to_steel,
    split_part(p_name, ' ', 2) AS second_word
  FROM part
)
SELECT p_brand,
  COUNT(*) AS n_parts,
  MIN(capped) AS min_capped,
  MAX(padded_key) AS max_padded_key,
  MIN(ciphered) AS min_ciphered,
  CAST(SUM(lev_to_steel) AS BIGINT) AS total_lev,
  MAX(second_word) AS max_second_word
FROM t
GROUP BY 1
""",
)
def string_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    # initcap capitalizes EVERY word and lowercases the rest — engines
    # disagree on multi-word edge cases, so the oracle-stable spelling
    # capitalizes the first character explicitly on both sides.
    t = p.select(
        "p_brand",
        F.concat(
            F.upper(F.substring("p_name", 1, 1)),
            F.expr("substring(p_name, 2)"),
        ).alias("capped"),
        F.lpad(F.col("p_partkey").cast("string"), 12, "0").alias(
            "padded_key"
        ),
        F.translate("p_name", "aeiou", "01234").alias("ciphered"),
        F.levenshtein(
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
            F.lit("steel"),
        ).alias("lev_to_steel"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
            "second_word"
        ),
    )
    return t.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("capped").alias("min_capped"),
        F.max("padded_key").alias("max_padded_key"),
        F.min("ciphered").alias("min_ciphered"),
        F.sum("lev_to_steel").cast("bigint").alias("total_lev"),
        F.max("second_word").alias("max_second_word"),
    )
