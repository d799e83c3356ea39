"""Multimodal-column plumbing (BASELINE.json north star): treat
image/audio/video payloads as opaque `binary` columns with typed
metadata. The container has no media libraries, so the decode step is
a clearly-marked deterministic fake behind the real Spark plumbing —
schema, Arrow batching, partitioning and UDF signatures are genuine
and tested; swap `_fake_decode` for a real decoder on a real cluster.

`documents.text` is encoded to bytes to stand in for a media payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from .registry import register


@register(
    "multimodal_binary_meta",
    ops=("P9", "A3", "F10"),
    doc="Typed metadata over an opaque binary column: byte length, "
    "SHA-256 content id, shard prefix, chunk count — all JVM-side "
    "column expressions (no decode).",
    oracle="""
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  sha256(text) AS content_id,
  lower(hex(encode(substring(text, 1, 4)))) AS shard_prefix,
  (octet_length(encode(text)) + 255) // 256 AS n_chunks
FROM documents
""",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_id"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "shard_prefix"
        ),
        F.expr("(length(encode(text, 'UTF-8')) + 255) div 256").alias("n_chunks"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image/video probe.

    STUB: the container ships no media codecs. On a real cluster,
    replace with e.g. PIL.Image.open(io.BytesIO(payload)).size; the
    surrounding Spark plumbing (Arrow batches, schema, partitioning)
    is unchanged.
    """
    import hashlib

    h = hashlib.md5(payload).digest()
    width = 256 + h[0] * 4
    height = 256 + h[1] * 4
    n_frames = 1 + h[2] % 32
    return width, height, n_frames


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas media probe: Arrow-batched, one Python worker per
    partition — the 100 TB pattern for opaque-binary feature
    extraction (never a row-at-a-time UDF)."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "n_frames": dims.map(lambda t: t[2]).astype("int32"),
                    "decoder": "fake-md5-probe",
                }
            )

    return df.mapInPandas(probe, schema=_DECODE_SCHEMA)


#: DuckDB spelling of _fake_decode's digest bytes: byte i of
#: md5(text) == hex pair at position 2i+1 (md5(VARCHAR) hashes the
#: UTF-8 bytes, same as the Python side's md5 of the encoded payload).
def _sql_md5_byte(i: int) -> str:
    return f"CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) AS INTEGER)"


@register(
    "multimodal_decode_probe",
    ops=("D6",),
    doc="Arrow-batched mapInPandas decode probe over binary payloads. "
    "The decoder is a deterministic md5-derived fake (see _fake_decode "
    "— the container ships no codecs), which makes even the Python "
    "decode path exactly oracle-checkable; the Spark plumbing (Arrow "
    "batches, schema, partitioning) is exactly what a real PIL/ffmpeg "
    "probe would use.",
    oracle=f"""
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  256 + {_sql_md5_byte(0)} * 4 AS width,
  256 + {_sql_md5_byte(1)} * 4 AS height,
  1 + {_sql_md5_byte(2)} % 32 AS n_frames,
  'fake-md5-probe' AS decoder
FROM documents
""",
)
def multimodal_decode_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return decode_media(payloads)


@register(
    "multimodal_frame_sample",
    ops=("F7", "P5"),
    doc="Frame sampling over decoded media: up to 4 evenly-spaced frame "
    "indices per payload, emitted row-per-frame (explode/sequence — "
    "the lateral expansion a video pipeline feeds to per-frame feature "
    "extraction). Frame counts come from the decode probe.",
    oracle=f"""
WITH probed AS (
  SELECT doc_id, 1 + {_sql_md5_byte(2)} % 32 AS n_frames FROM documents
)
SELECT doc_id, n_frames,
       UNNEST(generate_series(0, n_frames - 1, GREATEST(1, (n_frames + 3) // 4)))
         AS frame_index
FROM probed
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    probed = decode_media(payloads).select("doc_id", "n_frames")
    step = F.greatest(F.lit(1), F.expr("(n_frames + 3) div 4"))
    return probed.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, step)
        ).alias("frame_index"),
    )


@register(
    "multimodal_resize_features",
    ops=("P5", "P8", "F8"),
    doc="Resize planning + feature extraction over decoded media: "
    "aspect-preserving fit into 224×224 (scale = min(224/w, 224/h) "
    "capped at 1, floor'd target dims — the exact integer/double math "
    "a real resize kernel is handed), plus per-channel mean features "
    "from the digest bytes (deterministic fake standing in for real "
    "pixel statistics; the column shapes and Arrow plumbing are what "
    "a real extractor produces). Everything downstream of the decode "
    "probe is JVM-side column math.",
    oracle=f"""
WITH probed AS (
  SELECT doc_id,
    256 + {_sql_md5_byte(0)} * 4 AS width,
    256 + {_sql_md5_byte(1)} * 4 AS height,
    {_sql_md5_byte(3)} AS b3, {_sql_md5_byte(4)} AS b4, {_sql_md5_byte(5)} AS b5
  FROM documents
)
SELECT doc_id, width, height,
  LEAST(1.0, LEAST(224.0 / width, 224.0 / height)) AS scale,
  GREATEST(1, CAST(FLOOR(width * LEAST(1.0, LEAST(224.0 / width, 224.0 / height))) AS INT)) AS target_width,
  GREATEST(1, CAST(FLOOR(height * LEAST(1.0, LEAST(224.0 / width, 224.0 / height))) AS INT)) AS target_height,
  b3 / 255.0 AS mean_r, b4 / 255.0 AS mean_g, b5 / 255.0 AS mean_b
FROM probed
""",
)
def multimodal_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    probed = decode_media(payloads).select("doc_id", "width", "height")
    digest = d.select(
        "doc_id", F.md5(F.encode(F.col("text"), "UTF-8")).alias("digest")
    )
    byte = lambda i: F.conv(F.substring("digest", 2 * i + 1, 2), 16, 10).cast("int")  # noqa: E731
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    scale = F.least(F.lit(1.0), F.least(F.lit(224.0) / w, F.lit(224.0) / h))
    return (
        probed.join(digest, "doc_id")
        .select(
            "doc_id",
            "width",
            "height",
            scale.alias("scale"),
            F.greatest(F.lit(1), F.floor(w * scale).cast("int")).alias("target_width"),
            F.greatest(F.lit(1), F.floor(h * scale).cast("int")).alias("target_height"),
            (byte(3) / F.lit(255.0)).alias("mean_r"),
            (byte(4) / F.lit(255.0)).alias("mean_g"),
            (byte(5) / F.lit(255.0)).alias("mean_b"),
        )
    )


@register(
    "multimodal_phash_near_dup",
    ops=("J1", "A1"),
    doc="Perceptual-hash near-dup over opaque media payloads: a 60-bit "
    "pHash per payload (deterministic md5-derived fake standing in for "
    "the DCT perceptual hash of the decoded image — the container "
    "ships no codecs; a real kernel swaps into the same plumbing), "
    "4-band blocking for candidates (pigeonhole: any pair with "
    "Hamming <= 3 shares at least one intact band), exact "
    "bit_count(xor) verify <= 3 on candidates only — the threshold the "
    "banding provably covers; claiming a looser band (e.g. <= 6) with "
    "4 bands would silently miss pairs whose bits spread across all "
    "bands — the image-dedup "
    "equivalent of banded MinHash, never O(n²). With fake random "
    "hashes only byte-identical payloads actually collide, which makes "
    "the full candidate→verify path exactly oracle-checkable.",
    oracle="""
WITH h AS (
  SELECT doc_id,
         substr(md5(text), 1, 15) AS hx,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS ph
  FROM documents
), bands AS (
  SELECT doc_id, ph, CAST(i AS INT) AS band_id,
         substr(hx, CAST(1 + 4 * i AS INT),
                CASE WHEN i = 3 THEN 3 ELSE 4 END) AS bh
  FROM h, range(0, 4) t(i)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.ph AS ph_a,
                  b.doc_id AS doc_b, b.ph AS ph_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= 3
""",
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    # md5 of the UTF-8 payload == DuckDB md5(text) (same bytes).
    h = d.select(
        "doc_id", F.md5(F.encode(F.col("text"), "UTF-8")).alias("hx")
    ).select(
        "doc_id",
        F.expr("cast(conv(substr(hx, 1, 15), 16, 10) as bigint)").alias("ph"),
        F.array(
            F.substring("hx", 1, 4),
            F.substring("hx", 5, 4),
            F.substring("hx", 9, 4),
            F.substring("hx", 13, 3),
        ).alias("bhs"),
    )
    bands = h.select(
        "doc_id", "ph", F.posexplode("bhs").alias("band_id", "bh")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.ph").alias("ph_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.ph").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.expr("cast(bit_count(ph_a ^ ph_b) as int)")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


@register(
    "multimodal_shard_packing",
    ops=("W11", "A3", "A1"),
    doc="WebDataset-style shard packing: binary payloads are assigned "
    "to fixed-capacity training shards by a per-source running byte "
    "total (sequential chunking — the rule real shard writers use), "
    "then rolled up to one manifest row per shard. The window is "
    "partitioned by source, so packing parallelizes across sources "
    "and each shard manifest row is the unit a downstream dataloader "
    "opens. 8 KiB capacity here; the plan is capacity-independent.",
    oracle="""
WITH sized AS (
  SELECT source, doc_id, octet_length(encode(text)) AS n_bytes
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_bytes,
    COALESCE(SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 8192
      AS shard_id
  FROM sized
)
SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY source, shard_id
""",
)
def multimodal_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents", spread=True)
    sized = d.select(
        "source",
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    packed = sized.withColumn(
        "shard_id", F.floor(cum_before / 8192).cast("bigint")
    )
    return packed.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


#: Audio framing geometry: 4 analysis frames, 4 digest bytes each.
AUDIO_FRAMES = 4
_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("is_silence", T.BooleanType()),
    ]
)


def _fake_pcm_frames(payload: bytes):
    """Deterministic stand-in for a real audio decode + framing.

    STUB: the container ships no audio codecs. On a real cluster,
    replace with e.g. soundfile/librosa frame extraction over the
    decoded PCM; the Arrow plumbing, schema and per-frame shape are
    unchanged. The fake derives 4 frames of 4 'samples' each from the
    md5 digest of the payload, so every number is exactly
    reproducible (and oracle-checkable) from the payload bytes alone.
    """
    import hashlib
    import math

    h = hashlib.md5(payload).digest()
    out = []
    for f in range(AUDIO_FRAMES):
        b = h[4 * f : 4 * f + 4]
        rms = math.sqrt(sum(x * x for x in b) / 4.0) / 255.0
        peak = max(b) / 255.0
        out.append((f, rms, peak, rms < 0.3))
    return out


@register(
    "multimodal_audio_energy",
    ops=("D6", "A3"),
    doc="Audio-modality plumbing: mapInPandas frame-energy extraction "
    "over opaque audio payloads — per analysis frame, RMS energy, "
    "peak amplitude, and a silence flag (the VAD/silence-trim "
    "precursor every speech-data pipeline runs before ASR or audio "
    "tokenization). The decode is the deterministic md5 fake "
    "(_fake_pcm_frames — no codecs in the container) so the whole "
    "Python path is exactly oracle-checkable; rms = sqrt of an exact "
    "integer sum, bitwise deterministic. Arrow-batched, "
    "row-per-frame output, embarrassingly parallel.",
    oracle=f"""
WITH frames AS (
  SELECT doc_id, text, CAST(f AS INT) AS frame_id
  FROM documents, range(0, {AUDIO_FRAMES}) t(f)
),
b AS (
  SELECT doc_id, frame_id,
    CAST(concat('0x', substr(md5(text), 8 * frame_id + 1, 2)) AS INTEGER) AS b0,
    CAST(concat('0x', substr(md5(text), 8 * frame_id + 3, 2)) AS INTEGER) AS b1,
    CAST(concat('0x', substr(md5(text), 8 * frame_id + 5, 2)) AS INTEGER) AS b2,
    CAST(concat('0x', substr(md5(text), 8 * frame_id + 7, 2)) AS INTEGER) AS b3
  FROM frames
)
SELECT doc_id, frame_id,
  sqrt((b0*b0 + b1*b1 + b2*b2 + b3*b3) / 4.0) / 255.0 AS rms,
  GREATEST(b0, b1, b2, b3) / 255.0 AS peak,
  sqrt((b0*b0 + b1*b1 + b2*b2 + b3*b3) / 4.0) / 255.0 < 0.3 AS is_silence
FROM b
""",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for f, rms, peak, sil in _fake_pcm_frames(payload):
                    rows.append((doc_id, f, rms, peak, sil))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_id", "rms", "peak", "is_silence"]
            )

    return payloads.mapInPandas(extract, schema=_AUDIO_SCHEMA)


@register(
    "multimodal_scene_segments",
    ops=("F7", "W1", "W4", "A3"),
    doc="Video scene-change segmentation over the fake-decode frame "
    "stream: per-frame luminance (STUB: md5-derived — swap for a real "
    "frame-mean-luma kernel on a real cluster), a per-video LAG "
    "window marks cuts where |Δluma| > 64, a running cut count forms "
    "gaps-and-islands segment ids, and per-video stats (segments, "
    "longest run, mean luma) come from one hash agg. Frames are "
    "generated, not materialized from payload bytes — the window is "
    "partitioned per video so the sort never crosses documents.",
    oracle=f"""
WITH vids AS (
  SELECT doc_id, 1 + {_sql_md5_byte(2)} % 32 AS n_frames, text FROM documents
),
frames AS (
  SELECT doc_id, n_frames, UNNEST(generate_series(0, n_frames - 1)) AS f, text
  FROM vids
),
luma AS (
  SELECT doc_id, n_frames, f,
    CAST(concat('0x', substr(md5(text || ':' || CAST(f AS VARCHAR)), 1, 2)) AS INTEGER) AS luma
  FROM frames
),
cuts AS (
  SELECT doc_id, n_frames, f, luma,
    CASE WHEN abs(luma - LAG(luma) OVER (PARTITION BY doc_id ORDER BY f)) > 64
         THEN 1 ELSE 0 END AS is_cut
  FROM luma
),
segs AS (
  SELECT doc_id, n_frames, luma,
    SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY f
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM cuts
),
seg_len AS (
  SELECT doc_id, n_frames, seg_id, COUNT(*) AS seg_frames,
    CAST(SUM(luma) AS BIGINT) AS seg_luma
  FROM segs GROUP BY 1, 2, 3
)
SELECT doc_id, n_frames,
  COUNT(*) AS n_segments,
  CAST(MAX(seg_frames) AS BIGINT) AS longest_segment,
  CAST(SUM(seg_luma) AS DOUBLE) / n_frames AS mean_luma
FROM seg_len
GROUP BY 1, 2
""",
)
def multimodal_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents", spread=True)
    nf = 1 + F.conv(F.substring(F.md5("text"), 5, 2), 16, 10).cast("int") % 32
    frames = d.select(
        "doc_id", nf.alias("n_frames"), "text"
    ).select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("f"),
        "text",
    )
    luma = F.conv(
        F.substring(F.md5(F.concat(F.col("text"), F.lit(":"), F.col("f").cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")
    w = Window.partitionBy("doc_id").orderBy("f")
    cuts = frames.select("doc_id", "n_frames", "f", luma.alias("luma")).withColumn(
        "is_cut",
        F.when(
            F.abs(F.col("luma") - F.lag("luma").over(w)) > 64, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    segs = cuts.withColumn(
        "seg_id",
        F.sum("is_cut").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    seg_len = segs.groupBy("doc_id", "n_frames", "seg_id").agg(
        F.count(F.lit(1)).alias("seg_frames"),
        F.sum("luma").cast("bigint").alias("seg_luma"),
    )
    return seg_len.groupBy("doc_id", "n_frames").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("seg_frames").cast("bigint").alias("longest_segment"),
        (F.sum("seg_luma").cast("double") / F.col("n_frames")).alias("mean_luma"),
    )


@register(
    "multimodal_modality_mix",
    ops=("A1", "A3", "A9", "F13"),
    doc="Multimodal corpus data card: every payload is typed by its "
    "content signature (STUB: md5-derived modality — a real pipeline "
    "sniffs magic bytes), and the card reports per-modality document "
    "counts, byte budgets, frame totals (decode-cost proxy) and "
    "corpus shares — the planning table a mixed image/audio/video "
    "training run starts from. One scan, one hash agg; the card is "
    "modality-sized.",
    oracle=f"""
WITH typed AS (
  SELECT doc_id,
    octet_length(encode(text)) AS n_bytes,
    1 + {_sql_md5_byte(2)} % 32 AS n_frames,
    CASE {_sql_md5_byte(4)} % 3
      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_bytes) AS BIGINT) AS b FROM typed)
SELECT modality,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
  CAST(SUM(n_frames) AS BIGINT) AS total_frames,
  CAST(COUNT(*) AS DOUBLE) / t.n AS doc_share,
  CAST(SUM(n_bytes) AS DOUBLE) / t.b AS byte_share
FROM typed, tot t
GROUP BY modality, t.n, t.b
""",
)
def multimodal_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    payload = F.encode(F.col("text"), "UTF-8")
    byte2 = F.conv(F.substring(F.md5("text"), 5, 2), 16, 10).cast("int")
    byte4 = F.conv(F.substring(F.md5("text"), 9, 2), 16, 10).cast("int")
    typed = d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        (1 + byte2 % 32).alias("n_frames"),
        F.when(byte4 % 3 == 0, "image")
        .when(byte4 % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )
    tot = typed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_bytes").cast("bigint").alias("b"),
    )
    return (
        typed.crossJoin(F.broadcast(tot))
        .groupBy("modality", "n", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
        )
        .select(
            "modality",
            "n_docs",
            "total_bytes",
            "total_frames",
            (F.col("n_docs").cast("double") / F.col("n")).alias("doc_share"),
            (F.col("total_bytes").cast("double") / F.col("b")).alias("byte_share"),
        )
    )
