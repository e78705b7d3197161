"""Multimodal queries: the mapInPandas decode pipeline, oracle-gated.

The fake decode is deterministic (byte count, md5, fake frames), so DuckDB
can mirror it in SQL — which makes the *plumbing* (Arrow binary transfer,
batch iteration, schema) the thing under test, exactly as the extension
mandate asks (codec stubbed, Spark side real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.ops.multimodal import (
    FAKE_FRAME_BYTES,
    WAV_SAMPLE_RATE,
    attach_payloads,
    decode_payload_features,
    decode_ppm_features,
    decode_wav_features,
    sample_frames,
    synthesize_ppm_payloads,
    synthesize_wav_payloads,
)
from otus_cpp_11_spark.registry import register


@register(
    "multimodal_decode_features",
    oracle=f"""
SELECT doc_id,
       OCTET_LENGTH(ENCODE(text)) AS n_bytes,
       MD5(text) AS payload_md5,
       OCTET_LENGTH(ENCODE(text)) // {FAKE_FRAME_BYTES} + 1 AS n_frames,
       CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN -1
            ELSE CAST(ORD(SUBSTRING(text, 1, 1)) AS INT) END AS head_byte
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload decode via mapInPandas (Arrow-batched Python): byte
    stats + checksum + fake frame count per document payload."""
    d = load_table(spark, sf_dir, "documents")
    return decode_payload_features(attach_payloads(d)).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) // {FAKE_FRAME_BYTES} + 1 AS n_frames
  FROM documents
)
SELECT doc_id, f AS frame_idx
FROM feats CROSS JOIN UNNEST(RANGE(0, n_frames)) AS t(f)
WHERE f % 2 = 0
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: decode → explode fake frames → keep every 2nd (the
    video decode→sample pipeline shape over the binary column)."""
    d = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payloads(d), every_n=2).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "wav_decode_features",
    bench=True,
    oracle=f"""
SELECT doc_id,
       {WAV_SAMPLE_RATE} AS sample_rate,
       1 AS n_channels,
       16 AS bits_per_sample,
       doc_id % 100 + 50 AS n_samples,
       CAST((SELECT SUM(((doc_id * 31 + 7 * i) % 256 - 128) * 256)
             FROM UNNEST(RANGE(0, doc_id % 100 + 50)) AS t(i)) AS BIGINT) AS pcm_sum
FROM documents
ORDER BY doc_id
""",
)
def wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode path: synthesize a genuine 16-bit mono RIFF/WAVE
    payload per document (PCM samples a closed form of doc_id), then parse
    the container byte-for-byte inside Arrow-batched mapInPandas — chunk
    walk, fmt fields, PCM unpack (ops.multimodal.parse_wav_bytes). The
    oracle predicts every decoded feature from the closed form, so any
    misparsed offset or field hash-mismatches. Demonstrates the decode
    contract the PIL/ffmpeg stubs document, with zero external codecs."""
    d = load_table(spark, sf_dir, "documents")
    return decode_wav_features(synthesize_wav_payloads(d)).orderBy("doc_id")


@register(
    "ppm_decode_features",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 8 + 2 AS INT) AS width,
       CAST(doc_id % 5 + 2 AS INT) AS height,
       CAST((SELECT SUM((doc_id + 3 * (i % (doc_id % 8 + 2)) + 5 * (i // (doc_id % 8 + 2))) % 256)
             FROM UNNEST(RANGE(0, (doc_id % 8 + 2) * (doc_id % 5 + 2))) AS t(i)) AS BIGINT) AS r_sum,
       CAST((SELECT SUM((doc_id + 7 * (i % (doc_id % 8 + 2)) + 11 * (i // (doc_id % 8 + 2))) % 256)
             FROM UNNEST(RANGE(0, (doc_id % 8 + 2) * (doc_id % 5 + 2))) AS t(i)) AS BIGINT) AS g_sum,
       CAST((SELECT SUM((doc_id + 13 * (i % (doc_id % 8 + 2)) + 17 * (i // (doc_id % 8 + 2))) % 256)
             FROM UNNEST(RANGE(0, (doc_id % 8 + 2) * (doc_id % 5 + 2))) AS t(i)) AS BIGINT) AS b_sum,
FROM documents
ORDER BY doc_id
""",
)
def ppm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path: synthesize a genuine binary PPM (P6) per
    document (pixels a closed form of doc_id, x, y), then parse magic,
    header tokens, and RGB raster from the raw bytes inside mapInPandas
    (ops.multimodal.parse_ppm_bytes). Oracle recomputes dimensions and
    per-channel sums from the closed form."""
    d = load_table(spark, sf_dir, "documents")
    return decode_ppm_features(synthesize_ppm_payloads(d)).orderBy("doc_id")
