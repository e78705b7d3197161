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
    attach_payloads,
    decode_payload_features,
    sample_frames,
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
