"""Multimodal column plumbing (driver extension mandate, SURVEY.md §2.2):
image/audio/video as opaque ``binary`` columns with typed metadata, and
decode / feature-extract / frame-sample as Arrow-batched Python over
``mapInPandas``.

The actual media codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the codec step is stubbed two ways, clearly marked:

* ``decode_payload_features`` — a *deterministic fake decode* (byte stats +
  md5 checksum + a fake frame count) whose outputs are reproducible in SQL,
  so the whole mapInPandas pipeline — schema, Arrow binary transfer, batch
  iteration, partitioning — is real and oracle-gated end-to-end.
* ``decode_image`` / ``resample_audio`` — the real-codec entry points,
  gated behind import-try and raising ``NotImplementedError`` here.

Scale notes: mapInPandas streams Arrow batches (no per-row pickle);
payloads stay off the driver; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. At 100 TB the payload
column lives in its own parquet column chunk, so feature queries that don't
touch bytes never read them (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real codec path — not present in this environment
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

FAKE_FRAME_BYTES = 1000  # fake decode: one "frame" per kilobyte of payload

PAYLOAD_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<n_bytes: bigint, source: string>"
)
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, payload_md5 string, "
    "n_frames bigint, head_byte int"
)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Build the canonical multimodal table shape from the documents table:
    the UTF-8 bytes of ``text`` stand in for an encoded media payload, with
    typed metadata alongside. In production this is the ingestion schema;
    the engine never interprets the bytes outside a decode operator."""
    return docs.select(
        "doc_id",
        F.lit("application/x-fake-media").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_payload_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': per payload, byte count, md5 checksum, fake
    frame count, first byte. Deterministic by construction so the oracle
    can mirror it in SQL; swap the body for a real codec when available."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len).astype("int64"),
                    "payload_md5": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "n_frames": payload.map(
                        lambda b: len(b) // FAKE_FRAME_BYTES + 1
                    ).astype("int64"),
                    "head_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                }
            )

    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_image(payloads: DataFrame) -> DataFrame:
    """Real image decode (resize / pixel features). STUB: PIL is not in the
    container; the Spark-side contract (binary in, struct features out via
    mapInPandas) is exactly ``decode_payload_features``."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image codec unavailable in this environment; "
            "use decode_payload_features for the plumbing-verified fake path"
        )
    raise NotImplementedError("real decode intentionally unimplemented")


def sample_frames(payloads: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling over the fake decode: explode each payload into its
    fake frames and keep every ``every_n``-th — the video-pipeline shape
    (decode → explode frames → filter) with deterministic fake frames."""
    feats = decode_payload_features(payloads)
    frames = feats.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
    return frames.where(F.col("frame_idx") % every_n == 0)
