"""Multimodal plumbing tests: Arrow binary transfer shape, schema, stub
gating (SURVEY.md extension mandate — codec stubbed, Spark side real)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.ops.multimodal import (
    attach_payloads,
    decode_image,
    decode_payload_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return attach_payloads(docs)


class TestPayloadSchema:
    def test_payload_is_binary_with_typed_meta(self, payloads):
        dt = dict(payloads.dtypes)
        assert dt["payload"] == "binary"
        assert dt["media_type"] == "string"
        assert dt["meta"].startswith("struct<n_bytes:bigint")

    def test_payload_bytes_match_text(self, spark, payloads):
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        row = (
            payloads.join(docs, "doc_id")
            .select("payload", "text")
            .first()
        )
        assert bytes(row.payload) == row.text.encode("utf-8")


class TestDecode:
    def test_feature_schema_and_checksum(self, payloads):
        feats = decode_payload_features(payloads)
        assert dict(feats.dtypes) == {
            "doc_id": "bigint",
            "n_bytes": "bigint",
            "payload_md5": "string",
            "n_frames": "bigint",
            "head_byte": "int",
        }
        row = feats.orderBy("doc_id").first()
        src = payloads.orderBy("doc_id").first()
        assert row.payload_md5 == hashlib.md5(bytes(src.payload)).hexdigest()
        assert row.n_bytes == len(bytes(src.payload))

    def test_empty_payload_batch(self, spark):
        # zero-byte payload flows through the Arrow batch path
        df = spark.createDataFrame([(1, "")], ["doc_id", "text"]).select(
            "doc_id",
            F.lit("t").alias("media_type"),
            F.encode("text", "UTF-8").alias("payload"),
            F.struct(F.octet_length("text").alias("n_bytes")).alias("meta"),
        )
        row = decode_payload_features(df).first()
        assert row.n_bytes == 0 and row.head_byte == -1 and row.n_frames == 1

    def test_frame_sampling(self, payloads):
        frames = sample_frames(payloads, every_n=2)
        idx = [r.frame_idx for r in frames.collect()]
        assert all(i % 2 == 0 for i in idx)

    def test_real_codec_stub_raises(self, payloads):
        with pytest.raises(NotImplementedError):
            decode_image(payloads)
