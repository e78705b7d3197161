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


class TestRealCodecs:
    """Dependency-free REAL decoders: byte-level WAV/PPM parsing must
    round-trip the synthesized containers and reject malformed bytes."""

    def test_wav_roundtrip_known_file(self):
        import io
        import struct
        import wave

        from otus_cpp_11_spark.ops.multimodal import parse_wav_bytes

        samples = [0, 1000, -1000, 32767, -32768]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack("<5h", *samples))
        rate, ch, bits, n, s = parse_wav_bytes(buf.getvalue())
        assert (rate, ch, bits, n, s) == (8000, 1, 16, 5, sum(samples))

    def test_wav_rejects_malformed(self):
        from otus_cpp_11_spark.ops.multimodal import parse_wav_bytes

        for bad in (b"", b"RIFFxxxxNOPE", b"RIFF\x00\x00\x00\x00WAVE"):
            with pytest.raises(ValueError):
                parse_wav_bytes(bad)

    def test_ppm_roundtrip_known_image(self):
        from otus_cpp_11_spark.ops.multimodal import parse_ppm_bytes

        raster = bytes([10, 20, 30, 40, 50, 60])  # 2x1 image
        w, h, r, g, b = parse_ppm_bytes(b"P6\n2 1\n255\n" + raster)
        assert (w, h, r, g, b) == (2, 1, 10 + 40, 20 + 50, 30 + 60)

    def test_ppm_rejects_malformed(self):
        from otus_cpp_11_spark.ops.multimodal import parse_ppm_bytes

        with pytest.raises(ValueError):
            parse_ppm_bytes(b"P5\n2 1\n255\n" + bytes(6))  # not P6
        with pytest.raises(ValueError):
            parse_ppm_bytes(b"P6\n2 2\n255\n" + bytes(6))  # truncated raster
        # headers that end mid-scan must honor the ValueError contract,
        # not escape as IndexError from the byte-index loops
        for bad in (b"P6", b"P6\n", b"P6\n2 ", b"P6\n2 1", b"P6\n2 1\n255"):
            with pytest.raises(ValueError):
                parse_ppm_bytes(bad)

    def test_decode_matches_synthesis_on_spark(self, spark):
        from otus_cpp_11_spark.ops.multimodal import (
            _wav_samples,
            decode_wav_features,
            synthesize_wav_payloads,
        )

        docs = spark.createDataFrame([(7,), (123,)], ["doc_id"])
        rows = {
            r.doc_id: r
            for r in decode_wav_features(synthesize_wav_payloads(docs)).collect()
        }
        for doc_id in (7, 123):
            want = _wav_samples(doc_id)
            assert rows[doc_id].n_samples == len(want)
            assert rows[doc_id].pcm_sum == sum(want)


def test_ahash_near_dup_counts_match_brute_force(spark):
    # the banded distinct-hash-value plan must equal the all-pairs
    # definition: for every doc, count others within hamming <= 2
    from otus_cpp_11_spark.registry import all_queries

    qs = all_queries()
    hashes = {
        r["doc_id"]: r["ahash"]
        for r in qs["ppm_ahash16"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    got = {
        r["doc_id"]: r["n_near_dups"]
        for r in qs["ppm_ahash_near_dup_counts"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(got) == set(hashes)
    for d, h in hashes.items():
        want = sum(
            1
            for d2, h2 in hashes.items()
            if d2 != d and bin(h ^ h2).count("1") <= 2
        )
        assert got[d] == want, (d, got[d], want)


def test_ahash_brightness_shift_tolerance():
    # the defining perceptual property: a constant brightness shift that
    # does not wrap any channel byte leaves the aHash unchanged
    from otus_cpp_11_spark.ops.multimodal import ahash16_from_ppm

    w, h = 6, 4
    base = [(37 + 3 * x + 5 * y) % 200 for y in range(h) for x in range(w)]
    def ppm(shift):
        raster = bytes(v + shift for v in base for _ in range(3))
        return f"P6\n{w} {h}\n255\n".encode() + raster
    assert ahash16_from_ppm(ppm(0)) == ahash16_from_ppm(ppm(40))


def test_wav_fp_near_dup_counts_match_brute_force(spark):
    # same contract as the aHash test: the banded distinct-value plan must
    # equal the all-pairs hamming definition
    from otus_cpp_11_spark.registry import all_queries

    qs = all_queries()
    fps = {
        r["doc_id"]: r["afp"]
        for r in qs["wav_fingerprint16"].fn(spark, "/root/testdata/sf0.01").collect()
    }
    got = {
        r["doc_id"]: r["n_near_dups"]
        for r in qs["wav_fp_near_dup_counts"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    }
    assert set(got) == set(fps)
    for d, h in fps.items():
        want = sum(
            1 for d2, h2 in fps.items() if d2 != d and bin(h ^ h2).count("1") <= 2
        )
        assert got[d] == want, (d, got[d], want)


def test_audio_fingerprint_gain_invariance():
    # the defining perceptual property: uniform volume scaling preserves
    # every energy-delta sign, hence the fingerprint
    import io
    import struct
    import wave

    from otus_cpp_11_spark.ops.multimodal import audio_fp16_from_wav

    base = [((17 * i) % 199) - 99 for i in range(120)]  # |s| < 128: 2x safe

    def wav(gain):
        samples = [s * gain for s in base]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    assert audio_fp16_from_wav(wav(1)) == audio_fp16_from_wav(wav(2))
    assert audio_fp16_from_wav(wav(1)) != 0  # non-degenerate signal
