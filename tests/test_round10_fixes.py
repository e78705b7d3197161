"""Round-10 regression tests for the r9 ADVICE findings:

1. (medium) DV sidecar reads were PERMISSIVE: a truncated/corrupt
   sidecar JSON yielded i=NULL, explode dropped it, and the anti-join
   silently stopped masking that file — RTBF-deleted rows reappeared.
   Now FAILFAST + an in-data-path count check against the descriptor's
   ``n`` make both malformed AND valid-but-short sidecars loud.
2. (low) The stream admission cursor hard-failed a healthy stream if a
   future engine called latestOffset() before the restart replay. Now a
   backward batch whose end was produced by THIS reader while unlearned
   degrades to an empty batch with a floor clamp; a genuinely regressed
   offset still fails loudly.
3. (low) The OCC retry's schema-conflict check compared simpleString()
   which ignores nullability/metadata — a concurrent nullability-only
   schema change restaged silently. Now full StructType equality aborts.

Reference parity note: the reference engine (CityAplons/otus-cpp-11,
src/mapreduce.cpp) has no storage transactions or streaming; this
surface exists for the 100 TB lakehouse mandate.
"""

from __future__ import annotations

import json
from unittest import mock

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

import otus_cpp_11_spark.ops.versioned as V
from otus_cpp_11_spark.ops import manifest_format as mf
from otus_cpp_11_spark.ops.versioned import (
    commit_append,
    commit_delete,
    commit_version,
    current_version,
    manifest_dvs,
    read_manifest,
    read_version,
)
from otus_cpp_11_spark.sources import _VTStreamReader


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def _stale_once(real_cv, stale_version):
    calls = {"n": 0}

    def fn(s, t):
        calls["n"] += 1
        return stale_version if calls["n"] == 1 else real_cv(s, t)

    return fn


# ---------------------------------------------------------------------------
# 1. corrupt / truncated DV sidecars fail loudly instead of unmasking
# ---------------------------------------------------------------------------


def _spilled_sidecar(spark, table):
    n = 4 * mf.DV_INLINE_MAX
    cut = mf.DV_INLINE_MAX + 1
    commit_version(spark, _df(spark, 0, n).coalesce(1), table)
    commit_delete(spark, table, f"k < {cut}", dv_max_fraction=0.5)
    hdr, _ = read_manifest(spark, table, 2)
    (dv,) = manifest_dvs(hdr).values()
    assert "p" in dv  # genuinely spilled
    return f"{table}/{dv['p']}", n - cut


def _overwrite(sidecar: str, text: str) -> None:
    """Simulate corruption: rewrite the sidecar bytes and drop the local
    FS's Hadoop .crc so the read exercises the ENGINE's checks, not the
    checksum layer (object stores have no client-side crc sidecars)."""
    import os

    with open(sidecar, "w") as fh:
        fh.write(text)
    d, b = os.path.split(sidecar)
    crc = os.path.join(d, f".{b}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_truncated_sidecar_fails_instead_of_unmasking(spark, table):
    """A sidecar that is VALID JSON but carries fewer indices than its
    descriptor's ``n`` (torn write, partial restore) must raise — under
    the old PERMISSIVE read it quietly masked fewer rows."""
    sidecar, live_rows = _spilled_sidecar(spark, table)
    assert read_version(spark, table).count() == live_rows  # intact
    _overwrite(sidecar, json.dumps({"i": [0, 1, 2]}))
    with pytest.raises(Exception, match="corrupt DV sidecar"):
        read_version(spark, table).count()


def test_malformed_sidecar_fails_fast(spark, table):
    """Non-JSON sidecar bytes (corruption) raise via FAILFAST — under
    PERMISSIVE they became i=NULL and the file's mask vanished."""
    sidecar, _ = _spilled_sidecar(spark, table)
    _overwrite(sidecar, "this is { not json")
    with pytest.raises(Exception):
        read_version(spark, table).count()


def test_missing_i_key_sidecar_fails(spark, table):
    """A sidecar whose JSON lacks the ``i`` key reads as i=NULL;
    size(NULL) != n must trip the count check, not silently no-op."""
    sidecar, _ = _spilled_sidecar(spark, table)
    _overwrite(sidecar, json.dumps({"wrong_key": [1]}))
    with pytest.raises(Exception, match="corrupt DV sidecar"):
        read_version(spark, table).count()


# ---------------------------------------------------------------------------
# 2. admission cursor degrades gracefully on an unlearned backward batch
# ---------------------------------------------------------------------------


def _five_version_table(spark, table):
    commit_version(spark, _df(spark, 0, 10).coalesce(1), table)
    for i in range(4):
        commit_append(
            spark, _df(spark, 100 * (i + 1), 100 * (i + 1) + 5).coalesce(1), table
        )
    assert current_version(spark, table) == 5


def test_unlearned_backward_batch_degrades_then_clamps(spark, table):
    """Simulated future-engine call order: latestOffset() fires BEFORE
    the restart replay. The capped offset (from the seeded cursor) lands
    below the checkpoint; the backward batch must plan EMPTY (not raise),
    teach the cursor the checkpointed position, and floor-clamp the next
    forward range so no already-streamed version is re-emitted."""
    _five_version_table(spark, table)
    reader = _VTStreamReader({"path": table, "maxFilesPerTrigger": "1"})
    capped = reader.latestOffset()
    assert capped == {"version": 1}  # seeded cursor 0 + cap 1 file
    # restart replay arrives late: checkpoint says version 4
    parts = reader.partitions({"version": 4}, capped)
    assert parts == []  # degraded, not raised
    # cap resumes from the checkpointed position on the next trigger
    assert reader.latestOffset() == {"version": 5}
    # the regressed WAL entry (committed offset back at 1) must not
    # re-emit versions 2..4 — the floor clamps the range to (4, 5]
    parts = reader.partitions({"version": 1}, {"version": 5})
    assert len(parts) == 1  # only version 5's single added file


def test_learned_reader_backward_batch_still_raises(spark, table):
    """A LEARNED reader planned backward is a genuine anomaly (corrupted
    checkpoint / rebuilt table): the loud failure stays — silent
    skipping there could lose a rebuilt table's data."""
    _five_version_table(spark, table)
    reader = _VTStreamReader({"path": table, "maxFilesPerTrigger": "1"})
    reader.commit({"version": 4})  # position confirmed by the engine
    with pytest.raises(ValueError, match="planned backward"):
        reader.partitions({"version": 4}, {"version": 2})


def test_fresh_reader_replaying_degraded_wal_entry_degrades_again(spark, table):
    """r10 review: if a degraded (backward) batch landed in the WAL and
    the stream stopped, a RESTART replays it on a fresh reader whose
    position is unlearned — that replay must degrade again (empty batch
    + floor), not brick the stream on every start."""
    _five_version_table(spark, table)
    reader = _VTStreamReader({"path": table, "maxFilesPerTrigger": "1"})
    parts = reader.partitions({"version": 4}, {"version": 1})  # WAL replay
    assert parts == []
    # and the floor keeps versions <= 4 from re-emitting afterwards
    parts = reader.partitions({"version": 1}, {"version": 5})
    assert len(parts) == 1


def test_current_engine_order_unaffected_by_degrade_path(spark, table):
    """pyspark 4.1 order (commit replay teaches the cursor first):
    capped catch-up still drains one version per trigger, exactly-once."""
    _five_version_table(spark, table)
    reader = _VTStreamReader({"path": table, "maxFilesPerTrigger": "1"})
    reader.commit({"version": 3})  # restart replay
    assert reader.latestOffset() == {"version": 4}
    parts = reader.partitions({"version": 3}, {"version": 4})
    assert len(parts) == 1


# ---------------------------------------------------------------------------
# 3. nullability-only concurrent schema change aborts the OCC retry
# ---------------------------------------------------------------------------


def test_nullability_only_schema_change_aborts_dml_retry(spark, table):
    """simpleString() hides nullability: a winner commit that relaxed a
    non-nullable column restaged silently under the old check. Full
    StructType comparison must abort the retry loudly."""
    commit_version(spark, _df(spark, 0, 10, "base"), table, stats_cols=["k"])
    header, files = read_manifest(spark, table, 1)
    committed = StructType.fromJson(json.loads(header["schema"]))
    assert any(not f.nullable for f in committed.fields)  # test premise
    relaxed = StructType(
        [StructField(f.name, f.dataType, True, f.metadata) for f in committed.fields]
    )
    assert relaxed.simpleString() == committed.simpleString()
    assert relaxed != committed
    # winner: a metadata-only commit carrying the same files under the
    # relaxed schema (a future non-additive evolution would do this)
    V._commit(
        spark,
        table,
        2,
        "append",
        relaxed,
        files,
        None,
        dict(V.manifest_stats(header)),
        rows=V.manifest_rows(header),
        dvs={},
    )
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        with pytest.raises(V.CommitConflict, match="schema"):
            commit_delete(spark, table, "k < 5", max_retries=2)
    # the loser committed nothing; the winner's state is intact
    assert current_version(spark, table) == 2
    assert read_version(spark, table).count() == 10
