"""Versioned marker-committed tables (ops/versioned.py): atomic commit,
snapshot isolation, crash safety without recovery, conflict detection,
time travel, and retention vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.ops.versioned import (
    commit_version,
    current_version,
    list_versions,
    read_version,
    vacuum_versions,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, n, tag):
    return spark.range(0, n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_commit_read_roundtrip_and_versions(spark, table):
    assert current_version(spark, table) is None
    v1 = commit_version(spark, _df(spark, 10, "a"), table)
    v2 = commit_version(spark, _df(spark, 20, "b"), table)
    assert (v1, v2) == (1, 2)
    assert current_version(spark, table) == 2
    assert read_version(spark, table).count() == 20
    # time travel
    old = read_version(spark, table, version=1)
    assert old.count() == 10
    assert old.select("tag").distinct().first()[0] == "a"
    assert list_versions(spark, table) == [1, 2]


def test_snapshot_isolation_across_commit_and_vacuum(spark, table):
    commit_version(spark, _df(spark, 10, "a"), table)
    pinned = read_version(spark, table)  # bound to v1's immutable dir
    commit_version(spark, _df(spark, 99, "b"), table)
    # the pinned reader still sees v1 in full AFTER a newer commit
    assert pinned.count() == 10
    # and keep_last=2 retention keeps v1 alive for it
    assert vacuum_versions(spark, table, keep_last=2) == []
    assert pinned.count() == 10


def test_crash_before_marker_leaves_previous_version_current(spark, table):
    """A writer that dies after the snapshot write but before the marker
    claim (the analogue of the directory swap's crash window) leaves NO
    observable damage: the previous version stays current, no recovery
    step is needed, and the orphan is quiesced-vacuum garbage. There is
    no pointer file to lose — markers are create-once, so no crash can
    make committed history unreadable."""
    commit_version(spark, _df(spark, 10, "a"), table)
    # forge the crash: a complete v2 snapshot exists, marker never created
    _df(spark, 50, "b").write.parquet(table + "/v00000002")
    assert current_version(spark, table) == 1
    assert read_version(spark, table).count() == 10  # readers unaffected
    # a retrying writer simply commits over its own orphan
    v = commit_version(spark, _df(spark, 60, "c"), table)
    assert v == 2
    assert read_version(spark, table).count() == 60


def test_concurrent_commit_conflict_is_detected(spark, table):
    from otus_cpp_11_spark.ops.versioned import _claim_marker

    commit_version(spark, _df(spark, 10, "a"), table)
    # the race distilled: two writers claim the same next version — the
    # second exclusive create must fail loudly (this is the atomic
    # primitive commit_version stakes the protocol on)
    _claim_marker(spark, table, 2)
    with pytest.raises(RuntimeError, match="concurrent committer"):
        _claim_marker(spark, table, 2)
    # and a writer arriving AFTER the claim simply builds on top of it:
    # current advanced to the claimed number, the next commit takes 3
    assert current_version(spark, table) == 2
    assert commit_version(spark, _df(spark, 30, "c"), table) == 3


def test_vacuum_retention_and_quiesced_orphan_cleanup(spark, table):
    for i, tag in enumerate(["a", "b", "c", "d"], start=1):
        commit_version(spark, _df(spark, 10 * i, tag), table)
    # orphan newer than current (crashed or IN-FLIGHT writer)
    _df(spark, 5, "x").write.parquet(table + "/v00000009")
    # default vacuum never touches the orphan: it cannot distinguish a
    # crashed writer's leftover from a live commit's not-yet-marked
    # snapshot (the lakehouse.vacuum quiesce rule)
    assert vacuum_versions(spark, table, keep_last=2) == [1, 2]
    assert 9 in list_versions(spark, table)
    # quiesced cleanup removes it
    assert vacuum_versions(spark, table, keep_last=2, drop_uncommitted=True) == [9]
    assert list_versions(spark, table) == [3, 4]
    assert current_version(spark, table) == 4
    assert read_version(spark, table, version=3).count() == 30
    # current can never be vacuumed
    assert 4 not in vacuum_versions(spark, table, keep_last=1)
    assert read_version(spark, table).count() == 40
    assert os.path.exists(table + "/_commits/00000004")
