"""Versioned pointer-file tables (ops/versioned.py): atomic commit,
snapshot isolation, crash safety without recovery, time travel, and
retention vacuum."""

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


def test_crash_before_flip_leaves_previous_version_current(spark, table):
    """A writer that dies after the snapshot write but before the pointer
    flip (the analogue of the directory swap's crash window) leaves NO
    observable damage: the previous version stays current, no recovery
    step is needed, and the orphan is vacuumable garbage."""
    commit_version(spark, _df(spark, 10, "a"), table)
    # forge the crash: a complete v2 snapshot exists, pointer never moved
    _df(spark, 50, "b").write.parquet(table + "/v00000002")
    assert current_version(spark, table) == 1
    assert read_version(spark, table).count() == 10  # readers unaffected
    # a retrying writer simply commits over the orphan (mode overwrite)
    v = commit_version(spark, _df(spark, 60, "c"), table)
    assert v == 2
    assert read_version(spark, table).count() == 60


def test_vacuum_retention_and_orphans(spark, table):
    for i, tag in enumerate(["a", "b", "c", "d"], start=1):
        commit_version(spark, _df(spark, 10 * i, tag), table)
    # orphan newer than current (crashed writer)
    _df(spark, 5, "x").write.parquet(table + "/v00000009")
    removed = vacuum_versions(spark, table, keep_last=2)
    assert removed == [1, 2, 9]
    assert list_versions(spark, table) == [3, 4]
    assert current_version(spark, table) == 4
    assert read_version(spark, table, version=3).count() == 30
    # current can never be vacuumed
    assert 4 not in vacuum_versions(spark, table, keep_last=1)
    assert read_version(spark, table).count() == 40
    assert os.path.exists(table + "/_CURRENT")
