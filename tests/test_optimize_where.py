"""OPTIMIZE ... WHERE (Delta parity, generalized to stats ranges):
``commit_compaction(where_bounds=...)`` scopes the rewrite to files
whose manifest extents may overlap the predicate range — the scheduled
hot-ingest-range compaction pattern — carrying everything else by
reference untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from otus_cpp_11_spark.ops.versioned import (
    commit_append,
    commit_compaction,
    commit_version,
    current_version,
    metadata_count,
    read_manifest,
    read_version,
    scan_version,
)


def _df(spark, a, b):
    return spark.range(a, b).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def _files(spark, tbl, v=None):
    return read_manifest(spark, tbl, v or current_version(spark, tbl))[1]


def test_where_bounds_scopes_the_rewrite(spark, tmp_path):
    tbl = str(tmp_path / "t")
    commit_version(spark, _df(spark, 0, 1000).coalesce(1), tbl,
                   stats_cols=["k"])  # one cold file, k in [0, 999]
    for i in range(4):  # hot ingest debris: k in [1000, 1040)
        commit_append(
            spark, _df(spark, 1000 + 10 * i, 1010 + 10 * i).coalesce(1),
            tbl, stats_cols=["k"],
        )
    before = set(_files(spark, tbl))
    v = commit_compaction(
        spark, tbl, max_rows_per_file=10_000, cluster_cols=["k"],
        where_bounds={"k": (1000, 2000)},
    )
    after = _files(spark, tbl, v)
    # the cold file was OUT of range: carried by reference, byte-same
    cold = [f for f in after if f in before]
    assert len(cold) == 1
    # the 4 hot files packed into 1 fresh file
    assert len(after) == 2
    assert read_version(spark, tbl).count() == 1040
    assert metadata_count(spark, tbl, strict=True) == 1040
    # stats survive on the packed file: range scans still prune
    got, acct = scan_version(spark, tbl, bounds={"k": (0, 10)})
    assert got.count() == 11 and acct["files_scanned"] == 1


def test_where_bounds_outside_everything_noops(spark, tmp_path):
    tbl = str(tmp_path / "t")
    commit_version(spark, _df(spark, 0, 100).coalesce(1), tbl,
                   stats_cols=["k"])
    v0 = current_version(spark, tbl)
    assert commit_compaction(
        spark, tbl, 1000, ["k"], where_bounds={"k": (10_000, 20_000)}
    ) == v0  # no file in range: no version churn


def test_where_bounds_composes_with_small_file_rule(spark, tmp_path):
    tbl = str(tmp_path / "t")
    # two debris clusters: k in [0,20) (2 files) and [1000,1020) (2 files)
    for lo in (0, 10, 1000, 1010):
        commit_append(
            spark, _df(spark, lo, lo + 10).coalesce(1), tbl,
            stats_cols=["k"],
        )
    before = set(_files(spark, tbl))
    v = commit_compaction(
        spark, tbl, 10_000, ["k"],
        small_file_rows=100, where_bounds={"k": (1000, 2000)},
    )
    after = _files(spark, tbl, v)
    # only the in-range debris packed; the out-of-range pair untouched
    assert len(after) == 3
    assert len([f for f in after if f in before]) == 2
    assert read_version(spark, tbl).count() == 40
