"""Round-10 lakehouse additions: ``commit_apply_dvs`` (Delta REORG
APPLY (PURGE) — rewrite only DV-carrying files) and the global
deleted-row pressure valve on ``commit_delete`` (r9 verdict item 2:
past the broadcast cap every read paid a shuffle anti-join until a
human ran OPTIMIZE; now the deleting writer auto-heals).

Reference parity note: the reference engine (CityAplons/otus-cpp-11)
has no storage transactions; this surface exists for the 100 TB
lakehouse mandate, mirroring Delta's public auto-compaction/REORG
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.ops import manifest_format as mf
from otus_cpp_11_spark.ops.versioned import (
    DV_AUTO_APPLY_MAX_ROWS,
    DV_BROADCAST_MAX_ROWS,
    commit_append,
    commit_apply_dvs,
    commit_delete,
    commit_version,
    current_version,
    list_versions,
    manifest_dvs,
    metadata_count,
    read_manifest,
    read_version,
    snapshot_dv_rows,
    version_header,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def _physical_rows(table, files):
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f"{table}/{f}").metadata.num_rows for f in files
    )


def test_apply_dvs_purges_only_dv_files(spark, table):
    """The purge rewrites exactly the DV-carrying files: clean files are
    carried by REFERENCE (same manifest paths), the new manifest has no
    DVs, physical rows equal the logical count, and stats/metadata
    counts survive (strict metadata_count stays green)."""
    commit_version(
        spark,
        _df(spark, 0, 400).repartitionByRange(4, "k"),
        table,
        stats_cols=["k"],
    )
    commit_delete(spark, table, "k < 50", dv_max_fraction=0.9)
    hdr2, files2 = read_manifest(spark, table, 2)
    dvd = set(manifest_dvs(hdr2))
    assert dvd and dvd < set(files2)
    v = commit_apply_dvs(spark, table)
    assert v == 3
    hdr3, files3 = read_manifest(spark, table, 3)
    assert manifest_dvs(hdr3) == {}
    assert set(files2) - dvd <= set(files3)  # clean files carried verbatim
    assert hdr3["apply_dvs_io"]["files_selected"] == len(dvd)
    assert hdr3["apply_dvs_io"]["dv_rows_applied"] == 50
    assert read_version(spark, table).count() == 350
    assert metadata_count(spark, table, strict=True) == 350
    assert _physical_rows(table, files3) == 350
    # pruning stats survive the purge: a bounded scan still dismisses files
    from otus_cpp_11_spark.ops.versioned import scan_version

    got, acct = scan_version(spark, table, bounds={"k": (390, 399)})
    assert got.count() == 10
    assert acct["files_scanned"] < acct["files_total"]  # pruning survived


def test_apply_dvs_noop_without_dvs(spark, table):
    commit_version(spark, _df(spark, 0, 10), table)
    assert commit_apply_dvs(spark, table) == 1
    assert current_version(spark, table) == 1


def test_pressure_valve_auto_heals_wide_rtbf(spark, table):
    """THE valve gate (r9 verdict item 2's 'Done'): a wide RTBF sweep
    past the budget auto-commits the purge in the same call — the table
    lands DV-free and subsequent reads mask nothing (the over-cap
    shuffle fallback can never persist)."""
    commit_version(
        spark,
        _df(spark, 0, 300).repartitionByRange(3, "k"),
        table,
        stats_cols=["k"],
    )
    v = commit_delete(
        spark, table, "k % 3 = 0", dv_max_fraction=0.5, dv_auto_apply_rows=10
    )
    assert v == 2  # the delete's own version
    assert list_versions(spark, table) == [1, 2, 3]
    assert version_header(spark, table, 2)["delete_io"]["rewritten"] == 0
    hdr3, files3 = read_manifest(spark, table, 3)
    assert hdr3["op"] == "optimize"
    assert hdr3["trigger"] == "dv_pressure_valve"
    assert manifest_dvs(hdr3) == {}
    assert snapshot_dv_rows(spark, table, 3) == 0
    assert read_version(spark, table).count() == 200
    assert _physical_rows(table, files3) == 200
    # time travel: v2 still serves the masked view (the purge is layout)
    assert read_version(spark, table, 2).count() == 200
    assert snapshot_dv_rows(spark, table, 2) == 100


def test_valve_below_budget_stays_single_commit(spark, table):
    """Under the budget the delete is one commit and DVs persist — the
    valve never churns versions on healthy tables; the DEFAULT budget is
    the broadcast cap (fires exactly when reads would degrade)."""
    assert DV_AUTO_APPLY_MAX_ROWS == DV_BROADCAST_MAX_ROWS
    commit_version(spark, _df(spark, 0, 300).coalesce(1), table)
    commit_delete(spark, table, "k < 30", dv_max_fraction=0.5)  # default budget
    assert list_versions(spark, table) == [1, 2]
    assert snapshot_dv_rows(spark, table, 2) == 30
    # and an explicit budget ABOVE the sweep also stays put
    commit_delete(
        spark, table, "k >= 290", dv_max_fraction=0.5, dv_auto_apply_rows=100
    )
    assert list_versions(spark, table) == [1, 2, 3]
    assert snapshot_dv_rows(spark, table, 3) == 40


def test_valve_accumulates_across_deletes_then_heals(spark, table):
    """The gauge is SNAPSHOT-wide: two small deletes whose combined DV
    rows cross the budget heal on the second delete."""
    commit_version(
        spark,
        _df(spark, 0, 400).repartitionByRange(2, "k"),
        table,
        stats_cols=["k"],
    )
    commit_delete(
        spark, table, "k < 30", dv_max_fraction=0.5, dv_auto_apply_rows=50
    )
    assert list_versions(spark, table) == [1, 2]  # 30 <= 50: no purge
    commit_delete(
        spark, table, "k >= 370", dv_max_fraction=0.5, dv_auto_apply_rows=50
    )
    # 30 + 30 = 60 > 50: the second delete heals the whole backlog
    assert list_versions(spark, table) == [1, 2, 3, 4]
    hdr4, _ = read_manifest(spark, table, 4)
    assert hdr4["op"] == "optimize" and manifest_dvs(hdr4) == {}
    assert read_version(spark, table).count() == 340


def test_apply_dvs_composes_with_concurrent_append(spark, table):
    """OCC face: the purge is an 'optimize' commit — a concurrent append
    landing between the purge's read and its commit composes via the
    retry engine (appends never conflict with layout ops)."""
    from unittest import mock

    import otus_cpp_11_spark.ops.versioned as V

    commit_version(spark, _df(spark, 0, 100).coalesce(1), table)
    commit_delete(spark, table, "k < 10", dv_max_fraction=0.2)
    commit_append(spark, _df(spark, 1000, 1010, "late"), table)  # v3

    calls = {"n": 0}
    real = V.current_version

    def stale_once(s, t):
        calls["n"] += 1
        return 2 if calls["n"] == 1 else real(s, t)

    with mock.patch.object(V, "current_version", side_effect=stale_once):
        v = commit_apply_dvs(spark, table, max_retries=2)
    assert v == 4
    got = read_version(spark, table)
    assert got.count() == 100  # 100 - 10 + 10 appended
    assert got.where("tag = 'late'").count() == 10
    hdr4, _ = read_manifest(spark, table, 4)
    assert manifest_dvs(hdr4) == {}


def test_valve_purge_is_cdf_neutral(spark, table):
    """The auto-purge feeds NOTHING: the deletes were fed at DV-attach
    time, and replaying the feed lands on the post-purge logical state
    (the compaction CDF contract extends to the valve's commit)."""
    from otus_cpp_11_spark.ops.versioned import read_change_feed

    commit_version(spark, _df(spark, 0, 100).coalesce(1), table)
    commit_delete(
        spark,
        table,
        "k % 2 = 0",
        dv_max_fraction=0.6,
        dv_auto_apply_rows=5,
        change_feed=True,
    )
    assert list_versions(spark, table) == [1, 2, 3]
    feed = read_change_feed(spark, table, 2, 3)
    assert feed.where("_commit_version = 3").count() == 0
    assert feed.where(
        "_commit_version = 2 AND _change_type = 'delete'"
    ).count() == 50


# ---------------------------------------------------------------------------
# commit_autocompact — Delta autoCompact's debris sweep (cluster-agnostic)
# ---------------------------------------------------------------------------


def test_autocompact_packs_only_small_files(spark, table):
    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(
        spark, _df(spark, 0, 1000).coalesce(1), table, stats_cols=["k"]
    )  # one big file
    for i in range(4):  # per-micro-batch debris: 4 x 10-row files
        commit_append(
            spark, _df(spark, 2000 + 10 * i, 2000 + 10 * i + 10).coalesce(1),
            table, stats_cols=["k"],
        )
    v = commit_autocompact(
        spark, table, small_file_rows=100, max_rows_per_file=1000
    )
    assert v == 6
    hdr, files = read_manifest(spark, table, v)
    io = hdr["autocompact_io"]
    assert io["files_selected"] == 4 and io["rows"] == 40
    assert io["files_after"] == 2  # 1 carried big + 1 packed
    assert len(files) == 2
    assert read_version(spark, table).count() == 1040
    assert metadata_count(spark, table, strict=True) == 1040
    # the big file was carried by REFERENCE
    _, files5 = read_manifest(spark, table, 5)
    big = [f for f in files5 if f in set(files)]
    assert len(big) == 1
    # stats survive: key-bounded scans still prune
    from otus_cpp_11_spark.ops.versioned import scan_version

    got, acct = scan_version(spark, table, bounds={"k": (0, 10)})
    assert got.count() == 11
    assert acct["files_scanned"] == 1


def test_autocompact_noop_below_min_files_and_idempotent(spark, table):
    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(spark, _df(spark, 0, 10).coalesce(1), table)
    assert (
        commit_autocompact(spark, table, 100, 1000, min_small_files=2) == 1
    )  # one small file: nothing to merge with
    commit_append(spark, _df(spark, 100, 110).coalesce(1), table)
    v = commit_autocompact(spark, table, 100, 1000)
    assert v == 3
    # a second sweep finds one adequately-merged file: no-op, no churn
    assert commit_autocompact(spark, table, 100, 1000) == 3


def test_autocompact_applies_dvs_of_small_files(spark, table):
    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(spark, _df(spark, 0, 50).coalesce(1), table)
    commit_append(spark, _df(spark, 100, 150).coalesce(1), table)
    commit_delete(spark, table, "k < 5", dv_max_fraction=0.2)
    v = commit_autocompact(spark, table, 1000, 1000)
    hdr, files = read_manifest(spark, table, v)
    assert manifest_dvs(hdr) == {}
    assert read_version(spark, table).count() == 95
    assert _physical_rows(table, files) == 95
