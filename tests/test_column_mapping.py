"""Column mapping (r9 verdict item 5 — Delta's rename/drop without
rewrite): logical names map to frozen PHYSICAL names recorded per
version; RENAME and DROP are metadata-only commits (zero data IO), time
travel reads every snapshot under the names it had then, and every
writer/reader face (append, DML, compaction, connector, CDF, stats
pruning) respects the mapping.

Reference parity note: the reference engine (CityAplons/otus-cpp-11)
has no schema story; this mirrors Delta's public column-mapping
semantics for the 100 TB lakehouse mandate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.ops.versioned import (
    commit_append,
    commit_delete,
    commit_drop_column,
    commit_rename_column,
    commit_update,
    commit_upsert,
    commit_version,
    commit_compaction,
    current_version,
    manifest_cmap,
    metadata_count,
    read_change_feed,
    read_manifest,
    read_version,
    scan_version,
    version_header,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def _data_bytes(table):
    total = 0
    for r, _, fs in os.walk(os.path.join(table, "_data")):
        for f in fs:
            total += os.path.getsize(os.path.join(r, f))
    return total


def test_rename_is_metadata_only_and_time_travel_correct(spark, table):
    commit_version(spark, _df(spark, 0, 100).coalesce(2), table, stats_cols=["k"])
    before = _data_bytes(table)
    v = commit_rename_column(spark, table, "k", "key_id")
    assert v == 2
    assert _data_bytes(table) == before  # ZERO data bytes moved
    hdr2, files2 = read_manifest(spark, table, 2)
    _, files1 = read_manifest(spark, table, 1)
    assert files2 == files1  # every file carried by reference
    assert manifest_cmap(hdr2) == {"key_id": "k"}
    cur = read_version(spark, table)
    assert cur.columns == ["key_id", "tag"]
    assert cur.agg(F.sum("key_id")).first()[0] == sum(range(100))
    # time travel: version 1 still reads under the OLD name
    old = read_version(spark, table, 1)
    assert old.columns == ["k", "tag"]
    assert old.agg(F.sum("k")).first()[0] == sum(range(100))
    assert metadata_count(spark, table, strict=True) == 100


def test_rename_back_to_physical_restores_identity(spark, table):
    commit_version(spark, _df(spark, 0, 10), table)
    commit_rename_column(spark, table, "k", "key_id")
    commit_rename_column(spark, table, "key_id", "k")
    hdr, _ = read_manifest(spark, table, 3)
    assert manifest_cmap(hdr) == {}
    assert read_version(spark, table).columns == ["k", "tag"]


def test_drop_is_metadata_only_and_burns_physical(spark, table):
    commit_version(spark, _df(spark, 0, 50).coalesce(1), table)
    before = _data_bytes(table)
    commit_drop_column(spark, table, "tag")
    assert _data_bytes(table) == before
    cur = read_version(spark, table)
    assert cur.columns == ["k"]
    assert cur.count() == 50
    # time travel still serves the dropped column
    assert read_version(spark, table, 1).columns == ["k", "tag"]
    # the burned physical name cannot be reused by additive evolution
    hdr, _ = read_manifest(spark, table, 2)
    assert hdr["cmap_burned"] == ["tag"]
    evolved = spark.range(5).select(
        (F.col("id") + 100).alias("k"), F.lit("zz").alias("tag")
    )
    with pytest.raises(ValueError, match="collides"):
        commit_append(spark, evolved, table, merge_schema=True)


def test_append_after_rename_writes_physical_names(spark, table):
    commit_version(spark, _df(spark, 0, 10).coalesce(1), table, stats_cols=["k"])
    commit_rename_column(spark, table, "k", "key_id")
    late = spark.range(100, 105).select(
        F.col("id").alias("key_id"), F.lit("late").alias("tag")
    )
    commit_append(spark, late, table, stats_cols=["key_id"])
    got = read_version(spark, table)
    assert got.count() == 15
    assert got.where("key_id >= 100").count() == 5
    # the new files physically carry the ORIGINAL name (mapping invariant)
    hdr, files = read_manifest(spark, table, 3)
    import pyarrow.parquet as pq

    fresh = sorted(set(files) - set(read_manifest(spark, table, 2)[1]))
    assert fresh
    for f in fresh:
        cols = pq.ParquetFile(f"{table}/{f}").schema_arrow.names
        assert "k" in cols and "key_id" not in cols
    # stats pruning works through the mapping on LOGICAL bounds
    got2, acct = scan_version(spark, table, bounds={"key_id": (100, 104)})
    assert got2.count() == 5
    assert acct["files_scanned"] < acct["files_total"]


def test_dml_and_upsert_after_rename(spark, table):
    commit_version(spark, _df(spark, 0, 20).coalesce(2), table, stats_cols=["k"])
    commit_rename_column(spark, table, "k", "key_id")
    commit_delete(spark, table, "key_id < 5")
    assert read_version(spark, table).count() == 15
    commit_update(spark, table, "key_id = 10", {"tag": F.lit("upd")})
    assert (
        read_version(spark, table).where("key_id = 10").first()["tag"] == "upd"
    )
    delta = spark.createDataFrame([(6, "merged")], "key_id long, tag string")
    commit_upsert(spark, delta, table, keys=["key_id"])
    got = read_version(spark, table)
    assert got.where("key_id = 6").first()["tag"] == "merged"
    assert got.count() == 15
    assert metadata_count(spark, table, strict=True) == 15


def test_dv_delete_and_compaction_after_rename(spark, table):
    commit_version(spark, _df(spark, 0, 100).coalesce(1), table, stats_cols=["k"])
    commit_rename_column(spark, table, "k", "key_id")
    commit_delete(spark, table, "key_id < 10", dv_max_fraction=0.2)
    assert version_header(spark, table, 3)["delete_io"]["rewritten"] == 0
    assert read_version(spark, table).count() == 90
    v = commit_compaction(spark, table, 1000, ["key_id"], small_file_rows=5)
    assert v == 4
    got = read_version(spark, table)
    assert got.columns == ["key_id", "tag"] and got.count() == 90
    assert metadata_count(spark, table, strict=True) == 90


def test_connector_reads_through_mapping(spark, table):
    from otus_cpp_11_spark.sources import register_versioned_table_source

    commit_version(spark, _df(spark, 0, 30).coalesce(1), table)
    commit_rename_column(spark, table, "k", "key_id")
    commit_drop_column(spark, table, "tag")
    register_versioned_table_source(spark)
    via = spark.read.format("versioned_table").option("path", table).load()
    assert via.columns == ["key_id"]
    assert via.count() == 30
    assert via.agg(F.sum("key_id")).first()[0] == sum(range(30))
    # time travel through the connector uses the pinned version's names
    old = (
        spark.read.format("versioned_table")
        .option("path", table)
        .option("versionAsOf", "1")
        .load()
    )
    assert old.columns == ["k", "tag"]
    assert old.count() == 30


def test_stream_and_cdf_respect_mapping(spark, table, tmp_path):
    from otus_cpp_11_spark.sources import register_versioned_table_source

    commit_version(spark, _df(spark, 0, 10).coalesce(1), table)
    commit_rename_column(spark, table, "k", "key_id")
    commit_append(
        spark,
        spark.range(100, 110).select(
            F.col("id").alias("key_id"), F.lit("late").alias("tag")
        ),
        table,
    )
    register_versioned_table_source(spark)
    # stream started AFTER the rename serves the new logical names,
    # including files written before it
    q = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .load()
    )
    assert q.columns == ["key_id", "tag"]
    out: list = []
    sq = (
        q.writeStream.foreachBatch(
            lambda df, bid: out.append(
                (df.count(), int(df.agg(F.sum("key_id")).first()[0] or 0))
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    sq.awaitTermination()
    assert sum(n for n, _ in out) == 20
    assert sum(s for _, s in out) == sum(range(10)) + sum(range(100, 110))
    # batch CDF across the rename serves the END version's names
    feed = read_change_feed(spark, table, 1, 3)
    assert "key_id" in feed.columns
    assert feed.where("_change_type = 'insert'").count() == 20


def test_rename_refused_on_conflicts(spark, table):
    from otus_cpp_11_spark.ops.versioned import add_constraint

    commit_version(spark, _df(spark, 0, 10), table)
    with pytest.raises(ValueError, match="no column"):
        commit_rename_column(spark, table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        commit_rename_column(spark, table, "k", "tag")
    add_constraint(spark, table, "k_pos", "k >= 0")
    with pytest.raises(ValueError, match="constraint"):
        commit_rename_column(spark, table, "k", "key_id")
    with pytest.raises(ValueError, match="constraint"):
        commit_drop_column(spark, table, "k")


def test_drop_only_column_refused(spark, table):
    commit_version(spark, spark.range(5).select(F.col("id").alias("k")), table)
    with pytest.raises(ValueError, match="only column"):
        commit_drop_column(spark, table, "k")


def test_valve_and_rename_compose(spark, table):
    """The round's two lakehouse features together: a mapped table's
    wide DV delete auto-heals through commit_apply_dvs, reading and
    rewriting under the mapping."""
    commit_version(
        spark, _df(spark, 0, 200).repartitionByRange(2, "k"), table,
        stats_cols=["k"],
    )
    commit_rename_column(spark, table, "k", "key_id")
    commit_delete(
        spark, table, "key_id % 2 = 0", dv_max_fraction=0.6,
        dv_auto_apply_rows=10,
    )
    assert current_version(spark, table) == 4  # delete + auto purge
    got = read_version(spark, table)
    assert got.columns == ["key_id", "tag"]
    assert got.count() == 100
    assert metadata_count(spark, table, strict=True) == 100


# ---------------------------------------------------------------------------
# r10 self-review regression tests
# ---------------------------------------------------------------------------


def test_connector_reads_rename_onto_burned_name(spark, table):
    """Review finding: a logical column renamed onto a BURNED physical
    name that still exists in old data files must read correctly
    through the connector — the executor projects by physical name,
    never blanket-renames the file's columns (which would produce
    duplicate names and crash)."""
    from otus_cpp_11_spark.sources import register_versioned_table_source

    commit_version(spark, _df(spark, 0, 20).coalesce(1), table)
    commit_drop_column(spark, table, "tag")      # burns physical 'tag'
    commit_rename_column(spark, table, "k", "tag")  # logical tag -> phys k
    got = read_version(spark, table)
    assert got.columns == ["tag"]
    assert got.agg(F.sum("tag")).first()[0] == sum(range(20))  # k's data
    register_versioned_table_source(spark)
    via = spark.read.format("versioned_table").option("path", table).load()
    assert via.columns == ["tag"]
    assert via.agg(F.sum("tag")).first()[0] == sum(range(20))


def test_valve_purge_conflict_does_not_fail_the_delete(spark, table):
    """Review finding: the delete has already committed durably when the
    opportunistic purge runs — a purge losing its race must not raise
    out of commit_delete (a caller's retry loop would re-run the
    delete)."""
    from unittest import mock

    import otus_cpp_11_spark.ops.versioned as V

    commit_version(
        spark, _df(spark, 0, 100).repartitionByRange(2, "k"), table,
        stats_cols=["k"],
    )
    with mock.patch.object(
        V, "commit_apply_dvs", side_effect=V.CommitConflict("lost race")
    ):
        v = commit_delete(
            spark, table, "k % 2 = 0", dv_max_fraction=0.6,
            dv_auto_apply_rows=5,
        )
    assert v == 2  # the delete's success is reported
    assert current_version(spark, table) == 2  # no purge landed
    from otus_cpp_11_spark.ops.versioned import snapshot_dv_rows

    assert snapshot_dv_rows(spark, table, 2) == 50  # backlog remains
    # the next over-budget delete heals the whole backlog for real
    commit_delete(
        spark, table, "k = 1", dv_max_fraction=0.6, dv_auto_apply_rows=5
    )
    assert snapshot_dv_rows(spark, table, current_version(spark, table)) == 0


def test_diff_versions_identity_across_rename(spark, table):
    """Review finding: a metadata-only rename must diff as ZERO changes
    (a renamed column is the same column), and a renamed KEY column
    keeps working — consistent with the CDF-neutral rename contract."""
    from otus_cpp_11_spark.ops.versioned import diff_versions

    commit_version(spark, _df(spark, 0, 30).coalesce(1), table)
    commit_rename_column(spark, table, "k", "key_id")
    assert diff_versions(spark, table, 1, 2, keys=["key_id"]).count() == 0
    # value-column rename: same — and a REAL change still diffs
    commit_rename_column(spark, table, "tag", "label")
    assert diff_versions(spark, table, 1, 3, keys=["key_id"]).count() == 0
    commit_update(spark, table, "key_id = 5", {"label": F.lit("x")})
    d = diff_versions(spark, table, 1, 4, keys=["key_id"])
    rows = d.collect()
    assert len(rows) == 1 and rows[0]["change_type"] == "update"


def test_commit_version_full_overwrite_resets_mapping(spark, table):
    """Review finding (second pass): a FULL overwrite references no old
    files, so no dead bytes can resurrect — instead of refusing burned
    names forever, the overwrite RESETS the mapping: burned names become
    reusable, physical = logical again, and old snapshots still
    time-travel under their own headers' mappings."""
    commit_version(spark, _df(spark, 0, 10).coalesce(1), table)
    commit_rename_column(spark, table, "k", "key_id")
    commit_drop_column(spark, table, "tag")
    fresh = spark.range(5).select(
        F.col("id").alias("k"), F.lit("z").alias("tag")  # reuses BOTH names
    )
    v = commit_version(spark, fresh, table)
    hdr, _ = read_manifest(spark, table, v)
    assert manifest_cmap(hdr) == {}
    assert hdr.get("cmap_burned") is None
    got = read_version(spark, table)
    assert got.columns == ["k", "tag"] and got.count() == 5
    assert got.agg(F.sum("k")).first()[0] == 10
    # time travel still serves each old snapshot under its own names
    assert read_version(spark, table, 1).columns == ["k", "tag"]
    assert read_version(spark, table, 2).columns == ["key_id", "tag"]
    assert read_version(spark, table, 3).columns == ["key_id"]
    # and post-reset appends need no mapping at all
    commit_append(spark, _df(spark, 100, 105, "w"), table)
    assert read_version(spark, table).count() == 10


def test_diff_versions_across_drop_plus_rename_onto_burned_name(spark, table):
    """Review finding (second pass, reproduced): drop 'tag' then rename
    k -> tag made diff_versions alias two old columns to 'tag'
    (AMBIGUOUS_REFERENCE crash). A dropped column is metadata-only —
    excluded from the diff like a rename — so this lifecycle diffs as
    zero changes."""
    from otus_cpp_11_spark.ops.versioned import diff_versions

    commit_version(spark, _df(spark, 0, 20).coalesce(1), table)
    commit_drop_column(spark, table, "tag")
    commit_rename_column(spark, table, "k", "tag")
    assert diff_versions(spark, table, 1, 3, keys=["tag"]).count() == 0
    # a real content change after the refactor still diffs
    commit_delete(spark, table, "tag = 7")
    d = diff_versions(spark, table, 1, 4, keys=["tag"]).collect()
    assert len(d) == 1 and d[0]["change_type"] == "delete"


def test_autocompact_skips_burned_stat_columns(spark, table):
    """Review finding (second pass, reproduced): autocompact derived its
    stat columns from the SELECTED files' carried stats, which can
    include a dropped column's burned physical name — collecting stats
    for it over the new files crashed with UNRESOLVED_COLUMN."""
    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(
        spark, _df(spark, 0, 10).coalesce(1), table, stats_cols=["k", "tag"]
    )
    commit_drop_column(spark, table, "tag")
    commit_append(
        spark,
        spark.range(100, 110).select(F.col("id").alias("k")).coalesce(1),
        table,
        stats_cols=["k"],
    )
    v = commit_autocompact(spark, table, 1000, 1000)
    assert v == 4
    got = read_version(spark, table)
    assert got.columns == ["k"] and got.count() == 20
    # the live column's stats still collected: pruning works
    got2, acct = scan_version(spark, table, bounds={"k": (100, 109)})
    assert got2.count() == 10


def test_autocompact_splits_when_scan_underpartitions(spark, table):
    """Review finding (second pass, reproduced): coalesce cannot
    INCREASE partitions, so a scan that bin-packed the small files into
    fewer partitions than ceil(rows/target) silently violated the
    per-file row cap; the pack now repartitions in that case."""
    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(spark, _df(spark, 0, 4000).coalesce(1), table)
    commit_append(spark, _df(spark, 10000, 14000).coalesce(1), table)
    v = commit_autocompact(
        spark, table, small_file_rows=100_000, max_rows_per_file=1000
    )
    hdr, files = read_manifest(spark, table, v)
    assert hdr["autocompact_io"]["files_after"] == 8  # ceil(8000/1000)
    assert len(files) == 8
    import pyarrow.parquet as pq

    per_file = [
        pq.ParquetFile(f"{table}/{f}").metadata.num_rows for f in files
    ]
    assert sum(per_file) == 8000
    assert max(per_file) <= 1100  # round-robin balance ~ the cap


def test_layout_rewrites_shed_dropped_column_bytes(spark, table):
    """The physical-forget half of DROP COLUMN: the drop itself is
    metadata-only (dead bytes stay in files), and ANY later layout
    rewrite — autocompact here, OPTIMIZE/apply_dvs identically — reads
    the logical schema and therefore writes files WITHOUT the burned
    column, shedding the dead bytes for the files it touches (Delta's
    REORG PURGE behavior, for free from the mapping design)."""
    import pyarrow.parquet as pq

    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(spark, _df(spark, 0, 40).coalesce(1), table)
    commit_append(spark, _df(spark, 100, 140).coalesce(1), table)
    commit_drop_column(spark, table, "tag")
    _, files_pre = read_manifest(spark, table, 3)
    assert all(
        "tag" in pq.ParquetFile(f"{table}/{f}").schema_arrow.names
        for f in files_pre
    )  # metadata-only: dead bytes still physically present
    v = commit_autocompact(spark, table, 1000, 1000)
    _, files_post = read_manifest(spark, table, v)
    for f in files_post:
        assert "tag" not in pq.ParquetFile(f"{table}/{f}").schema_arrow.names
    got = read_version(spark, table)
    assert got.columns == ["k"] and got.count() == 80


def test_predicate_dml_skips_burned_stat_columns(spark, table):
    """Review finding (r10 ADVICE, high — reproduced): the predicate
    DELETE/UPDATE rewrite derived its stat columns from the union of ALL
    carried per-file stats, which after commit_drop_column still names
    the dropped column's burned physical name; collecting stats for it
    over the rewritten files crashed with UNRESOLVED_COLUMN, blocking
    RTBF deletes on any table that ever dropped a stats-tracked column.
    Same class as the autocompact/_layout_rewrite_commit fix — the DML
    path was a third hand-copied tail."""
    commit_version(
        spark, _df(spark, 0, 10).coalesce(1), table, stats_cols=["k", "tag"]
    )
    commit_drop_column(spark, table, "tag")
    v = commit_delete(spark, table, "k < 5")
    assert v == 3
    got = read_version(spark, table)
    assert got.columns == ["k"] and got.count() == 5
    # UPDATE through the same rewrite path also survives
    commit_update(spark, table, "k >= 8", {"k": F.col("k") + 100})
    assert sorted(r["k"] for r in read_version(spark, table).collect()) == [
        5, 6, 7, 108, 109,
    ]
    # the live column's carried stats still prune
    _, acct = scan_version(spark, table, bounds={"k": (108, 109)})
    assert acct["files_scanned"] <= acct["files_total"]


def test_autocompact_strict_cap_under_skew(spark, table):
    """Review finding (r10 ADVICE): with parts >= n_out, coalesce merges
    whole partitions and cannot split, so one oversized input (admitted
    because small_file_rows > max_rows_per_file) breached the per-file
    row cap. The pack now proves the coalesce grouping respects the cap
    from per-partition counts, else repartitions."""
    import pyarrow.parquet as pq

    from otus_cpp_11_spark.ops.versioned import commit_autocompact

    commit_version(spark, _df(spark, 0, 3000).coalesce(1), table)
    commit_append(spark, _df(spark, 10000, 10100).coalesce(1), table)
    # force the masked scan to one partition per (tiny) file so the
    # parts >= n_out branch is exercised with a skewed partition
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        v = commit_autocompact(
            spark, table, small_file_rows=100_000, max_rows_per_file=1000
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_oc)
    hdr, files = read_manifest(spark, table, v)
    per_file = [
        pq.ParquetFile(f"{table}/{f}").metadata.num_rows for f in files
    ]
    assert sum(per_file) == 3100
    assert max(per_file) <= 1100  # strict cap (round-robin balance)
    assert read_version(spark, table).count() == 3100
