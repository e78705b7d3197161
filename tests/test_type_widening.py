"""Type widening in schema evolution (r10 verdict item 3 — Delta's
type widening): int→long / float→double / decimal precision growth are
METADATA-ONLY commits; readers impose the manifest schema on the scan
and Spark 4's parquet reader up-converts narrow files. Narrowings and
unrelated type changes stay loudly refused.

Reference parity note: the reference engine (CityAplons/otus-cpp-11)
has no schema story; this mirrors Delta's public type-widening
semantics for the 100 TB lakehouse mandate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.ops.versioned import (
    commit_append,
    commit_version,
    commit_widen_column,
    read_manifest,
    read_version,
    scan_version,
    version_header,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("float").alias("v"),
    )


def _data_bytes(table):
    total = 0
    for r, _, fs in os.walk(os.path.join(table, "_data")):
        for f in fs:
            total += os.path.getsize(os.path.join(r, f))
    return total


def test_widen_column_is_metadata_only_and_time_travel_correct(spark, table):
    commit_version(spark, _ints(spark, 0, 100).coalesce(2), table)
    before = _data_bytes(table)
    _, files1 = read_manifest(spark, table, 1)
    v = commit_widen_column(spark, table, "k", "bigint")
    assert v == 2
    assert _data_bytes(table) == before  # zero data IO
    _, files2 = read_manifest(spark, table, 2)
    assert files1 == files2  # carried by reference
    # current snapshot reads the WIDE type over the narrow files
    got = read_version(spark, table)
    assert dict(got.dtypes)["k"] == "bigint"
    assert got.count() == 100
    assert got.agg(F.sum("k").alias("s")).first()["s"] == 4950
    # time travel reads the pre-widening snapshot under its own type
    v1 = read_version(spark, table, 1)
    assert dict(v1.dtypes)["k"] == "int"
    hdr = version_header(spark, table, 2)
    assert hdr["widen_column"] == {"column": "k", "from": "int", "to": "bigint"}


def test_widen_then_append_long_rows(spark, table):
    """The verdict's lifecycle: write int → widen → append long —
    mixed-width files under one wide manifest schema."""
    commit_version(spark, _ints(spark, 0, 10).coalesce(1), table)
    commit_widen_column(spark, table, "k", "bigint")
    big = 3_000_000_000  # does not fit int32: only valid post-widening
    delta = spark.createDataFrame([(big, 1.5)], "k bigint, v float")
    commit_append(spark, delta, table)
    got = read_version(spark, table)
    assert got.count() == 11
    assert got.agg(F.max("k").alias("m")).first()["m"] == big


def test_merge_schema_append_auto_widens(spark, table):
    """commit_append(merge_schema=True) with a WIDER frame widens the
    committed type instead of refusing (Delta mergeSchema)."""
    commit_version(spark, _ints(spark, 0, 10).coalesce(1), table)
    delta = spark.createDataFrame(
        [(3_000_000_000, 2.5)], "k bigint, v double"
    )
    commit_append(spark, delta, table, merge_schema=True)
    got = read_version(spark, table)
    assert dict(got.dtypes)["k"] == "bigint"
    assert dict(got.dtypes)["v"] == "double"
    assert got.count() == 11


def test_merge_schema_append_upcasts_narrow_writer(spark, table):
    """A writer still emitting the NARROW type into a widened table is
    healthy: its rows upcast, the committed type stays wide."""
    commit_version(spark, _ints(spark, 0, 10).coalesce(1), table)
    commit_widen_column(spark, table, "k", "bigint")
    commit_append(
        spark, _ints(spark, 100, 105).coalesce(1), table, merge_schema=True
    )
    got = read_version(spark, table)
    assert dict(got.dtypes)["k"] == "bigint"
    assert got.count() == 15


def test_narrowing_and_unrelated_changes_refused(spark, table):
    commit_version(spark, _ints(spark, 0, 10).coalesce(1), table)
    with pytest.raises(ValueError, match="not a safe widening"):
        commit_widen_column(spark, table, "v", "int")
    commit_widen_column(spark, table, "k", "bigint")
    with pytest.raises(ValueError, match="not a safe widening"):
        commit_widen_column(spark, table, "k", "int")  # narrowing back
    bad = spark.createDataFrame([("x", 1.0)], "k string, v float")
    with pytest.raises(ValueError, match="refused"):
        commit_append(spark, bad, table, merge_schema=True)
    # strict (non-merge) appends still require the committed schema
    with pytest.raises(ValueError):
        commit_append(spark, _ints(spark, 0, 1), table)  # int into bigint


def test_widen_noop_and_decimal_precision_growth(spark, table):
    d = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").cast("decimal(10,2)").alias("d")
    )
    commit_version(spark, d.coalesce(1), table)
    v = commit_widen_column(spark, table, "d", "decimal(20,2)")
    assert v == 2
    assert commit_widen_column(spark, table, "d", "decimal(20,2)") == 2  # no-op
    with pytest.raises(ValueError, match="not a safe widening"):
        commit_widen_column(spark, table, "d", "decimal(30,4)")  # scale change
    got = read_version(spark, table)
    assert dict(got.dtypes)["d"] == "decimal(20,2)"
    assert got.count() == 5


def test_widened_table_stats_pruning_and_dml_survive(spark, table):
    """The widened column's carried stats (recorded narrow) still prune,
    and the DML rewrite path works over mixed-width files."""
    from otus_cpp_11_spark.ops.versioned import commit_delete

    commit_version(
        spark, _ints(spark, 0, 100).coalesce(2), table, stats_cols=["k"]
    )
    commit_widen_column(spark, table, "k", "bigint")
    commit_append(
        spark,
        spark.createDataFrame([(5_000_000_000, 0.5)], "k bigint, v float"),
        table,
        stats_cols=["k"],
    )
    got, acct = scan_version(spark, table, bounds={"k": (5_000_000_000, 9_999_999_999)})
    assert got.count() == 1
    assert acct["files_scanned"] < acct["files_total"]
    commit_delete(spark, table, "k < 50")
    assert read_version(spark, table).count() == 51


def test_running_stream_fails_on_midflight_widening(spark, table):
    """A RUNNING stream (schema pinned narrow at start) must not
    silently pass over a widening committed mid-flight — the first
    overflowing wide value would fail executor-side, far from the
    cause. It errors at the widening commit with a restart instruction
    (Delta's readStream-on-schema-change behavior)."""
    import time

    from otus_cpp_11_spark.sources import register_versioned_table_source

    commit_version(spark, _ints(spark, 0, 10).coalesce(1), table)
    register_versioned_table_source(spark)
    q = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .load()
        .writeStream.format("memory")
        .queryName("widen_stream_running")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while spark.table("widen_stream_running").count() < 10:
            assert time.time() < deadline, "stream never drained v1"
            time.sleep(0.2)
        commit_widen_column(spark, table, "k", "bigint")
        big = 3_000_000_000
        commit_append(
            spark,
            spark.createDataFrame([(big, 1.5)], "k bigint, v float"),
            table,
        )
        while q.exception() is None:
            assert time.time() < deadline, "stream never hit the widening"
            time.sleep(0.2)
        assert "widened column" in str(q.exception())
        assert "restart the stream" in str(q.exception())
    finally:
        q.stop()


def test_restarted_stream_adopts_widened_schema(spark, table):
    """A FRESH stream started after the widening pins the WIDE schema,
    passes over the (now historical) widening commit as neutral, and
    drains every row including post-widening wide values."""
    from otus_cpp_11_spark.sources import register_versioned_table_source

    commit_version(spark, _ints(spark, 0, 10).coalesce(1), table)
    commit_widen_column(spark, table, "k", "bigint")
    big = 3_000_000_000
    commit_append(
        spark, spark.createDataFrame([(big, 1.5)], "k bigint, v float"), table
    )
    register_versioned_table_source(spark)
    s = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .load()
    )
    assert dict(s.dtypes)["k"] == "bigint"
    name = "widen_stream_restarted"
    (
        s.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.table(name)
    assert got.count() == 11
    assert got.agg(F.max("k").alias("m")).first()["m"] == big


def test_upsert_and_transaction_accept_narrow_writer(spark, table, tmp_path):
    """MERGE and multi-table transactions on a widened table accept a
    writer still emitting the narrow type (rows upcast losslessly);
    unrelated schema drift stays refused."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_transaction,
        commit_upsert,
    )

    commit_version(
        spark, _ints(spark, 0, 10).coalesce(1), table, stats_cols=["k"]
    )
    commit_widen_column(spark, table, "k", "bigint")
    commit_upsert(spark, _ints(spark, 5, 12).coalesce(1), table, keys=["k"])
    got = read_version(spark, table)
    assert dict(got.dtypes)["k"] == "bigint" and got.count() == 12
    other = str(tmp_path / "other")
    commit_version(spark, _ints(spark, 0, 3).coalesce(1), other)
    commit_transaction(
        spark,
        [(table, _ints(spark, 100, 102).coalesce(1)),
         (other, _ints(spark, 100, 102).coalesce(1))],
        str(tmp_path / "txns"),
    )
    assert read_version(spark, table).count() == 14
    assert read_version(spark, other).count() == 5
    bad = spark.createDataFrame([("x", 1.0)], "k string, v float")
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_upsert(spark, bad, table, keys=["k"])


def test_meta_cannot_spoof_transaction_fields(spark, table):
    """Header meta flows into the marker verbatim, and 'txn' /
    'txn_aborted' drive marker RESOLUTION — a spoofed value would point
    readers at an attacker-chosen final record or silently no-op a real
    commit. Only commit_transaction may set them."""
    with pytest.raises(ValueError, match="reserved transaction"):
        commit_version(
            spark, _ints(spark, 0, 3).coalesce(1), table,
            meta={"txn": {"id": "x", "root": "/tmp"}},
        )
    commit_version(spark, _ints(spark, 0, 3).coalesce(1), table)
    with pytest.raises(ValueError, match="reserved transaction"):
        commit_append(
            spark, _ints(spark, 3, 6).coalesce(1), table,
            meta={"txn_aborted": True},
        )
