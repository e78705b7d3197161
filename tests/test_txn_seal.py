"""Durable transaction verdicts (r11 advice, medium): a committed
multi-table transaction's visibility must not depend on the transaction
root forever. The verdict is SEALED table-side (``<version>.txnseal``
in ``_commits``) by the coordinator at decide time and by any engine
reader on first resolution, so a cleaned txn root can never silently
rewrite committed history to a no-op; claims past the force-abort
horizon fail loudly instead of aborting.

Also regression-covers the r11 advice CDF-stream gaps (high/medium):
``_cdf_partitions`` must resolve txn claims (an aborted claim's staged
files never feed as inserts) and must fail loudly on a post-pin
widening, mirroring the row-stream walk."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

import otus_cpp_11_spark.ops.versioned as V
from otus_cpp_11_spark.ops.versioned import (
    commit_append,
    commit_transaction,
    commit_version,
    commit_widen_column,
    read_version,
    vacuum_versions,
    version_header,
)


@pytest.fixture()
def roots(tmp_path):
    return (
        str(tmp_path / "corpus"),
        str(tmp_path / "datacard"),
        str(tmp_path / "txns"),
    )


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


@pytest.fixture(autouse=True)
def _fast_grace(monkeypatch):
    monkeypatch.setattr(V, "_TXN_INDOUBT_WAIT_SECS", 0.0)
    V._TXN_FINAL_CACHE.clear()
    V._TXN_SEAL_CACHE.clear()


def _clear_caches():
    V._TXN_FINAL_CACHE.clear()
    V._TXN_SEAL_CACHE.clear()


def _commit_both(spark, a, b, troot):
    commit_version(spark, _df(spark, 0, 10).coalesce(1), a)
    commit_version(spark, _df(spark, 0, 5).coalesce(1), b)
    return commit_transaction(
        spark,
        [
            (a, _df(spark, 100, 110).coalesce(1)),
            (b, _df(spark, 100, 103).coalesce(1)),
        ],
        troot,
    )


def test_committed_txn_survives_root_cleanup(spark, roots):
    """The coordinator seals at decide time: a COLD replay (caches
    cleared, txn root GONE) still reads the transaction as committed —
    the retroactive-history-edit channel is closed."""
    a, b, troot = roots
    _commit_both(spark, a, b, troot)
    assert glob.glob(f"{a}/_commits/*.txnseal"), "coordinator must seal"
    shutil.rmtree(troot)
    _clear_caches()
    assert read_version(spark, a).count() == 20
    assert read_version(spark, b).count() == 8
    assert version_header(spark, a, 2).get("txn_aborted") is None


def test_connector_survives_root_cleanup(spark, roots, tmp_path):
    """The versioned_table connector (batch + row stream + CDF stream)
    consults the table-side seal before the txn root."""
    from otus_cpp_11_spark.sources import register_versioned_table_source

    a, b, troot = roots
    _commit_both(spark, a, b, troot)
    shutil.rmtree(troot)
    _clear_caches()
    register_versioned_table_source(spark)
    via = spark.read.format("versioned_table").option("path", a).load()
    assert via.count() == 20
    name = "seal_stream_sink"
    (
        spark.readStream.format("versioned_table")
        .option("path", a)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert spark.table(name).count() == 20
    cdf_name = "seal_cdf_sink"
    (
        spark.readStream.format("versioned_table")
        .option("path", a)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(cdf_name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.table(cdf_name)
    assert got.count() == 20  # v1 inserts + the committed claim's inserts
    assert {r["_change_type"] for r in got.collect()} == {"insert"}


def test_reader_seals_on_first_resolution(spark, roots, monkeypatch):
    """A coordinator whose seal writes were all lost: the FIRST engine
    reader resolves from the final record and seals; afterwards the txn
    root is dispensable."""
    a, b, troot = roots
    real_seal = V._txn_write_seal
    monkeypatch.setattr(V, "_txn_write_seal", lambda *args, **kw: None)
    _commit_both(spark, a, b, troot)
    monkeypatch.setattr(V, "_txn_write_seal", real_seal)
    assert not glob.glob(f"{a}/_commits/*.txnseal")
    _clear_caches()
    assert read_version(spark, a).count() == 20  # resolves + seals
    assert glob.glob(f"{a}/_commits/*.txnseal")
    shutil.rmtree(troot)
    _clear_caches()
    assert read_version(spark, a).count() == 20
    assert version_header(spark, a, 2).get("txn_aborted") is None


def test_force_abort_refused_past_horizon(spark, roots, monkeypatch):
    """An unsealed in-doubt claim OLDER than the retention horizon is
    never force-aborted — absence of the final record is by then as
    likely txn-root cleanup as a coordinator crash; readers fail loudly
    instead of rewriting possibly-committed history."""
    a, b, troot = roots
    _commit_both(spark, a, b, troot)
    # simulate: root cleaned AND seals lost (worst case), claim is old
    shutil.rmtree(troot)
    for t in (a, b):
        for f in glob.glob(f"{t}/_commits/*.txnseal"):
            os.remove(f)
    _clear_caches()
    old = time.time() - 3600.0
    os.utime(f"{a}/_commits/00000002", (old, old))
    monkeypatch.setattr(V, "_TXN_FORCE_ABORT_HORIZON_SECS", 60.0)
    with pytest.raises(IOError, match="horizon"):
        read_version(spark, a)
    # a YOUNG unsealed in-doubt claim still force-aborts (liveness)
    now = time.time()
    os.utime(f"{a}/_commits/00000002", (now, now))
    _clear_caches()
    assert read_version(spark, a).count() == 10  # aborted -> parent content


def test_vacuum_txn_records_respects_retention(spark, roots, monkeypatch):
    """Old final records sweep out (seals carry the verdict); young ones
    survive; a post-sweep cold replay still reads committed."""
    from otus_cpp_11_spark.ops.versioned import vacuum_txn_records

    a, b, troot = roots
    _commit_both(spark, a, b, troot)
    finals = glob.glob(f"{troot}/txn-*.final")
    assert finals
    assert vacuum_txn_records(spark, troot, older_than_s=3600.0) == []
    old = time.time() - 7200.0
    for f in finals:
        os.utime(f, (old, old))
    removed = vacuum_txn_records(spark, troot, older_than_s=3600.0)
    assert len(removed) == len(finals)
    assert not glob.glob(f"{troot}/txn-*.final")
    _clear_caches()
    assert read_version(spark, a).count() == 20  # seal carries the verdict
    assert version_header(spark, a, 2).get("txn_aborted") is None


def _abort_claim(spark, monkeypatch, a, b, troot):
    """Claim both slots then hard-crash the coordinator; resolve the
    claim to ABORT through an engine read (which also seals it)."""
    real = V._txn_decide

    def dying(spark_, root, txn_id, want):
        if want == "commit":
            raise RuntimeError("simulated crash")
        return real(spark_, root, txn_id, want)

    monkeypatch.setattr(V, "_txn_decide", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        commit_transaction(
            spark,
            [
                (a, _df(spark, 100, 110).coalesce(1)),
                (b, _df(spark, 100, 103).coalesce(1)),
            ],
            troot,
        )
    monkeypatch.setattr(V, "_txn_decide", real)
    assert read_version(spark, a).count() == 10  # resolves abort + seals


def test_cdf_stream_skips_aborted_txn_claim(spark, roots, monkeypatch):
    """r11 advice (high): a readChangeFeed STREAM must resolve txn
    claims like every other face — an aborted claim's staged files
    never feed as ``_change_type=insert`` rows, and the stream keeps
    working after vacuum reclaims the aborted staged data."""
    a, b, troot = roots
    commit_version(spark, _df(spark, 0, 10).coalesce(1), a)
    commit_version(spark, _df(spark, 0, 5).coalesce(1), b)
    _abort_claim(spark, monkeypatch, a, b, troot)
    commit_append(spark, _df(spark, 200, 203).coalesce(1), a)  # v3
    # vacuum reclaims the aborted claim's staged files: a feed that
    # still planned them would crash on missing files mid-batch
    vacuum_versions(
        spark, a, keep_last=5, drop_uncommitted=True, uncommitted_grace_s=0.0
    )
    from otus_cpp_11_spark.sources import register_versioned_table_source

    register_versioned_table_source(spark)
    name = "cdf_aborted_txn_sink"
    (
        spark.readStream.format("versioned_table")
        .option("path", a)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.table(name)
    assert got.count() == 13  # v1's 10 + v3's 3; NOTHING from aborted v2
    assert {r["_commit_version"] for r in got.collect()} == {1, 3}


def test_cdf_stream_fails_on_midflight_widening(spark, tmp_path):
    """r11 advice (medium): a RUNNING CDF stream errors loudly at a
    widening committed after its schema pinned — silently passing it
    would defer failure to an executor-side Arrow overflow on the first
    wide value, far from the cause."""
    from otus_cpp_11_spark.sources import register_versioned_table_source

    table = str(tmp_path / "cdf_widen")
    commit_version(
        spark,
        spark.range(10).select(F.col("id").cast("int").alias("k")).coalesce(1),
        table,
    )
    register_versioned_table_source(spark)
    name = "cdf_widen_running"
    q = (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while spark.table(name).count() < 10:
            assert time.time() < deadline, "CDF stream never drained v1"
            time.sleep(0.2)
        commit_widen_column(spark, table, "k", "bigint")
        commit_append(
            spark,
            spark.createDataFrame([(3_000_000_000,)], "k bigint"),
            table,
        )
        while q.exception() is None:
            assert time.time() < deadline, "CDF stream never hit the widening"
            time.sleep(0.2)
        assert "widened column" in str(q.exception())
        assert "restart the stream" in str(q.exception())
    finally:
        q.stop()


def test_cdf_stream_restarted_after_widening_passes_it(spark, tmp_path):
    """A FRESH CDF stream started after the widening pins the wide
    schema and treats the historical widening commit as neutral."""
    from otus_cpp_11_spark.sources import register_versioned_table_source

    table = str(tmp_path / "cdf_widen_restart")
    commit_version(
        spark,
        spark.range(10).select(F.col("id").cast("int").alias("k")).coalesce(1),
        table,
    )
    commit_widen_column(spark, table, "k", "bigint")
    big = 3_000_000_000
    commit_append(spark, spark.createDataFrame([(big,)], "k bigint"), table)
    register_versioned_table_source(spark)
    name = "cdf_widen_restarted"
    (
        spark.readStream.format("versioned_table")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.table(name)
    assert got.count() == 11
    assert got.agg(F.max("k").alias("m")).first()["m"] == big
