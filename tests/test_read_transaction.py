"""Snapshot-consistent multi-table READS (r11 verdict item 8):
commit_transaction makes writes both-or-neither; read_transaction must
make sure a reader never observes the half-included interleaving —
table A at a version including transaction U while table B excludes it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import otus_cpp_11_spark.ops.versioned as V
from otus_cpp_11_spark.ops.versioned import (
    commit_transaction,
    commit_version,
    read_transaction,
    read_version,
)


@pytest.fixture(autouse=True)
def _fast_grace(monkeypatch):
    monkeypatch.setattr(V, "_TXN_INDOUBT_WAIT_SECS", 0.0)
    V._TXN_FINAL_CACHE.clear()
    V._TXN_SEAL_CACHE.clear()


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


@pytest.fixture()
def pair(spark, tmp_path):
    a, b, troot = (
        str(tmp_path / "A"),
        str(tmp_path / "B"),
        str(tmp_path / "txns"),
    )
    commit_version(spark, _df(spark, 0, 10, "base").coalesce(1), a)
    commit_version(spark, _df(spark, 0, 5, "base").coalesce(1), b)
    commit_transaction(  # txn T -> v2 on both
        spark,
        [(a, _df(spark, 100, 110, "T").coalesce(1)),
         (b, _df(spark, 100, 103, "T").coalesce(1))],
        troot,
    )
    return a, b, troot


def test_consistent_at_current(spark, pair):
    a, b, _ = pair
    got = read_transaction(spark, [a, b])
    assert got == {a: 2, b: 2}


def test_pinned_partial_inclusion_is_lowered(spark, pair):
    """A pinned at v1 (excludes T), B at v2 (includes T): the only
    consistent vector at or below the pins excludes T on both."""
    a, b, _ = pair
    got = read_transaction(spark, [a, b], at={a: 1, b: 2})
    assert got == {a: 1, b: 1}
    assert read_version(spark, b, got[b]).count() == 5  # T excluded


def test_cascading_transactions_lower_to_fixpoint(spark, pair):
    """Two stacked transactions: excluding the newer one must not
    strand the older half-included."""
    a, b, troot = pair
    commit_transaction(  # txn U -> v3 on both
        spark,
        [(a, _df(spark, 200, 205, "U").coalesce(1)),
         (b, _df(spark, 200, 202, "U").coalesce(1))],
        troot,
    )
    assert read_transaction(spark, [a, b]) == {a: 3, b: 3}
    got = read_transaction(spark, [a, b], at={a: 2, b: 3})
    assert got == {a: 2, b: 2}  # U excluded on both, T kept on both


def test_race_interleaved_txn_never_observed_torn(
    spark, pair, monkeypatch
):
    """The actual race: a transaction lands BETWEEN the reader's two
    current-version probes. The fixpoint must repair the vector so the
    interleaved transaction is excluded on BOTH tables (or included on
    both), never torn."""
    a, b, troot = pair
    real = V.current_version
    state = {"fired": False}

    def racing_current(spark_, table):
        v = real(spark_, table)
        if table.rstrip("/") == a and not state["fired"]:
            state["fired"] = True
            # txn U lands after A's probe, before B's
            commit_transaction(
                spark_,
                [(a, _df(spark_, 300, 303, "U").coalesce(1)),
                 (b, _df(spark_, 300, 302, "U").coalesce(1))],
                troot,
            )
        return v

    monkeypatch.setattr(V, "current_version", racing_current)
    got = read_transaction(spark, [a, b])
    monkeypatch.setattr(V, "current_version", real)
    # A was probed pre-U (v2), B post-U (v3): torn unless repaired
    assert got == {a: 2, b: 2}
    for t, n in ((a, 20), (b, 8)):
        df = read_version(spark, t, got[t])
        assert df.count() == n
        assert df.where(F.col("tag") == "U").count() == 0  # never torn


def test_single_table_txns_do_not_constrain(spark, tmp_path):
    a, b = str(tmp_path / "A"), str(tmp_path / "B")
    commit_version(spark, _df(spark, 0, 3, "x").coalesce(1), a)
    commit_version(spark, _df(spark, 0, 3, "x").coalesce(1), b)
    got = read_transaction(spark, [a, b])
    assert got == {a: 1, b: 1}
    with pytest.raises(ValueError, match="duplicate"):
        read_transaction(spark, [a, a])
