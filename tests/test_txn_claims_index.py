"""Checkpoint-indexed committed txn claims (r12 verdict item 2):
``read_transaction`` must resolve its claim set in O(claims + markers
since the newest checkpoint) reads — bounded by the checkpoint
interval like snapshot replay — never O(history). The index must also
survive vacuum: claims whose markers were dropped past the retention
horizon live on in the horizon checkpoint, where the old marker walk
silently lost them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import otus_cpp_11_spark.ops.manifest_format as mf
import otus_cpp_11_spark.ops.versioned as V
from otus_cpp_11_spark.ops.versioned import (
    commit_transaction,
    commit_version,
    committed_txn_claims,
    current_version,
    read_transaction,
    read_version,
    restore_version,
    vacuum_versions,
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


def _grow_history(spark, table, versions):
    """Advance ``table`` to ``versions`` total commits with metadata-only
    restore commits (files carried by reference, zero data IO) — cheap
    versions, each a real marker, checkpoints landing every
    CHECKPOINT_EVERY as in production."""
    v = current_version(spark, table)
    while v < versions:
        v = restore_version(spark, table, 1)
    return v


@pytest.fixture()
def long_pair(spark, tmp_path):
    """A at 200 versions, B at 2; one spanning txn T at (A v2, B v2),
    landed long before the churn so A's claim sits far below the
    newest checkpoint."""
    a, b, troot = (
        str(tmp_path / "A"),
        str(tmp_path / "B"),
        str(tmp_path / "txns"),
    )
    commit_version(spark, _df(spark, 0, 10, "base").coalesce(1), a)
    commit_version(spark, _df(spark, 0, 5, "base").coalesce(1), b)
    commit_transaction(
        spark,
        [(a, _df(spark, 100, 110, "T").coalesce(1)),
         (b, _df(spark, 100, 103, "T").coalesce(1))],
        troot,
    )
    assert _grow_history(spark, a, 200) == 200
    return a, b, troot


def _counting(monkeypatch):
    counts = {"marker_text": 0, "header_raw": 0}
    real_text = V._read_commit_text
    real_head = V._read_commit_header_raw

    def text(spark, table, name):
        if mf.MARKER_RE.match(name):
            counts["marker_text"] += 1
        return real_text(spark, table, name)

    def head(spark, table, name):
        counts["header_raw"] += 1
        return real_head(spark, table, name)

    monkeypatch.setattr(V, "_read_commit_text", text)
    monkeypatch.setattr(V, "_read_commit_header_raw", head)
    return counts


def test_claim_walk_bounded_by_checkpoint_interval(
    spark, long_pair, monkeypatch
):
    """On a 200-version history the resolver reads the newest
    checkpoint's header plus only the markers AFTER it — never the 200
    markers the old walk paid."""
    a, b, _ = long_pair
    counts = _counting(monkeypatch)
    claims = committed_txn_claims(spark, a)
    assert set(claims.values()) == {2}  # T's claim, from the checkpoint
    # markers after the newest checkpoint: < CHECKPOINT_EVERY of 200
    assert counts["marker_text"] < mf.CHECKPOINT_EVERY
    assert counts["header_raw"] <= 2  # newest indexed checkpoint found


def test_read_transaction_bounded_and_correct(
    spark, long_pair, monkeypatch
):
    a, b, _ = long_pair
    counts = _counting(monkeypatch)
    got = read_transaction(spark, [a, b])
    assert got == {a: 200, b: 2}
    # both tables together: post-checkpoint markers only (B has no
    # checkpoint yet at 2 commits, so its 2 markers are read raw)
    assert counts["marker_text"] < mf.CHECKPOINT_EVERY + 4
    # partial pin still lowers through the indexed claims
    got = read_transaction(spark, [a, b], at={a: 200, b: 1})
    assert got == {a: 1, b: 1}
    assert read_version(spark, a, 1).count() == 10  # T excluded


def test_claims_survive_vacuum_past_the_horizon(spark, long_pair):
    """Vacuum drops the claim's marker; the horizon checkpoint's index
    must still carry it — the old marker walk would silently lose the
    claim and stop lowering."""
    a, b, _ = long_pair
    dropped = vacuum_versions(spark, a, keep_last=5)
    assert 2 in dropped  # T's claimed version is gone from the marker dir
    claims = committed_txn_claims(spark, a)
    assert list(claims.values()) == [2]
    # the consistent read still knows B v2 includes T while A pinned at
    # a vacuumed-away v1 cannot — the vector must stay untorn at current
    assert read_transaction(spark, [a, b]) == {a: 200, b: 2}


def test_legacy_checkpoint_heals_at_next_checkpoint(
    spark, tmp_path, monkeypatch
):
    """A checkpoint written WITHOUT the claim index (pre-feature
    lineage) anchors replay with txns unknown; the next checkpoint
    write performs the one-time walk and the lineage is indexed from
    then on."""
    import json
    import os

    a, b, troot = (
        str(tmp_path / "A"),
        str(tmp_path / "B"),
        str(tmp_path / "txns"),
    )
    commit_version(spark, _df(spark, 0, 10, "base").coalesce(1), a)
    commit_version(spark, _df(spark, 0, 5, "base").coalesce(1), b)
    commit_transaction(
        spark,
        [(a, _df(spark, 100, 110, "T").coalesce(1)),
         (b, _df(spark, 100, 103, "T").coalesce(1))],
        troot,
    )
    _grow_history(spark, a, mf.CHECKPOINT_EVERY)
    # simulate a pre-feature checkpoint: strip txns from its header
    cdir = os.path.join(a, "_commits")
    ck = os.path.join(cdir, mf.ckpt_name(mf.CHECKPOINT_EVERY))
    lines = open(ck).read().splitlines()
    head = json.loads(lines[0])
    assert head.pop("txns") == {"%s" % _txn_id(spark, a): 2}
    open(ck, "w").write("\n".join([json.dumps(head)] + lines[1:]) + "\n")
    # resolver falls back to the full walk and still finds the claim
    assert list(committed_txn_claims(spark, a).values()) == [2]
    # the next checkpoint heals: one walk, then indexed forever
    _grow_history(spark, a, 2 * mf.CHECKPOINT_EVERY)
    ck2 = os.path.join(cdir, mf.ckpt_name(2 * mf.CHECKPOINT_EVERY))
    head2 = json.loads(open(ck2).readline())
    assert list(head2["txns"].values()) == [2]


def _txn_id(spark, table):
    h = V.version_header(spark, table, 2)
    return h["txn"]["id"]
