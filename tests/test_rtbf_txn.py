"""Transactional RTBF across base table + served ANN index (r11
verdict item 4): delete staging via ``_rewrite_matching_files``'s
``stage_to`` mode, both deletes claimed in ONE transaction. Crash
injection mirrors tests/test_multi_table_txn.py: a coordinator dying
between the two delete claims must leave BOTH tables un-deleted (no
state where the base row is erased while the index still serves its
vector, or vice versa)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import otus_cpp_11_spark.ops.versioned as V
from otus_cpp_11_spark.ops.versioned import (
    CommitConflict,
    commit_append,
    commit_transaction,
    commit_version,
    read_version,
    vacuum_versions,
    version_header,
)


@pytest.fixture(autouse=True)
def _fast_grace(monkeypatch):
    monkeypatch.setattr(V, "_TXN_INDOUBT_WAIT_SECS", 0.0)
    V._TXN_FINAL_CACHE.clear()
    V._TXN_SEAL_CACHE.clear()


@pytest.fixture()
def tables(spark, tmp_path):
    base, index, troot = (
        str(tmp_path / "base"),
        str(tmp_path / "index"),
        str(tmp_path / "txns"),
    )
    rows = spark.range(100).select(
        F.col("id").alias("vec_id"), (F.col("id") % 8).alias("cell")
    )
    commit_version(
        spark, rows.coalesce(2), base,
        stats_cols=["vec_id"], bloom_cols=["vec_id"],
    )
    commit_version(
        spark, rows.coalesce(2), index,
        stats_cols=["cell", "vec_id"], bloom_cols=["vec_id"],
    )
    return base, index, troot


FORGET = "vec_id IN (7, 42)"


def test_txn_delete_both_or_neither(spark, tables):
    base, index, troot = tables
    got = commit_transaction(
        spark,
        [],
        troot,
        deletes=[(base, FORGET, {"vec_id": (7, 42)}, 0.5),
                 (index, FORGET, {"vec_id": (7, 42)}, 0.5)],
    )
    assert got == {base: 2, index: 2}
    for t in (base, index):
        assert read_version(spark, t).count() == 98
        assert (
            read_version(spark, t).where(F.col("vec_id").isin(7, 42)).count()
            == 0
        )
    assert (
        version_header(spark, base, 2)["txn"]["id"]
        == version_header(spark, index, 2)["txn"]["id"]
    )
    # time travel still shows the pre-delete snapshot (retention note)
    assert read_version(spark, base, 1).count() == 100


def test_crash_between_delete_claims_aborts_both(spark, tables, monkeypatch):
    """Coordinator dies after claiming the FIRST delete slot: the claim
    resolves to abort and NEITHER table loses rows."""
    base, index, troot = tables
    real = V._claim_commit
    state = {"n": 0}

    def dying_claim(spark_, table, version, content):
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("simulated crash between claims")
        return real(spark_, table, version, content)

    monkeypatch.setattr(V, "_claim_commit", dying_claim)
    with pytest.raises(RuntimeError, match="between claims"):
        commit_transaction(
            spark, [], troot,
            deletes=[(base, FORGET, None, 0.5), (index, FORGET, None, 0.5)],
        )
    monkeypatch.setattr(V, "_claim_commit", real)
    # simulate a HARD crash: no abort record, no seals — readers decide
    for f in glob.glob(f"{troot}/txn-*.final"):
        os.remove(f)
    for t in (base, index):
        for f in glob.glob(f"{t}/_commits/*.txnseal"):
            os.remove(f)
    V._TXN_FINAL_CACHE.clear()
    V._TXN_SEAL_CACHE.clear()
    for t in (base, index):
        assert read_version(spark, t).count() == 100  # nothing deleted
    # the tables stay writable and a retried txn succeeds
    got = commit_transaction(
        spark, [], troot,
        deletes=[(base, FORGET, None, 0.5), (index, FORGET, None, 0.5)],
    )
    for t in (base, index):
        assert read_version(spark, t, got[t]).count() == 98


def test_interleaved_commit_steals_slot_aborts_whole_txn(
    spark, tables, monkeypatch
):
    """A writer interleaving between a delete's staging and its claim
    takes the slot; the WHOLE transaction aborts (the slot claim is the
    delete's OCC validation) and neither table shows the delete."""
    base, index, troot = tables
    real = V._claim_commit
    state = {"stolen": False}

    def stealing_claim(spark_, table, version, content):
        if table == index and not state["stolen"]:
            state["stolen"] = True
            monkeypatch.setattr(V, "_claim_commit", real)
            commit_append(
                spark_,
                spark_.range(900, 902).select(
                    F.col("id").alias("vec_id"),
                    (F.col("id") % 8).alias("cell"),
                ),
                index,
            )
            monkeypatch.setattr(V, "_claim_commit", stealing_claim)
        return real(spark_, table, version, content)

    monkeypatch.setattr(V, "_claim_commit", stealing_claim)
    with pytest.raises(CommitConflict):
        commit_transaction(
            spark, [], troot,
            deletes=[(base, FORGET, None, 0.5), (index, FORGET, None, 0.5)],
        )
    monkeypatch.setattr(V, "_claim_commit", real)
    assert read_version(spark, base).count() == 100  # delete aborted whole
    assert read_version(spark, index).count() == 102  # stealer's append only
    assert (
        read_version(spark, index).where(F.col("vec_id").isin(7, 42)).count()
        == 2
    )


def test_mixed_append_and_delete_txn(spark, tables):
    """One transaction appends to the index while deleting from the
    base — both land with the same txn id."""
    base, index, troot = tables
    arrivals = spark.range(200, 205).select(
        F.col("id").alias("vec_id"), (F.col("id") % 8).alias("cell")
    )
    got = commit_transaction(
        spark,
        [(index, arrivals.coalesce(1), ["cell", "vec_id"])],
        troot,
        deletes=[(base, FORGET, None, 0.5)],
    )
    assert got == {base: 2, index: 2}
    assert read_version(spark, base).count() == 98
    assert read_version(spark, index).count() == 105
    assert (
        version_header(spark, base, 2)["txn"]["id"]
        == version_header(spark, index, 2)["txn"]["id"]
    )


def test_noop_delete_claims_nothing(spark, tables):
    base, index, troot = tables
    got = commit_transaction(
        spark, [], troot,
        deletes=[(base, "vec_id = 99999", None, 0.5),
                 (index, FORGET, None, 0.5)],
    )
    assert got == {base: 1, index: 2}  # no-match table never claimed
    assert version_header(spark, base, 1).get("txn") is None
    assert read_version(spark, index).count() == 98


def test_txn_upsert_both_or_neither(spark, tables, monkeypatch):
    """Transactional MERGE (r12): one txn upserts both tables; a
    coordinator dying between the two claims leaves BOTH unchanged."""
    base, index, troot = tables
    delta = spark.createDataFrame(
        [(3, 99, False), (7, 0, True)], "vec_id long, cell long, dead boolean"
    )
    got = commit_transaction(
        spark, [], troot,
        upserts=[(base, delta, ["vec_id"], "dead"),
                 (index, delta, ["vec_id"], "dead")],
    )
    assert got == {base: 2, index: 2}
    for t in (base, index):
        d = {r["vec_id"]: r["cell"] for r in read_version(spark, t).collect()}
        assert d[3] == 99 and 7 not in d and len(d) == 99
    assert (
        version_header(spark, base, 2)["txn"]["id"]
        == version_header(spark, index, 2)["txn"]["id"]
    )
    # crash between the two upsert claims: neither table changes
    real = V._claim_commit
    state = {"n": 0}

    def dying(s_, t_, v_, c_):
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("boom")
        return real(s_, t_, v_, c_)

    monkeypatch.setattr(V, "_claim_commit", dying)
    delta2 = spark.createDataFrame(
        [(4, 77, False)], "vec_id long, cell long, dead boolean"
    )
    with pytest.raises(RuntimeError, match="boom"):
        commit_transaction(
            spark, [], troot,
            upserts=[(base, delta2, ["vec_id"], "dead"),
                     (index, delta2, ["vec_id"], "dead")],
        )
    monkeypatch.setattr(V, "_claim_commit", real)
    for t in (base, index):
        d = {r["vec_id"]: r["cell"] for r in read_version(spark, t).collect()}
        assert d[4] == 4 % 8 and d[3] == 99  # crash txn aborted; first kept


def test_noop_delete_never_seals_foreign_version(spark, tables, monkeypatch):
    """Review finding (r12): a no-match delete reports the table at its
    CURRENT version — which some other transaction may own. Sealing it
    would permanently occupy that version's one-shot seal slot with the
    wrong txn id. The no-op table must get NO seal from this txn; the
    real owner's verdict must still seal on first resolution."""
    import glob

    base, index, troot = tables
    # txn B commits v2 on base+index but its seal writes are lost
    real_seal = V._txn_write_seal
    monkeypatch.setattr(V, "_txn_write_seal", lambda *a, **k: None)
    commit_transaction(
        spark,
        [(base, spark.range(500, 502).select(
            F.col("id").alias("vec_id"), (F.col("id") % 8).alias("cell")
        ).coalesce(1)),
         (index, spark.range(500, 502).select(
            F.col("id").alias("vec_id"), (F.col("id") % 8).alias("cell")
         ).coalesce(1))],
        troot,
    )
    monkeypatch.setattr(V, "_txn_write_seal", real_seal)
    assert not glob.glob(f"{base}/_commits/*.txnseal")
    # txn A: delete matching NOTHING on base, real delete on index
    got = commit_transaction(
        spark, [], troot,
        deletes=[(base, "vec_id = 99999", None, 0.5),
                 (index, FORGET, None, 0.5)],
    )
    assert got[base] == 2  # reported at current (B's version), unclaimed
    # A must not have sealed base v2 (B's slot); B still seals on read
    seals = glob.glob(f"{base}/_commits/00000002.txnseal")
    if seals:
        import json

        doc = json.load(open(seals[0]))
        b_txn = version_header(spark, base, 2)["txn"]["id"]
        assert doc["txn"] == b_txn, "foreign txn squatted the seal slot"
    V._TXN_SEAL_CACHE.clear()
    V._TXN_FINAL_CACHE.clear()
    assert read_version(spark, base).count() == 102  # resolves + seals B
    import json

    doc = json.load(open(f"{base}/_commits/00000002.txnseal"))
    assert doc["txn"] == version_header(spark, base, 2)["txn"]["id"]
    assert doc["state"] == "commit"


def test_vacuum_reclaims_aborted_txn_delete_staging(
    spark, tables, monkeypatch
):
    """An aborted transactional delete's staged DV sidecars / rewritten
    files are referenced by no resolved manifest; vacuum reclaims them."""
    base, index, troot = tables
    real = V._claim_commit
    state = {"n": 0}

    def dying_claim(spark_, table, version, content):
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("boom")
        return real(spark_, table, version, content)

    monkeypatch.setattr(V, "_claim_commit", dying_claim)
    with pytest.raises(RuntimeError):
        commit_transaction(
            spark, [], troot,
            # fraction 0: force the REWRITE path so staged data files exist
            deletes=[(base, FORGET, None, 0.0), (index, FORGET, None, 0.0)],
        )
    monkeypatch.setattr(V, "_claim_commit", real)
    assert read_version(spark, base).count() == 100  # abort resolved
    staged = glob.glob(f"{base}/_data/c00000002-*/**/*.parquet", recursive=True)
    assert staged, "the aborted delete staged rewritten files"
    vacuum_versions(
        spark, base, keep_last=5, drop_uncommitted=True,
        uncommitted_grace_s=0.0,
    )
    assert not glob.glob(
        f"{base}/_data/c00000002-*/**/*.parquet", recursive=True
    )
    assert read_version(spark, base).count() == 100
