"""Batch k-NN join through the served residual IVF-PQ index (r11
verdict item 1): structural invariants the oracle hash can't express —
probe containment (every reported neighbor lives in one of its query's
nprobe cells), rerank ordering, and self-exclusion. The value-level
identity vs a from-scratch recomputation is the driver oracle's job
(``knn_join_ivfpq_topk`` / ``knn_ivfpq_recall_at_3``)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from otus_cpp_11_spark.queries.similarity import (
    IVF_T_K,
    KNN_IVFPQ_NPROBE,
    KNN_QUERY_MOD,
    KNN_TOPK,
    _d2,
    _ivf_trained,
    _knn_ivfpq_ranked,
    knn_ivfpq_recall_at_3,
)

SF_DIR = "/root/testdata/sf0.001"


def test_batch_join_structure_and_probe_containment(spark):
    from otus_cpp_11_spark.catalog import load_table

    rows = _knn_ivfpq_ranked(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
        assert r["neighbor_id"] != r["query_id"]
    e = load_table(spark, SF_DIR, "embeddings")
    n_queries = e.where(F.col("vec_id") % KNN_QUERY_MOD == 0).count()
    assert len(by_q) == n_queries  # every query answered in the ONE plan
    # recompute each query's nprobe cells and each neighbor's cell the
    # slow way; the join must never report a neighbor outside the probe
    cents, _, _, _ = _ivf_trained(spark, SF_DIR, pre_ingest=True)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cid bigint, cv array<double>",
    )
    d2s = (
        e.join(cdf)
        .select("vec_id", "cid", _d2(F.col("embedding"), F.col("cv")).alias("d2"))
        .collect()
    )
    per_vec = defaultdict(list)
    for r in d2s:
        per_vec[r["vec_id"]].append((r["d2"], r["cid"]))
    cell_of = {v: min(ds)[1] for v, ds in per_vec.items()}
    probed = {
        v: {cid for _, cid in sorted(ds)[:KNN_IVFPQ_NPROBE]}
        for v, ds in per_vec.items()
    }
    for qid, nbrs in by_q.items():
        assert 1 <= len(nbrs) <= KNN_TOPK
        assert sorted(r["rnk"] for r in nbrs) == list(range(1, len(nbrs) + 1))
        cosines = [r["cosine"] for r in sorted(nbrs, key=lambda r: r["rnk"])]
        assert cosines == sorted(cosines, reverse=True)  # rerank order
        for r in nbrs:
            assert cell_of[r["neighbor_id"]] in probed[qid], (
                qid, r["neighbor_id"],
            )
    assert len(probed[0]) == KNN_IVFPQ_NPROBE <= IVF_T_K


def test_sql_encode_equals_column_encode(spark):
    """encode_ivfpq builds its expression tree as JVM-parsed SQL strings
    (per-micro-batch construction cost); it must stay bit-identical to
    the Column-API encode the pinned bulk build uses."""
    from otus_cpp_11_spark.catalog import load_table
    from otus_cpp_11_spark.queries.similarity import (
        _ivf_trained as _ivt,
        _pq_code_exprs_slices,
        _pq_trained_res,
        _residual_frame,
        encode_ivfpq,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    cents, _, _, _ = _ivt(spark, SF_DIR, pre_ingest=True)
    slices, _, _, _ = _pq_trained_res(spark, SF_DIR, pre_ingest=True)
    new = sorted(tuple(r) for r in encode_ivfpq(e, cents, slices).collect())
    old = sorted(
        tuple(r)
        for r in _residual_frame(e, cents)
        .select("vec_id", "label", "cell", *_pq_code_exprs_slices(slices))
        .collect()
    )
    assert new == old


def test_maintainer_checkpoint_resume_exactly_once(spark, tmp_path):
    """Stop-and-resume: stream two arrival files, then add a third and
    re-run on the SAME checkpoint — only the new file is encoded, and
    the final index equals a from-scratch bulk encode of everything. A
    fresh checkpoint against the maintained index is refused loudly."""
    import pytest
    from pyspark.sql import functions as F

    from otus_cpp_11_spark.catalog import load_table
    from otus_cpp_11_spark.ops.versioned import (
        commit_version,
        list_versions,
        read_version,
    )
    from otus_cpp_11_spark.queries.similarity import (
        PQ_INGEST_MOD,
        _ivf_trained as _ivt,
        _pq_trained_res,
        encode_ivfpq,
    )
    from otus_cpp_11_spark.streaming import incremental_ann_index

    e = load_table(spark, SF_DIR, "embeddings")
    cents, _, _, _ = _ivt(spark, SF_DIR, pre_ingest=True)
    slices, _, _, _ = _pq_trained_res(spark, SF_DIR, pre_ingest=True)
    is_ingest = F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    arrivals = str(tmp_path / "arrivals")
    commit_version(
        spark,
        encode_ivfpq(e.where(~is_ingest), cents, slices),
        index,
        stats_cols=["cell", "vec_id"],
    )
    ing = e.where(is_ingest).cache()
    first = ing.where(F.col("vec_id") % 3 != 0)
    late = ing.where(F.col("vec_id") % 3 == 0)
    first.repartition(2).write.parquet(arrivals)
    glob = f"{arrivals[:-1]}[{arrivals[-1]}]"

    def run():
        s = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(glob)
        )
        incremental_ann_index(
            s, index, cents, slices, checkpoint=ckpt
        ).awaitTermination()

    run()
    v_mid = max(list_versions(spark, index))
    assert read_version(spark, index).count() == e.count() - late.count()
    late.coalesce(1).write.mode("append").parquet(arrivals)
    run()  # same checkpoint: encodes ONLY the new file
    v_end = max(list_versions(spark, index))
    assert v_end == v_mid + 1  # one new append, nothing re-applied
    got = sorted(
        tuple(r)
        for r in read_version(spark, index)
        .select("vec_id", "cell", "code_0", "code_1", "code_2", "code_3")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in encode_ivfpq(e, cents, slices)
        .select("vec_id", "cell", "code_0", "code_1", "code_2", "code_3")
        .collect()
    )
    assert got == want  # maintained == from-scratch rebuild
    with pytest.raises(ValueError, match="persistent checkpoint"):
        incremental_ann_index(
            spark.readStream.schema(e.schema).parquet(glob),
            index,
            cents,
            slices,
        )


def test_recall_row_shape(spark):
    rows = knn_ivfpq_recall_at_3(spark, SF_DIR).collect()
    assert rows, "no queries scored"
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert 0 <= r["n_overlap"] <= KNN_TOPK
