"""Trained PQ codebook gates (r8 verdict item 4): the one-step Lloyd
refinement must (a) monotonically reduce total quantization distortion —
the classical k-means guarantee, which holds for our fixed-point means
up to their 1e-7 rounding — and (b) not lose eval recall vs the init
codebook on the driver testdata (the oracle hash gate separately proves
both engines compute identical recall rows)."""

from __future__ import annotations

import numpy as np

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.similarity import (
    PQ_DSUB,
    PQ_SCALE,
    PQ_SUBVECTORS,
    _pq_encode_np,
    _pq_init_slices,
    _pq_slice_mat,
    _pq_trained_slices,
)
from otus_cpp_11_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _distortion(emb, cmat):
    """Total int64 quantization distortion under nearest-centroid
    assignment — the objective Lloyd's iteration descends."""
    total = 0
    codes = _pq_encode_np(emb, cmat)
    for s in range(PQ_SUBVECTORS):
        lo, hi = s * PQ_DSUB, (s + 1) * PQ_DSUB
        d = emb[:, lo:hi] - cmat[s][codes[:, s]]
        total += int(
            np.floor(d * d * float(PQ_SCALE)).astype(np.int64).sum()
        )
    return total


def test_one_lloyd_step_reduces_quantization_distortion(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    init = _pq_init_slices(e)
    trained = _pq_trained_slices(e)
    emb = np.array(
        [list(r["embedding"]) for r in e.select("embedding").collect()],
        dtype=np.float64,
    )
    d_init = _distortion(emb, _pq_slice_mat(init))
    d_trained = _distortion(emb, _pq_slice_mat(trained))
    # strict descent: init-by-first-K is far from a fixed point on this
    # data, so one exact assign+update step must improve the objective
    # (allowing equality would also mask a trained==init plumbing bug)
    assert d_trained < d_init, (d_trained, d_init)
    # empty-cluster handling: every (s, code) slice exists and is finite
    assert set(trained) == set(init)
    assert all(np.isfinite(v).all() for v in map(np.array, trained.values()))


def test_trained_recall_not_below_init_on_eval_queries(spark):
    q = all_queries()["pq_recall_trained_vs_init"]
    got = q.fn(spark, SF_DIR).toPandas()
    assert (got["n_hits_trained"].sum()) >= (got["n_hits_init"].sum())
    assert (got["recall_trained"] - got["n_hits_trained"] / 5.0).abs().max() == 0


def test_ivf_refinement_reduces_coarse_distortion(spark):
    """The IVF symmetry: one Lloyd step over the COARSE (full-dim)
    quantizer must descend the quantization objective — the provable
    half of ivf_trained_recall (probe recall itself is data-dependent
    and is the eval's OUTPUT, not an invariant)."""
    from otus_cpp_11_spark.queries.similarity import IVF_T_K

    e = load_table(spark, SF_DIR, "embeddings")
    emb = np.array(
        [
            list(r["embedding"])
            for r in e.select("vec_id", "embedding").orderBy("vec_id").collect()
        ],
        dtype=np.float64,
    )
    seeds = emb[:IVF_T_K].copy()  # vec_id < K — the query's exact seed set

    def distortion(C):
        d2 = ((emb[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        return float(d2.min(axis=1).sum())

    a = ((emb[:, None, :] - seeds[None, :, :]) ** 2).sum(-1).argmin(1)
    trained = seeds.copy()
    for k in range(IVF_T_K):
        m = a == k
        if m.any():
            trained[k] = emb[m].mean(0)
    assert distortion(trained) < distortion(seeds)


def test_ivf_trained_recall_rows_well_formed(spark):
    from otus_cpp_11_spark.queries.similarity import IVF_T_NQ, IVF_T_TOPK

    got = all_queries()["ivf_trained_recall"].fn(spark, SF_DIR).toPandas()
    assert len(got) == IVF_T_NQ
    for c in ("n_hits_seeded", "n_hits_trained"):
        assert got[c].between(0, IVF_T_TOPK).all()
    assert (got["recall_seeded"] == got["n_hits_seeded"] / IVF_T_TOPK).all()
    assert (got["recall_trained"] == got["n_hits_trained"] / IVF_T_TOPK).all()
