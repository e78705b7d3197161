"""OPQ trained on the planted anisotropic fixture (r12 verdict item 4):
the decision probe must FIRE on the fixture (anisotropy orders of
magnitude beyond the near-isotropic corpus), and the trained rotation
(serpentine eigenvalue-allocation permutation — the axis-aligned
parametric-OPQ case) must DOMINATE the identity split in recall at
equal code bytes. The oracle rows pin the values; this file gates the
inequalities themselves."""

from __future__ import annotations

from otus_cpp_11_spark.queries.similarity import (
    PQ_DSUB,
    PQ_SUBVECTORS,
    _opq_fixture,
    _opq_posmap,
    _opq_rotated,
)
from otus_cpp_11_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_probe_fires_on_the_fixture(spark):
    """Fixture overall anisotropy must dwarf the corpus's (~2.3 there,
    thousands here) — the trigger condition for training a rotation."""
    probe = all_queries()["opq_aniso_probe_fires"]
    rows = {r["subvector"]: r for r in probe.fn(spark, SF_DIR).collect()}
    assert rows[-1]["anisotropy"] > 1000.0
    # and the identity split is maximally unbalanced: subvector 0 holds
    # more variance mass than the other three combined
    assert rows[0]["v_sum"] > sum(rows[s]["v_sum"] for s in (1, 2, 3))


def test_posmap_is_a_balanced_permutation(spark):
    pm = _opq_posmap(spark, SF_DIR)
    assert sorted(pm) == list(range(PQ_SUBVECTORS * PQ_DSUB))
    # serpentine allocation spreads the top-PQ_SUBVECTORS variance dims
    # one per subvector: the 4 highest-variance dims (all in source
    # block 0) land in 4 DIFFERENT target subvectors
    fx_dims_per_sub = [
        {d for d in pm[s * PQ_DSUB : (s + 1) * PQ_DSUB] if d < PQ_DSUB}
        for s in range(PQ_SUBVECTORS)
    ]
    assert all(fx_dims_per_sub), "a subvector got no high-variance dim"


def test_rotation_preserves_exact_geometry(spark):
    """The rotation is a permutation: per-vector multisets of elements
    are identical, so exact L2 is preserved — dominance can only come
    from the quantizer fitting better, never from easier geometry."""
    fx = _opq_fixture(spark, SF_DIR).orderBy("vec_id").limit(5)
    pm = _opq_posmap(spark, SF_DIR)
    fo = _opq_rotated(fx, pm)
    for a, b in zip(fx.collect(), fo.collect()):
        assert a["vec_id"] == b["vec_id"]
        assert sorted(a["embedding"]) == sorted(b["embedding"])


def test_opq_dominates_identity_at_equal_code_bytes(spark):
    q = all_queries()["pq_recall_opq_vs_identity"]
    got = q.fn(spark, SF_DIR).toPandas()
    assert got["n_hits_opq"].sum() > got["n_hits_identity"].sum()
    assert (
        got["recall_opq"] - got["n_hits_opq"] / 5.0
    ).abs().max() == 0
