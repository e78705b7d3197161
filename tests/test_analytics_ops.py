"""Semantic contracts of the profiling / funnel / k-means / containment
operators (cross-engine value equality is the oracle harness's job; these
lock in the invariants that must hold on ANY input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _q(name):
    return all_queries()[name].fn


def test_funnel_stage_counts_monotone(spark):
    row = _q("user_funnel_conversion")(spark, SF).first()
    assert (
        row.n_users
        >= row.n_viewed
        >= row.n_clicked_after_view
        >= row.n_purchased_after_click
        >= 0
    )
    assert 0.0 <= row.view_to_click_rate <= 1.0
    assert 0.0 <= row.click_to_purchase_rate <= 1.0


def test_containment_dominates_jaccard_on_shared_pairs(spark):
    cont = _q("near_dup_containment")(spark, SF).collect()
    assert cont, "fixture corpus must contain containment pairs"
    for r in cont:
        assert r.doc_a < r.doc_b
        assert 0.8 <= r.containment <= 1.0
        assert r.size_a > 0 and r.size_b > 0
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _q("near_dup_pairs_minhash")(spark, SF).collect()
    }
    by_pair = {(r.doc_a, r.doc_b): r.containment for r in cont}
    shared = set(by_pair) & set(jac)
    assert shared, "some pair must pass both gates on the fixture"
    for k in shared:
        # |A∩B|/min <= 1 and |A∩B|/|A∪B| <= |A∩B|/min always
        assert by_pair[k] >= jac[k]


def test_kmeans_partitions_all_vectors(spark):
    rows = _q("kmeans_assign_update")(spark, SF).collect()
    n_vectors = load_table(spark, SF, "embeddings").count()
    dim = len(
        load_table(spark, SF, "embeddings").select("embedding").first()[0]
    )
    # every cluster emits exactly one row per dimension
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r.cluster_id, set()).add(r.pos)
        # n_members constant across a cluster's dims
    for cid, poss in per_cluster.items():
        assert poss == set(range(dim)), cid
    members = {r.cluster_id: r.n_members for r in rows}
    # assignment is a partition of the vectors
    assert sum(members.values()) == n_vectors
    # the seed centroid of each nonempty cluster pulls at least itself
    assert all(m >= 1 for m in members.values())


def test_profile_matches_direct_aggregates(spark):
    rows = {r.column_name: r for r in _q("lineitem_profile")(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    n = li.count()
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}
    for c, r in rows.items():
        assert r.n_rows == n
        assert r.n_nulls == n - li.where(F.col(c).isNotNull()).count()
        assert r.n_distinct <= r.n_rows - r.n_nulls
        assert r.min_val <= r.max_val


def test_novelty_bounded_by_containment_overlap(spark):
    nov = {r.doc_id: r for r in _q("doc_novelty_score")(spark, SF).collect()}
    assert nov
    for r in nov.values():
        assert 0.0 <= r.novelty_ratio <= 1.0
        assert 0 <= r.n_first_seen <= r.n_shingles
    # cross-operator conservation law vs the containment pairs: for a
    # verified pair (a < b), the n_common shingles shared with the EARLIER
    # doc a were first seen no later than a, so doc b can have at most
    # size_b - n_common first-seen shingles
    pairs = _q("near_dup_containment")(spark, SF).collect()
    assert pairs, "fixture corpus must contain containment pairs"
    for pr in pairs:
        n_common = round(pr.containment * min(pr.size_a, pr.size_b))
        r = nov[pr.doc_b]
        assert r.n_first_seen <= r.n_shingles - n_common, pr


def test_semantic_dedup_pairs_within_cells(spark):
    pairs = _q("semantic_dedup_pairs")(spark, SF).collect()
    assert pairs, "fixture embeddings must contain semantic near-dups"
    cells = {r.cell for r in pairs}
    assert cells <= set(range(8))  # K=8 seed cells
    for r in pairs:
        assert r.vec_a < r.vec_b
        assert r.cosine >= 0.4


def test_mixture_weights_normalize_and_flatten(spark):
    rows = _q("source_mixture_weights")(spark, SF).collect()
    assert len(rows) > 1
    assert abs(sum(r.sample_prob for r in rows) - 1.0) < 1e-9
    total_tokens = sum(r.n_tokens for r in rows)
    for r in rows:
        assert 0.0 < r.sample_prob < 1.0
        token_share = r.n_tokens / total_tokens
        # sqrt weighting flattens: above-average sources are downweighted,
        # below-average sources upweighted
        if token_share > 1.0 / len(rows):
            assert r.sample_prob <= token_share + 1e-12
        else:
            assert r.sample_prob >= token_share - 1e-12
