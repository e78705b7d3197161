"""Round-6 operator invariants: quality-priority dedup canonicalization."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def canonical(spark):
    from otus_cpp_11_spark.registry import all_queries

    return all_queries()["dedup_canonical_by_quality"].fn(spark, SF).collect()


def test_exactly_one_survivor_per_cluster(canonical):
    by_cluster: dict[int, list] = {}
    for r in canonical:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert by_cluster  # the corpus plants near-dup clusters
    for rows in by_cluster.values():
        keeps = [r for r in rows if r["keep"] == 1]
        assert len(keeps) == 1
        # the survivor IS the canonical doc, and it is a member
        assert keeps[0]["doc_id"] == keeps[0]["canonical_doc"]
        assert all(r["canonical_doc"] == keeps[0]["doc_id"] for r in rows)


def test_survivor_is_undominated(canonical):
    """No cluster member strictly beats its survivor on the documented
    priority (quality gate, then length, then lowest id)."""
    by_cluster: dict[int, list] = {}
    for r in canonical:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for rows in by_cluster.values():
        win = max(rows, key=lambda r: (r["quality_ok"], r["n_tokens"], -r["doc_id"]))
        keep = next(r for r in rows if r["keep"] == 1)
        assert (keep["quality_ok"], keep["n_tokens"], keep["doc_id"]) == (
            win["quality_ok"],
            win["n_tokens"],
            win["doc_id"],
        )


def test_resize_conserves_channel_mass_and_covers_grid(spark):
    """Box-downsampling is a partition of the pixels: summing the resized
    cells' channel sums must reproduce the full-image channel sums from
    the independent decode query, and every image must fill the full
    2x2 grid (binning leaves no empty cell for w,h >= grid)."""
    from otus_cpp_11_spark.registry import all_queries

    qs = all_queries()
    cells = qs["ppm_resize_2x2"].fn(spark, SF).collect()
    feats = {
        r["doc_id"]: (r["r_sum"], r["g_sum"], r["b_sum"])
        for r in qs["ppm_decode_features"].fn(spark, SF).collect()
    }
    sums: dict[int, list[int]] = {}
    grid: dict[int, set] = {}
    for r in cells:
        a = sums.setdefault(r["doc_id"], [0, 0, 0])
        a[0] += r["r_sum"]
        a[1] += r["g_sum"]
        a[2] += r["b_sum"]
        grid.setdefault(r["doc_id"], set()).add((r["cx"], r["cy"]))
    assert set(sums) == set(feats)
    for doc, (rs, gs, bs) in feats.items():
        assert sums[doc] == [rs, gs, bs]
        assert grid[doc] == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_membership_matches_cluster_relation(spark, canonical):
    from otus_cpp_11_spark.queries.dedup import doc_dedup_clusters

    want = {
        (r["doc_id"], r["cluster_id"])
        for r in doc_dedup_clusters(spark, SF).collect()
    }
    got = {(r["doc_id"], r["cluster_id"]) for r in canonical}
    assert got == want
