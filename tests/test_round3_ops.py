"""Semantic laws for the round-3 operators, beyond the row-level oracle:
SCD2 intervals must tile each user's timeline, path counts must conserve
sessions, hash samples must be deterministic and subsets, the Gram matrix
must match numpy on planted data, and the power-iteration unit vector
must have norm 1."""

from __future__ import annotations

import numpy as np
import pytest

from otus_cpp_11_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_scd2_intervals_tile_timeline(spark, qs):
    rows = qs["user_value_scd2"].fn(spark, SF).collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    from otus_cpp_11_spark.catalog import load_table

    n_events = load_table(spark, SF, "events").count()
    assert sum(len(v) for v in by_user.values()) == n_events
    for user, ivs in by_user.items():
        # rows come back ordered by (user, valid_from, event_id)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for prev, cur in zip(ivs, ivs[1:]):
            # each interval closes exactly where the next opens: no gap,
            # no overlap (ties allowed: simultaneous events share a ts)
            assert prev.valid_to == cur.valid_from


def test_session_paths_conserve_sessions(spark, qs):
    paths = qs["session_top_paths"].fn(spark, SF).collect()
    sessions = qs["user_event_sessions"].fn(spark, SF).collect()
    assert sum(r.n_sessions for r in paths) == len(sessions)
    # every path is 1..3 event types joined by '>'
    for r in paths:
        parts = r.path.split(">")
        assert 1 <= len(parts) <= 3 and all(parts)


def test_reservoir_sample_deterministic_subset(spark, qs):
    a = qs["doc_reservoir_sample"].fn(spark, SF).collect()
    b = qs["doc_reservoir_sample"].fn(spark, SF).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # retry-stable
    from otus_cpp_11_spark.catalog import load_table

    all_ids = {r.doc_id for r in load_table(spark, SF, "documents").select("doc_id").collect()}
    assert {r.doc_id for r in a} <= all_ids


def test_gram_matches_numpy_on_planted_matrix(spark):
    from otus_cpp_11_spark.queries.similarity import GRAM_ESCALE

    rng = [[0.5, -0.25, 0.125], [1.0, 0.0, -0.5], [-0.75, 0.3125, 0.0625]]
    # quantize exactly like the query, then compare integer-exact
    eu = np.floor(np.array(rng) * GRAM_ESCALE).astype(np.int64)
    want = (eu.T @ eu).astype(float) / GRAM_ESCALE / GRAM_ESCALE

    import tempfile
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(rng, pa.list_(pa.float32())),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    got = all_queries()["embedding_gram_upper"].fn(spark, d).collect()
    for r in got:
        assert r.gram == pytest.approx(want[r.k][r.l], abs=1e-12), (r.k, r.l)


def test_power_iteration_unit_norm(spark, qs):
    rows = qs["embedding_power_iteration"].fn(spark, SF).collect()
    norm = sum(r.v1_unit**2 for r in rows) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-9)
    # v1_unit is v1 rescaled: same direction
    import math

    dot = sum(r.v1 * r.v1_unit for r in rows)
    va = math.sqrt(sum(r.v1**2 for r in rows))
    assert dot / va == pytest.approx(1.0, abs=1e-9)
