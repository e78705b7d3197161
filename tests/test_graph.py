"""Connected components: the adaptive operator's two strategies (driver
union-find below DRIVER_CC_MAX_EDGES, distributed pointer-jumping label
propagation above) must produce identical labelings — same contract the
reference's iterative driver loop satisfies per prefix length
(src/main.cpp:59-99: every iteration recomputes the full answer)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

import otus_cpp_11_spark.ops.graph as graph
from otus_cpp_11_spark.ops.graph import connected_components


def _labels(df):
    return sorted((r["id"], r["component"]) for r in df.collect())


@pytest.fixture
def force_distributed(monkeypatch):
    monkeypatch.setattr(graph, "DRIVER_CC_MAX_EDGES", 0)


def test_small_graph_driver_path(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8)], "src int, dst int"
    )
    assert _labels(connected_components(edges, "src", "dst")) == [
        (1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (8, 8),
    ]


def test_distributed_path_matches_driver_path(spark, force_distributed):
    rng = random.Random(7)
    rows = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    edges = spark.createDataFrame(rows, "src int, dst int")
    dist = _labels(connected_components(edges, "src", "dst"))

    # driver union-find on the same edges is the oracle
    expected = sorted(graph._driver_union_find(edges.collect(), "src", "dst"))
    assert dist == expected


def test_long_chain_converges_via_pointer_jumping(spark, force_distributed):
    n = 300  # diameter >> max_iter without pointer jumping
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src int, dst int"
    )
    cc = connected_components(edges, "src", "dst", max_iter=15)
    assert cc.agg(F.count_distinct("component")).first()[0] == 1
    assert cc.count() == n + 1
