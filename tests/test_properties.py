"""Property-based tests (hypothesis): engine results vs brute-force Python
oracles on randomized small inputs — the corpus queries pin one dataset,
these pin the semantics. Example counts are small because every example
runs real Spark jobs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from otus_cpp_11_spark.mapreduce import MapReduceJob
from otus_cpp_11_spark.ops.joins import asof_join
from otus_cpp_11_spark.prefix import min_unique_prefix_length

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

lines_strategy = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5), min_size=1, max_size=12
)


def brute_min_unique_prefix(lines: list[str]) -> int | None:
    if len(set(lines)) != len(lines):
        return None
    max_len = max((len(s) for s in lines), default=0)
    if max_len == 0:
        return None
    for L in range(1, max_len + 1):
        prefixes = [s[:L] for s in lines]
        if len(set(prefixes)) == len(prefixes):
            return L
    return max_len


@given(lines=lines_strategy)
@settings(**SETTINGS)
def test_prefix_matches_bruteforce(spark, lines):
    df = spark.createDataFrame([(v,) for v in lines], "value string")
    assert min_unique_prefix_length(spark, df) == brute_min_unique_prefix(lines)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=8
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=8
    ),
)
@settings(**SETTINGS)
def test_asof_matches_bruteforce(spark, left, right):
    t0 = dt.datetime(2025, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    # dedupe right on (key, ts) — the documented precondition (ties on the
    # as-of time are otherwise plan-dependent); keep max id per (k, t)
    rdedup: dict[tuple[int, int], int] = {}
    for i, (k, t) in enumerate(right):
        rdedup[(k, t)] = max(rdedup.get((k, t), -1), 100 + i)
    ldf = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(rid, k, ts(t)) for (k, t), rid in rdedup.items()],
        "rid long, k long, ts timestamp",
    )
    got = {
        r.lid: r.asof_rid
        for r in asof_join(ldf, rdf, on="k", right_cols=["rid"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, rid) for (rk, rt), rid in rdedup.items() if rk == k and rt <= t
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, cands)


@given(
    lines=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=10
    )
)
@settings(**SETTINGS)
def test_mapreduce_word_count_matches_counter(spark, lines):
    from collections import Counter

    want = Counter(w for line in lines for w in line.split() if w)
    job = MapReduceJob(mappers=2, reducers=2).set_mapper(
        lambda line: [(w, 1) for w in line.split() if w]
    )
    df = spark.createDataFrame([(v,) for v in lines], "value string")
    # r["count"] not r.count — Row.count is the tuple method
    got = {r.key: r["count"] for r in job.run_counts(spark, df).collect()}
    assert got == dict(want)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200)), min_size=1, max_size=8
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200)), min_size=0, max_size=8
    ),
)
@settings(**SETTINGS)
def test_range_join_matches_bruteforce(spark, left, right):
    """range_join_within must equal the brute-force pair set for every
    generated (key, minute) layout — boundary inclusion (<=), cell-edge
    replication, and exactly-once pairing all covered by search."""
    from otus_cpp_11_spark.ops.joins import range_join_within

    t0 = dt.datetime(2025, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    ldf = spark.createDataFrame(
        [(i, k, ts(t)) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, ts(t)) for i, (k, t) in enumerate(right)],
        "rid long, k long, ts timestamp",
    )
    out = range_join_within(ldf, rdf, on="k", window="'1' HOUR")
    got = sorted((r.l_lid, r.r_rid) for r in out.collect())
    want = sorted(
        (i, 100 + j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and rt > lt and rt <= lt + 60
    )
    assert got == want
