"""Error-bound tests for sketch aggregates (events_user_sketches
oracle-checks exact companion columns plus in-bound booleans; the HARD
error bounds against exact answers live here) and row-identity tests for
the salted skew join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.ops.skew import salted_join
from otus_cpp_11_spark.registry import all_queries

SF = "/root/testdata/sf0.01"


def test_sketch_query_booleans_and_exact_counts(spark):
    rows = all_queries()["events_user_sketches"].fn(spark, SF).collect()
    e = load_table(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.hll_within_bound and r.median_within_band


def test_hll_distinct_within_rsd(spark):
    e = load_table(spark, SF, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("est"),
            F.count_distinct("user_id").alias("n"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.est - r.n) / r.n <= 0.05  # rsd=0.02, generous


def test_approx_median_brackets_exact(spark):
    e = load_table(spark, SF, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, 0.5, 10000)").alias("est"),
            F.expr("percentile(value, 0.4)").alias("p40"),
            F.expr("percentile(value, 0.6)").alias("p60"),
        )
        .collect()
    )
    for r in rows:
        assert r.p40 <= r.est <= r.p60


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # 90% of left rows share key 1 — the pathological hot key
    left = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)],
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 60)], "k long, name string"
    )
    return left, right


def test_salted_join_row_identical_to_plain(spark, skewed_pair):
    left, right = skewed_pair
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k").collect()))
    assert salted == plain


def test_salted_join_left_outer(spark, skewed_pair):
    left, right = skewed_pair
    plain = sorted(map(tuple, left.join(right, "k", "left").collect()), key=repr)
    salted = sorted(
        map(tuple, salted_join(left, right, "k", how="left").collect()), key=repr
    )
    assert salted == plain


def test_salted_join_semi_anti(spark, skewed_pair):
    left, right = skewed_pair
    for how in ("semi", "anti"):
        plain = sorted(map(tuple, left.join(right, "k", how).collect()), key=repr)
        salted = sorted(
            map(tuple, salted_join(left, right, "k", how=how).collect()), key=repr
        )
        assert salted == plain, how


def test_salted_join_rejects_outer_how(spark, skewed_pair):
    # right/full would replicate each unmatched `other` row once per salt
    # replica (null-extended), so salted_join refuses them outright
    left, right = skewed_pair
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", how=how)


def test_salted_topk_exact_under_heavy_ties(spark):
    """salted_topk must return the identical rows as the naive single
    window even when the order column is massively tied (the case where
    a wrong salt interaction would be most visible): 400 rows, 4 groups,
    only 3 distinct score values, unique id tie-break."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from otus_cpp_11_spark.ops.skew import salted_topk

    df = (
        spark.range(400)
        .select(
            (F.col("id") % 4).alias("g"),
            (F.col("id") % 3).alias("score"),
            F.col("id"),
        )
    )
    order = [F.desc("score"), F.asc("id")]
    naive = (
        df.withColumn(
            "rank", F.row_number().over(Window.partitionBy("g").orderBy(*order))
        )
        .where(F.col("rank") <= 7)
    )
    got = salted_topk(df, ["g"], order, 7, salt_on="id")
    want = {(r["g"], r["rank"], r["id"]) for r in naive.collect()}
    have = {(r["g"], r["rank"], r["id"]) for r in got.collect()}
    assert have == want
