"""Invariants for curation/batch-prep operators beyond the row-level
oracle gate: conservation laws that must hold at any scale factor."""

from __future__ import annotations

import pyspark.sql.functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.rollup import doc_pack_bins, events_multires_rollup

SF = "/root/testdata/sf0.001"


def test_pack_bins_conserve_docs_and_tokens(spark):
    d = load_table(spark, SF, "documents")
    n_docs = d.count()
    n_tokens = d.select(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda x: x != F.lit("")))
        ).alias("t")
    ).first()["t"]
    bins = doc_pack_bins(spark, SF).collect()
    assert sum(b["n_docs"] for b in bins) == n_docs
    assert sum(b["total_tokens"] for b in bins) == n_tokens
    # bins are contiguous doc_id ranges in order
    ids = [b["bin_id"] for b in bins]
    assert ids == sorted(ids)
    for prev, cur in zip(bins, bins[1:]):
        assert prev["last_doc"] < cur["first_doc"]


def test_multires_tiers_conserve_counts(spark):
    tiers = events_multires_rollup(spark, SF)
    totals = (
        tiers.groupBy("resolution")
        .agg(
            F.sum("n_events").alias("n"),
            # round, not floor: sum_value is units/1e6 in double, and
            # x/1e6*1e6 can land an ulp below the integer it represents
            F.sum(F.round(F.col("sum_value") * 1e6).cast("long")).alias("u"),
        )
        .collect()
    )
    by_res = {t["resolution"]: t for t in totals}
    n_raw = load_table(spark, SF, "events").count()
    assert {r["n"] for r in totals} == {n_raw}
    # fixed-point units survive re-aggregation bit-identically
    assert by_res["1m"]["u"] == by_res["1h"]["u"] == by_res["1d"]["u"]
