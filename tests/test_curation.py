"""Invariants for curation/batch-prep operators beyond the row-level
oracle gate: conservation laws that must hold at any scale factor, and
the size-gated join strategies that decide whether the plans survive a
100x scale-up (r3 verdict: forced broadcasts must degrade, not OOM)."""

from __future__ import annotations

import pyspark.sql.functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.rollup import doc_pack_bins, events_multires_rollup

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _plan(df):
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def test_decontamination_broadcast_gate_degrades(spark, monkeypatch):
    """The eval-index broadcast is probe-gated: small eval set -> hint
    planted (map-side join even when the planner's own threshold would
    not broadcast); eval set over the memory ceiling -> no hint, the
    join degrades to sort-merge, and the values are identical."""
    from otus_cpp_11_spark.queries import curation

    d = load_table(spark, SF01, "documents")
    assert curation.eval_index_fits_broadcast(d)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = curation.benchmark_decontamination(spark, SF01)
        assert "BroadcastHashJoin" in _plan(hinted)
        monkeypatch.setattr(curation, "DECON_BROADCAST_MAX_EVAL_CHARS", 0)
        degraded = curation.benchmark_decontamination(spark, SF01)
        p = _plan(degraded)
        assert "BroadcastHashJoin" not in p
        assert "SortMergeJoin" in p
        assert degraded.collect() == hinted.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_top_terms_join_strategy_left_to_aqe(spark):
    """doc_top_terms plants no broadcast hint (a web corpus has a
    billion-term vocab): with broadcasts disabled the tf-df join is a
    sort-merge and values are unchanged; with defaults the runtime picks
    broadcast from the df relation's actual (tiny) size."""
    from otus_cpp_11_spark.queries import curation

    default_df = curation.doc_top_terms(spark, SF01)
    rows_default = default_df.collect()
    assert "BroadcastHashJoin" in str(
        default_df._jdf.queryExecution().executedPlan()
    )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        degraded = curation.doc_top_terms(spark, SF01)
        assert "SortMergeJoin" in _plan(degraded)
        assert degraded.collect() == rows_default
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


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


def test_repeated_spans_planted_corpus(spark):
    """Hand-computed span semantics on a planted corpus: run merging,
    coverage-contiguity gap rule (<= k), attribution to the earliest doc,
    and exclusion of first-occurrence (owner) docs."""
    from otus_cpp_11_spark.queries.curation import SPAN_TOKENS, _repeated_spans

    assert SPAN_TOKENS == 5
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x x a b c d e f g h y y z w q"),
            (3, "a b c d e q1 q2 q3 q4 q5 q6 f g h i j"),
            (4, "a b c"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.span_start): r
        for r in _repeated_spans(docs).collect()
    }
    # doc 2: grams at pos 3..6 all first-seen in doc 1 -> one merged span
    # covering tokens 3..10 (8 tokens)
    assert set(rows) == {(2, 3), (3, 1), (3, 12)}
    assert (rows[(2, 3)].span_len, rows[(2, 3)].n_dup_grams, rows[(2, 3)].source_doc) == (8, 4, 1)
    # doc 3: two repeats separated by > k fresh tokens -> two spans
    assert (rows[(3, 1)].span_len, rows[(3, 1)].n_dup_grams, rows[(3, 1)].source_doc) == (5, 1, 1)
    assert (rows[(3, 12)].span_len, rows[(3, 12)].n_dup_grams, rows[(3, 12)].source_doc) == (5, 1, 1)


def test_span_strip_apply_matches_stats(spark):
    """Conservation law between the strip ACCOUNTING and the strip APPLY:
    for every doc, tokens kept by corpus_after_span_strip must equal
    n_tokens - tokens_removed from repeated_span_strip_stats (spans are
    disjoint coverage intervals, so the two paths must agree exactly)."""
    from otus_cpp_11_spark.queries.curation import (
        corpus_after_span_strip,
        repeated_span_strip_stats,
    )

    kept = {
        r.doc_id: r.n_tokens_kept
        for r in corpus_after_span_strip(spark, SF).collect()
    }
    stats = repeated_span_strip_stats(spark, SF).collect()
    assert kept and len(kept) == len(stats)
    for r in stats:
        assert kept[r.doc_id] == r.n_tokens - r.tokens_removed, r.doc_id


def test_incremental_decontamination_delta_is_novel_only(spark):
    """The O(delta) claim, mechanically: shard 2's rescan joins only the
    shingles NOVEL to the index (strictly fewer than the shard's own
    set whenever shards overlap, as they do here), and the appended
    matches are disjoint from the v1 matches — nothing is recomputed."""
    from otus_cpp_11_spark.queries.curation import (
        DECON_NGRAM,
        EVAL_MOD,
        _word_shingles_raw,
    )

    d = load_table(spark, SF, "documents")
    grams = _word_shingles_raw(d, DECON_NGRAM)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    s1 = (
        grams.where(is_eval & (F.col("doc_id") % (2 * EVAL_MOD) == 0))
        .select("shingle").distinct()
    )
    s2 = (
        grams.where(is_eval & (F.col("doc_id") % (2 * EVAL_MOD) != 0))
        .select("shingle").distinct()
    )
    n2 = s2.count()
    novel = s2.join(s1, "shingle", "left_anti").count()
    assert 0 < novel < n2, (novel, n2)  # shards overlap: delta < shard

    from otus_cpp_11_spark.queries.curation import incremental_decontamination
    from otus_cpp_11_spark.ops import versioned as V

    calls = []
    orig = V.commit_append

    def spy(spark_, df, table, **kw):
        calls.append(df.count())
        return orig(spark_, df, table, **kw)

    V.commit_append = spy
    try:
        result = incremental_decontamination(spark, SF).collect()
    finally:
        V.commit_append = orig
    assert len(calls) == 1
    # the delta commit is bounded by matches against NOVEL shingles only
    corpus = grams.where(F.col("doc_id") % EVAL_MOD != 0)
    full_s2_matches = (
        corpus.join(s2, "shingle").select("doc_id", "shingle").distinct().count()
    )
    novel_matches = (
        corpus.join(s2.join(s1, "shingle", "left_anti"), "shingle")
        .select("doc_id", "shingle").distinct().count()
    )
    assert calls[0] == novel_matches <= full_s2_matches
    assert result  # and the maintained answer is non-trivial
