"""Observation-instrumented pipelines: funnel accounting that rides the
SAME job as the query it measures.

A curation pipeline needs stage accounting (docs in, docs past each gate,
tokens kept) for every run. Recomputing those as separate ``count()`` jobs
re-scans the corpus once per metric — at 100 TB that triples the cost of
the pipeline. Spark's ``Observation`` API attaches aggregate expressions
to points IN the lazy plan; the metrics are computed by the very tasks
that execute the query and collected on the driver when the one action
finishes — zero extra scans, zero extra shuffles, exact (not sampled)
counts.

This is the engine-feature face (utility + pytest contract); the
registered oracle queries stay un-instrumented so their driver-verified
plans are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.text import (
    QUALITY_MIN_STOP_RATIO,
    QUALITY_MIN_TOKENS,
    STOPWORDS,
    _tokens,
)


def observe_stage(df: DataFrame, name: str, *metrics) -> tuple[DataFrame, Observation]:
    """Attach an Observation with the given aggregate expressions at this
    point of the plan. Returns (instrumented frame, observation); read
    ``observation.get`` AFTER the first action on the returned frame."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def curation_funnel_observed(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, dict[str, Observation]]:
    """A quality-gated curation funnel with per-stage metrics observed in
    one pass: input docs/tokens at the scan, kept docs/tokens after the
    gate. One action computes the per-source result AND both metric sets;
    ``obs["input"].get`` / ``obs["kept"].get`` read them afterwards.

    The gate IS doc_quality_score's heuristic (same imported tokenizer
    and threshold constants, so they cannot drift) — the point here is the instrumentation
    contract, not a new gate: rejected-row accounting falls out as
    input - kept without a second job."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    scored = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin([*STOPWORDS]))).alias("n_stop"),
    )
    scored, obs_in = observe_stage(
        scored,
        "curation_input",
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    kept = scored.where(
        (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
        & (
            F.col("n_stop").cast("double") / F.col("n_tokens")
            >= QUALITY_MIN_STOP_RATIO
        )
    )
    kept, obs_kept = observe_stage(
        kept,
        "curation_kept",
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    result = (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )
    return result, {"input": obs_in, "kept": obs_kept}
