"""Rollup / batch-preparation operators: multi-resolution time rollups
(the hypertable continuous-aggregate shape), token-budget sequence packing,
and int8 embedding quantization — the batch-side operators a training-data
pipeline runs after curation (driver extension mandate, SURVEY.md §2.2).

All are generalizations of the reference's aggregate shapes (partial
aggregation per block, then a final combine — src/mapreduce.cpp:32-33 +
src/main.cpp:75-91), expressed as Spark hash aggregates.

Determinism notes: double sums stay in the exact integer domain
(fixed-point units summed as DECIMAL(38,0)) until the final divide;
quantization rounds with FLOOR(x + 0.5) because round-half-even vs
round-half-up differs between engines; all per-vector reductions (max) are
order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.registry import register

VALUE_SCALE = 10**6


@register(
    "events_multires_rollup",
    oracle=f"""
WITH minute AS (
  SELECT date_trunc('minute', ts) AS bucket_start,
         COUNT(*) AS n_events,
         SUM(CAST(FLOOR(value * {VALUE_SCALE}.0) AS DECIMAL(38,0))) AS units
  FROM events GROUP BY bucket_start
),
hour AS (
  SELECT date_trunc('hour', bucket_start) AS bucket_start,
         CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(units) AS units
  FROM minute GROUP BY 1
),
day AS (
  SELECT date_trunc('day', bucket_start) AS bucket_start,
         CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(units) AS units
  FROM hour GROUP BY 1
)
SELECT resolution, bucket_start, n_events,
       CAST(units AS DOUBLE) / {VALUE_SCALE}.0 AS sum_value
FROM (
  SELECT '1m' AS resolution, * FROM minute
  UNION ALL SELECT '1h', * FROM hour
  UNION ALL SELECT '1d', * FROM day
)
ORDER BY resolution, bucket_start
""",
    bench=True,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup (hypertable continuous aggregates): minute,
    hour, and day tiers where each coarser tier re-aggregates the next
    finer tier instead of rescanning raw events — at 100 TB the raw scan
    happens once and the hour/day tiers aggregate ~1/60 and ~1/1440 of it.
    Sums ride as exact fixed-point integer units between tiers so the
    re-aggregation is bit-identical to a direct aggregate."""
    e = load_table(spark, sf_dir, "events")
    units = F.sum(
        F.floor(F.col("value") * F.lit(float(VALUE_SCALE))).cast("decimal(38,0)")
    )
    minute = (
        e.groupBy(F.date_trunc("minute", "ts").alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("n_events"), units.alias("units"))
        .localCheckpoint()  # the tier feeds 3 outputs; compute it once
    )

    def up(df: DataFrame, unit: str) -> DataFrame:
        return df.groupBy(
            F.date_trunc(unit, "bucket_start").alias("bucket_start")
        ).agg(F.sum("n_events").alias("n_events"), F.sum("units").alias("units"))

    hour = up(minute, "hour").localCheckpoint()
    day = up(hour, "day")
    tiers = (
        minute.select(F.lit("1m").alias("resolution"), "*")
        .unionByName(hour.select(F.lit("1h").alias("resolution"), "*"))
        .unionByName(day.select(F.lit("1d").alias("resolution"), "*"))
    )
    return tiers.select(
        "resolution",
        "bucket_start",
        "n_events",
        (F.col("units").cast("double") / F.lit(float(VALUE_SCALE))).alias(
            "sum_value"
        ),
    ).orderBy("resolution", "bucket_start")


PACK_BUDGET = 2048  # tokens per packed training sequence
PACK_SHARD = 100  # docs per prefix-sum shard


@register(
    "doc_pack_bins",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_excl
  FROM toks
)
SELECT CAST(FLOOR(CAST(cum_excl AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY bin_id
ORDER BY bin_id
""",
    bench=True,
)
def doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign docs (in doc_id order)
    to fixed token-budget bins by exclusive prefix sum. The prefix sum is
    computed scalably — per-shard partial sums, a shard-offset relation
    (|shards| = N/{PACK_SHARD} rows, broadcast), then a window only WITHIN
    each shard — so no global single-partition window exists in the plan;
    this is the classic two-phase distributed scan. Bins may overflow by at
    most one doc (docs don't split), the standard approximation."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != F.lit(""))).alias(
            "n_tokens"
        ),
        (F.floor(F.col("doc_id") / PACK_SHARD)).alias("shard"),
    )
    shard_totals = toks.groupBy("shard").agg(F.sum("n_tokens").alias("shard_sum"))
    # shard offsets: cumsum over the tiny shard relation (N/PACK_SHARD rows)
    shard_off = shard_totals.select(
        "shard",
        (
            F.sum("shard_sum").over(
                Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("shard_sum")
        ).alias("shard_offset"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = toks.join(F.broadcast(shard_off), "shard").select(
        "doc_id",
        "n_tokens",
        (
            F.col("shard_offset") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
        ).alias("cum_excl"),
    )
    return (
        cum.groupBy(
            F.floor(F.col("cum_excl").cast("double") / PACK_BUDGET)
            .cast("bigint")
            .alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


ERR_SCALE = 10**12


@register(
    "embedding_quantization",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         LEN(embedding) AS n_dims,
         LIST_AGGREGATE([ABS(CAST(x AS DOUBLE)) FOR x IN embedding], 'max') AS max_abs
  FROM embeddings
),
err AS (
  SELECT e.vec_id, q.n_dims, q.max_abs,
         CASE WHEN q.max_abs > 0 THEN 127.0 / q.max_abs ELSE 1.0 END AS scale,
         [CAST(x AS DOUBLE)
            - FLOOR(CAST(x AS DOUBLE)
                    * (CASE WHEN q.max_abs > 0 THEN 127.0 / q.max_abs ELSE 1.0 END)
                    + 0.5)
              / (CASE WHEN q.max_abs > 0 THEN 127.0 / q.max_abs ELSE 1.0 END)
          FOR x IN e.embedding] AS errs
  FROM embeddings e JOIN q USING (vec_id)
)
SELECT vec_id, n_dims, max_abs, scale,
       LIST_AGGREGATE([ABS(x) FOR x IN errs], 'max') AS max_abs_err,
       CAST(LIST_AGGREGATE([CAST(FLOOR(x * x * {ERR_SCALE}.0) AS BIGINT)
                            FOR x IN errs], 'sum') AS BIGINT) AS sse_units
FROM err
ORDER BY vec_id
""",
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings with reconstruction-error
    accounting: per-vector symmetric scale 127/max|x|, quantize with
    FLOOR(x*scale + 0.5) (identical in every engine, unlike banker's
    rounding), report max abs error and fixed-point sum of squared errors.
    Pure array math — no explode, no shuffle: one narrow map stage that
    would stream at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    max_abs = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    v = e.select("vec_id", "embedding", F.size("embedding").alias("n_dims"),
                 max_abs.alias("max_abs"))
    scale = F.when(F.col("max_abs") > 0, 127.0 / F.col("max_abs")).otherwise(
        F.lit(1.0)
    )
    v = v.select("vec_id", "embedding", "n_dims", "max_abs", scale.alias("scale"))
    errs = F.transform(
        "embedding",
        lambda x: xd(x)
        - F.floor(xd(x) * F.col("scale") + 0.5) / F.col("scale"),
    )
    v = v.select("vec_id", "n_dims", "max_abs", "scale", errs.alias("errs"))
    return v.select(
        "vec_id",
        "n_dims",
        "max_abs",
        "scale",
        F.array_max(F.transform("errs", lambda x: F.abs(x))).alias("max_abs_err"),
        F.aggregate(
            F.transform(
                "errs",
                lambda x: F.floor(x * x * F.lit(float(ERR_SCALE))).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sse_units"),
    ).orderBy("vec_id")


@register(
    "events_minute_rollup_streamed",
    oracle=f"""
SELECT date_trunc('minute', ts) AS bucket_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * {VALUE_SCALE}.0) AS DECIMAL(38,0))) AS DOUBLE)
         / {VALUE_SCALE}.0 AS sum_value
FROM events
GROUP BY bucket_start
ORDER BY bucket_start
""",
)
def events_minute_rollup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming, driver-visible: replay the events table
    through the INCREMENTAL minute-rollup maintainer (foreachBatch upsert
    with idempotent-retry markers, streaming.incremental_minute_rollup)
    under Trigger.AvailableNow, then return the materialized tier. The
    oracle is the plain batch aggregate — the maintained tier must be
    bit-identical to a from-scratch batch rollup no matter how the stream
    was micro-batched, because counts and sums ride as exact integer
    units until the final divide. This is the continuous-aggregate
    contract a 100 TB ingest pipeline relies on: the streaming path and
    the backfill path produce the same table.

    Previously the streaming family was proven only by pytest equivalence
    (memory sink vs batch same-function); this query puts one end-to-end
    streaming behavior under the driver's cross-engine correctness gate.
    """
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.streaming import (
        incremental_minute_rollup,
        read_events_stream,
    )

    from otus_cpp_11_spark.ops.versioned import read_version

    tier_path = scratch_dir("sg-tier-") + "/minute"
    q = incremental_minute_rollup(read_events_stream(spark, sf_dir), tier_path)
    q.awaitTermination()
    return (
        read_version(spark, tier_path)
        .select(
            "bucket_start",
            "n_events",
            (F.col("units").cast("double") / F.lit(float(VALUE_SCALE))).alias(
                "sum_value"
            ),
        )
        .orderBy("bucket_start")
    )
