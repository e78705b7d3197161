"""The reference's own query surface, oracle-gated: the flagship prefix
query (src/main.cpp:59-99) and the lecture-spec operators the generic
framework must express (description/MapReduce.cpp — SURVEY.md §2.1),
re-hosted on the driver's synthetic tables.

These are the queries()-facing versions; the generic ``MapReduceJob`` API
(reference mapper/reducer functor parity) lives in
``otus_cpp_11_spark.mapreduce`` with its own unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.prefix import min_unique_prefix_length_single_pass
from otus_cpp_11_spark.queries import dsum, dsum_sql
from otus_cpp_11_spark.registry import register


@register(
    "prefix_min_unique_len",
    oracle="""
WITH exploded AS (
  SELECT l AS "L", SUBSTRING(c_name, 1, CAST(l AS INT)) AS prefix
  FROM customer
  CROSS JOIN UNNEST(GENERATE_SERIES(1, LENGTH(c_name))) AS t(l)
  WHERE LENGTH(c_name) >= 1
),
per_len AS (
  SELECT "L", MAX(cnt) AS max_count
  FROM (SELECT "L", prefix, COUNT(*) AS cnt FROM exploded GROUP BY "L", prefix) g
  GROUP BY "L"
),
cand AS (
  SELECT CAST(MIN("L") AS BIGINT) AS c FROM per_len WHERE max_count = 1
),
guard AS (
  SELECT COUNT(c_name) > COUNT(DISTINCT c_name) AS has_dups FROM customer
)
SELECT CASE WHEN guard.has_dups THEN NULL ELSE cand.c END AS min_unique_prefix_len
FROM cand, guard
""",
    bench=True,
)
def prefix_min_unique_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (reference src/main.cpp:59-99): minimal prefix length that
    uniquely identifies every customer name — single-pass variant."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_name").alias("value"))
    return min_unique_prefix_length_single_pass(c)


@register(
    "word_count",
    oracle="""
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT UNNEST(STRING_SPLIT(REGEXP_REPLACE(LOWER(text), '[^a-z ]', ' ', 'g'), ' ')) AS word
  FROM documents
) t
WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word
""",
    bench=True,
)
def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lecture word count (description/MapReduce.cpp:125-150): normalize
    (lowercase, strip non-alpha, description/MapReduce.cpp:91-102) → tokenize
    → hash-aggregate count. The canonical map-side-combined groupBy: shuffle
    carries one row per distinct word per partition."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", " "), " ")
        ).alias("word")
    ).where(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
    )


@register(
    "sum_of_squares",
    oracle=f"""
SELECT {dsum_sql("l_quantity * l_quantity", 4)} AS sum_sq
FROM lineitem
""",
)
def sum_of_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lecture task 1 (description/MapReduce.cpp:19-36): map x→x² + scalar
    fold, as a one-row aggregate (map-side partial sums)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(dsum(F.col("l_quantity") * F.col("l_quantity"), 4).alias("sum_sq"))


@register(
    "unique_by_abs",
    oracle="""
SELECT COUNT(DISTINCT ABS(CAST(l_quantity AS INT) - 25)) AS n_unique
FROM lineitem
""",
)
def unique_by_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lecture task 2 (description/MapReduce.cpp:43-68): distinct count of
    |x| — recentered so the abs actually folds value pairs together."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count_distinct(
            F.abs(F.col("l_quantity").cast("int") - F.lit(25))
        ).alias("n_unique")
    )


@register(
    "prefix_counts_l1",
    oracle="""
SELECT SUBSTRING(c_name, 1, 10) AS prefix, COUNT(*) AS cnt
FROM customer
GROUP BY prefix
ORDER BY prefix
""",
)
def prefix_counts_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One iteration of the reference job at fixed L (the mapper's
    substr(0,L)+1 emission, src/main.cpp:62-74, and the count-per-key
    reduction its reducer approximates, SURVEY.md §2.3.3)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.substring("c_name", 1, 10).alias("prefix"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("prefix")
    )
