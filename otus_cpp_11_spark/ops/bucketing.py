"""Bucketed-table layout: the co-located join path for repeated
fact-to-fact joins (SURVEY.md §2.2 'Joins' scale note).

A shuffle exists in a join plan because neither side is partitioned by
the join key on disk. Bucketing fixes the layout once at write time:
``bucketBy(n, key)`` hash-partitions rows into n stable buckets per
write, and the catalog records it — every later equi-join (or groupBy)
on that key reads bucket i against bucket i with NO Exchange in the
plan. At 100 TB this converts the dominant per-query cost (re-shuffling
the same fact table every join) into a one-time write cost.

Rules that make it work, encoded in ``write_bucketed``:
* both sides must use the SAME bucket count (or an exact multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
* the join key must be the bucket key exactly;
* keep one file per bucket (repartition before write) — a thousand tiny
  files per bucket forfeits the sorted-bucket read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table. The
    pre-write ``repartition(num_buckets, key)`` yields exactly one file
    per bucket per write."""
    w = (
        df.repartition(num_buckets, key)
        .write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with zero
    Exchange nodes (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partitioned layout (``path/col=value/...``): the lake
    counterpart to bucketing. Bucketing co-locates a JOIN key; partitioning
    prunes a FILTER key — a predicate on a partition column eliminates
    whole directories at planning time (PartitionFilters in the scan, zero
    I/O for pruned values), which is the difference between scanning one
    day and scanning three years at 100 TB. Partition by low-cardinality,
    always-filtered columns (date, region); never by high-cardinality keys
    (one directory per value = millions of tiny files)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partition_pruned(
    spark: SparkSession, path: str, **partition_values: str
) -> DataFrame:
    """Read a partitioned layout with equality predicates on partition
    columns — Catalyst turns them into PartitionFilters (directory pruning),
    not data filters (asserted in tests/test_bucketing.py)."""
    df = spark.read.parquet(path)
    for col, val in partition_values.items():
        df = df.where(F.col(col) == val)
    return df
