"""Testdata catalog: load the driver-generated parquet tables and register
them as temp views so the SQL API and the DataFrame API see the same names.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.

At 100 TB these would be partitioned/bucketed parquet datasets; the loader
takes any directory that contains ``<name>.parquet`` (file or directory), so
the same code path serves a partitioned lake layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to session-TZ TIMESTAMP no matter which
    physical parquet shape the lake handed us (SURVEY.md §1.2: handle
    timestamp[ms,us,ns] variants):

    * ``timestamp[ns]`` under ``nanosAsLong`` arrives as raw-nanos bigint —
      divide to micros, exactly like DuckDB does;
    * ``timestamp[us]`` without a timezone arrives as TIMESTAMP_NTZ — cast
      to TIMESTAMP; under the pinned UTC session the wall-clock value is
      preserved and epoch math matches DuckDB's naive-as-UTC semantics;
    * ``timestamp[us] tz=UTC`` already reads as TIMESTAMP — no-op.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_us(col) -> "F.Column":
    """Type-safe epoch-microseconds: works on TIMESTAMP and TIMESTAMP_NTZ
    alike (``unix_micros`` alone rejects NTZ). Under the pinned UTC session
    this matches DuckDB's ``epoch_us`` on naive timestamps exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_ts(df)
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a scan so CPU-heavy per-row work (shingling,
    hashing, regex tokenization) uses every core.

    Why it exists: parquet splits no finer than a row group, and the local
    testdata files are single-row-group, so a scan arrives as ONE partition
    and any expensive projection chained onto it runs on 1 of 32 cores
    (measured: trigram shingling at sf0.1 was 3.2s serial). On a 100 TB lake
    the scan already has thousands of splits, so this becomes a no-op (the
    partition count is already >= cores) — the gate below keeps it from
    inserting a pointless shuffle there.

    The gate reads scan metadata only — ``df.inputFiles()`` (a driver-side
    plan inspection) and, for few-file scans, the parquet footers — never
    ``df.rdd`` (which forces a full plan-to-RDD conversion per call) and
    never a Spark job. A lake scan with >= cores files short-circuits on
    the file count alone; only the pathological few-big-files case pays
    the (tiny) footer reads to count row groups.
    """
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= n:
        return df  # at least one split per core already
    if files:
        import pyarrow.parquet as pq

        groups = 0
        for f in files:
            path = f.removeprefix("file:")
            try:
                groups += pq.ParquetFile(path).metadata.num_row_groups
            except Exception:
                break  # remote/odd layout: fall through to repartition
            if groups >= n:
                return df
    return df.repartition(n)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (idempotent) and return the dict."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
