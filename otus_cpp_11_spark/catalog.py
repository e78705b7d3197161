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

    The gate replays Spark's own split arithmetic
    (``FilePartition.maxSplitBytes``: bin-pack file byte ranges into
    partitions of ``min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/defaultParallelism))``) over ``df.inputFiles()`` — a
    driver-side plan inspection plus ``os.path.getsize``, never a Spark
    job. File/row-group counting was tried first and is wrong both ways:
    Spark splits by byte-size bin-packing, so many small files can still
    bin-pack into fewer partitions than cores, and one big file splits
    into many partitions regardless of its row-group count (splits that
    contain no row-group midpoint come back empty but still occupy
    tasks). For a non-file-scan input (``inputFiles()`` empty) the gate
    falls back to the RDD's actual partition count — one plan-to-RDD
    conversion, paid only on that rare path, beats the unconditional
    repartition shuffle it replaces.
    """
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df if df.rdd.getNumPartitions() >= n else df.repartition(n)
    conf = df.sparkSession.conf

    def _size_conf(key: str, default: int) -> int:
        # Spark size strings: optional one-letter k/m/g/t/p multiplier,
        # optional trailing 'b' ('128m', '128mb', '1gb', plain bytes). The
        # multiplier must be matched BEFORE the bare-'b' suffix or '128mb'
        # parses as float('128m'). Unparseable values fall back to the
        # default — a heuristic gate must never crash the query it guards.
        try:
            raw = str(conf.get(key, str(default))).strip().lower()
            if raw.endswith("b"):
                raw = raw[:-1]
            units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}
            mult = units.get(raw[-1:], 1)
            if mult != 1:
                raw = raw[:-1]
            return int(float(raw) * mult)
        except (ValueError, TypeError):
            return default

    max_pb = _size_conf("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _size_conf("spark.sql.files.openCostInBytes", 4 << 20)
    try:
        total = sum(
            os.path.getsize(f.removeprefix("file:")) for f in files
        ) + open_cost * len(files)
    except OSError:
        return df.repartition(n)  # remote files: assume the worst
    target = min(max_pb, max(open_cost, total // max(n, 1)))
    est_splits = -(-total // max(target, 1))  # ceil
    return df if est_splits >= n else df.repartition(n)


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
