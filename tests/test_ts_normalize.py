"""Schema-drift smoke: the engine must load ``events.ts`` as a session-TZ
TIMESTAMP no matter which physical parquet shape the lake hands it —
``timestamp[us]`` without timezone (read as TIMESTAMP_NTZ), ``timestamp[us]
tz=UTC`` (read as TIMESTAMP), ``timestamp[ms]``, and ``timestamp[ns]`` (read
as raw-nanos bigint under ``nanosAsLong``). Round 2 shipped against a
regenerated testdata whose ``ts`` flipped ns -> us-NTZ and three queries plus
the bench and the streaming family broke; this test pins the invariant so
any future drift fails fast and locally (VERDICT r2 'next round' #2).
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from otus_cpp_11_spark.catalog import epoch_us, load_table, normalize_ts

WALL = [
    datetime.datetime(2024, 1, 1, 12, 0, 0),
    datetime.datetime(2024, 1, 1, 12, 30, 0),
    datetime.datetime(2024, 1, 2, 0, 0, 1),
]
EXPECT_US = [int(d.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for d in WALL]

SHAPES = {
    "us_ntz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
    "ms_ntz": pa.timestamp("ms"),
    "ns_ntz": pa.timestamp("ns"),
}


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_load_table_normalizes_every_physical_ts_shape(spark, tmp_path, shape):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(WALL, SHAPES[shape]),
        }
    )
    sf_dir = tmp_path / shape
    sf_dir.mkdir()
    pq.write_table(table, sf_dir / "events.parquet")

    df = load_table(spark, str(sf_dir), name="events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{shape}: loaded as {dict(df.dtypes)['ts']}, not timestamp"
    )
    got = [
        r["us"]
        for r in df.select(epoch_us("ts").alias("us")).orderBy("us").collect()
    ]
    assert got == EXPECT_US, f"{shape}: wall-clock drifted under normalization"


def test_epoch_us_accepts_ntz_and_ltz(spark):
    df = spark.createDataFrame([(WALL[0],)], ["t"])
    ntz = df.select(df.t.cast("timestamp_ntz").alias("t"))
    ltz = df.select(df.t.cast("timestamp").alias("t"))
    a = ntz.select(epoch_us("t").alias("us")).first()["us"]
    b = ltz.select(epoch_us("t").alias("us")).first()["us"]
    assert a == b == EXPECT_US[0]


def test_normalize_ts_noop_on_missing_column(spark):
    df = spark.range(3)
    assert normalize_ts(df).columns == df.columns


def test_driver_testdata_loads_as_timestamp(spark):
    """The real driver-generated events table, whatever shape it currently
    has, must come out of the catalog as TIMESTAMP."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
