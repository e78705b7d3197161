"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) — the
'arbitrary source connector' surface (SURVEY.md §2.2 sources row; the
reference's only source is a line-text file, src/mapreduce.cpp:111-137).

``SyntheticEventsDataSource`` is a partitioned, deterministic event
generator: the connector reports N input partitions and each executor
task materializes only its own slice from a closed form of the row id —
the same contract a real connector (Kafka admin + per-partition consume,
JDBC predicate ranges, REST cursor shards) fulfills. Because rows are a
pure function of ``i``, results are retry-identical and a SQL oracle can
recompute any aggregate of the stream without reading it.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SOURCE_NAME = "synthetic_events"
DEFAULT_ROWS = 5000
DEFAULT_PARTS = 8

# closed form: user = i % 97, value = (i * 31) % 1000 / 10
SCHEMA = "event_id bigint, user_id bigint, value double"


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", DEFAULT_ROWS))
        self.parts = int(options.get("partitions", DEFAULT_PARTS))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n // self.parts)
        return [
            _Range(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield i, i % 97, (i * 31) % 1000 / 10.0


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming face of the same closed-form generator:
    offsets are row indices, each micro-batch advances by ``batch_rows``
    until the capped ``rows`` is reached, after which reads return the
    unchanged offset (no progress -> an AvailableNow drain terminates).
    ``readBetweenOffsets`` replays any committed range identically —
    the exactly-once-replay contract a real cursor/offset connector
    (Kafka, kinesis, CDC log) must honor on recovery."""

    def __init__(self, options: dict):
        self.n = int(options.get("rows", DEFAULT_ROWS))
        self.batch = int(options.get("batch_rows", 1000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.n)
        return self._rows(lo, hi), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(int(start["i"]), int(end["i"]))

    @staticmethod
    def _rows(lo: int, hi: int) -> Iterator[tuple]:
        return iter([(i, i % 97, (i * 31) % 1000 / 10.0) for i in range(lo, hi)])


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N).load() —
    batch face; ``spark.readStream`` on the same format gets the
    offset-tracked streaming face (_StreamReader)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name replaces)."""
    spark.dataSource.register(SyntheticEventsDataSource)
