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
    DataSourceStreamReader,
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


# --------------------------------------------------------------------------
# Versioned-table connector: batch + streaming faces over ops.versioned
# manifest commits (r7). The streaming face is Delta's `readStream` on a
# table: offsets are COMMIT VERSION NUMBERS, a micro-batch is the set of
# data files the commits in (start, end] ADDED, and each file is one
# executor-side InputPartition read as Arrow batches — the driver only
# ever touches manifests (file lists), never data.
# --------------------------------------------------------------------------

VT_SOURCE_NAME = "versioned_table"


def _vt_commits_dir(table: str) -> str:
    return f"{table.rstrip('/')}/_commits"


def _vt_current_version(table: str):
    import os
    import re as _re

    d = _vt_commits_dir(table)
    if not os.path.isdir(d):
        return None
    vs = [int(n) for n in os.listdir(d) if _re.fullmatch(r"\d{8}", n)]
    return max(vs) if vs else None


def _vt_read_manifest(table: str, version: int):
    import json

    with open(f"{_vt_commits_dir(table)}/{version:08d}") as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    return json.loads(lines[0]), lines[1:]


class _VTFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _vt_read_file(partition: _VTFile):
    import pyarrow.parquet as pq

    yield from pq.read_table(partition.path).to_batches()


class _VTBatchReader(DataSourceReader):
    """Batch face: the CURRENT snapshot's files, one InputPartition per
    data file (the manifest is the split plan — no directory listing,
    no footer probing on the driver)."""

    def __init__(self, options: dict):
        self.table = options["path"].rstrip("/")

    def partitions(self) -> Sequence[InputPartition]:
        cur = _vt_current_version(self.table)
        if cur is None:
            raise FileNotFoundError(
                f"versioned table {self.table!r} has no commits"
            )
        _, files = _vt_read_manifest(self.table, cur)
        return [_VTFile(f"{self.table}/{f}") for f in files]

    def read(self, partition: _VTFile):
        return _vt_read_file(partition)


class _VTStreamReader(DataSourceStreamReader):
    """Streaming face — Delta `readStream` semantics: version-number
    offsets; ``partitions(start, end)`` walks the manifests of commits
    (start, end] and emits the files each commit ADDED over its parent
    (version 1 is the initial snapshot, streamed in full). A non-append
    commit (upsert/optimize/full) REWRITES rows already streamed, so by
    default it fails the stream loudly; ``skipChangeCommits=true`` skips
    its file delta, exactly Delta's option of the same name. Replay of a
    committed offset range re-lists the same immutable manifests —
    manifest immutability IS the exactly-once-replay contract, no extra
    bookkeeping. The driver handles file LISTS only; every data byte is
    read executor-side as Arrow batches."""

    def __init__(self, options: dict):
        self.table = options["path"].rstrip("/")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": _vt_current_version(self.table) or 0}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        prev: set = (
            set() if lo == 0 else set(_vt_read_manifest(self.table, lo)[1])
        )
        added: list[str] = []
        for v in range(lo + 1, hi + 1):
            hdr, files = _vt_read_manifest(self.table, v)
            if v > 1 and hdr.get("op") != "append":
                if not self.skip_change:
                    raise ValueError(
                        f"versioned_table stream: version {v} is a "
                        f"{hdr.get('op')!r} commit, which rewrites rows "
                        "already streamed; restart from a fresh checkpoint "
                        "or set skipChangeCommits=true to ignore it"
                    )
            else:
                added.extend(f for f in files if f not in prev)
            prev = set(files)
        return [_VTFile(f"{self.table}/{f}") for f in added]

    def read(self, partition: _VTFile):
        return _vt_read_file(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint; manifests immutable


class VersionedTableDataSource(DataSource):
    """``spark.read.format("versioned_table").option("path", tbl)`` —
    current snapshot, manifest-planned splits; ``spark.readStream`` on
    the same format tails append commits by version number. The schema
    comes from the current manifest header (never inferred). Paths are
    plain-filesystem here (the connector runs driver-side manifest reads
    through ``open``); an object-store deployment swaps these few lines
    for its client, the protocol is unchanged."""

    @classmethod
    def name(cls) -> str:
        return VT_SOURCE_NAME

    def schema(self):
        import json

        from pyspark.sql.types import StructType

        table = self.options["path"].rstrip("/")
        cur = _vt_current_version(table)
        if cur is None:
            raise FileNotFoundError(f"versioned table {table!r} has no commits")
        header, _ = _vt_read_manifest(table, cur)
        return StructType.fromJson(json.loads(header["schema"]))

    def reader(self, schema) -> _VTBatchReader:
        return _VTBatchReader(self.options)

    def streamReader(self, schema) -> _VTStreamReader:
        return _VTStreamReader(self.options)


def register_versioned_table_source(spark) -> None:
    """Idempotent registration (re-registering the same name replaces)."""
    spark.dataSource.register(VersionedTableDataSource)
