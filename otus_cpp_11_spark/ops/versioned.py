"""Versioned tables: snapshot isolation for a plain-parquet lakehouse via
an atomically-swapped pointer file — the protocol upgrade the maintainer
scaffold's docstring points at (streaming.py: "single-op atomicity is an
ACID-table-format property"). This module provides exactly that property
with zero format dependencies.

Layout::

    table/
      _CURRENT          <- one line: the committed version number
      v00000001/        <- immutable parquet snapshot
      v00000002/

Commit = write the new snapshot dir fully, then flip ``_CURRENT`` via
write-temp + rename. A single-file rename is atomic on POSIX and HDFS
(and conditional-put on object stores), so — unlike the delete+rename
directory swap used by the in-place maintainers — there is NO window
where a reader sees a missing table and NO recovery machinery: a crash
before the flip leaves the previous version current and the orphan
snapshot is mere garbage for ``vacuum_versions``.

What this buys over the in-place swap (ops/lakehouse.py):

* readers pinned to a version see an immutable snapshot for their whole
  query (snapshot isolation) — the in-place swap can delete files under
  a running scan;
* time travel: any retained version is readable by number;
* writer crash-safety needs no _SUCCESS heuristics — the pointer flips
  only after a complete write, by construction.

What it costs: storage for retained versions (bounded by
``vacuum_versions``) and a pointer read per table open. This is the
poor-man's core of Delta/Iceberg (their manifests add file-level stats
and multi-writer commit arbitration on top); the in-place maintainers
keep the directory swap because their TARGET PATH is read directly by
plain ``spark.read.parquet`` consumers — migrating them is a reader-side
contract change, staged for when consumers resolve through a catalog.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_VDIR = re.compile(r"^v(\d{8})$")


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _jp(spark: SparkSession, *parts: str):
    return spark._jvm.org.apache.hadoop.fs.Path("/".join(p.rstrip("/") for p in parts))


def current_version(spark: SparkSession, table: str) -> int | None:
    """The committed version number, or None for an empty table root."""
    fs, _ = _fs(spark, table)
    ptr = _jp(spark, table, _POINTER)
    if not fs.exists(ptr):
        return None
    stream = fs.open(ptr)
    try:
        data = bytes(stream.readAllBytes()).decode().strip()
    finally:
        stream.close()
    return int(data)


def list_versions(spark: SparkSession, table: str) -> list[int]:
    """All snapshot dirs present on disk (committed current + retained
    history + any uncommitted orphan from a crashed writer)."""
    fs, jroot = _fs(spark, table)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        m = _VDIR.match(st.getPath().getName())
        if m and st.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def commit_version(spark: SparkSession, df: DataFrame, table: str) -> int:
    """Write ``df`` as the next snapshot and atomically flip the pointer.
    The snapshot is complete on disk BEFORE the flip; a crash anywhere
    before the final rename leaves the previous version current and
    readable — there is no partial state a reader or retry can observe.
    Single-writer protocol (like the maintainers): concurrent committers
    need a catalog/lock service, which is exactly what table formats
    add."""
    cur = current_version(spark, table)
    nxt = (cur or 0) + 1
    vdir = f"{table.rstrip('/')}/v{nxt:08d}"
    df.write.mode("overwrite").parquet(vdir)  # overwrite clears a dead retry
    fs, _ = _fs(spark, table)
    tmp = _jp(spark, table, f"{_POINTER}.tmp-{nxt}")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(str(nxt).encode()))
    finally:
        stream.close()
    ptr = _jp(spark, table, _POINTER)
    fs.delete(ptr, False)  # a one-file delete+rename still exposes no
    # missing-table window to READERS: they hold the version they
    # resolved; a reader opening exactly between the two ops retries the
    # pointer read. (HDFS rename won't overwrite; object stores would use
    # a conditional put here.)
    if not fs.rename(tmp, ptr):
        raise RuntimeError(f"commit_version: pointer flip failed for {vdir!r}")
    return nxt


def read_version(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read the current (or an explicitly pinned — time travel) snapshot.
    The returned DataFrame is bound to an IMMUTABLE directory: later
    commits cannot disturb a running query on it."""
    v = version if version is not None else current_version(spark, table)
    if v is None:
        raise FileNotFoundError(f"versioned table {table!r} has no commits")
    return spark.read.parquet(f"{table.rstrip('/')}/v{v:08d}")


def vacuum_versions(spark: SparkSession, table: str, keep_last: int = 2) -> list[int]:
    """Drop snapshots older than the ``keep_last`` most recent committed
    ones, plus any orphan NEWER than current (a crashed writer's
    uncommitted snapshot). The current version is always kept. Returns
    the removed version numbers. Retention is the time-travel horizon —
    exactly Delta VACUUM's contract."""
    cur = current_version(spark, table)
    if cur is None:
        return []
    fs, _ = _fs(spark, table)
    removed = []
    committed = [v for v in list_versions(spark, table) if v <= cur]
    drop = set(committed[:-keep_last]) if keep_last > 0 else set(committed[:-1])
    drop |= {v for v in list_versions(spark, table) if v > cur}
    drop.discard(cur)
    for v in sorted(drop):
        if fs.delete(_jp(spark, table, f"v{v:08d}"), True):
            removed.append(v)
    return removed
