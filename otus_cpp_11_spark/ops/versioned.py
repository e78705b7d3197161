"""Versioned tables: snapshot isolation for a plain-parquet lakehouse via
create-once commit markers — the protocol upgrade the maintainer
scaffold's docstring points at (streaming.py: "single-op atomicity is an
ACID-table-format property"). This module provides exactly that property
with zero format dependencies.

Layout::

    table/
      _commits/00000001   <- empty marker, created EXCLUSIVELY after the
      _commits/00000002      snapshot dir is complete; never modified
      v00000001/          <- immutable parquet snapshot
      v00000002/

Commit = write the new snapshot dir fully, then create its marker with
``create(overwrite=False)`` — an atomic claim on POSIX/HDFS (and
if-none-match on object stores). The committed version is the MAX
marker. Because markers are create-once and nothing is ever renamed or
deleted on the read path, there is NO window in which a reader can see a
missing or torn pointer (the first design used a ``_CURRENT`` file
flipped by delete+rename; review showed that crash-between-the-two-ops
loses the pointer and a retry then overwrites v1 over committed history
— markers have no such state by construction). A crash before the
marker leaves the previous version current and the orphan snapshot is
mere garbage.

What this buys over the in-place swap (ops/lakehouse.py):

* readers pinned to a version see an immutable snapshot for their whole
  query (snapshot isolation) — the in-place swap can delete files under
  a running scan;
* time travel: any retained version is readable by number;
* writer crash-safety needs no _SUCCESS heuristics — the marker exists
  only after a complete write, by construction;
* concurrent committers are conflict-DETECTED (the second exclusive
  create of the same marker fails loudly) rather than silently
  interleaved; retry-with-next-number on conflict is a catalog/lock
  service's job, which is exactly what table formats add.

What it costs: storage for retained versions (bounded by
``vacuum_versions``) and one ``_commits`` listing per table open. This
is the poor-man's core of Delta/Iceberg (their manifests add file-level
stats and multi-writer commit arbitration on top); the in-place
maintainers keep the directory swap because their TARGET PATH is read
directly by plain ``spark.read.parquet`` consumers — migrating them is
a reader-side contract change, staged for when consumers resolve
through a catalog.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from otus_cpp_11_spark.ops.lakehouse import _hadoop_fs

_COMMITS = "_commits"
_VDIR = re.compile(r"^v(\d{8})$")
_MARKER = re.compile(r"^(\d{8})$")


def _jp(spark: SparkSession, *parts: str):
    return spark._jvm.org.apache.hadoop.fs.Path("/".join(p.rstrip("/") for p in parts))


def current_version(spark: SparkSession, table: str) -> int | None:
    """The committed version number (max create-once marker), or None
    for a table with no commits."""
    fs, _ = _hadoop_fs(spark, table)
    cdir = _jp(spark, table, _COMMITS)
    if not fs.exists(cdir):
        return None
    best = None
    for st in fs.listStatus(cdir):
        m = _MARKER.match(st.getPath().getName())
        if m:
            v = int(m.group(1))
            best = v if best is None or v > best else best
    return best


def list_versions(spark: SparkSession, table: str) -> list[int]:
    """All snapshot dirs present on disk (committed + any uncommitted
    orphan from a crashed writer)."""
    fs, jroot = _hadoop_fs(spark, table)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        m = _VDIR.match(st.getPath().getName())
        if m and st.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def commit_version(spark: SparkSession, df: DataFrame, table: str) -> int:
    """Write ``df`` as the next snapshot, then atomically claim its
    commit marker. The snapshot is complete on disk BEFORE the marker
    exists; a crash anywhere before the claim leaves the previous
    version current and readable — there is no partial state a reader or
    retry can observe (a same-writer retry recomputes the same number
    and overwrites its own orphan). A CONCURRENT committer racing to the
    same number fails the exclusive create loudly instead of silently
    clobbering — single-writer is the contract, conflict detection the
    safety net."""
    cur = current_version(spark, table)
    nxt = (cur or 0) + 1
    vdir = f"{table.rstrip('/')}/v{nxt:08d}"
    df.write.mode("overwrite").parquet(vdir)  # overwrite clears a dead retry
    _claim_marker(spark, table, nxt)
    return nxt


def _claim_marker(spark: SparkSession, table: str, version: int) -> None:
    """Exclusive create of a commit marker — the atomic claim the whole
    protocol rests on (``create(overwrite=False)`` throws if the file
    exists, on POSIX/HDFS; if-none-match on object stores)."""
    fs, _ = _hadoop_fs(spark, table)
    marker = _jp(spark, table, _COMMITS, f"{version:08d}")
    try:
        stream = fs.create(marker, False)
        stream.close()
    except Exception as exc:  # py4j wraps FileAlreadyExistsException
        raise RuntimeError(
            f"commit_version: version {version} of {table!r} was claimed "
            "by a concurrent committer — versioned tables are "
            "single-writer; serialize writers through a catalog/lock "
            "service"
        ) from exc


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


def vacuum_versions(
    spark: SparkSession,
    table: str,
    keep_last: int = 2,
    drop_uncommitted: bool = False,
) -> list[int]:
    """Drop committed snapshots (and their markers) older than the
    ``keep_last`` most recent; the current version is always kept.
    Retention is the time-travel horizon — exactly Delta VACUUM's
    contract. Returns the removed version numbers.

    ``drop_uncommitted`` additionally removes orphan snapshots NEWER
    than current (a crashed writer's leftovers). It is OFF by default
    because an orphan is indistinguishable from a LIVE commit's
    snapshot written but not yet marked — running it concurrently with
    a writer would delete the snapshot about to be committed (the same
    quiesce requirement lakehouse.vacuum documents); enable it only
    with writers stopped."""
    cur = current_version(spark, table)
    if cur is None:
        return []
    fs, _ = _hadoop_fs(spark, table)
    versions = list_versions(spark, table)
    committed = [v for v in versions if v <= cur]
    keep = max(keep_last, 1)
    drop = set(committed[:-keep])
    if drop_uncommitted:
        drop |= {v for v in versions if v > cur}
    drop.discard(cur)
    removed = []
    for v in sorted(drop):
        if fs.delete(_jp(spark, table, f"v{v:08d}"), True):
            fs.delete(_jp(spark, table, _COMMITS, f"{v:08d}"), False)
            removed.append(v)
    return removed
