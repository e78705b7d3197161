"""Optimistic-concurrency retry for predicate DML and OPTIMIZE
(ops/versioned.py `_commit_retrying`, r8 verdict item 1): a loser of the
version-number race restages O(1) against the new parent when the
interleaved commits provably did not invalidate what it read — touched
files (bytes AND deletion vectors) survived, and nothing added may match
the statement's read predicate. Every streaming maintainer commits per
micro-batch, so an RTBF delete racing a maintainer must compose instead
of dying on CommitConflict.

Reference parity note: the reference engine (CityAplons/otus-cpp-11,
src/mapreduce.cpp) is single-process with no storage transactions; this
surface exists for the 100 TB lakehouse mandate, mirroring Delta's
public conflict-resolution rules."""

from __future__ import annotations

from unittest import mock

import pytest
from pyspark.sql import functions as F

import otus_cpp_11_spark.ops.versioned as V
from otus_cpp_11_spark.ops.versioned import (
    commit_append,
    commit_delete,
    commit_compaction,
    commit_update,
    commit_upsert,
    commit_version,
    current_version,
    list_versions,
    manifest_dvs,
    read_manifest,
    read_version,
    version_header,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def _stale_once(real_cv, stale_version):
    calls = {"n": 0}

    def fn(s, t):
        calls["n"] += 1
        return stale_version if calls["n"] == 1 else real_cv(s, t)

    return fn


def test_delete_retry_composes_when_added_rows_cannot_match(spark, table):
    """A DELETE losing the race to a DISJOINT append restages O(1): its
    rewritten file is reused, the winner's rows are carried, and the
    final state equals the serial order delete-after-append."""
    commit_version(spark, _df(spark, 0, 10, "base"), table, stats_cols=["k"])
    commit_append(spark, _df(spark, 100, 105, "winner"), table)  # v2
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        v = V.commit_delete(spark, table, "k < 5", max_retries=2)
    assert v == 3
    cur = read_version(spark, table)
    assert cur.count() == 10  # 10 - 5 deleted + 5 winner rows
    assert cur.where("k < 5").count() == 0
    assert cur.where("tag = 'winner'").count() == 5
    assert list_versions(spark, table) == [1, 2, 3]
    io = version_header(spark, table, 3)["delete_io"]
    assert io["retries"] == 1 and io["restaged_parent"] == 2
    # and with max_retries=0 the same race dies loudly
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        with pytest.raises(V.CommitConflict):
            # matches at the stale snapshot, so a commit IS attempted
            V.commit_delete(spark, table, "k = 9", max_retries=0)


def test_delete_retry_aborts_when_added_rows_match(spark, table):
    """An interleaved append whose rows MATCH the delete condition means
    a serial delete-after-append would have removed them — composing
    around them would silently spare rows, so the retry must abort."""
    commit_version(spark, _df(spark, 0, 10, "base"), table, stats_cols=["k"])
    commit_append(spark, _df(spark, 2, 4, "winner"), table)  # k=2,3 match
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        with pytest.raises(V.CommitConflict, match="matching this statement"):
            V.commit_delete(spark, table, "k < 5", max_retries=2)
    # nothing was committed by the loser; the winner's state is intact
    assert current_version(spark, table) == 2
    assert read_version(spark, table).count() == 12


def test_delete_retry_bounds_dismiss_added_files_without_io(spark, table):
    """With caller `bounds` implied by the condition, the added-file
    check dismisses provably-disjoint files from manifest stats alone —
    the stats fast path of `_dml_added_check` (the exact probe is the
    fallback, exercised by the no-bounds tests)."""
    commit_version(spark, _df(spark, 0, 10, "base"), table, stats_cols=["k"])
    commit_append(
        spark, _df(spark, 100, 105, "w"), table, stats_cols=["k"]
    )
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        v = V.commit_delete(
            spark, table, "k < 5", bounds={"k": (0, 4)}, max_retries=2
        )
    assert v == 3
    assert read_version(spark, table).count() == 10


def test_delete_dv_retry_composes_and_keeps_dv(spark, table):
    """A deletion-vector delete (no rewrite at all) restaging against an
    interleaved append: the DV attaches to the SAME file it was computed
    for, the winner's file is carried, and no rewrite happens anywhere."""
    commit_version(spark, _df(spark, 0, 100, "base"), table, stats_cols=["k"])
    commit_append(spark, _df(spark, 500, 510, "winner"), table)  # v2
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        v = V.commit_delete(
            spark, table, "k = 7", dv_max_fraction=0.5, max_retries=2
        )
    assert v == 3
    io = version_header(spark, table, 3)["delete_io"]
    assert io["rewritten"] == 0 and io["dv_files"] == 1
    assert io["retries"] == 1
    cur = read_version(spark, table)
    assert cur.count() == 109  # 100 - 1 + 10
    assert cur.where("k = 7").count() == 0
    assert cur.where("tag = 'winner'").count() == 10
    assert manifest_dvs(read_manifest(spark, table, 3)[0])


def test_update_retry_composes_and_aborts_symmetrically(spark, table):
    commit_version(spark, _df(spark, 0, 10, "base"), table, stats_cols=["k"])
    commit_append(spark, _df(spark, 100, 103, "winner"), table)  # v2
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        v = V.commit_update(
            spark, table, "k < 3", {"tag": F.lit("touched")}, max_retries=2
        )
    assert v == 3
    cur = read_version(spark, table)
    assert cur.where("tag = 'touched'").count() == 3
    assert cur.where("tag = 'winner'").count() == 3
    assert cur.count() == 13
    # a matching interleaved row aborts: serial order would update it
    commit_append(spark, _df(spark, 1, 2, "late"), table)  # k=1 matches
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 3)
    ):
        with pytest.raises(V.CommitConflict, match="matching this statement"):
            V.commit_update(
                spark, table, "k < 3", {"tag": F.lit("x")}, max_retries=2
            )


def test_optimize_retry_composes_over_interleaved_append(spark, table):
    """OPTIMIZE never conflicts with appends (Delta's rule): the restage
    carries the winner's file uncompacted and reuses the compacted
    output; rows are identical to the serial order either way."""
    for i in range(3):
        (commit_version if i == 0 else commit_append)(
            spark, _df(spark, i * 10, i * 10 + 10, f"b{i}"), table
        )
    commit_append(spark, _df(spark, 900, 905, "winner"), table)  # v4
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 3)
    ):
        v = V.commit_compaction(spark, table, 1000, ["k"], max_retries=2)
    assert v == 5
    cur = read_version(spark, table)
    assert cur.count() == 35
    assert cur.where("tag = 'winner'").count() == 5
    io = version_header(spark, table, 5)["optimize_io"]
    assert io["retries"] == 1 and io["restaged_parent"] == 4
    # the winner's file is carried by reference, not recompacted
    _, files4 = read_manifest(spark, table, 4)
    _, files5 = read_manifest(spark, table, 5)
    winner_only = set(files4) & set(files5)
    assert winner_only  # at least the winner's appended file survives


def test_optimize_retry_aborts_when_selected_file_gains_dv(spark, table):
    """A DV attached concurrently to a file the compaction selected is a
    write-write conflict: the rewrite already re-emitted rows from the
    OLD mask, so composing would resurrect the concurrently-deleted
    rows."""
    commit_version(spark, _df(spark, 0, 100, "base"), table, stats_cols=["k"])
    commit_delete(spark, table, "k = 3", dv_max_fraction=0.5)  # v2: DV
    with mock.patch.object(
        V, "current_version", side_effect=_stale_once(V.current_version, 1)
    ):
        with pytest.raises(V.CommitConflict, match="write-write"):
            V.commit_compaction(spark, table, 1000, ["k"], max_retries=2)
    assert current_version(spark, table) == 2


def test_real_thread_maintainer_vs_rtbf_delete_both_commit(spark, table):
    """The r8 verdict's done-criterion: a keyed upsert maintainer and a
    concurrent predicate RTBF DELETE race through real threads — BOTH
    must commit (retries resolve every version race) and the final state
    must equal either serial order. Read sets are disjoint (the upserts
    key >= 1000, the delete matches k < 10), so both serial orders agree
    exactly; a genuine read-overlap is the abort tests' job above."""
    import threading

    commit_version(spark, _df(spark, 0, 50, "base"), table, stats_cols=["k"])
    errors: list[Exception] = []
    done = threading.Event()

    def maintainer():
        try:
            for j in range(4):
                batch = spark.range(1000 + 10 * j, 1000 + 10 * j + 10).select(
                    F.col("id").alias("k"), F.lit(f"m{j}").alias("tag")
                )
                commit_upsert(
                    spark, batch, table, ["k"], stats_cols=["k"],
                    max_retries=16,
                )
        except Exception as e:
            errors.append(e)
        finally:
            done.set()

    def deleter():
        try:
            commit_delete(spark, table, "k < 10", max_retries=16)
        except Exception as e:
            errors.append(e)

    t1 = threading.Thread(target=maintainer)
    t2 = threading.Thread(target=deleter)
    t1.start()
    t2.start()
    t1.join()
    t2.join()
    assert not errors, errors
    # both serial orders: base minus k<10, plus all 40 maintainer rows.
    # Forensics ride every assert: one full-suite run produced 5
    # versions with both threads reporting success (not reproduced in
    # 10 targeted reruns incl. under load) — if it recurs, the per-
    # version op/io headers identify WHICH commit went missing.
    forensics = {
        v: {
            k: version_header(spark, table, v).get(k)
            for k in ("op", "delete_io", "upsert_io")
        }
        for v in list_versions(spark, table)
    }
    cur = read_version(spark, table)
    assert cur.where("k < 10").count() == 0, forensics
    per_tag = {
        r["tag"]: r["n"]
        for r in cur.groupBy("tag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_tag.pop("base", 0) == 40, (per_tag, forensics)
    assert per_tag == {f"m{j}": 10 for j in range(4)}, (per_tag, forensics)
    assert cur.count() == 40 + 40, forensics
    assert list_versions(spark, table) == list(range(1, 7)), forensics


def test_real_thread_optimize_vs_appends_both_commit(spark, table):
    """Layout maintenance racing live ingest through real threads:
    scheduled OPTIMIZE (max_retries) and two appenders all commit —
    OPTIMIZE composes with appends by Delta's rule (their files are
    simply carried uncompacted), and no row is lost or doubled."""
    import threading

    commit_version(
        spark, _df(spark, 0, 40, "base").repartition(4), table,
        stats_cols=["k"],
    )
    errors: list[Exception] = []

    def appender(i):
        try:
            for j in range(3):
                commit_append(
                    spark,
                    _df(
                        spark, 1000 * i + 10 * j, 1000 * i + 10 * j + 10,
                        f"a{i}",
                    ),
                    table,
                    stats_cols=["k"],
                    max_retries=16,
                )
        except Exception as e:
            errors.append(e)

    def optimizer():
        try:
            for _ in range(2):
                commit_compaction(spark, table, 500, ["k"], max_retries=16)
        except Exception as e:
            errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(1,)),
        threading.Thread(target=appender, args=(2,)),
        threading.Thread(target=optimizer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert list_versions(spark, table) == list(range(1, 10))  # 1 + 6 + 2
    cur = read_version(spark, table)
    assert cur.count() == 40 + 6 * 10
    per_tag = {
        r["tag"]: r["n"]
        for r in cur.groupBy("tag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_tag == {"base": 40, "a1": 30, "a2": 30}
