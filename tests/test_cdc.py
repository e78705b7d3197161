"""CDC / lakehouse-maintenance operator tests: SCD2 history invariants,
MERGE arm behavior, multi-batch streaming upsert vs batch compaction
(incl. tombstone retention and retry idempotence), and the Bloom prune's
no-false-negative guarantee.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.cdc import (
    CDC_DELETE_TYPE,
    CDC_KEY_MULT,
    CDC_KEY_OFF,
    customer_cdc_merge,
    user_state_scd2,
)

SF = "/root/testdata/sf0.001"


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


class TestScd2:
    def test_history_invariants(self, spark):
        hist = user_state_scd2(spark, SF).collect()
        by_user: dict[int, list] = {}
        for r in hist:
            by_user.setdefault(r.user_id, []).append(r)
        assert by_user
        for rows in by_user.values():
            # versions contiguous from 1, in order
            assert [r.version for r in rows] == list(range(1, len(rows) + 1))
            # validity chain: each version ends where the next begins; only
            # the last is open-ended/current
            for a, b in zip(rows, rows[1:]):
                assert a.valid_to == b.valid_from
                assert a.valid_from < a.valid_to
                assert not a.is_current
                # SCD2 records CHANGES: adjacent versions differ
                assert a.state != b.state
            assert rows[-1].valid_to is None and rows[-1].is_current

    def test_matches_event_replay(self, spark):
        """Brute-force model: replay each user's events in (ts, event_id)
        order and record state transitions."""
        events = sorted(
            load_table(spark, SF, "events")
            .select("user_id", "ts", "event_id", "event_type")
            .collect(),
            key=lambda r: (r.user_id, r.ts, r.event_id),
        )
        want: dict[int, list] = {}
        for r in events:
            runs = want.setdefault(r.user_id, [])
            if not runs or runs[-1][0] != r.event_type:
                runs.append((r.event_type, r.ts))
        got: dict[int, list] = {}
        for r in user_state_scd2(spark, SF).collect():
            got.setdefault(r.user_id, []).append((r.state, r.valid_from))
        assert got == want


class TestCdcMerge:
    def test_merge_arms(self, spark):
        merged = {r.c_custkey: r for r in customer_cdc_merge(spark, SF).collect()}
        base = {r.c_custkey: r for r in load_table(spark, SF, "customer").collect()}
        latest = {
            r.user_id: r.m
            for r in load_table(spark, SF, "events")
            .groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m"))
            .collect()
        }
        changes = {
            u * CDC_KEY_MULT + CDC_KEY_OFF: m for u, m in latest.items()
        }
        n_upd = n_ins = n_del = 0
        for key, m in changes.items():
            if m.event_type == CDC_DELETE_TYPE:
                # delete: matched key removed, absent key a no-op
                assert key not in merged
                n_del += key in base
            elif key in base:
                assert merged[key].op_applied == "update"
                assert merged[key].c_acctbal == m.value
                assert merged[key].c_name == base[key].c_name  # non-SET cols keep
                n_upd += 1
            else:
                assert merged[key].op_applied == "insert"
                assert merged[key].c_acctbal == m.value
                assert merged[key].c_mktsegment == "STREAM"
                n_ins += 1
        # untouched base rows carry through verbatim
        for key, row in base.items():
            if key not in changes:
                assert merged[key].op_applied == "none"
                assert merged[key].c_acctbal == row.c_acctbal
        # the synthetic changelog exercises every arm
        assert n_upd and n_ins and n_del
        assert len(merged) == len(base) + n_ins - n_del


class TestCdcUpsertStream:
    def _schema_rows(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_id bigint, "
            "event_type string, value double"
        )

    def test_multibatch_equals_batch_compaction(self, spark, tmp_path):
        from otus_cpp_11_spark.streaming import cdc_upsert_user_state

        events = load_table(spark, SF, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        src = str(tmp_path / "cdc_src")
        events.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        target = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        cdc_upsert_user_state(stream, target, ckpt).awaitTermination()
        from otus_cpp_11_spark.ops.versioned import (
            current_version,
            read_version,
            version_header,
        )

        got = read_version(spark, target).select("user_id", "m")
        want = events.groupBy("user_id").agg(
            F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m")
        )
        assert _rows(got, "user_id") == _rows(want, "user_id")

        # resume idempotence: same checkpoint, no new files -> no batches,
        # no new commits (batch id lives in the commit HEADER now)
        applied = version_header(spark, target)["batch_id"]
        v_after = current_version(spark, target)
        cdc_upsert_user_state(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            target,
            ckpt,
        ).awaitTermination()
        assert current_version(spark, target) == v_after
        assert version_header(spark, target)["batch_id"] == applied
        assert _rows(
            read_version(spark, target).select("user_id", "m"), "user_id"
        ) == _rows(want, "user_id")

        # cross-run guard: existing target + throwaway checkpoint refused
        import pytest

        with pytest.raises(ValueError, match="checkpoint"):
            cdc_upsert_user_state(
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                target,
            )

    def test_tombstone_survives_any_batch_order(self, spark, tmp_path):
        """A delete tombstone must win on recency REGARDLESS of which
        micro-batch delivers it: user 1's delete is the newest record
        (stays dead even if an older upsert arrives in a later batch);
        user 2's delete is superseded by a newer upsert (stays alive).
        The records are spread across 4 files, so whatever order the file
        source picks, compaction — not arrival order — decides."""
        from otus_cpp_11_spark.streaming import cdc_upsert_user_state

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 10, "click", 1.0),
            (1, t0 + dt.timedelta(minutes=5), 11, CDC_DELETE_TYPE, 0.0),
            (2, t0, 20, CDC_DELETE_TYPE, 0.0),
            (2, t0 + dt.timedelta(minutes=5), 21, "view", 2.0),
        ]
        events = self._schema_rows(spark, rows)
        src = str(tmp_path / "tomb_src")
        events.repartition(4).write.parquet(src)
        target = str(tmp_path / "tomb_state")
        cdc_upsert_user_state(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            target,
        ).awaitTermination()
        from otus_cpp_11_spark.ops.versioned import read_version

        state = read_version(spark, target)
        # tombstone rows are STORED (resurrection-proofing) ...
        assert state.count() == 2
        # ... and filtered at read time: user 1 dead, user 2 alive
        live = {
            r.user_id: r
            for r in state.where(
                F.col("m.event_type") != CDC_DELETE_TYPE
            ).collect()
        }
        assert set(live) == {2}
        assert live[2].m.event_id == 21 and live[2].m.value == 2.0

    def test_restart_resumes_and_crash_retry_is_exactly_once_versioned(
        self, spark, tmp_path
    ):
        """r6 verdict item 5's 'Done' gate: the three-leg restart proof
        (run, restart-with-new-files, crash-window replay) on the
        VERSIONED commit path. The batch-id marker now rides in the
        commit header, so the retry detection is a header probe and the
        no-double-apply assert is 'current version did not advance'."""
        import shutil

        from otus_cpp_11_spark.ops.versioned import (
            current_version,
            read_version,
            version_header,
        )
        from otus_cpp_11_spark.streaming import cdc_upsert_user_state

        events = load_table(spark, SF, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        e1 = events.where(F.col("user_id") % 2 == 0)
        e2 = events.where(F.col("user_id") % 2 == 1)
        src = str(tmp_path / "src")
        e1.repartition(2).write.parquet(src)
        target = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")

        def run():
            stream = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            cdc_upsert_user_state(stream, target, ckpt).awaitTermination()

        def compacted(ev):
            return ev.groupBy("user_id").agg(
                F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m")
            )

        run()  # leg 1
        assert _rows(read_version(spark, target), "user_id") == _rows(
            compacted(e1), "user_id"
        )
        batch1 = version_header(spark, target)["batch_id"]

        shutil.copytree(ckpt, str(tmp_path / "ckpt_snap"))  # pre-run#2
        e2.repartition(2).write.mode("append").parquet(src)

        run()  # leg 2: restart, same checkpoint — only the new files
        assert _rows(read_version(spark, target), "user_id") == _rows(
            compacted(events), "user_id"
        )
        batch2 = version_header(spark, target)["batch_id"]
        v2 = current_version(spark, target)
        assert batch2 > batch1  # ids continued: resumed offsets, no replay

        # leg 3: kill window — state committed, checkpoint pre-run#2
        shutil.rmtree(ckpt)
        shutil.copytree(str(tmp_path / "ckpt_snap"), ckpt)
        run()
        assert current_version(spark, target) == v2  # no re-commit at all
        assert version_header(spark, target)["batch_id"] == batch2
        assert _rows(read_version(spark, target), "user_id") == _rows(
            compacted(events), "user_id"
        )


class TestBloomPrune:
    def test_no_false_negatives_and_fp_accounting(self, spark):
        from otus_cpp_11_spark.queries.curation import (
            DECON_NGRAM,
            EVAL_MOD,
            decontam_bloom_prune,
        )
        from otus_cpp_11_spark.queries.dedup import _word_shingles

        got = {r.doc_id: r for r in decontam_bloom_prune(spark, SF).collect()}
        # independent exact computation over the FULL corpus (no pruning)
        grams = _word_shingles(load_table(spark, SF, "documents"), DECON_NGRAM)
        ev = grams.where(F.col("doc_id") % EVAL_MOD == 0).select("shingle").distinct()
        exact = {
            r.doc_id: r.n
            for r in grams.where(F.col("doc_id") % EVAL_MOD != 0)
            .join(ev, "shingle", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # no false negatives: every doc with exact shared grams is a
        # candidate doc, with its exact count fully recovered from the
        # pruned (candidate-only) verification
        for doc_id, n in exact.items():
            assert doc_id in got, f"bloom dropped true hit doc {doc_id}"
            assert got[doc_id].n_exact_shared == n
        # FP accounting: candidates can only exceed exact hits
        for r in got.values():
            assert r.n_bloom_candidates >= r.n_exact_shared
            assert r.n_exact_shared == exact.get(r.doc_id, 0)


class TestPitEnrich:
    def test_pit_never_leaks_the_version_an_event_created(self, spark):
        """The leakage contract: an event that STARTS a version must see
        the version it transitioned FROM (or NULL for the user's first),
        never its own; an event inside a run sees its own run's state."""
        from otus_cpp_11_spark.queries.cdc import events_pit_enrich, user_state_scd2

        hist: dict[tuple, object] = {}
        for r in user_state_scd2(spark, SF).collect():
            hist[(r.user_id, r.valid_from)] = r
        enriched = events_pit_enrich(spark, SF).collect()
        n_starts = n_inside = 0
        for r in enriched:
            started = hist.get((r.user_id, r.ts))
            if started is not None and (
                r.prior_state is None or r.prior_state != started.state
            ):
                # this event began a new version: prior must be the
                # immediately preceding version, never the new one
                if started.version == 1:
                    assert r.prior_state is None and r.prior_version is None
                else:
                    assert r.prior_version == started.version - 1
                    assert r.prior_state != started.state
                n_starts += 1
            else:
                # inside a run: the active (pre-existing) state is its own
                assert r.prior_state == r.event_type
                n_inside += 1
        assert n_starts and n_inside


class TestIncrementalScd2:
    def test_multibatch_equals_batch_history(self, spark, tmp_path):
        from otus_cpp_11_spark.queries.cdc import _scd2_history
        from otus_cpp_11_spark.streaming import incremental_scd2_history

        events = load_table(spark, SF, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        src = str(tmp_path / "scd2_src")
        events.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        hist, raw = str(tmp_path / "hist"), str(tmp_path / "raw")
        incremental_scd2_history(stream, hist, raw).awaitTermination()
        from otus_cpp_11_spark.ops.versioned import current_version, read_version

        assert current_version(spark, hist) >= 2  # genuinely multi-commit
        got = read_version(spark, hist)
        want = _scd2_history(events)
        assert _rows(got, "user_id", "version") == _rows(want, "user_id", "version")

    def test_late_event_rewrites_only_its_keys_chain(self, spark, tmp_path):
        """A late change landing BETWEEN existing transitions must rewrite
        its key's validity chain (new middle version, re-numbered
        successors) while an untouched key's history carries unchanged —
        the scoped-recompute contract."""
        from otus_cpp_11_spark.streaming import incremental_scd2_history

        t0 = dt.datetime(2024, 1, 1)
        mk = lambda u, ts, eid, st: (u, ts, eid, st, 0.0)  # noqa: E731
        schema = (
            "user_id bigint, ts timestamp, event_id bigint, "
            "event_type string, value double"
        )
        src = str(tmp_path / "src")
        first = spark.createDataFrame(
            [
                mk(1, t0, 10, "click"),
                mk(1, t0 + dt.timedelta(hours=2), 12, "view"),
                mk(2, t0, 20, "click"),
            ],
            schema,
        )
        first.coalesce(1).write.mode("append").parquet(src)
        hist, raw = str(tmp_path / "hist"), str(tmp_path / "raw")
        ckpt = str(tmp_path / "ckpt")
        stream = lambda: (  # noqa: E731
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        from otus_cpp_11_spark.ops.versioned import read_version

        incremental_scd2_history(stream(), hist, raw, ckpt).awaitTermination()
        v1 = {
            (r.user_id, r.version): (r.state, r.valid_from)
            for r in read_version(spark, hist).collect()
        }
        assert v1[(1, 1)][0] == "click" and v1[(1, 2)][0] == "view"

        # the late event: lands between user 1's two existing transitions
        late = spark.createDataFrame(
            [mk(1, t0 + dt.timedelta(hours=1), 11, "purchase")], schema
        )
        late.coalesce(1).write.mode("append").parquet(src)
        # same checkpoint: AvailableNow picks up ONLY the new file
        incremental_scd2_history(stream(), hist, raw, ckpt).awaitTermination()
        rows = read_version(spark, hist).collect()
        u1 = sorted(
            [(r.version, r.state, r.valid_from, r.valid_to) for r in rows if r.user_id == 1]
        )
        assert [(v, s) for v, s, *_ in u1] == [
            (1, "click"),
            (2, "purchase"),
            (3, "view"),
        ]
        # chain contiguous through the inserted version
        assert u1[0][3] == u1[1][2] and u1[1][3] == u1[2][2]
        # untouched key carried byte-for-byte
        u2 = [(r.version, r.state) for r in rows if r.user_id == 2]
        assert u2 == [(1, "click")]

    def test_crash_between_raw_and_hist_commits_replays_cleanly(
        self, spark, tmp_path
    ):
        """The one two-table crash window of the versioned SCD2
        maintainer: die AFTER the batch's raw append commit, BEFORE its
        history upsert commit. The checkpoint replays the batch; the
        raw header's batch id suppresses the re-append (no duplicate
        records) and the history commit completes — final state equals
        the from-scratch batch SCD2."""
        import otus_cpp_11_spark.ops.versioned as V
        from otus_cpp_11_spark.queries.cdc import _scd2_history
        from otus_cpp_11_spark.streaming import incremental_scd2_history

        events = load_table(spark, SF, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        src = str(tmp_path / "src")
        events.repartition(2).write.parquet(src)
        stream = lambda: (  # noqa: E731
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        hist, raw = str(tmp_path / "hist"), str(tmp_path / "raw")
        ckpt = str(tmp_path / "ckpt")

        orig_upsert = V.commit_upsert
        armed = {"on": True}

        def flaky_upsert(bspark, df, table, keys, **kw):
            # crash on the SECOND batch's history commit (its raw
            # commit has already happened by this point in the merge)
            if armed["on"] and V.current_version(bspark, table) is not None:
                armed["on"] = False
                raise RuntimeError("injected crash: raw committed, hist not")
            return orig_upsert(bspark, df, table, keys, **kw)

        V.commit_upsert = flaky_upsert
        try:
            q = incremental_scd2_history(stream(), hist, raw, ckpt)
            try:
                q.awaitTermination()
            except Exception:
                pass  # the injected crash kills the query mid-run
            assert not armed["on"], "crash was never injected"
            # crash window state: raw is ahead of hist by one batch
            raw_bid = V.version_header(spark, raw).get("batch_id")
            hist_bid = V.version_header(spark, hist).get("batch_id")
            assert raw_bid == hist_bid + 1
        finally:
            V.commit_upsert = orig_upsert
        # restart from the same checkpoint: replay must converge
        incremental_scd2_history(stream(), hist, raw, ckpt).awaitTermination()
        # no duplicated raw records from the replayed append
        assert V.read_version(spark, raw).count() == events.count()
        got = _rows(V.read_version(spark, hist), "user_id", "version")
        want = _rows(_scd2_history(events), "user_id", "version")
        assert got == want

    def test_interleaved_optimize_in_crash_window_does_not_duplicate(
        self, spark, tmp_path
    ):
        """Replay idempotence must survive an interleaved NON-batch
        commit: crash after the raw append, then run commit_compaction
        on the raw store (the maintainer's own docstring recommends it),
        which puts a batch-id-free OPTIMIZE commit at the head. A head
        peek would miss the applied batch id and re-append the batch on
        restart; the txn-scan (walk back to the newest header carrying
        a batch id) must not (review finding, r8)."""
        import otus_cpp_11_spark.ops.versioned as V
        from otus_cpp_11_spark.queries.cdc import _scd2_history
        from otus_cpp_11_spark.streaming import incremental_scd2_history

        events = load_table(spark, SF, "events").select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        src = str(tmp_path / "src")
        events.repartition(2).write.parquet(src)
        stream = lambda: (  # noqa: E731
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        hist, raw = str(tmp_path / "hist"), str(tmp_path / "raw")
        ckpt = str(tmp_path / "ckpt")

        orig_upsert = V.commit_upsert
        armed = {"on": True}

        def flaky_upsert(bspark, df, table, keys, **kw):
            if armed["on"] and V.current_version(bspark, table) is not None:
                armed["on"] = False
                raise RuntimeError("injected crash: raw committed, hist not")
            return orig_upsert(bspark, df, table, keys, **kw)

        V.commit_upsert = flaky_upsert
        try:
            q = incremental_scd2_history(stream(), hist, raw, ckpt)
            try:
                q.awaitTermination()
            except Exception:
                pass
            assert not armed["on"], "crash was never injected"
        finally:
            V.commit_upsert = orig_upsert
        # the interleaved maintenance commit: masks the head batch id
        v_opt = V.commit_compaction(spark, raw, 10**9, ["user_id"])
        assert V.version_header(spark, raw, v_opt).get("batch_id") is None
        # restart: replay must suppress the re-append despite the mask
        incremental_scd2_history(stream(), hist, raw, ckpt).awaitTermination()
        assert V.read_version(spark, raw).count() == events.count()
        got = _rows(V.read_version(spark, hist), "user_id", "version")
        want = _rows(_scd2_history(events), "user_id", "version")
        assert got == want
