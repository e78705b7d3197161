"""Sources & sinks surface (SURVEY.md §2.2 'scans/sources/sinks'): the
reference reads/writes newline text only (O1/O2/O5); the engine covers
text/csv/json/parquet/orc with schema round-trips and partitioned layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", val=1.5, seg="x"),
            Row(k=2, name="b", val=2.5, seg="y"),
            Row(k=3, name="c", val=-0.5, seg="x"),
        ]
    )


def _assert_roundtrip(df, back, sort_col="k"):
    a = sorted(df.collect(), key=lambda r: r[sort_col])
    b = sorted(back.collect(), key=lambda r: r[sort_col])
    assert a == b


class TestFormats:
    def test_parquet_roundtrip(self, spark, sample, tmp_path):
        p = str(tmp_path / "t.parquet")
        sample.write.mode("overwrite").parquet(p)
        _assert_roundtrip(sample, spark.read.parquet(p))

    def test_orc_roundtrip(self, spark, sample, tmp_path):
        p = str(tmp_path / "t.orc")
        sample.write.mode("overwrite").orc(p)
        _assert_roundtrip(sample, spark.read.orc(p))

    def test_csv_roundtrip_explicit_schema(self, spark, sample, tmp_path):
        # explicit schema, never inferSchema in prod (extra pass over data)
        p = str(tmp_path / "t.csv")
        sample.write.mode("overwrite").option("header", True).csv(p)
        back = spark.read.schema("k bigint, name string, val double, seg string").csv(
            p, header=True
        )
        _assert_roundtrip(sample, back)

    def test_json_roundtrip(self, spark, sample, tmp_path):
        p = str(tmp_path / "t.json")
        sample.write.mode("overwrite").json(p)
        back = spark.read.schema("k bigint, name string, val double, seg string").json(p)
        _assert_roundtrip(sample, back)

    def test_text_sink_and_source(self, spark, tmp_path):
        # the reference's only format (O1/O2/O5)
        p = str(tmp_path / "lines")
        df = spark.createDataFrame([("alpha",), ("beta",)], ["value"])
        df.coalesce(1).write.mode("overwrite").text(p)
        back = spark.read.text(p)
        assert sorted(r.value for r in back.collect()) == ["alpha", "beta"]


class TestPartitionedLayout:
    def test_partitionby_write_and_pruning(self, spark, sample, tmp_path):
        """Hive-partitioned write — the 100 TB lake layout; reading one
        partition directory must not scan the other."""
        p = str(tmp_path / "part")
        sample.write.mode("overwrite").partitionBy("seg").parquet(p)
        x = spark.read.parquet(p).where(F.col("seg") == "x")
        assert x.count() == 2
        # partition pruning visible in the physical plan
        plan = x._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or "seg" in plan

    def test_partition_column_type_roundtrip(self, spark, sample, tmp_path):
        p = str(tmp_path / "part2")
        sample.write.mode("overwrite").partitionBy("k").parquet(p)
        back = spark.read.parquet(p)
        assert {r.k for r in back.select("k").collect()} == {1, 2, 3}


class TestCatalogScan:
    def test_column_pruning_reaches_scan(self, spark):
        """A 2-column projection must not read all 11 lineitem columns
        (ReadSchema shows the pruned set)."""
        l = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        q = l.select("l_orderkey", "l_quantity")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "l_orderkey" in plan
        assert "l_extendedprice" not in plan  # pruned away

    def test_predicate_pushdown_reaches_scan(self, spark):
        l = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        q = l.where(F.col("l_returnflag") == "R").select("l_orderkey")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "l_returnflag" in plan


class TestSourceRobustness:
    """Schema evolution and malformed-record handling — the failure modes
    a 100 TB lake actually has (files written by different pipeline
    versions, truncated JSON lines)."""

    def test_parquet_merge_schema_evolution(self, spark, tmp_path):
        base = str(tmp_path / "evolving")
        spark.createDataFrame(
            [(1, "a")], "id long, name string"
        ).write.parquet(base + "/v=1")
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, name string, score double"
        ).write.parquet(base + "/v=2")
        df = spark.read.option("mergeSchema", "true").parquet(base + "/v=*")
        assert set(df.columns) == {"id", "name", "score"}
        rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
        # old-schema rows surface the new column as NULL, not an error
        assert rows[1] == ("a", None)
        assert rows[2] == ("b", 9.5)

    def test_json_permissive_corrupt_record_capture(self, spark, tmp_path):
        p = tmp_path / "mixed.json"
        p.write_text(
            '{"id": 1, "v": "ok"}\n'
            '{"id": 2, "v": "also ok"}\n'
            '{"id": 3, "v": TRUNCATED\n'
        )
        # Spark disallows predicates referencing ONLY the internal corrupt
        # column on a raw scan; cache materializes it first (documented
        # JSON-source limitation)
        df = (
            spark.read.schema("id long, v string, _corrupt_record string")
            .json(str(p))
            .cache()
        )
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
        # the malformed line is preserved verbatim for quarantine
        assert "TRUNCATED" in bad.first()["_corrupt_record"]

    def test_json_dropmalformed_mode(self, spark, tmp_path):
        p = tmp_path / "mixed2.json"
        p.write_text('{"id": 1}\nnot json at all\n{"id": 2}\n')
        df = (
            spark.read.schema("id long")
            .option("mode", "DROPMALFORMED")
            .json(str(p))
        )
        assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_python_datasource_partitions_and_options(spark):
    """Custom connector contract: the planner asks partitions(), each task
    reads only its slice, options flow through, and results are exact."""
    from otus_cpp_11_spark.sources import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 1000)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 1000
    assert {r.event_id for r in rows} == set(range(1000))
    for r in rows[:50]:
        assert r.user_id == r.event_id % 97
        assert r.value == (r.event_id * 31) % 1000 / 10.0


def test_spread_gate_uses_split_math(spark):
    """spread() replays Spark's byte-size split arithmetic: a small
    single-file scan repartitions to the requested width, while a
    non-file-scan input that already has enough partitions is returned
    untouched (identity — no shuffle inserted)."""
    from otus_cpp_11_spark.catalog import spread

    scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert spread(scan, 8).rdd.getNumPartitions() == 8

    wide = spark.range(0, 1000, 1, 16)
    assert spread(wide, 8) is wide
    narrow = spark.range(0, 1000, 1, 2)
    assert spread(narrow, 8).rdd.getNumPartitions() == 8


def test_stream_reader_offset_contract():
    """The streaming face's offset arithmetic: batches advance by
    batch_rows, cap at rows (then stop progressing — what terminates an
    AvailableNow drain), and readBetweenOffsets replays any committed
    range identically (the recovery contract)."""
    from otus_cpp_11_spark.sources import _StreamReader

    r = _StreamReader({"rows": 25, "batch_rows": 10})
    off = r.initialOffset()
    seen = []
    for want in (10, 20, 25, 25):
        rows, off = r.read(off)
        seen.extend(rows)
        assert off == {"i": want}
    assert [t[0] for t in seen] == list(range(25))
    replay = list(r.readBetweenOffsets({"i": 10}, {"i": 20}))
    assert replay == [t for t in seen if 10 <= t[0] < 20]


def _vt_mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 0.5).alias("v"),
    )


def test_versioned_table_batch_face_manifest_planned(spark, tmp_path):
    """Batch face of the versioned_table connector: reads exactly the
    CURRENT manifest's files (one InputPartition per file), schema from
    the manifest header, never a directory listing — files of older
    versions and uncommitted attempts are invisible."""
    from otus_cpp_11_spark.ops.versioned import commit_upsert, commit_version
    from otus_cpp_11_spark.sources import (
        _VTBatchReader,
        register_versioned_table_source,
    )

    tbl = str(tmp_path / "t")
    commit_version(spark, _vt_mk(spark, 0, 100).repartition(3), tbl)
    commit_upsert(
        spark,
        spark.createDataFrame([(5, "x", 9.9)], "k long, g string, v double"),
        tbl,
        ["k"],
    )
    register_versioned_table_source(spark)
    df = spark.read.format("versioned_table").option("path", tbl).load()
    assert df.count() == 100
    assert df.where("k = 5").first()["g"] == "x"  # current snapshot, not v1
    # split plan == manifest file list
    from otus_cpp_11_spark.ops.versioned import current_version, read_manifest

    _, files = read_manifest(spark, tbl, current_version(spark, tbl))
    assert len(_VTBatchReader({"path": tbl}).partitions()) == len(files)


def test_versioned_table_stream_tails_appends_incrementally(spark, tmp_path):
    """Streaming face: version-number offsets; a checkpointed drain
    consumes v1..v2, a later append commits v3, and the SECOND drain on
    the same checkpoint reads ONLY v3's files — incremental tailing with
    no loss and no re-delivery across restarts."""
    from otus_cpp_11_spark.ops.versioned import commit_append, commit_version
    from otus_cpp_11_spark.sources import register_versioned_table_source

    tbl = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    commit_version(spark, _vt_mk(spark, 0, 100).repartition(2), tbl)
    commit_append(spark, _vt_mk(spark, 100, 150), tbl)
    register_versioned_table_source(spark)

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", tbl)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    assert drain() == 150  # initial snapshot + first append
    commit_append(spark, _vt_mk(spark, 150, 175), tbl)
    assert drain() == 175  # only the 25 new rows were delivered
    got = spark.read.parquet(out)
    assert got.select("k").distinct().count() == 175  # no re-delivery
    assert drain() == 175  # no new commits -> empty batch, no-op


def test_versioned_table_stream_change_commit_policy(spark, tmp_path):
    """A non-append commit rewrites already-streamed rows: the stream
    refuses it loudly by default; skipChangeCommits=true ignores its
    file delta and continues with later appends (Delta's contract)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_upsert,
        commit_version,
    )
    from otus_cpp_11_spark.sources import _VTStreamReader

    tbl = str(tmp_path / "t")
    commit_version(spark, _vt_mk(spark, 0, 50).repartition(2), tbl)
    commit_upsert(
        spark,
        spark.createDataFrame([(1, "x", 0.0)], "k long, g string, v double"),
        tbl,
        ["k"],
    )
    commit_append(spark, _vt_mk(spark, 50, 60).coalesce(1), tbl)
    r = _VTStreamReader({"path": tbl})
    assert len(r.partitions({"version": 0}, {"version": 1})) == 2
    with pytest.raises(ValueError, match="upsert"):
        r.partitions({"version": 1}, {"version": 3})
    skip = _VTStreamReader({"path": tbl, "skipChangeCommits": "true"})
    parts = skip.partitions({"version": 1}, {"version": 3})
    # the upsert's rewrite is skipped; only v3's appended file remains
    assert len(parts) == 1 and "/c00000003-" in parts[0].path


def test_versioned_table_time_travel_options(spark, tmp_path):
    """Delta's batch time-travel options on the connector: versionAsOf
    pins a snapshot (including its OWN pre-evolution schema), and
    timestampAsOf resolves through commit-marker mtimes to the latest
    commit at or before the instant; both are refused together, and a
    timestamp older than the first commit errors."""
    import time

    from otus_cpp_11_spark.ops.versioned import commit_append, commit_version
    from otus_cpp_11_spark.sources import register_versioned_table_source

    tbl = str(tmp_path / "t")
    commit_version(spark, _vt_mk(spark, 0, 100), tbl)  # v1
    time.sleep(1.1)  # marker mtimes must be distinguishable
    t_between = time.time()
    time.sleep(1.1)
    commit_append(
        spark,
        _vt_mk(spark, 100, 130).withColumn("extra", F.lit(1)),
        tbl,
        merge_schema=True,
    )  # v2: evolved schema
    register_versioned_table_source(spark)

    cur = spark.read.format("versioned_table").option("path", tbl).load()
    assert cur.count() == 130 and "extra" in cur.columns
    v1 = (
        spark.read.format("versioned_table")
        .option("path", tbl)
        .option("versionAsOf", "1")
        .load()
    )
    assert v1.count() == 100
    assert "extra" not in v1.columns  # the pinned snapshot's own schema
    at = (
        spark.read.format("versioned_table")
        .option("path", tbl)
        .option("timestampAsOf", str(t_between))
        .load()
    )
    assert at.count() == 100  # resolves to v1, the commit before t
    with pytest.raises(Exception, match="at or before"):
        (
            spark.read.format("versioned_table")
            .option("path", tbl)
            .option("timestampAsOf", "100.0")  # 1970: older than any commit
            .load()
            .count()
        )
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.read.format("versioned_table")
            .option("path", tbl)
            .option("versionAsOf", "1")
            .option("timestampAsOf", str(t_between))
            .load()
            .count()
        )


def test_versioned_table_stream_starting_version(spark, tmp_path):
    """Delta's startingVersion on the streaming face: N streams changes
    from version N inclusive (no initial-snapshot replay); 'latest'
    starts past everything already committed, so a fresh drain delivers
    only commits made after the stream's first offset read."""
    from otus_cpp_11_spark.ops.versioned import commit_append, commit_version
    from otus_cpp_11_spark.sources import _VTStreamReader

    tbl = str(tmp_path / "t")
    commit_version(spark, _vt_mk(spark, 0, 100).coalesce(1), tbl)  # v1
    commit_append(spark, _vt_mk(spark, 100, 120).coalesce(1), tbl)  # v2
    commit_append(spark, _vt_mk(spark, 120, 130).coalesce(1), tbl)  # v3

    r = _VTStreamReader({"path": tbl, "startingVersion": "2"})
    off0 = r.initialOffset()
    assert off0 == {"version": 1}  # stream begins WITH v2's delta
    parts = r.partitions(off0, r.latestOffset())
    assert len(parts) == 2  # v2 + v3 files only, no v1 snapshot replay
    assert all("/c00000001-" not in p.path for p in parts)

    latest = _VTStreamReader({"path": tbl, "startingVersion": "latest"})
    off = latest.initialOffset()
    assert off == {"version": 3}
    assert latest.partitions(off, latest.latestOffset()) == []
    commit_append(spark, _vt_mk(spark, 130, 135).coalesce(1), tbl)  # v4
    parts4 = latest.partitions(off, latest.latestOffset())
    assert len(parts4) == 1 and "/c00000004-" in parts4[0].path

    with pytest.raises(ValueError, match="startingVersion"):
        _VTStreamReader({"path": tbl, "startingVersion": "0"}).initialOffset()
