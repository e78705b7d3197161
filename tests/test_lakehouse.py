"""Lakehouse OPTIMIZE (ops/lakehouse.py): row-multiset preservation,
bin-pack accounting, and the footer-stats pruning property the clustered
rewrite exists for (r5 verdict item 3)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.ops.lakehouse import compact_parquet, list_data_files
from otus_cpp_11_spark.queries.sampling import Z_BITS, _z_interleave

SF = "/root/testdata/sf0.01"
FRAG_FILES = 40
ROWS_PER_FILE = 2000  # small bins -> enough output files to measure pruning


def _local(p: str) -> str:
    return p.removeprefix("file:")


def _file_extents(spark, path: str, cols: tuple[str, str]):
    """Per-file (min, max) of two columns from the parquet FOOTER stats
    (pyarrow) — exactly the statistics a stats-aware reader prunes on."""
    out = {}
    for f, _bytes in list_data_files(spark, path):
        md = pq.ParquetFile(_local(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ext = {}
        for c in cols:
            lo = min(md.row_group(g).column(idx[c]).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx[c]).statistics.max for g in range(md.num_row_groups))
            ext[c] = (lo, hi)
        out[f] = ext
    return out


@pytest.fixture(scope="module")
def compacted(spark, tmp_path_factory):
    li = load_table(spark, SF, "lineitem")
    frag = str(tmp_path_factory.mktemp("lakehouse")) + "/lineitem"
    li.repartitionByRange(FRAG_FILES, "l_orderkey").write.parquet(frag)
    frag_extents = _file_extents(spark, frag, ("l_partkey", "l_suppkey"))
    mx = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    px = f"((l_partkey * {2 ** Z_BITS}) div {int(mx[0]) + 1})"
    py = f"((l_suppkey * {2 ** Z_BITS}) div {int(mx[1]) + 1})"
    acct = compact_parquet(
        spark,
        frag,
        ROWS_PER_FILE,
        order_by=[_z_interleave(px, py), F.col("l_orderkey"), F.col("l_linenumber")],
    )
    return {
        "path": frag,
        "acct": acct,
        "frag_extents": frag_extents,
        "max_pk": int(mx[0]),
        "max_sk": int(mx[1]),
    }


def test_compaction_preserves_row_multiset(spark, compacted):
    src = load_table(spark, SF, "lineitem")
    comp = spark.read.parquet(compacted["path"])
    assert comp.exceptAll(src).count() == 0
    assert src.exceptAll(comp).count() == 0


def test_compaction_accounting(spark, compacted):
    acct = compacted["acct"]
    n = load_table(spark, SF, "lineitem").count()
    assert acct["rows"] == n
    assert acct["files_before"] == FRAG_FILES
    assert acct["files_after"] == math.ceil(n / ROWS_PER_FILE)
    assert acct["files_after"] < acct["files_before"]
    assert acct["bytes_after"] > 0
    # clustered rewrite must not blow up storage (sorted data encodes
    # at least as well; allow slack for block-boundary effects)
    assert acct["bytes_after"] <= acct["bytes_before"] * 1.2
    # staging debris removed by the swap
    assert not any(
        ".compacting" in f for f, _ in list_data_files(spark, compacted["path"])
    )


def test_vacuum_removes_only_protocol_debris(spark, tmp_path):
    from otus_cpp_11_spark.ops.lakehouse import vacuum

    target = str(tmp_path / "tbl")
    df = spark.range(0, 100).withColumnRenamed("id", "v")
    df.write.parquet(target)
    # simulated crash debris from both writers' protocols
    df.write.parquet(target + ".staging-7")
    df.write.parquet(target + ".compacting")
    # an unrelated sibling table must survive
    df.write.parquet(str(tmp_path / "tbl_other"))
    removed = vacuum(spark, target)
    assert len(removed) == 2
    assert spark.read.parquet(target).count() == 100
    assert spark.read.parquet(str(tmp_path / "tbl_other")).count() == 100
    import os

    assert not os.path.exists(target + ".staging-7")
    assert not os.path.exists(target + ".compacting")
    # idempotent
    assert vacuum(spark, target) == []


def test_vacuum_refuses_crash_window_and_recover_completes(spark, tmp_path):
    """In the swap crash window the debris IS the table: vacuum must
    refuse (deleting it would destroy the sole copy) and recover_swap
    must complete the interrupted rename; only then is vacuum safe."""
    import os

    from otus_cpp_11_spark.ops.lakehouse import recover_swap, vacuum

    target = str(tmp_path / "tbl")
    df = spark.range(0, 50).withColumnRenamed("id", "v")
    df.write.parquet(target)
    os.rename(target, target + ".staging-3")  # the crash state

    with pytest.raises(ValueError, match="recover_swap"):
        vacuum(spark, target)
    assert os.path.exists(target + ".staging-3")  # nothing was destroyed

    recovered = recover_swap(spark, target)
    assert recovered and recovered.endswith(".staging-3")
    assert spark.read.parquet(target).count() == 50
    assert recover_swap(spark, target) is None  # idempotent no-op now
    assert vacuum(spark, target) == []


def test_partial_staging_is_never_promoted(spark, tmp_path):
    """A crash DURING the staging write (no _SUCCESS) leaves a PARTIAL
    table: recover_swap must refuse to promote it — promoting would
    commit truncated rows whose batch marker then swallows the retry —
    and vacuum may remove it (it is not the sole copy of anything)."""
    import os

    from otus_cpp_11_spark.ops.lakehouse import recover_swap, vacuum

    target = str(tmp_path / "tbl")
    df = spark.range(0, 50).withColumnRenamed("id", "v")
    df.write.parquet(target + ".staging-5")
    os.remove(target + ".staging-5/_SUCCESS")  # forge the mid-write crash

    assert recover_swap(spark, target) is None
    assert not os.path.exists(target)  # nothing was promoted
    removed = vacuum(spark, target)  # partial debris is safe to clear
    assert removed and removed[0].endswith(".staging-5")
    assert not os.path.exists(target + ".staging-5")


def test_scd2_raw_store_compaction_preserves_history(spark, tmp_path):
    """Integration of the maintenance triple with the CDC family: the
    SCD2 maintainer's raw store is append-fragmented (one versioned
    APPEND commit per micro-batch); OPTIMIZE-ing it as a commit
    (commit_compaction clustered on user_id, the touched-key
    recompute's pruning key) must leave every key's recomputed SCD2
    chain byte-identical."""
    from otus_cpp_11_spark.catalog import load_table
    from otus_cpp_11_spark.ops.versioned import (
        commit_compaction,
        current_version,
        read_manifest,
        read_version,
    )
    from otus_cpp_11_spark.queries.cdc import _scd2_history
    from otus_cpp_11_spark.streaming import incremental_scd2_history

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hist, raw = str(tmp_path / "hist"), str(tmp_path / "raw")
    incremental_scd2_history(
        stream, hist, raw, checkpoint=str(tmp_path / "ckpt")
    ).awaitTermination()
    before = _rows_sorted(read_version(spark, hist))
    n_files_before = len(read_manifest(spark, raw, current_version(spark, raw))[1])
    assert n_files_before >= 4  # one append commit per micro-batch

    v = commit_compaction(
        spark, raw, max_rows_per_file=10_000, cluster_cols=["user_id", "event_id"]
    )
    n_files_after = len(read_manifest(spark, raw, v)[1])
    assert n_files_after < n_files_before
    # full recompute from the compacted raw store: identical history
    recomputed = _rows_sorted(_scd2_history(read_version(spark, raw)))
    assert recomputed == before


def _rows_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_clustered_rewrite_prunes_2d_predicate(spark, compacted):
    """THE property OPTIMIZE ZORDER buys: after the clustered rewrite, a
    conjunctive 2-D predicate rectangle intersects the footer extents of
    only a few files, while every orderkey-fragmented file spans ~the
    whole key domain and none can be skipped."""
    comp_extents = _file_extents(
        spark, compacted["path"], ("l_partkey", "l_suppkey")
    )
    # one z-cell's rectangle: bucket 5 of each dimension
    pk_lo = 5 * (compacted["max_pk"] + 1) // (2 ** Z_BITS)
    pk_hi = 6 * (compacted["max_pk"] + 1) // (2 ** Z_BITS) - 1
    sk_lo = 5 * (compacted["max_sk"] + 1) // (2 ** Z_BITS)
    sk_hi = 6 * (compacted["max_sk"] + 1) // (2 ** Z_BITS) - 1

    def touched(extents):
        n = 0
        for ext in extents.values():
            (p_lo, p_hi), (s_lo, s_hi) = ext["l_partkey"], ext["l_suppkey"]
            if p_lo <= pk_hi and p_hi >= pk_lo and s_lo <= sk_hi and s_hi >= sk_lo:
                n += 1
        return n

    frag_touched = touched(compacted["frag_extents"])
    comp_touched = touched(comp_extents)
    # fragmented layout: every file overlaps the rectangle (no pruning)
    assert frag_touched == FRAG_FILES
    # clustered layout: the rectangle is one z-cell -> a handful of files
    assert comp_touched <= max(3, len(comp_extents) // 4)
    assert comp_touched < frag_touched


def test_compact_bin_count_guaranteed_under_degenerate_order(spark, tmp_path):
    """r6 advice: a sampled range partitioner can merge output ranges and
    silently undershoot the bin count. Force the worst case — a CONSTANT
    order key collapses every range into one — and assert the repair
    path still delivers exactly ceil(rows/rows_per_file) files with the
    row multiset intact."""
    from pyspark.sql import functions as F

    from otus_cpp_11_spark.ops.lakehouse import compact_parquet, list_data_files

    path = str(tmp_path / "tbl")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(3).write.parquet(path)
    stats = compact_parquet(spark, path, rows_per_file=10, order_by=[F.lit(1)])
    assert stats["files_after"] == 10  # ceil(100/10), not 1
    assert len(list_data_files(spark, path)) == 10
    got = spark.read.parquet(path)
    assert got.count() == 100
    assert got.agg(F.sum("k")).first()[0] == sum(range(100))


def test_zn_interleave_matches_duckdb_twin_at_n3(spark):
    """Cross-engine parity of the N-column Morton interleave (r9): the
    Spark expression and its DuckDB SQL twin must agree on every bucket
    triple — the drift hazard the zorder module exists to prevent."""
    import duckdb
    import pandas as pd

    from otus_cpp_11_spark.ops.zorder import Z_BITS, zn_interleave, zn_sql

    b = 2**Z_BITS
    grid = pd.DataFrame(
        [(x, y, z) for x in range(b) for y in range(0, b, 3) for z in (0, 5, b - 1)],
        columns=["px", "py", "pz"],
    )
    sdf = spark.createDataFrame(grid).select(
        "px", "py", "pz", zn_interleave(["px", "py", "pz"]).alias("zv")
    )
    got = sdf.orderBy("px", "py", "pz").toPandas()
    con = duckdb.connect()
    con.register("grid", grid)
    want = con.execute(
        f"SELECT px, py, pz, {zn_sql(['px', 'py', 'pz'])} AS zv "
        "FROM grid ORDER BY px, py, pz"
    ).df()
    assert (got["zv"].to_numpy() == want["zv"].to_numpy()).all()
    # distinct triples -> distinct z-values (it is a bijection on the grid)
    assert got["zv"].nunique() == len(got)
