"""Blue/green retrain cutover of the served index (r12 verdict item 3):
the retrained (green) lineage is bulk-built BESIDE the serving (blue)
one, and one OCC commit on the one-row router table redirects serving
AND the maintainer atomically — no arrival is lost across the swap, the
old lineage stays time-travelable, and a concurrent cutover loses the
race loudly. The oracle row (``ann_blue_green_cutover``) pins pre/post
retrieval values; THIS file pins the maintainer-continuity composition
the oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.ops.versioned import (
    CommitConflict,
    commit_version,
    current_version,
    read_version,
    version_header,
)
from otus_cpp_11_spark.queries.similarity import (
    GREEN_TRAIN_ITERS,
    PQ_INGEST_MOD,
    _ROUTER_SCHEMA,
    _ivf_train,
    _ivf_trained,
    _knn_ivfpq_ranked,
    _pq_train,
    _pq_trained_res,
    _residual_frame,
    encode_ivfpq,
)
from otus_cpp_11_spark.session import scratch_dir
from otus_cpp_11_spark.streaming import incremental_ann_index

SF_DIR = "/root/testdata/sf0.001"


def _routed_index(spark, router: str) -> tuple[str, str]:
    """(index_path, lineage) the router's CURRENT row names — the one
    resolution step serving and maintainer share, which is what makes
    the swap atomic for both."""
    row = read_version(spark, router).first()
    return row["index_path"], row["lineage"]


def _stream_batches(spark, schema, files_glob, index, cents, slices,
                    checkpoint=None):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(files_glob)
    )
    incremental_ann_index(
        stream, index, cents, slices, checkpoint=checkpoint
    ).awaitTermination()


@pytest.fixture(scope="module")
def cutover_world(spark):
    """Blue serving + half the arrivals streamed; green retrain built
    beside it over everything blue has; router cut over; the REMAINING
    arrivals streamed through the ROUTER-resolved lineage."""
    e = load_table(spark, SF_DIR, "embeddings")
    bcents, _, _, _ = _ivf_trained(spark, SF_DIR, pre_ingest=True)
    bslices, _, _, _ = _pq_trained_res(spark, SF_DIR, pre_ingest=True)
    is_ingest = F.col("vec_id") % PQ_INGEST_MOD == PQ_INGEST_MOD - 1
    root = scratch_dir("sg-anncut-")
    blue, green, router = f"{root}/blue", f"{root}/green", f"{root}/router"
    commit_version(
        spark,
        encode_ivfpq(e.where(~is_ingest), bcents, bslices),
        blue,
        stats_cols=["cell", "vec_id"],
        meta={"stage": "bulk-build", "lineage": "blue"},
    )
    commit_version(
        spark,
        spark.createDataFrame([("ann", blue, "blue")], _ROUTER_SCHEMA)
        .coalesce(1),
        router,
        meta={"stage": "serve", "lineage": "blue"},
    )
    # phase 1: maintainer feeds the ROUTED lineage (blue) half the ingest
    early = e.where(is_ingest & (F.col("vec_id") % 2 == 0))
    late = e.where(is_ingest & (F.col("vec_id") % 2 == 1))
    wave1 = f"{root}/wave1"
    early.repartition(2).write.parquet(wave1)
    target, lineage = _routed_index(spark, router)
    assert (target, lineage) == (blue, "blue")
    _stream_batches(
        spark, e.schema, f"{wave1[:-1]}[{wave1[-1]}]", target,
        bcents, bslices,
    )
    blue_rows_pre = sorted(map(tuple, read_version(spark, blue).collect()))

    # retrain: green artifacts over EVERYTHING blue currently serves
    # (bulk + wave1), deeper Lloyd budget; bulk-build green beside blue
    served = e.where(~is_ingest).unionByName(early)
    gcents, _, _, _ = _ivf_train(spark, served, iters=GREEN_TRAIN_ITERS)
    gres = _residual_frame(served, gcents).select("vec_id", "embedding")
    gslices, _, _, _ = _pq_train(gres, iters=GREEN_TRAIN_ITERS)
    commit_version(
        spark,
        encode_ivfpq(served, gcents, gslices),
        green,
        stats_cols=["cell", "vec_id"],
        meta={"stage": "bulk-build", "lineage": "green"},
    )
    # the cutover: ONE OCC commit on the router
    commit_version(
        spark,
        spark.createDataFrame([("ann", green, "green")], _ROUTER_SCHEMA)
        .coalesce(1),
        router,
        meta={"stage": "cutover", "lineage": "green", "cutover_from": blue},
    )
    # phase 2: maintainer re-resolves through the router -> green now
    wave2 = f"{root}/wave2"
    late.repartition(2).write.parquet(wave2)
    target, lineage = _routed_index(spark, router)
    assert (target, lineage) == (green, "green")
    _stream_batches(
        spark, e.schema, f"{wave2[:-1]}[{wave2[-1]}]", target,
        gcents, gslices,
    )
    return dict(
        e=e, root=root, blue=blue, green=green, router=router,
        bcents=bcents, bslices=bslices, gcents=gcents, gslices=gslices,
        blue_rows_pre=blue_rows_pre, late=late,
    )


def test_no_arrival_lost_across_the_swap(spark, cutover_world):
    """Green ends exactly = from-scratch encode of the FULL corpus
    under green artifacts: wave1 arrivals came in via the retrain
    snapshot, wave2 via the redirected maintainer — nothing dropped,
    nothing doubled, across the cutover boundary."""
    w = cutover_world
    want = sorted(
        map(
            tuple,
            encode_ivfpq(w["e"], w["gcents"], w["gslices"]).collect(),
        )
    )
    got = sorted(map(tuple, read_version(spark, w["green"]).collect()))
    assert got == want


def test_old_lineage_untouched_and_time_travelable(spark, cutover_world):
    """The swap is metadata on the router only: blue's content is
    byte-identical to its pre-cutover snapshot, and router v1 still
    names it — rollback is a time-travel read."""
    w = cutover_world
    assert (
        sorted(map(tuple, read_version(spark, w["blue"]).collect()))
        == w["blue_rows_pre"]
    )
    v1 = read_version(spark, w["router"], 1).first()
    assert (v1["index_path"], v1["lineage"]) == (w["blue"], "blue")
    hdr = version_header(spark, w["router"], 2)
    assert hdr["cutover_from"] == w["blue"]


def test_serving_resolves_through_the_router(spark, cutover_world):
    """Retrieval through the ROUTED lineage equals retrieval through
    green directly — serving and maintainer share the one resolution
    step, so neither can lag the other after the swap."""
    w = cutover_world
    target, lineage = _routed_index(spark, w["router"])
    assert lineage == "green"
    routed = _knn_ivfpq_ranked(
        spark, SF_DIR, index_path=target,
        artifacts=(w["gcents"], w["gslices"]),
    )
    direct = _knn_ivfpq_ranked(
        spark, SF_DIR, index_path=w["green"],
        artifacts=(w["gcents"], w["gslices"]),
    )
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_concurrent_cutover_loses_the_occ_race_loudly(spark, cutover_world):
    """A second cutover attempt against the same router version fails
    with CommitConflict — never a silent double-swap."""
    w = cutover_world
    assert current_version(spark, w["router"]) == 2
    with pytest.raises(CommitConflict):
        # replaying the v2 claim: the slot is taken
        from otus_cpp_11_spark.ops.versioned import _claim_commit

        _claim_commit(spark, w["router"], 2, "stale cutover replay")


def test_forked_blue_maintainer_refused_without_its_checkpoint(
    spark, cutover_world
):
    """Post-cutover, blue still has maintainer commits; restarting a
    maintainer against it with a FRESH checkpoint must be refused
    loudly (batch ids would restart at 0 and drop/double arrivals) —
    the same guard that prevents accidental forks protects the
    decommissioned lineage."""
    w = cutover_world
    stream = (
        spark.readStream.schema(w["e"].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{w['root']}/wave1")
    )
    with pytest.raises(ValueError, match="checkpoint"):
        incremental_ann_index(stream, w["blue"], w["bcents"], w["bslices"])
