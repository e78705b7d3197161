"""Iterative graph operator: connected components.

The reference's defining control-flow shape is the iterative driver loop —
re-run a full MapReduce job until a fixpoint (src/main.cpp:59-99, prefix
search). This module generalizes that shape to graphs with an ADAPTIVE
strategy, the same philosophy as Spark's broadcast-join threshold:

* **small edge sets** (≤ ``DRIVER_CC_MAX_EDGES``): collect and run
  union-find on the driver, return the labeling as a broadcast-sized
  DataFrame. A dedup pipeline's *verified* near-dup edges are ~|duplicate
  docs|, orders of magnitude smaller than the corpus — at 100 TB of
  documents the verified pair set is still typically < 10⁶ rows, and a
  driver union-find is microseconds versus seconds-per-round of
  distributed fixpoint scheduling. The result joins back into the corpus
  as an auto-broadcast dim.
* **large edge sets**: distributed min-label propagation with pointer
  jumping (label-of-label self-join), converging in O(log diameter)
  rounds; each round is one Spark job, the convergence test is a
  driver-side count — the reference's ``while`` loop shape.

Scale notes for the distributed path:
* every round FULLY materializes the new labels (a plain ``count`` over
  the changed-filter). A ``limit(1)`` early-exit probe would leave the
  round's cache partially filled, so later rounds would recompute missing
  partitions through k rounds of lineage — the classic quadratic
  iterative-Spark failure mode.
* ``localCheckpoint`` every few rounds truncates the lineage chain.
* edges are cached once up front; they are reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

CHECKPOINT_EVERY = 3
DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(rows, src: str, dst: str):
    """Plain union-find with path compression; component = min id."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row[src], row[dst]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(v, find(v)) for v in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Undirected connected components: returns ``[id, component]`` where
    component = min node id reachable from ``id``. Input edges may be
    directed/one-sided; they are symmetrized as needed. Nodes with no
    edges are absent (callers union isolated nodes if needed)."""
    e = edges.select(src, dst).cache()
    n_edges = e.count()

    if n_edges <= DRIVER_CC_MAX_EDGES:
        id_type = e.schema[src].dataType
        labeled = _driver_union_find(e.collect(), src, dst)
        e.unpersist()
        schema = StructType(
            [StructField("id", id_type), StructField("component", id_type)]
        )
        # r13: createDataFrame over a local list plans as Scan ExistingRDD
        # with NO size stats, so a downstream join against the corpus
        # picked SortMergeJoin — shuffling + sorting the corpus side to
        # meet a driver-local relation (corpus_curation_pipeline paid an
        # Exchange+Sort of its whole scored relation for this). The
        # driver path is bounded by DRIVER_CC_MAX_EDGES by construction,
        # so the broadcast hint is always safe HERE; the distributed
        # path below stays unhinted (labels are corpus-sized).
        return F.broadcast(e.sparkSession.createDataFrame(labeled, schema))

    sym = (
        e.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(e.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .cache()
    )
    cached = (
        sym.select(F.col("s").alias("id")).distinct().withColumn("label", F.col("id"))
    ).cache()
    cached.count()
    labels = cached

    for i in range(max_iter):
        # min neighbor label per node: one join + one aggregate; the old
        # label rides along so convergence is a filter on the SAME cached
        # result — no extra join per round just to detect the fixpoint.
        prop = (
            sym.join(labels, sym["s"] == labels["id"])
            .groupBy(F.col("d").alias("id2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        merged = labels.join(prop, labels["id"] == prop["id2"], "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("cand"),
            F.col("label").alias("old"),
        )
        # pointer jumping: labels are node ids, so label-of-my-label is a
        # self-join on the labels relation; chains halve every round.
        jump = labels.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        new_labels = (
            merged.join(jump, merged["cand"] == jump["pid"], "left")
            .select(
                "id",
                F.least(
                    F.col("cand"), F.coalesce(F.col("plabel"), F.col("cand"))
                ).alias("label"),
                "old",
            )
        ).cache()
        if i % CHECKPOINT_EVERY == CHECKPOINT_EVERY - 1:
            new_labels = new_labels.localCheckpoint()
        # FULL materialization (no limit-probe): fills the round's cache
        # completely so no later round reaches back through old lineage.
        changed = new_labels.where(F.col("label") != F.col("old")).count()
        cached.unpersist()
        cached = new_labels
        labels = new_labels.select("id", "label")
        if changed == 0:
            break

    sym.unpersist()
    e.unpersist()
    return labels.select("id", F.col("label").alias("component"))
