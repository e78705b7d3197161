"""Iterative graph operator: connected components by label propagation.

The reference's defining control-flow shape is the iterative driver loop —
re-run a full MapReduce job until a fixpoint (src/main.cpp:59-99, prefix
search). This module generalizes that shape to graphs: each iteration is
one Spark job (join + aggregate), the convergence test is a driver-side
count, and the loop lives in Python exactly like the reference's ``while``.

Scale notes:
* labels converge in O(diameter) rounds for min-label propagation; each
  round is one shuffle of |edges| on src plus one of |nodes| on id.
* ``localCheckpoint`` every few rounds truncates the lineage chain —
  without it the plan for round k replays rounds 1..k-1 and the DAG grows
  quadratically (the classic iterative-Spark failure mode).
* edges are cached once up front; they are reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 3


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Undirected connected components: returns ``[id, component]`` where
    component = min node id reachable from ``id``. Input edges may be
    directed/one-sided; they are symmetrized here. Nodes with no edges are
    absent (callers union isolated nodes if needed)."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .cache()
    )
    cached = (
        sym.select(F.col("s").alias("id")).distinct().withColumn("label", F.col("id"))
    ).cache()
    cached.count()
    labels = cached

    for i in range(max_iter):
        # min neighbor label per node, one join + one aggregate; the old
        # label rides along so convergence is a filter on the SAME cached
        # result — no extra join (and no extra shuffle) per round just to
        # detect the fixpoint.
        prop = (
            sym.join(labels, sym["s"] == labels["id"])
            .groupBy(F.col("d").alias("id2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, labels["id"] == prop["id2"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("old"),
            )
        ).cache()
        if i % CHECKPOINT_EVERY == CHECKPOINT_EVERY - 1:
            new_labels = new_labels.localCheckpoint()
        changed = new_labels.where(F.col("label") != F.col("old")).limit(1).count()
        cached.unpersist()
        cached = new_labels
        labels = new_labels.select("id", "label")
        if changed == 0:
            break

    sym.unpersist()
    return labels.select("id", F.col("label").alias("component"))
