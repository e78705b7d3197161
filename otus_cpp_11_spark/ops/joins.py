"""Custom join operators Spark lacks as built-ins: as-of join and
bounded range join (driver extension mandate — the reference has no joins
at all, SURVEY.md §2.2 'Joins: none').

Both are compositions of existing DataFrame ops (the mandate's preferred
strategy (a)) — no Python in the row path, no UDFs.

Scale rationale:

* ``asof_join`` uses the union+window formulation: ONE shuffle of
  |left|+|right| rows on the key, then a per-partition ordered scan with
  ``last(..., ignorenulls=True)``. The naive formulation (inequality join
  then max_by per left row) shuffles the same data but materializes every
  (left, earlier-right) pair before aggregating — quadratic per key in the
  worst case. The union+window plan is linear and skew degrades to a big
  sort, not a big cross product.
* ``range_join_within`` buckets time into window-width cells and
  replicates the LEFT side into its cell and the next one, so candidates
  join on (key, cell) — an equi-join whose fan-out is bounded by cell
  population, never the full per-key cross product. Replication factor is
  exactly 2 regardless of window width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from otus_cpp_11_spark.catalog import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest ``right_time <= left_time`` for the same ``on`` key (ties on
    time include equal timestamps; left rows with no earlier right row get
    NULLs — i.e. a LEFT as-of join).

    Right-side ties on (on, right_time) must be resolved by the caller
    (e.g. pre-aggregate) — which row wins is otherwise plan-dependent.
    Emits all left columns plus ``prefix + c`` for each requested right
    column.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # _side orders right rows before left rows at equal timestamps, so an
    # exactly-simultaneous right row is visible to the left row (<=).
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = matched.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str,
    left_time: str = "ts",
    right_time: str = "ts",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Bounded range join: pairs (l, r) with the same ``on`` key and
    ``l.left_time < r.right_time <= l.left_time + window``. ``window`` is a
    SQL interval string like ``'6 hours'``.

    Implemented as a time-bucketed equi-join: with cell width = window, a
    qualifying right row lives in the left row's cell or the next one, so
    the left side is replicated into exactly those two cells and the join
    key becomes (on, cell) — candidate fan-out is bounded by cell
    population, not per-key row count.
    """
    win = F.expr(f"INTERVAL {window}")
    width_us = F.unix_micros(F.to_timestamp(F.lit("1970-01-01")) + win)
    lt = epoch_us(F.col(left_time))
    rt = epoch_us(F.col(right_time))
    l = left.select(
        F.col(on).alias("_k"),
        F.explode(
            F.array(F.floor(lt / width_us), F.floor(lt / width_us) + 1)
        ).alias("_cell"),
        F.col(left_time).alias("_lt"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.floor(rt / width_us).alias("_cell"),
        F.col(right_time).alias("_rt"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    # Each right row carries exactly one cell and the left row is replicated
    # into two distinct cells, so every qualifying pair joins exactly once.
    pairs = l.join(r, ["_k", "_cell"]).where(
        (F.col("_rt") > F.col("_lt")) & (F.col("_rt") <= F.col("_lt") + win)
    )
    return pairs.drop("_k", "_cell", "_lt", "_rt")
