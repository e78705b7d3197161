"""Skew mitigation: salted join (driver extension mandate — scale path).

AQE's runtime skew-join splitting (on in ``session.get_spark``) handles
moderate skew transparently; salting is the explicit fallback for the
pathological case — one key carrying a double-digit percentage of a
fact-to-fact join, where even a split partition still hammers one task.

Mechanics: the skewed (big) side gets a deterministic salt in [0, S);
the other side is replicated S times with every salt value. The join key
becomes (key, salt), so the hot key's rows spread over S tasks. Cost:
S-fold replication of the small side — the knob trades replication for
parallelism and only the skewed side's cardinality stays untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Join types whose results survive salting unchanged: the replicated
# (other) side never contributes unmatched rows to any of these, so its
# num_salts-fold replication is invisible in the output. 'right'/'full'
# would emit one null-extended row PER SALT REPLICA for every unmatched
# `other` row — wrong by construction, hence rejected.
_SALTABLE = {"inner", "left", "left_outer", "semi", "left_semi", "anti", "left_anti"}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with the skewed side's
    hot keys spread across ``num_salts`` subtasks. Result is row-identical
    to ``skewed.join(other, on, how)`` for the supported join types (any
    ``how`` where unmatched ``other`` rows don't reach the output: inner /
    left / semi / anti). For right/full-outer, salt the other side instead
    (swap the arguments and mirror the join type).

    The salt is a deterministic hash of the whole skewed row (not rand()),
    so retried/speculated tasks salt identically — nondeterministic salts
    can duplicate or drop rows when a stage retries.
    """
    norm = how.replace("outer", "_outer").replace("__", "_").lower()
    if norm not in _SALTABLE:
        raise ValueError(
            f"salted_join: how={how!r} would replicate unmatched rows of the "
            f"salted dim {num_salts}x; supported: {sorted(_SALTABLE)}"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    s = skewed.withColumn("_salt", salt)
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return s.join(o, [on, "_salt"], how).drop("_salt")


def salted_topk(
    df: DataFrame,
    partition_cols: list[str],
    order: list,
    k: int,
    salt_on: str,
    cells: int = 16,
) -> DataFrame:
    """EXACT per-group top-k through two chained windows: a local top-k per
    (group, salt-cell) first, then the global per-group top-k over at most
    ``cells * k`` survivors. Row-identical to the single-window formulation
    (proven in tests) because pruning a row that is not in its CELL's top-k
    can never remove a row from the GROUP's top-k — but the heavy sort runs
    across ``cells`` tasks per group instead of funneling every candidate
    row in the corpus through one reducer per group. Use whenever the
    number of groups is small relative to the cluster (retrieval queries,
    anchor sets); ``order`` must be a total order (include a unique
    tie-break column) for a deterministic result.

    The salt is a deterministic hash of ``salt_on`` (a per-row id), never
    rand(): retried/speculated tasks must salt identically (same contract
    as salted_join)."""
    salt = F.pmod(F.crc32(F.col(salt_on).cast("string")), F.lit(cells))
    local = Window.partitionBy(*partition_cols, salt).orderBy(*order)
    final = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("_lrn", F.row_number().over(local))
        .where(F.col("_lrn") <= k)
        .drop("_lrn")
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
    )
