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

from pyspark.sql import DataFrame
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
