"""Morton (z-order) interleaving as plain integer column math — ONE home
for the bit-interleave used by the layout planner + z-cell-ordered
compaction accounting queries (queries.sampling) and the versioned
OPTIMIZE (ops.versioned.commit_compaction zorder mode), so the Spark expression
and its DuckDB oracle twin can never drift apart.

Why z-order: bucket each of two columns into 2^bits ranges, interleave
the bucket bits into one value, and cluster the layout on it — every
resulting cell's extent is provably <= 1/2^bits of EACH key's domain,
so per-file min/max stats become tight rectangles and a conjunctive
2-D predicate prunes files on BOTH dimensions, where a single-column
sort clusters one dimension and scans the full table for predicates on
the other. This is Delta OPTIMIZE ZORDER BY, exact in integer math.

Reference parity: extension mandate (the reference has no layout
management; CityAplons/otus-cpp-11 src/mapreduce.cpp writes round-robin
splits)."""

from __future__ import annotations

from pyspark.sql import functions as F

Z_BITS = 4  # 16 buckets per dimension -> 8-bit z-value, 256 cells


def z_interleave(px: str, py: str, bits: int = Z_BITS):
    """Morton-interleave two ``bits``-bit bucket-id columns (``px`` gets
    the odd bits). Pure div/mod integer math — exact in both engines."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.expr(f"(({px} div {2 ** i}) % 2) * {2 ** (2 * i + 1)}")
            + F.expr(f"(({py} div {2 ** i}) % 2) * {2 ** (2 * i)}")
        )
    return z


def z_sql(px: str = "px", py: str = "py", bits: int = Z_BITS) -> str:
    """DuckDB twin of ``z_interleave`` (// for integer division)."""
    return " + ".join(
        f"(({px} // {2 ** i}) % 2) * {2 ** (2 * i + 1)}"
        f" + (({py} // {2 ** i}) % 2) * {2 ** (2 * i)}"
        for i in range(bits)
    )
