"""Query modules. Each module registers its queries into
``otus_cpp_11_spark.registry`` at import time; ``registry.all_queries()``
imports them all.

Shared helpers live here: order-independent, engine-independent aggregation
of double columns.

Why not plain SUM(double): float addition isn't associative, so Spark's
partition-parallel sum and DuckDB's sequential sum disagree in low bits.
Why not SUM(CAST(x AS DECIMAL)): the double→decimal cast *rounds*, and
Spark rounds HALF_UP while DuckDB rounds half-even — on the rare row whose
double value lands exactly on a representable tie (multiples of 2^-(s+1))
the two engines produce different decimals (observed on q1's sum_charge).

The fix used everywhere: scale by 10^s and FLOOR — flooring identical
doubles is identical in every engine, no rounding mode exists — then sum
the resulting integers exactly as DECIMAL(38,0), and divide back in double:

    CAST(SUM(CAST(FLOOR(x * 10^s) AS DECIMAL(38,0))) AS DOUBLE) / 10^s

This defines the query semantics as fixed-point at s digits, which is the
right call for money/quantity columns anyway.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, ndigits: int) -> Column:
    """Order/engine-independent sum of a double expression at fixed-point
    scale ``ndigits`` (see module docstring)."""
    f = 10**ndigits
    return F.sum(F.floor(col * F.lit(float(f))).cast("decimal(38,0)")).cast(
        "double"
    ) / F.lit(float(f))


def dsum_sql(expr: str, ndigits: int) -> str:
    """DuckDB mirror of :func:`dsum` for oracle SQL strings."""
    f = 10**ndigits
    return f"CAST(SUM(CAST(FLOOR(({expr}) * {f}.0) AS DECIMAL(38,0))) AS DOUBLE) / {f}.0"


def davg(col: Column, ndigits: int) -> Column:
    """Average as fixed-point sum / count, in double."""
    return dsum(col, ndigits) / F.count(col)


def davg_sql(expr: str, ndigits: int) -> str:
    return f"({dsum_sql(expr, ndigits)}) / COUNT({expr})"
