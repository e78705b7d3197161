"""Query registry: the single source of truth mapping query names to
(Spark implementation, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here; the driver
contract (``__spark_entry__.py``) and the bench harness both read this
registry, so an operator exists exactly when it is correctness-gated.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash matches the oracle bit-for-bit):

* Sums of double columns go through an exact decimal cast first —
  ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`` — because floating-point
  summation order differs between engines (and between Spark partitions run
  to run); decimal addition is exact and associative, and the per-row
  double→decimal rounding of the *same* input value is identical in both
  engines. Averages are expressed as decimal-sum / count in double.
* Every LIMIT/top-k has a total tie-break order (append a unique key).
* Aggregate/computed columns are aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip(), bench)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    from otus_cpp_11_spark.queries import (  # noqa: F401
        curation,
        dedup,
        mapreduce_ops,
        multimodal,
        pandas_ops,
        pipeline,
        relational,
        rollup,
        similarity,
        text,
        timeseries,
        tpch_extra,
    )

    return dict(_REGISTRY)
