"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose every operator registered in
``otus_cpp_11_spark.registry`` (the single source of truth — each operator
from SURVEY.md §2 registers its Spark implementation and its DuckDB oracle
SQL together).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


# SparkContext applicationIds that already received the package zip.
# Keyed on applicationId, NOT id(spark): a garbage-collected session's id()
# can be reused by a brand-new session, which would silently skip shipping
# and leave executors unable to import otus_cpp_11_spark helpers.
_SHIPPED_APPS: set[str] = set()
_ARCHIVE: str | None = None  # one zip per process, reused across sessions


def _package_archive() -> str:
    global _ARCHIVE
    if _ARCHIVE is None:
        import shutil
        import tempfile

        pkg_dir = Path(__file__).resolve().parent / "otus_cpp_11_spark"
        zip_base = Path(tempfile.mkdtemp(prefix="sg-pkg-")) / "otus_cpp_11_spark"
        _ARCHIVE = shutil.make_archive(
            str(zip_base), "zip", pkg_dir.parent, "otus_cpp_11_spark"
        )
    return _ARCHIVE


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session confs the engine relies on when the driver hands us an
    externally-built SparkSession (timezone for timestamp parity, nanos
    handling for the events table), and ship the package to executors so
    mapInPandas closures that reference module-level helpers resolve no
    matter what the driver's working directory is."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; catalog handles the fallback
    sc = spark.sparkContext
    if sc.applicationId not in _SHIPPED_APPS:
        # A shared context may already carry the archive (another entry
        # module instance shipped it): detect that from the context's own
        # resource list instead of pattern-matching exception messages, so
        # a genuine shipping failure always surfaces.
        archive = _package_archive()
        basename = Path(archive).name
        already = any(Path(f).name == basename for f in sc.listFiles)
        if not already:
            sc.addPyFile(archive)
        _SHIPPED_APPS.add(sc.applicationId)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary at sf0.001 (rows > 0,
    stable schema)."""
    from otus_cpp_11_spark.registry import all_queries

    _configure(spark)
    return all_queries()["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from otus_cpp_11_spark.registry import all_queries

    return {
        name: (lambda s, d, _fn=q.fn: _fn(_configure(s), d))
        for name, q in all_queries().items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for every oracle-expressible
    query (keys match ``queries()``; omissions are non-SQL-expressible ops
    that get the driver's rows-only check)."""
    from otus_cpp_11_spark.registry import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
