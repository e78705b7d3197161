"""Benchmark harness: runs the headline queries (registry entries tagged
bench=True) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a warm-up is NOT used (the driver measures
cold-ish); timing covers plan + execution to a count/collect of the result.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from otus_cpp_11_spark.registry import all_queries  # noqa: E402
from otus_cpp_11_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # One tiny untimed query to absorb one-time JVM init (codegen compiler,
    # parquet reader classes, shuffle machinery) — otherwise whichever query
    # happens to run first is charged ~5s of engine bring-up that has
    # nothing to do with its plan. region is the smallest table (5 rows).
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).groupBy(
        "r_name"
    ).count().collect()

    timings: dict[str, float] = {}
    for name, q in all_queries().items():
        if not q.bench:
            continue
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        # force full materialization of the result set
        n = df.collect()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
