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

    # Untimed warmup to absorb one-time JVM init (codegen compiler, parquet
    # reader classes, shuffle machinery, JIT of the hot expression kernels)
    # — otherwise whichever query happens to run first is charged ~5-7s of
    # engine bring-up that has nothing to do with its plan. The warmup runs
    # on a 5-row parquet scan plus synthetic rows, NEVER on benchmark
    # tables, so no benchmark data is pre-read or cached.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).groupBy(
        "r_name"
    ).count().collect()
    from pyspark.sql import Window, functions as F

    w = spark.range(2000).select(
        F.col("id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i))))
                for i in range(8)
            ],
        ).alias("text"),
    )
    toks = w.select(
        "id",
        F.filter(
            F.split(F.regexp_replace(F.lower("text"), r"\s+", " "), " "),
            lambda x: x != F.lit(""),
        ).alias("ws"),
    ).select(
        "id", F.explode(F.transform(F.col("ws"), lambda t: F.md5(t))).alias("tok")
    )
    agg = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    joined = toks.join(agg, "tok").join(F.broadcast(w.select("id")), "id")
    joined.select(
        F.row_number().over(Window.partitionBy("tok").orderBy("id")).alias("rn")
    ).where(F.col("rn") == 1).count()

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
