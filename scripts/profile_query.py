"""Isolated per-query profiler (optimization round tooling, guide §1).

For each named registry query: run once untimed (warm JIT/page cache),
then time N noop-sink materializations (min reported — the bench.py floor
estimator), and write ``.explain('formatted')`` to
``plans/r13/<name>_<tag>.txt`` so plan-shape claims are auditable.

Usage: python scripts/profile_query.py <tag> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, PROFILE_RUNS.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from otus_cpp_11_spark.registry import all_queries  # noqa: E402
from otus_cpp_11_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    spark = get_spark(app_name=f"profile-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    from otus_cpp_11_spark.queries.bpe import release_bpe_caches
    from otus_cpp_11_spark.queries.dedup import release_dedup_caches

    qs = all_queries()
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    plans_dir.mkdir(parents=True, exist_ok=True)

    def cleanup() -> None:
        release_dedup_caches()
        release_bpe_caches()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            try:
                rdd.unpersist()
            except Exception:
                pass
        spark._jvm.System.gc()

    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        df = q.fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (plans_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        df.write.format("noop").mode("overwrite").save()
        best = None
        for i in range(runs):
            cleanup()
            time.sleep(1.0)
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"  run {i}: {dt:.3f}s", flush=True)
        cleanup()
        print(f"{name}\t{best:.3f}s  (min of {runs})", flush=True)


if __name__ == "__main__":
    main()
