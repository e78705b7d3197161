"""Cache-retention contract of near_dup_pairs_minhash (VERDICT r1 item 5):
repeated dedup calls in a long-lived session must not accumulate cached
RDDs (one generation — shingles + bands — at most), and
release_dedup_caches() must drop even that.

The checks track the specific RDD ids each call persists, NOT the global
persistent-RDD count: the shared test session carries localCheckpoint
RDDs from earlier tests that the ContextCleaner collects at arbitrary
times, so any equality on the global count is a race (observed flaking
both on the final count and on the between-calls equality).
"""

SF = "/root/testdata/sf0.001"


def _ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_dedup_cache_is_single_generation_and_releasable(spark):
    from otus_cpp_11_spark.queries.dedup import (
        near_dup_pairs_minhash,
        release_dedup_caches,
    )

    release_dedup_caches()
    ids0 = _ids(spark)

    near_dup_pairs_minhash(spark, SF).count()
    gen1 = _ids(spark) - ids0
    assert len(gen1) <= 2  # shingles + bands, nothing else

    near_dup_pairs_minhash(spark, SF).count()
    ids2 = _ids(spark)
    gen2 = ids2 - ids0 - gen1
    assert len(gen2) <= 2
    assert not (gen1 & ids2)  # second call evicted the first generation

    release_dedup_caches()
    assert not ((gen1 | gen2) & _ids(spark))  # nothing of ours retained
