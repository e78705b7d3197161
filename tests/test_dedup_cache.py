"""Cache-retention contract of near_dup_pairs_minhash (VERDICT r1 item 5):
repeated dedup calls in a long-lived session must not accumulate cached
RDDs (one generation — shingles + bands — at most), and
release_dedup_caches() must drop even that.
"""

SF = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_dedup_cache_is_single_generation_and_releasable(spark):
    from otus_cpp_11_spark.queries.dedup import (
        near_dup_pairs_minhash,
        release_dedup_caches,
    )

    release_dedup_caches()
    base = _n_persistent(spark)

    near_dup_pairs_minhash(spark, SF).count()
    after_one = _n_persistent(spark)
    assert after_one - base <= 2  # shingles + bands, nothing else

    near_dup_pairs_minhash(spark, SF).count()
    after_two = _n_persistent(spark)
    assert after_two == after_one  # second call evicted the first generation

    release_dedup_caches()
    # <= not ==: `base` can include localCheckpoint RDDs left by earlier
    # tests in the shared session, and the ContextCleaner collects those
    # asynchronously — the dedup caches themselves must be gone, but
    # unrelated leftovers may ALSO have been cleaned meanwhile
    assert _n_persistent(spark) <= base
