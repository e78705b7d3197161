"""Cache-retention contract of near_dup_pairs_minhash (VERDICT r1 item 5):
repeated dedup calls in a long-lived session must not accumulate cached
shingle RDDs, and release_shingle_cache() must drop the last one.
"""

SF = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_shingle_cache_is_single_slot_and_releasable(spark):
    from otus_cpp_11_spark.queries.dedup import (
        near_dup_pairs_minhash,
        release_shingle_cache,
    )

    release_shingle_cache()
    base = _n_persistent(spark)

    near_dup_pairs_minhash(spark, SF).count()
    after_one = _n_persistent(spark)
    assert after_one - base <= 1

    near_dup_pairs_minhash(spark, SF).count()
    after_two = _n_persistent(spark)
    assert after_two == after_one  # second call evicted the first cache

    release_shingle_cache()
    assert _n_persistent(spark) == base
