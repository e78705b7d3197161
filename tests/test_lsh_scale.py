"""Scale hardening for the LSH paths (VERDICT r1 items 7-8): multiprobe
ANN recall dominance and salted hot-bucket candidate generation
pair-set equivalence.
"""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_multiprobe_dominates_single_probe(spark):
    from otus_cpp_11_spark.queries.similarity import (
        ann_cosine_top10,
        lsh_cosine_top5,
        lsh_cosine_top5_multiprobe,
    )

    single = lsh_cosine_top5(spark, SF).collect()
    multi = lsh_cosine_top5_multiprobe(spark, SF).collect()

    # candidate set is a superset, so at every rank the multiprobe cosine
    # can only match or beat the single-probe one
    assert len(multi) >= len(single)
    for m, s in zip(multi, single):
        assert m.cosine >= s.cosine - 1e-12

    # recall vs the brute-force ground truth does not regress
    brute5 = {r.vec_id for r in ann_cosine_top10(spark, SF).collect()[:5]}
    recall_multi = len({r.vec_id for r in multi} & brute5)
    recall_single = len({r.vec_id for r in single} & brute5)
    assert recall_multi >= recall_single


def _pairs(df):
    return sorted((r.doc_a, r.doc_b) for r in df.collect())


def test_banded_candidates_hot_bucket_equivalence(spark):
    """Planted hot bucket: the grid path must produce EXACTLY the plain
    self-join pair set — no lost pairs (recall) and no duplicates
    (candidate-count blowup)."""
    from otus_cpp_11_spark.queries.dedup import banded_candidate_pairs

    rows = (
        [(i, 0, "HOT") for i in range(60)]  # one hot bucket: 60 docs
        + [(100 + i, 0, f"c{i % 5}") for i in range(25)]  # cold: 5 docs each
        + [(200 + i, 1, "HOT") for i in range(12)]  # same sig, other band
    )
    bands = spark.createDataFrame(rows, "doc_id long, band int, band_sig string")

    a, b = bands.alias("a"), bands.alias("b")
    plain = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_sig") == F.col("b.band_sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))

    salted = banded_candidate_pairs(bands, hot_threshold=10, num_salts=4)
    want = sorted(set(_pairs(plain)))
    got = _pairs(salted)
    assert got == want  # sorted + exact => no dups, no losses

    # degenerate salts: every doc in one grid row still yields equivalence
    one_salt = banded_candidate_pairs(bands, hot_threshold=10, num_salts=1)
    assert _pairs(one_salt) == want


def test_blocked_cosine_pairs_hot_block_equivalence(spark):
    """Planted hot label block: the salt-grid path must yield EXACTLY the
    plain blocked self-join's (pair, cosine) set (VERDICT r2 item 8)."""
    from otus_cpp_11_spark.queries.similarity import blocked_cosine_pairs

    rows = [(i, "HOT", [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(40)]
    rows += [(100 + i, f"c{i % 4}", [1.0, float(i + 1)]) for i in range(16)]
    e = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )

    def key(df):
        return sorted((r.vec_a, r.vec_b, r.label, r.cosine) for r in df.collect())

    plain = blocked_cosine_pairs(e, hot_threshold=10**9)  # never hot
    grid = blocked_cosine_pairs(e, hot_threshold=8, num_salts=4)
    assert key(grid) == key(plain)
    one_salt = blocked_cosine_pairs(e, hot_threshold=8, num_salts=1)
    assert key(one_salt) == key(plain)
