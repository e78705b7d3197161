"""BPE tokenizer APPLY: property-check the rank-ordered replace scheme
(queries/bpe.py) against a literal Python implementation of greedy BPE
(repeatedly merge the lowest-rank applicable pair, leftmost first), and
check the merge-table well-formedness property the scheme's correctness
argument rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from otus_cpp_11_spark.queries.bpe import BPE_MERGES, bpe_tokens_expr

SF = "/root/testdata/sf0.01"


def ref_bpe(word: str) -> list[str]:
    """Greedy BPE apply, the definition: lowest-rank applicable merge
    anywhere in the word wins; leftmost occurrence of that merge first."""
    ranks = {p: i for i, p in enumerate(BPE_MERGES)}
    toks = list(word)
    while True:
        best, bi = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            return toks
        toks[bi : bi + 2] = [toks[bi] + toks[bi + 1]]


def test_merge_table_is_well_formed():
    # every rule's sides must be single chars or outputs of EARLIER rules:
    # this is the property that makes one rank-ordered pass per rule equal
    # to greedy BPE (rule k can never create work for rule j < k)
    produced: set[str] = set()
    for x, y in BPE_MERGES:
        for side in (x, y):
            assert len(side) == 1 or side in produced, (x, y, side)
        produced.add(x + y)
    # and the table has no duplicate rules (a duplicate would merge nothing
    # on its second application but signals a broken training run)
    assert len(set(BPE_MERGES)) == len(BPE_MERGES)


def test_spark_tokenization_matches_greedy_bpe(spark):
    # every distinct corpus word + adversarial shapes: overlapping chains
    # ("aaa" under a hypothetical (a,a)), rule-output adjacency, words with
    # no applicable merges, single chars
    corpus_words = [
        r["word"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .distinct()
        .collect()
    ]
    extra = [
        "q", "erer", "ererer", "sparkwindow", "windowwindow", "vectorvector",
        "upstream", "streamer", "instinct", "partition", "torch",
        "erinorstow", "stst", "ststst", "parpark", "wwindow",
    ]
    words = sorted(set(corpus_words + extra))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["toks"])
        for r in df.select("word", bpe_tokens_expr(F.col("word")).alias("toks")).collect()
    }
    for w in words:
        assert got[w] == ref_bpe(w), (w, got[w], ref_bpe(w))


def test_token_count_conservation(spark):
    # sum over docs of n_bpe_tokens == total tokens of every word occurrence
    from otus_cpp_11_spark.registry import all_queries

    qs = all_queries()
    stats = qs["doc_bpe_token_stats"].fn(spark, SF)
    total_docs = stats.agg(F.sum("n_bpe_tokens")).first()[0]
    freqs = qs["bpe_token_frequencies"].fn(spark, SF)
    total_vocab = freqs.agg(F.sum("total")).first()[0]
    assert total_docs == total_vocab
    # packing conserves docs and tokens
    bins = qs["doc_pack_bins_bpe"].fn(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    agg = bins.agg(F.sum("n_docs"), F.sum("total_tokens")).first()
    assert agg[0] == n_docs
    assert agg[1] == total_docs
