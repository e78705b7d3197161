"""BPE tokenizer APPLY: property-check the three formulations against
each other on the frozen PRODUCTION table (1024 rules) — the literal
greedy-BPE definition, the rank-ordered replace-chain semantics, and the
engine's Arrow-batched encoder — plus the merge-table well-formedness
property the chain/greedy equivalence argument rests on, and the
chain-expression face at its sub-crossover scale."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from otus_cpp_11_spark.queries.bpe import (
    BPE_MERGES,
    BPE_MERGES_SMALL,
    bpe_encode_vocab,
    bpe_tokens_expr,
    bpe_word_tokens,
)

SF = "/root/testdata/sf0.01"


def ref_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Greedy BPE apply, the definition: lowest-rank applicable merge
    anywhere in the word wins; leftmost occurrence of that merge first."""
    ranks = {p: i for i, p in enumerate(merges)}
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


def chain_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The replace-chain semantics, literally: char wrap then one global
    leftmost-non-overlapping replace per rule in rank order — Python
    ``str.replace`` has exactly the semantics of JVM/DuckDB REPLACE, so
    this is the reference for BOTH engine oracles."""
    s = "".join(f" {c} " for c in word)
    for x, y in merges:
        s = s.replace(f" {x}  {y} ", f" {x}{y} ")
    return [t for t in s.split(" ") if t]


def _sample_words() -> list[str]:
    """Corpus-shaped + adversarial + pseudo-random words (seeded)."""
    fixed = [
        "q", "erer", "ererer", "sparkwindow", "windowwindow", "vectorvector",
        "upstream", "streamer", "instinct", "partition", "torch",
        "erinorstow", "stst", "ststst", "parpark", "wwindow", "rezubu",
        "rezuburezubu", "tizu", "buti", "aaaa",
    ]
    rng = random.Random(7)
    syllables = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]
    rand = [
        "".join(rng.choice(syllables) for _ in range(rng.randint(1, 6)))
        for _ in range(200)
    ] + ["".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 12))) for _ in range(100)]
    return sorted(set(fixed + rand))


def test_merge_table_is_well_formed():
    # every rule's sides must be single chars or outputs of EARLIER rules:
    # this is the property that makes one rank-ordered pass per rule equal
    # to greedy BPE (rule k can never create work for rule j < k) — checked
    # on BOTH tables, so a regenerated bpe_merges.py is re-proven valid
    for merges in (BPE_MERGES, BPE_MERGES_SMALL):
        produced: set[str] = set()
        for x, y in merges:
            for side in (x, y):
                assert len(side) == 1 or side in produced, (x, y, side)
            produced.add(x + y)
        # and the table has no duplicate rules (a duplicate would merge
        # nothing on its second application but signals a broken training)
        assert len(set(merges)) == len(merges)
    assert len(BPE_MERGES) >= 1024  # the production-scale bar (r5 item 2)


def test_greedy_equals_chain_on_production_table():
    # the two formulations agree word-for-word on the 1024-rule table —
    # the equivalence the Spark-UDF-vs-DuckDB-chain oracle match rests on
    for w in _sample_words():
        assert bpe_word_tokens(w) == ref_bpe(w, BPE_MERGES), w
        assert bpe_word_tokens(w) == chain_bpe(w, BPE_MERGES), w
        # token concatenation is lossless
        assert "".join(bpe_word_tokens(w)) == w


def test_engine_encoder_matches_greedy_bpe(spark):
    # the Arrow-batched mapInPandas encoder, driven through Spark, equals
    # the literal greedy definition on every distinct corpus word + the
    # adversarial/random sample
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
    words = sorted(set(corpus_words + _sample_words()))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["toks"]) for r in bpe_encode_vocab(df).collect()
    }
    assert set(got) == set(words)
    for w in words:
        assert got[w] == ref_bpe(w, BPE_MERGES), (w, got[w])


def test_chain_expression_matches_greedy_at_small_scale(spark):
    # the Column-expression replace chain (the sub-crossover face, kept
    # for <100-rule tables where whole-stage codegen beats the UDF)
    # equals greedy BPE under ITS table
    words = _sample_words()
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["toks"])
        for r in df.select(
            "word", bpe_tokens_expr(F.col("word")).alias("toks")
        ).collect()
    }
    for w in words:
        assert got[w] == ref_bpe(w, BPE_MERGES_SMALL), (w, got[w])


def test_in_engine_trainer_reproduces_frozen_tables(spark):
    """The full tokenizer lifecycle closes: the in-engine trainer
    (distributed word-count -> bounded-vocab merge loop,
    ops/bpe_train.py) reproduces BPE_MERGES_SMALL byte-for-byte from the
    exact corpus it was trained on (sf0.1 documents), and the production
    table's freeze script runs the SAME loop (single-sourced import) —
    so both frozen literals are proven regenerable, not copy-pasted
    artifacts."""
    from otus_cpp_11_spark.ops.bpe_train import train_bpe_from_corpus
    from otus_cpp_11_spark.queries.bpe import _doc_words

    words = _doc_words(spark, "/root/testdata/sf0.1").select("word")
    got = train_bpe_from_corpus(words, len(BPE_MERGES_SMALL))
    assert got == BPE_MERGES_SMALL
    # freshly trained tables satisfy the closure property generically
    produced: set[str] = set()
    for x, y in got:
        for side in (x, y):
            assert len(side) == 1 or side in produced
        produced.add(x + y)


def test_trainer_min_frequency_tail_cut_is_sound(spark):
    """The production tail-cut knob: cutting singleton words from THIS
    corpus leaves the trained table unchanged (their counts never win an
    argmax round), while the collect guard trips when the cap is below
    the vocab size."""
    import pytest

    from otus_cpp_11_spark.ops.bpe_train import train_bpe_from_corpus
    from otus_cpp_11_spark.queries.bpe import _doc_words

    words = _doc_words(spark, SF).select("word")
    full = train_bpe_from_corpus(words, 16)
    cut = train_bpe_from_corpus(words, 16, min_frequency=2)
    assert cut == full
    with pytest.raises(ValueError, match="collect guard"):
        train_bpe_from_corpus(words, 4, max_vocab=3)


def test_token_id_sequences_conserve_counts_and_ids(spark):
    """The materialized token-id sequences agree with the count and
    histogram queries: per-doc sequence length == n_bpe_tokens, and the
    id multiset across all docs == the frequency histogram's totals."""
    from collections import Counter

    from otus_cpp_11_spark.registry import all_queries

    qs = all_queries()
    ids = {
        r["doc_id"]: [int(t) for t in r["token_ids_str"].split()]
        for r in qs["doc_bpe_token_ids"].fn(spark, SF).collect()
    }
    stats = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in qs["doc_bpe_token_stats"].fn(spark, SF).collect()
    }
    assert set(ids) == set(stats)
    for doc, seq in ids.items():
        assert len(seq) == stats[doc]
    id_counts = Counter(t for seq in ids.values() for t in seq)
    hist = {
        r["rank"]: r["total"]
        for r in qs["bpe_token_frequencies"].fn(spark, SF).collect()
    }
    assert dict(id_counts) == hist


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
