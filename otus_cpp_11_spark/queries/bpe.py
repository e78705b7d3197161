"""BPE tokenizer APPLY: run a trained byte-pair-encoding merge table over
the corpus and re-base token-budget operators on REAL tokenizer counts
(r4 verdict item 2 — whitespace tokens are not what a production pipeline
packs or mixes by).

The merge table below was trained with the classic BPE loop (argmax
adjacent-pair frequency over the word-count vocab, ties broken
lexicographically) on the sf0.1 documents corpus and frozen as a literal —
exactly how a real pipeline ships a pretrained tokenizer alongside the
code. `bpe_pair_counts` (queries/curation.py) demonstrates the training
side of the same algorithm in-engine.

APPLY algorithm: a word's characters are wrapped as " c " each (adjacent
tokens therefore separated by a double space), and each merge rule (x, y)
is one global leftmost-non-overlapping replace of " x  y " with " xy ",
applied in RANK ORDER. This is exactly greedy BPE: in a trained merge
table a rule's constituent tokens are only ever produced by EARLIER
rules, so applying rule k can never create a new occurrence of a rule
j < k (the merged token t_k cannot appear in rule j, and a merge never
makes its neighbors adjacent to each other) — hence one rank-ordered
pass per rule equals iterate-until-lowest-rank-fixpoint; within one
rule, leftmost-non-overlapping replacement equals BPE's leftmost merge
chaining ("aaa" -> [aa, a]). The identical REPLACE chain renders into
the DuckDB oracle, and tests/test_bpe.py property-checks both against a
literal Python implementation of greedy BPE.

Scale shape: the encode runs over the DISTINCT-WORD relation (vocab is
~log corpus — the same trick that makes BPE training feasible), then
joins token counts back onto the per-doc words. No broadcast hint on
that join: a web-scale corpus has a billion-term vocab (typos, numbers),
so the hint would OOM; AQE converts from the vocab relation's actual
runtime size (the doc_top_terms policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table, spread
from otus_cpp_11_spark.registry import register

# Trained on sf0.1 documents (31-word synthetic vocab, 270704 word
# occurrences); 32 merges. Regenerate with the training loop in
# tests/test_bpe.py::train_reference if the corpus generator changes.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "r"), ("s", "t"), ("o", "w"),
    ("t", "a"), ("l", "u"), ("m", "er"), ("a", "r"), ("p", "ar"),
    ("u", "p"), ("par", "k"), ("s", "park"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("g", "e"), ("mer", "ge"), ("b", "l"), ("bl", "e"),
    ("ta", "ble"), ("c", "o"), ("co", "lu"), ("colu", "m"),
    ("colum", "n"), ("c", "t"), ("ct", "or"), ("e", "ctor"),
    ("v", "ector"), ("a", "m"), ("e", "am"), ("r", "eam"),
]

BPE_PACK_BUDGET = 2048  # BPE tokens per packed training sequence
BPE_PACK_SHARD = 100  # docs per prefix-sum shard


def bpe_tokens_expr(word: Column) -> Column:
    """array<string> of BPE tokens for a lowercase [a-z]+ word column:
    char wrap + one literal replace per merge rule (32 chained JVM string
    ops, zero Python, zero regex in the hot loop — the wrap regex runs
    once per word)."""
    s = F.regexp_replace(word, "(.)", " $1 ")
    for x, y in BPE_MERGES:
        s = F.replace(s, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} "))
    return F.filter(F.split(s, " "), lambda t: t != F.lit(""))


def _bpe_apply_sql(expr: str) -> str:
    """The identical chain in DuckDB SQL, returning the token list."""
    s = f"REGEXP_REPLACE({expr}, '(.)', ' \\1 ', 'g')"
    for x, y in BPE_MERGES:
        s = f"REPLACE({s}, ' {x}  {y} ', ' {x}{y} ')"
    return f"LIST_FILTER(STRING_SPLIT({s}, ' '), t -> t <> '')"


_WORDS_SQL = """
  SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS word
  FROM documents
"""

_ENC_SQL = f"""
  SELECT word, {_bpe_apply_sql("word")} AS toks
  FROM (SELECT DISTINCT word FROM ({_WORDS_SQL}))
"""


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return spread(d).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )


def _vocab_token_counts(words: DataFrame) -> DataFrame:
    """(word, n_toks) over the distinct-word relation — the vocab-sized
    encode that makes tokenization linear in |vocab|, not |corpus|."""
    return (
        words.select("word")
        .distinct()
        .select("word", F.size(bpe_tokens_expr(F.col("word"))).alias("n_toks"))
    )


@register(
    "doc_bpe_token_stats",
    oracle=f"""
WITH words AS ({_WORDS_SQL}),
enc AS ({_ENC_SQL})
SELECT w.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(LEN(e.toks)) AS BIGINT) AS n_bpe_tokens
FROM words w JOIN enc e USING (word)
GROUP BY w.doc_id
ORDER BY doc_id
""",
    bench=True,
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real tokenizer token counts per document: the frozen BPE merge
    table applied to every word, aggregated per doc. THIS is the number a
    training pipeline budgets by (whitespace words undercount by the
    subword split factor). Plan: explode words (narrow), distinct-word
    encode (vocab-sized, 32 chained JVM replaces), unhinted join back
    (AQE broadcasts the vocab when it fits), one per-doc aggregate."""
    words = _doc_words(spark, sf_dir)
    vocab = _vocab_token_counts(words)
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "bpe_token_frequencies",
    oracle=f"""
WITH words AS ({_WORDS_SQL}),
wc AS (SELECT word, COUNT(*) AS n_occ FROM words GROUP BY word),
enc AS ({_ENC_SQL}),
tok AS (
  SELECT UNNEST(e.toks) AS token, w.n_occ
  FROM enc e JOIN wc w USING (word)
)
SELECT token, CAST(SUM(n_occ) AS BIGINT) AS total,
       ROW_NUMBER() OVER (ORDER BY SUM(n_occ) DESC, token) AS rank
FROM tok
GROUP BY token
ORDER BY rank
""",
)
def bpe_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency histogram under the trained tokenizer (the
    vocabulary-coverage / fertility report every tokenizer eval needs).
    Token explosion happens on the vocab relation WEIGHTED by word count
    — |vocab| x tokens-per-word rows, never |corpus| rows — then one
    aggregate; the token id space is the rank order."""
    words = _doc_words(spark, sf_dir)
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_occ"))
    enc = wc.select(
        "n_occ", F.explode(bpe_tokens_expr(F.col("word"))).alias("token")
    )
    w = Window.orderBy(F.desc("total"), F.asc("token"))
    return (
        enc.groupBy("token")
        .agg(F.sum("n_occ").cast("bigint").alias("total"))
        .withColumn("rank", F.row_number().over(w))
        .orderBy("rank")
    )


@register(
    "doc_pack_bins_bpe",
    oracle=f"""
WITH words AS ({_WORDS_SQL}),
enc AS ({_ENC_SQL}),
per_doc AS (
  SELECT w.doc_id, CAST(SUM(LEN(e.toks)) AS BIGINT) AS n_tokens
  FROM words w JOIN enc e USING (word)
  GROUP BY w.doc_id
),
toks AS (
  SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_excl
  FROM toks
)
SELECT CAST(FLOOR(CAST(cum_excl AS DOUBLE) / {BPE_PACK_BUDGET}) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cum
GROUP BY bin_id
ORDER BY bin_id
""",
    bench=True,
)
def doc_pack_bins_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing by REAL tokenizer budget: doc_pack_bins' two-phase
    distributed prefix sum (per-shard partials + tiny offset relation +
    within-shard window — no global single-partition window), re-based on
    BPE token counts so the 2048-token bins are the bins a trainer
    actually fills. Docs with no [a-z] words pack at zero cost (left
    join, count conservation holds). The offset relation stays hinted:
    |shards| = N/{BPE_PACK_SHARD} is bounded by construction, unlike a
    per-user dimension."""
    words = _doc_words(spark, sf_dir)
    vocab = _vocab_token_counts(words)
    per_doc = (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_toks").cast("bigint").alias("n_tokens"))
    )
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.floor(F.col("doc_id") / BPE_PACK_SHARD).alias("shard"),
        )
    )
    shard_totals = toks.groupBy("shard").agg(F.sum("n_tokens").alias("shard_sum"))
    shard_off = shard_totals.select(
        "shard",
        (
            F.sum("shard_sum").over(
                Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("shard_sum")
        ).alias("shard_offset"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = toks.join(F.broadcast(shard_off), "shard").select(
        "doc_id",
        "n_tokens",
        (
            F.col("shard_offset") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")
        ).alias("cum_excl"),
    )
    return (
        cum.groupBy(
            F.floor(F.col("cum_excl").cast("double") / BPE_PACK_BUDGET)
            .cast("bigint")
            .alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


@register(
    "source_token_fertility",
    oracle=f"""
WITH words AS (
  SELECT d.source, UNNEST(REGEXP_EXTRACT_ALL(LOWER(d.text), '[a-z]+')) AS word
  FROM documents d
),
enc AS ({_ENC_SQL})
SELECT w.source,
       COUNT(*) AS n_words,
       CAST(SUM(LEN(e.toks)) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(LEN(e.toks)) AS DOUBLE) / COUNT(*) AS fertility
FROM words w JOIN enc e USING (word)
GROUP BY w.source
ORDER BY w.source
""",
)
def source_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per word) by corpus source —
    the standard tokenizer-vs-domain health metric (fertility creep on a
    domain means the merge table underfits it and token budgets inflate).
    Same vocab-sized encode as every BPE query; fertility is an exact
    int/int division so both engines round identically."""
    d = load_table(spark, sf_dir, "documents")
    words = spread(d).select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    vocab = _vocab_token_counts(words)
    return (
        words.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
            (
                F.sum("n_toks").cast("double") / F.count(F.lit(1))
            ).alias("fertility"),
        )
        .orderBy("source")
    )
