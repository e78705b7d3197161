"""Text-analysis operators over the documents table (driver extension
mandate: language-ID, quality scoring, token counting, fingerprinting —
SURVEY.md §2.2 'extension operators'). All pure Column expressions — JVM-side
whole-stage codegen; no Python in the hot path.

Determinism notes: every ratio is an int/int division in double (identical
IEEE results in Spark and DuckDB); regexes stick to ASCII classes shared by
Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.registry import register

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _tokens(col: str = "text"):
    """Whitespace tokens with empties dropped (lecture normalize+tokenize,
    description/MapReduce.cpp:91-102)."""
    return F.filter(F.split(F.col(col), " "), lambda x: x != F.lit(""))


@register(
    "doc_token_stats",
    oracle=f"""
SELECT doc_id,
       LEN(list_filter(string_split(text, ' '), x -> x <> ''))  AS n_tokens,
       LEN(regexp_extract_all(text, '[a-z]+|[0-9]+'))           AS n_word_pieces,
       LENGTH(text)                                             AS n_chars_measured
FROM documents
ORDER BY doc_id
""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a regex word-piece count (the
    BPE-ish pretokenizer shape) + char length, per document."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).alias(
            "n_word_pieces"
        ),
        F.length("text").alias("n_chars_measured"),
    ).orderBy("doc_id")


@register(
    "doc_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         LEN(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         LEN(list_filter(string_split(text, ' '),
                         x -> x IN ({_STOP_SQL}))) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CASE WHEN n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.05
            THEN 1 ELSE 0 END AS quality_ok
FROM t
ORDER BY doc_id
""",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length + stopword-ratio heuristics (the classic
    pretraining-corpus filters, e.g. C4-style), as pure column math."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop_lits = [F.lit(w) for w in STOPWORDS]
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin([*STOPWORDS]))
    )
    n_tokens = F.size(toks)
    ratio = n_stop.cast("double") / n_tokens
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        ratio.alias("stopword_ratio"),
        F.when((n_tokens >= 20) & (ratio >= 0.05), 1).otherwise(0).alias("quality_ok"),
    ).orderBy("doc_id")


@register(
    "doc_lang_id",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         LEN(list_filter(string_split(LOWER(text), ' '),
                         x -> x IN ({_STOP_SQL}))) AS en_hits,
         LEN(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN n_tokens > 0 AND CAST(en_hits AS DOUBLE) / n_tokens >= 0.02
            THEN 'en' ELSE 'und' END AS lang_pred
FROM t
ORDER BY doc_id
""",
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-hit-rate heuristic (n-gram/dictionary LID in
    its simplest deterministic form), compared against the table's lang
    label downstream in tests."""
    d = load_table(spark, sf_dir, "documents")
    lowered = F.split(F.lower(F.col("text")), " ")
    en_hits = F.size(F.filter(lowered, lambda x: x.isin([*STOPWORDS])))
    n_tokens = F.size(F.filter(lowered, lambda x: x != F.lit("")))
    return d.select(
        "doc_id",
        "lang",
        F.when(
            (n_tokens > 0) & (en_hits.cast("double") / n_tokens >= 0.02), "en"
        )
        .otherwise("und")
        .alias("lang_pred"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
ORDER BY doc_id
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text — the exact-dedup key (content-defined fingerprints; rolling-hash
    shingles live in the MinHash pipeline in ops/dedup)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fingerprint"),
    ).orderBy("doc_id")
