"""Corpus-curation operators a pretraining-data pipeline runs beyond basic
quality filters (driver extension mandate — SURVEY.md §2.2 'extension
operators'): benchmark decontamination, repetition-based quality signals
(Gopher-style), and corpus-relative term weighting.

Like queries/text.py, these are generalizations of the reference's
tokenize-then-aggregate shape (description/MapReduce.cpp:91-150): every
operator is normalize → explode n-grams/tokens → hash aggregate → join,
all JVM-side Column expressions.

Determinism notes (cross-engine hash match): ratios are int/int division
in double; term weighting uses reciprocal document frequency (cnt/df, an
exact int/int division) instead of ln(N/df) because transcendental
functions are not guaranteed identically rounded across engines.

Scale notes:
* decontamination broadcasts the eval-set n-grams only after a metadata
  probe confirms they fit executor memory (eval_index_fits_broadcast);
  when they do, the corpus side streams map-side with zero shuffle of
  corpus text; when they don't, the join degrades to sort-merge instead
  of OOMing.
* repetition stats shuffle (doc_id, bigram) pairs once; partial
  aggregation collapses repeats map-side before the exchange.
* top-terms leaves the tf⋈df join strategy to AQE: the df relation's
  true size is only known after its aggregate runs, and AQE converts to
  broadcast at runtime when it is small (vocab grows ~log corpus) while
  keeping sort-merge for billion-term vocabularies — no forced hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries.dedup import (
    BLAST_MAX_HOPS,
    SHINGLE_WORDS,
    _NEAR_PAIRS_CTES,
    _NORM_SQL,
    _cache,
    _normalized,
    _word_shingles,
    _word_shingles_raw,
    near_dup_pairs_minhash,
    release_dedup_caches,
)
from otus_cpp_11_spark.registry import register

DECON_NGRAM = 5
DECON_MIN_SHARED = 3
EVAL_MOD = 10  # doc_id % EVAL_MOD == 0 plays the held-out benchmark set

# Broadcast the eval n-gram index only while it plausibly fits executor
# memory: 8M chars of eval text ≈ 40M shingle-chars (k=5 overlapping
# grams) ≈ low hundreds of MB as a JVM hash relation — the sane ceiling.
# Above it the query degrades to a shuffle join instead of OOMing every
# executor (the r3 verdict's scale finding: the testdata models the eval
# set as 10% of the corpus, so "benchmarks are tiny" does not hold for
# the query as written — the hint must be size-gated, not assumed).
DECON_BROADCAST_MAX_EVAL_CHARS = 8 << 20


def eval_index_fits_broadcast(docs: DataFrame) -> bool:
    """Cheap driver probe deciding the decontamination join strategy: one
    column-pruned aggregate over the eval slice's n_chars metadata column
    (no text is read). A planned broadcast join is worth a probe job: AQE
    can also convert at runtime, but only after the corpus side's shuffle
    map stage has already written corpus-shingle-sized output — at 100 TB
    that write IS the bottleneck, so deciding before planning matters."""
    chars = (
        docs.where(F.col("doc_id") % EVAL_MOD == 0)
        .agg(F.sum("n_chars"))
        .first()[0]
        or 0
    )
    return chars <= DECON_BROADCAST_MAX_EVAL_CHARS


def _shingles_sql(k: int) -> str:
    """DuckDB word-k-gram CTE mirroring dedup._word_shingles."""
    gram = " || ' ' || ".join(f"w[i+{off}]" for off in range(k))
    return f"""
  SELECT doc_id, UNNEST(LIST_DISTINCT([{gram}
                 FOR i IN RANGE(1, GREATEST(LEN(w) - {k - 1}, 0) + 1)])) AS shingle
  FROM (SELECT doc_id,
               LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '') AS w
        FROM documents) t
"""


@register(
    "benchmark_decontamination",
    oracle=f"""
WITH shingles AS ({_shingles_sql(DECON_NGRAM)}),
eval_grams AS (
  SELECT doc_id AS eval_doc_id, shingle FROM shingles
  WHERE doc_id % {EVAL_MOD} = 0
),
hits AS (
  SELECT c.doc_id, c.shingle, e.eval_doc_id
  FROM shingles c JOIN eval_grams e USING (shingle)
  WHERE c.doc_id % {EVAL_MOD} <> 0
)
SELECT doc_id,
       COUNT(DISTINCT shingle) AS n_shared_ngrams,
       COUNT(DISTINCT eval_doc_id) AS n_eval_docs_hit
FROM hits
GROUP BY doc_id
HAVING COUNT(DISTINCT shingle) >= {DECON_MIN_SHARED}
ORDER BY doc_id
""",
    bench=True,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >= 3 word-5-grams
    with any held-out eval doc (doc_id % 10 == 0 plays the benchmark set).
    The eval n-gram index is broadcast WHEN IT FITS — a metadata probe
    (eval_index_fits_broadcast) sums the eval slice's n_chars and only
    then plants the hint, so the corpus side is a map-side join with zero
    shuffle of corpus-sized data at benchmark-decontamination scale, while
    an eval side that outgrows executor memory degrades to a shuffle join
    instead of OOMing. Shingles are RAW occurrences (_word_shingles_raw):
    both aggregates and the oracle count DISTINCT themselves, so per-doc
    set construction would be wasted work."""
    d = load_table(spark, sf_dir, "documents")
    grams = _word_shingles_raw(d, DECON_NGRAM)
    eval_grams = grams.where(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    if eval_index_fits_broadcast(d):
        eval_grams = F.broadcast(eval_grams)
    hits = grams.where(F.col("doc_id") % EVAL_MOD != 0).join(eval_grams, "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_ngrams"),
            F.count_distinct("eval_doc_id").alias("n_eval_docs_hit"),
        )
        .where(F.col("n_shared_ngrams") >= DECON_MIN_SHARED)
        .orderBy("doc_id")
    )


_QUARANTINE_RECURSION_SQL = f"""
uedges AS (
  SELECT doc_a AS s, doc_b AS d FROM near_pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM near_pairs
),
qreach(id, hop) AS (
  SELECT doc_id, 0 FROM flagged
  UNION ALL
  SELECT DISTINCT e.d, r.hop + 1
  FROM qreach r JOIN uedges e ON e.s = r.id
  WHERE r.hop < {BLAST_MAX_HOPS}
)
SELECT id AS doc_id, CAST(MIN(hop) AS BIGINT) AS hops
FROM qreach
GROUP BY id
ORDER BY doc_id"""


@register(
    "quarantine_blast_sweep",
    oracle=f"""
WITH RECURSIVE {_NEAR_PAIRS_CTES},
dshingles AS ({_shingles_sql(DECON_NGRAM)}),
deval AS (
  SELECT doc_id AS eval_doc_id, shingle FROM dshingles
  WHERE doc_id % {EVAL_MOD} = 0
),
flagged AS (
  SELECT c.doc_id
  FROM dshingles c JOIN deval e USING (shingle)
  WHERE c.doc_id % {EVAL_MOD} <> 0
  GROUP BY c.doc_id
  HAVING COUNT(DISTINCT shingle) >= {DECON_MIN_SHARED}
),{_QUARANTINE_RECURSION_SQL}
""",
)
def quarantine_blast_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production quarantine sweep, composed end to end: seeds are
    the decontamination hits (corpus docs sharing >= {DECON_MIN_SHARED}
    word-{DECON_NGRAM}-grams with the held-out benchmark slice —
    ``benchmark_decontamination`` verbatim), and the sweep expands them
    through the LSH-verified near-dup graph to everything within
    {BLAST_MAX_HOPS} hops, because a contaminated document's near
    duplicates (and THEIR near duplicates) carry the same leaked
    content even when their own n-gram overlap with the benchmark
    falls under the flagging threshold — the well-known decontam gap
    that paraphrased or truncated copies slip through. Output is
    (doc_id, min hop): hop 0 = directly flagged, hop k = quarantined by
    graph proximity; a training run drops them all.

    Same execution discipline as ``dup_blast_radius`` (Spark runs the
    WITH RECURSIVE natively; per-step DISTINCT + hop bound make
    UNION ALL recursion terminate with frontier-sized levels), but the
    seed relation is now a real upstream operator instead of a
    convention — the recursion composes with any flagging query. At
    100 TB: decontam's broadcast eval index and the LSH pair
    verification are the corpus-sized costs (both already benched);
    the sweep itself touches only the contamination neighborhood."""
    flagged = benchmark_decontamination(spark, sf_dir).select("doc_id")
    pairs = near_dup_pairs_minhash(spark, sf_dir).select("doc_a", "doc_b")
    flagged.createOrReplaceTempView("sg_quarantine_seeds")
    pairs.createOrReplaceTempView("sg_quarantine_pairs")
    return spark.sql(
        "WITH RECURSIVE "
        + _QUARANTINE_RECURSION_SQL.lstrip()
        .replace("FROM near_pairs", "FROM sg_quarantine_pairs")
        .replace("FROM flagged", "FROM sg_quarantine_seeds")
    )


@register(
    "doc_repetition_stats",
    oracle="""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS w
  FROM documents
),
bigrams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
  FROM (SELECT doc_id, w, UNNEST(RANGE(1, GREATEST(LEN(w) - 1, 0) + 1)) AS i
        FROM words) t
),
bg_counts AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bigram
),
bg AS (
  SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams
  FROM bg_counts GROUP BY doc_id
)
SELECT w.doc_id,
       LEN(w.w) AS n_tokens,
       CAST(LEN(LIST_DISTINCT(w.w)) AS DOUBLE) / LEN(w.w) AS distinct_token_ratio,
       bg.top_bigram_count,
       CAST(bg.top_bigram_count AS DOUBLE) / bg.n_bigrams AS top_bigram_frac
FROM words w JOIN bg ON w.doc_id = bg.doc_id
WHERE LEN(w.w) >= 2
ORDER BY w.doc_id
""",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher-style filters): distinct-token
    ratio and most-frequent-bigram fraction per document. High repetition is
    the strongest single low-quality indicator in web corpora. One shuffle
    of (doc_id, bigram) with map-side partial aggregation."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("w"),
    ).where(F.size("w") >= 2)
    n = F.size("w")
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
                ),
            )
        ).alias("bigram"),
    )
    bg = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams"))
    )
    return (
        words.select(
            "doc_id",
            n.alias("n_tokens"),
            (F.size(F.array_distinct("w")).cast("double") / n).alias(
                "distinct_token_ratio"
            ),
        )
        .join(bg, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "distinct_token_ratio",
            "top_bigram_count",
            (
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


TOP_TERMS_K = 3


@register(
    "doc_top_terms",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tf) GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.cnt, df.df,
         CAST(tf.cnt AS DOUBLE) / df.df AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY CAST(tf.cnt AS DOUBLE) / df.df DESC, tf.term) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, rank, term, cnt, df, score
FROM scored WHERE rank <= {TOP_TERMS_K}
ORDER BY doc_id, rank
""",
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative top terms per document (keyword extraction): term
    weight = term count / document frequency — the tf-idf shape with a
    reciprocal-df weighting so the score is an exact int/int division
    (ln(N/df) is not identically rounded across engines). Two hash
    aggregates; the tf⋈df join strategy is AQE's call: df is usually
    vocabulary-sized (~log corpus) and AQE broadcast-converts it at
    runtime from its shuffle-stage statistics, but a web-scale corpus has
    a billion-term vocab (typos, numbers) where a forced broadcast hint
    would OOM — so no hint is planted (r3 verdict scale finding). The tf
    side's map outputs are read via AQE's local shuffle reader on
    conversion, and tf is vocab-×-docs-sized, far smaller than the
    corpus text itself."""
    d = load_table(spark, sf_dir, "documents")
    norm = _normalized()
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(norm, " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    df_rel = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("cnt").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(df_rel, "term")
        .select("doc_id", "term", "cnt", "df", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_TERMS_K)
        .select("doc_id", "rank", "term", "cnt", "df", "score")
        .orderBy("doc_id", "rank")
    )


BPE_TOP = 20


@register(
    "bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS word FROM documents
),
wc AS (SELECT word, COUNT(*) AS n FROM words GROUP BY word),
pos AS (
  SELECT word, n, UNNEST(RANGE(1, LENGTH(word))) AS i FROM wc WHERE LENGTH(word) >= 2
),
pairs AS (
  SELECT SUBSTRING(word, CAST(i AS INT), 2) AS pair,
         CAST(SUM(n) AS BIGINT) AS total
  FROM pos GROUP BY 1
)
SELECT pair, total,
       ROW_NUMBER() OVER (ORDER BY total DESC, pair) AS rank
FROM pairs
ORDER BY rank
LIMIT {BPE_TOP}
""",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First round of BPE tokenizer training: corpus-wide adjacent
    character-pair frequencies (the argmax pair is the first merge rule).
    Pair positions explode over the DISTINCT-word relation weighted by word
    frequency — the explode touches |vocab| rows, not |corpus| tokens,
    which is the standard trick that makes BPE training feasible at scale
    (vocab grows ~log corpus). Two hash aggregates, one top-k."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("word")
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        wc.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "n",
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("total"))
    )
    w = Window.orderBy(F.desc("total"), F.asc("pair"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BPE_TOP)
        .orderBy("rank")
    )


@register(
    "doc_novelty_score",
    oracle=f"""
WITH shingles AS ({_shingles_sql(SHINGLE_WORDS)}),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM shingles GROUP BY shingle)
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_first_seen,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty_ratio
FROM shingles s JOIN first f USING (shingle)
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
)
def doc_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's word-trigram shingles
    whose corpus-wide FIRST occurrence (min doc_id — ingestion order) is
    this doc. Exact copies and boilerplate-heavy docs score ~0, fresh
    content ~1 — the 'marginal contribution' signal a dedup-aware sampler
    weights by (complements pairwise near-dup detection, which only says
    WHO collides, not how much new text a doc adds).

    Two hash aggregates and one equi-join, all keyed on shingle then
    doc_id: the min-doc_id relation is vocabulary-sized, the join is
    co-partitioned with the first agg's output (AQE reuses the exchange),
    and nothing ever pairs docs with docs — cost is O(corpus shingles),
    immune to duplicate-cluster size, where a pairwise formulation
    degenerates quadratically on heavy boilerplate."""
    d = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(d, SHINGLE_WORDS)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_first_seen"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_first_seen",
            (F.col("n_first_seen").cast("double") / F.col("n_shingles")).alias(
                "novelty_ratio"
            ),
        )
        .orderBy("doc_id")
    )


SPAN_TOKENS = 5  # minimum duplicated token run = one SPAN_TOKENS-gram


def _positioned_grams_sql(k: int) -> str:
    """DuckDB CTE body: every word-k-gram occurrence WITH its 1-based token
    position (the positioned twin of _shingles_sql)."""
    gram = " || ' ' || ".join(f"w[pos+{off}]" for off in range(k))
    return f"""
  SELECT doc_id, pos, {gram} AS gram
  FROM (SELECT doc_id, w, UNNEST(RANGE(1, GREATEST(LEN(w) - {k - 1}, 0) + 1)) AS pos
        FROM (SELECT doc_id,
                     LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '') AS w
              FROM documents) base) t
"""


_SPANS_SQL = f"""
grams AS ({_positioned_grams_sql(SPAN_TOKENS)}),
first AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram),
dup AS (
  SELECT g.doc_id, g.pos, f.first_doc
  FROM grams g JOIN first f USING (gram)
  WHERE f.first_doc < g.doc_id
),
marked AS (
  SELECT doc_id, pos, first_doc,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {SPAN_TOKENS} THEN 0 ELSE 1 END AS is_start
  FROM dup
),
runs AS (
  SELECT doc_id, pos, first_doc,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS run
  FROM marked
),
spans AS (
  SELECT doc_id,
         MIN(pos) AS span_start,
         MAX(pos) - MIN(pos) + {SPAN_TOKENS} AS span_len,
         COUNT(*) AS n_dup_grams,
         MIN(first_doc) AS source_doc
  FROM runs GROUP BY doc_id, run
)
"""


def _positioned_grams(df: DataFrame) -> DataFrame:
    """(doc_id, pos, gram): every word-SPAN_TOKENS-gram occurrence of the
    normalized text with its 1-based token position. Same zip_with-slices
    construction as dedup._word_shingle_arrays (see its docstring for why
    not transform/element_at); posexplode keeps the position the slices
    trick would otherwise discard."""
    from otus_cpp_11_spark.catalog import spread

    k = SPAN_TOKENS
    wdf = spread(df).select(
        "doc_id",
        F.filter(F.split(_normalized(), " "), lambda x: x != F.lit("")).alias("w"),
    )
    w = F.col("w")
    m = F.greatest(F.size(w) - (k - 1), F.lit(0))
    acc = F.slice(w, 1, m)
    for off in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(w, off + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return wdf.select("doc_id", F.posexplode(acc).alias("pos0", "gram")).select(
        "doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "gram"
    )


def _repeated_spans(d: DataFrame) -> DataFrame:
    """Maximal repeated token spans (the distributed shape of Lee et al.
    2022, 'Deduplicating Training Data Makes Language Models Better' — the
    suffix-array ExactSubstr dedup, re-expressed as sorted shingle
    attribution so it distributes):

    1. every k-token gram occurrence keeps its in-doc position;
    2. a gram's ATTRIBUTION is the minimum doc_id containing it
       (ingestion order — the doc that gets to keep the text);
    3. a position is DUPLICATED iff its gram also occurs in an earlier
       doc; consecutive duplicated positions within a doc merge into
       maximal spans (gap <= k keeps coverage contiguous: grams at p and
       p+k cover adjacent token ranges [p, p+k-1] and [p+k, p+2k-1]).

    Returns (doc_id, span_start, span_len, n_dup_grams, source_doc) where
    span_len counts TOKENS covered and source_doc is the earliest doc any
    gram in the span was first seen in.

    Scale: the gram relation is O(corpus tokens) and shuffles exactly ONCE
    on gram — attribution is min(doc_id) OVER (PARTITION BY gram), not an
    aggregate-plus-self-join. The window form halves the plan: the
    agg+join formulation scanned and shingled the corpus twice (Spark
    does not reuse an exchange whose sibling has a partial aggregate
    below it — measured: 2 scans, 0 ReusedExchange) and shuffled the gram
    relation into both sides of a sort-merge join; the window shuffles it
    once and sorts within partitions (measured 1.6 s -> 1.07 s at sf0.1,
    identical results). Skew boundary of the window form: a hot gram's
    rows land in one window partition, so it skews the stage only when a
    SINGLE 5-gram's occurrence count rivals a whole shuffle partition
    (~corpus_tokens / shuffle_partitions — at 100 TB with 1e5 reduce
    partitions, one gram in ~0.005% of ALL tokens; ordinary boilerplate
    sits orders of magnitude below). For a corpus where ultra-hot
    template grams do cross that line, the skew-immune formulation is
    the cached agg+join (persist grams once, groupBy-min — the partial
    aggregate collapses the hot gram map-side; measured 1.24 s vs
    0.92 s here, identical results), at the price of materializing the
    gram relation. The duplicated-position relation — usually a
    small fraction of the corpus — then shuffles once on doc_id where one
    window pass computes both the run-break flag and the running run-id
    (same partition/order spec). Nothing ever pairs docs with docs, so
    cost is linear in corpus size, immune to duplicate-cluster blowup —
    at 100 TB this is the standard distributed approximation of the
    suffix-array family (a true suffix array is single-node; k-gram
    attribution finds the same >= k-token repeats, fragmenting only spans
    with internal period < k)."""
    grams = _positioned_grams(d)
    dup = (
        grams.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("gram"))
        )
        .where(F.col("first_doc") < F.col("doc_id"))
        .select("doc_id", "pos", "first_doc")
    )
    wo = Window.partitionBy("doc_id").orderBy("pos")
    is_start = F.when(
        F.col("pos") - F.lag("pos").over(wo) <= SPAN_TOKENS, F.lit(0)
    ).otherwise(F.lit(1))
    run = F.sum("is_start").over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dup.withColumn("is_start", is_start)
        .withColumn("run", run)
        .groupBy("doc_id", "run")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + SPAN_TOKENS).alias("span_len"),
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.min("first_doc").alias("source_doc"),
        )
        .select("doc_id", "span_start", "span_len", "n_dup_grams", "source_doc")
    )


@register(
    "doc_repeated_spans",
    oracle=f"""
WITH {_SPANS_SQL}
SELECT doc_id, span_start, span_len, n_dup_grams, source_doc
FROM spans
ORDER BY doc_id, span_start
""",
    bench=True,
)
def doc_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sequence exact substring dedup, detection half (Lee et al.
    ExactSubstr shape — see _repeated_spans): every maximal cross-document
    repeated token span of >= SPAN_TOKENS tokens, with the earliest doc
    that owns the text. Document-level dedup (exact/MinHash/SimHash) asks
    'is this DOC a copy'; this asks 'which PARTS of this doc are copies' —
    the strongest known dedup lever for LM training data."""
    d = load_table(spark, sf_dir, "documents")
    return _repeated_spans(d).orderBy("doc_id", "span_start")


@register(
    "repeated_span_strip_stats",
    oracle=f"""
WITH {_SPANS_SQL},
tok AS (
  SELECT doc_id,
         LEN(LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         CAST(SUM(span_len) AS BIGINT) AS tokens_removed
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       COALESCE(a.n_spans, 0) AS n_spans,
       COALESCE(a.tokens_removed, 0) AS tokens_removed,
       CASE WHEN t.n_tokens = 0 THEN 0.0
            ELSE CAST(COALESCE(a.tokens_removed, 0) AS DOUBLE) / t.n_tokens
       END AS frac_removed
FROM tok t LEFT JOIN agg a USING (doc_id)
ORDER BY t.doc_id
""",
)
def repeated_span_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sequence exact substring dedup, strip half: per document, how
    many tokens the span-removal pass deletes (spans are disjoint maximal
    coverage intervals, so removed tokens = sum of span lengths) and the
    surviving fraction — the corpus-shrink accounting a pretraining
    pipeline reports after ExactSubstr dedup. Every doc appears, including
    span-free ones (left join, zero-filled)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(_normalized(), " "), lambda x: x != F.lit(""))
        ).alias("n_tokens"),
    )
    agg = (
        _repeated_spans(d)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_len").cast("bigint").alias("tokens_removed"),
        )
    )
    return (
        tok.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("tokens_removed", F.lit(0)).alias("tokens_removed"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("tokens_removed", F.lit(0)).cast("double")
                / F.col("n_tokens")
            )
            .alias("frac_removed"),
        )
        .orderBy("doc_id")
    )


@register(
    "source_mixture_weights",
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS denom_units
  FROM counts
)
SELECT c.source, c.n_docs, c.n_tokens,
       CAST(FLOOR(SQRT(CAST(c.n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS weight_units,
       CAST(CAST(FLOOR(SQRT(CAST(c.n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS DOUBLE) / t.denom_units AS sample_prob
FROM counts c CROSS JOIN tot t
ORDER BY c.source
""",
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weighting (temperature sampling, alpha = 0.5): each
    source's sampling probability proportional to sqrt of its token count —
    the standard rebalancing that keeps small high-quality sources from
    drowning under bulk web text. Weights are floored to integer
    micro-units before normalizing so the probabilities are exact int/int
    ratios both engines compute identically (a raw double SUM over sqrt
    values would be order-dependent). One token-count aggregate (source-
    keyed, map-side combined), one scalar total broadcast back — the per-
    source relation is tiny at any corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks).cast("bigint")).alias("n_tokens"),
    )
    units = F.floor(
        F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0)
    ).cast("bigint")
    weighted = counts.select("source", "n_docs", "n_tokens", units.alias("weight_units"))
    denom = weighted.agg(F.sum("weight_units").alias("denom_units"))
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight_units",
            (F.col("weight_units").cast("double") / F.col("denom_units")).alias(
                "sample_prob"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII scrubbing and corpus-LM surprisal — round-4 curation additions.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_EMAIL_MOD = 7
PII_PHONE_MOD = 11


@register(
    "pii_scrub_stats",
    oracle=f"""
WITH salted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % {PII_EMAIL_MOD} = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % {PII_PHONE_MOD} = 0
                 THEN ' call 555-' || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
                 ELSE '' END AS t
  FROM documents
),
scrubbed AS (
  SELECT doc_id, t,
         REGEXP_REPLACE(REGEXP_REPLACE(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM salted
)
SELECT doc_id,
       LEN(REGEXP_EXTRACT_ALL(t, '{PII_EMAIL_RE}')) AS n_emails,
       LEN(REGEXP_EXTRACT_ALL(t, '{PII_PHONE_RE}')) AS n_phones,
       LENGTH(clean) AS clean_len,
       LENGTH(t) - LENGTH(clean) AS delta_chars
FROM scrubbed
ORDER BY doc_id
""",
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (the mandatory scrub pass of any training
    corpus): count and replace email addresses and phone numbers with
    typed placeholders, reporting per-doc match counts and the redaction
    size delta. The synthetic corpus carries no PII, so deterministic
    PII is INJECTED first from closed forms of doc_id (the same
    synthesize-then-operate pattern as the multimodal codecs,
    ops/multimodal.py) — the regex scan and replace over the salted text
    is the real operator and runs entirely in whole-stage codegen; the
    oracle runs the same regexes in DuckDB's RE2, pinning a
    dialect-portable pattern subset. One scan, no shuffle (ORDER BY
    aside); at 100 TB this is a narrow map stage."""
    d = load_table(spark, sf_dir, "documents")
    salted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % PII_EMAIL_MOD == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % PII_PHONE_MOD == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-0199"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("t"), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return (
        salted.select(
            "doc_id",
            F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL_RE), 0)).alias(
                "n_emails"
            ),
            F.size(F.regexp_extract_all("t", F.lit(PII_PHONE_RE), 0)).alias(
                "n_phones"
            ),
            F.length(clean).alias("clean_len"),
            (F.length("t") - F.length(clean)).alias("delta_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_bigram_surprisal",
    oracle="""
WITH words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' '),
                             x -> x <> '') AS w
  FROM documents
),
bigrams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
  FROM (SELECT doc_id, w, UNNEST(RANGE(1, GREATEST(LEN(w) - 1, 0) + 1)) AS i
        FROM words) t
),
cnt AS (SELECT bigram, COUNT(*) AS c FROM bigrams GROUP BY bigram)
SELECT b.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(1000000 // c.c) AS BIGINT) AS surprisal_units,
       CAST(SUM(1000000 // c.c) AS DOUBLE) / COUNT(*) AS mean_surprisal
FROM bigrams b JOIN cnt c USING (bigram)
GROUP BY b.doc_id
ORDER BY b.doc_id
""",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality signal (the KenLM-filter shape, statistics taken
    from the corpus itself): per-doc mean reciprocal corpus frequency of
    its word bigrams, in exact integer micro-units (1e6 div count — both
    engines use true integer division, so no transcendental log and no FP
    summation order to disagree on). High surprisal = bigrams the corpus
    has rarely seen (noise, mojibake, or genuinely novel text); low =
    boilerplate. The corpus frequency deliberately comes from an
    aggregate-plus-join, NOT count() OVER (PARTITION BY bigram), even
    though the window form was measured faster at test scale and is used
    for spans (_repeated_spans): hot BIGRAMS are zipf-top keys — "of
    the" alone can be ~1% of ALL corpus bigrams, thousands of times a
    shuffle partition at 100 TB — and a window cannot split a partition,
    while this shape is skew-immune twice over (the partial aggregate
    collapses hot bigrams map-side; AQE skew-join splits the probe-side
    join). 5-gram frequencies are zipf-suppressed enough for the window;
    bigrams are not. The double tokenize scan is the accepted price —
    scans are cheap, stuck tasks are not. Count-relation join strategy
    is AQE's call (a web-scale bigram vocab outgrows any broadcast)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.filter(F.split(_normalized(), " "), lambda x: x != F.lit("")).alias("w"),
    )
    w = F.col("w")
    m = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(w, 1, m),
                F.slice(w, 2, m),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    cnt = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    return (
        bigrams.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.expr("1000000 div c")).cast("bigint").alias("surprisal_units"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "surprisal_units",
            (F.col("surprisal_units").cast("double") / F.col("n_bigrams")).alias(
                "mean_surprisal"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_after_span_strip",
    oracle=f"""
WITH {_SPANS_SQL},
tok AS (
  SELECT doc_id,
         LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '') AS w
  FROM documents
),
spanlist AS (
  SELECT doc_id, LIST([s.span_start, s.span_start + s.span_len - 1]) AS iv
  FROM spans s GROUP BY doc_id
),
stripped AS (
  SELECT t.doc_id,
         CASE WHEN sl.doc_id IS NULL THEN t.w
              ELSE [t.w[i] FOR i IN RANGE(1, LEN(t.w) + 1)
                    IF LEN(LIST_FILTER(sl.iv, v -> i >= v[1] AND i <= v[2])) = 0]
         END AS kept
  FROM tok t LEFT JOIN spanlist sl ON sl.doc_id = t.doc_id
)
SELECT doc_id,
       LEN(kept) AS n_tokens_kept,
       -- COALESCE: DuckDB's ARRAY_TO_STRING of an empty list is NULL,
       -- Spark's array_join is '' — a fully-stripped doc must hash ''
       MD5(COALESCE(ARRAY_TO_STRING(kept, ' '), '')) AS kept_text_hash
FROM stripped
ORDER BY doc_id
""",
)
def corpus_after_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-sequence substring dedup, APPLY half: emit each document's
    surviving text with every cross-document repeated span removed —
    repeated_span_strip_stats says how much would go; this actually
    removes it (returning the md5 of the kept text rather than the text
    itself keeps the driver compare row-sized; the construction is the
    full rewritten token stream). Spans arrive per doc as a compact
    interval array (disjoint by construction), the token filter is a
    positional HOF over the words array — per-doc work, no extra
    shuffle beyond the span build plus one doc_id join."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.filter(F.split(_normalized(), " "), lambda x: x != F.lit("")).alias("w"),
    )
    spans = _repeated_spans(d)
    spanlist = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.array(F.col("span_start"), F.col("span_start") + F.col("span_len") - 1)
        ).alias("iv")
    )
    joined = tok.join(spanlist, "doc_id", "left")
    idx = F.zip_with(
        F.col("w"),
        F.sequence(F.lit(1), F.greatest(F.size("w"), F.lit(1))),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.when(F.col("iv").isNull(), F.col("w")).otherwise(
        F.transform(
            F.filter(
                idx,
                lambda p: ~F.exists(
                    F.col("iv"),
                    lambda v: (p.getField("i") >= v.getItem(0))
                    & (p.getField("i") <= v.getItem(1)),
                ),
            ),
            lambda p: p.getField("t"),
        )
    )
    return (
        joined.select("doc_id", kept.alias("kept"))
        .select(
            "doc_id",
            F.size("kept").alias("n_tokens_kept"),
            F.md5(F.array_join("kept", " ")).alias("kept_text_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR-shaped importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document by
# how target-like its hashed n-gram feature distribution is, so a curation
# pipeline can importance-resample the raw pool toward a target domain
# without training a model.

DSIR_BUCKETS = 64
DSIR_UNIT = 1_000_000  # fixed-point scale for the per-bucket probability ratio
_DSIR_BUCKET_SQL = (
    "((STRPOS('0123456789abcdef', SUBSTRING(MD5(f), 7, 1)) - 1) * 16"
    " + (STRPOS('0123456789abcdef', SUBSTRING(MD5(f), 8, 1)) - 1))"
    f" % {DSIR_BUCKETS}"
)
# unigrams ++ adjacent bigrams, as one array expression (no window, no
# second explode): DSIR's feature space over the whitespace token stream.
_DSIR_FEATS_EXPR = (
    "concat(t, transform(slice(t, 1, greatest(size(t) - 1, 0)),"
    " (x, i) -> concat(x, ' ', element_at(t, i + 2))))"
)


@register(
    "doc_dsir_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, lang,
         UNNEST(LIST_CONCAT(t,
             LIST_TRANSFORM(RANGE(1, LEN(t)), i -> t[i] || ' ' || t[i + 1]))) AS f
  FROM toks
),
bucketed AS (
  SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS b FROM feats
),
dist AS (
  SELECT b, COUNT(*) AS raw_n,
         COUNT(*) FILTER (WHERE lang = 'en') AS tgt_n
  FROM bucketed GROUP BY b
),
ratio AS (
  SELECT b, ({DSIR_UNIT} * (tgt_n + 1)) // (raw_n + 1) AS r FROM dist
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_feats, CAST(SUM(r) AS BIGINT) AS dsir_units
  FROM bucketed JOIN ratio USING (b) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_feats, 0) AS n_feats,
       COALESCE(p.dsir_units, 0) AS dsir_units,
       CASE WHEN p.n_feats > 0
            THEN CAST(p.dsir_units AS DOUBLE) / p.n_feats END AS mean_units
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""",
    bench=True,
)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: hash every unigram+bigram feature into
    {DSIR_BUCKETS} md5 buckets, estimate the target distribution from the
    lang='en' slice and the raw distribution from the whole pool
    (add-1 smoothed), and score each doc by the sum of its features'
    target/raw probability ratios. The ratio is kept in exact fixed
    point — ``(UNIT*(tgt+1)) div (raw+1)`` integer division — instead of
    DSIR's log-likelihood ratio because transcendental logs are not
    identically rounded across engines; the fixed-point ratio sum is a
    monotone analogue of the same target-likeness ordering (documented
    deviation, same resampling intent).

    Scale shape: one explode of the corpus token stream, ONE shuffle on
    the 6-bit bucket key for the distribution aggregate (64 rows out —
    partial aggregation collapses almost everything map-side), then a
    join of the re-exploded features against the 64-row ratio relation,
    which AQE converts to broadcast at runtime (bounded by construction:
    the bucket space is fixed, not data-dependent — no hint needed, same
    policy as top-terms). Per-doc sums shuffle (doc_id) once. At 100 TB
    the feature explode is the dominant cost and is embarrassingly
    parallel; the 64-row model table is the only global state, the
    property that makes DSIR tractable where a learned classifier needs
    a training loop. Feature hashing uses the same two-nibble md5
    arithmetic as doc_shard_assignment so both engines bucket
    identically.

    r13 optimization (guide §2.3/§2.4): the exploded+md5-bucketed
    feature relation used to feed BOTH the distribution aggregate and
    the per-doc scoring join as separate subtrees, so the corpus-sized
    explode and one md5 per feature ran twice
    (plans/r13/doc_dsir_weights_before.txt: two scan→explode chains).
    Features are now collapsed to per-doc bucket COUNTS — (doc_id,
    lang, b, cnt), ≤ {DSIR_BUCKETS} rows per doc, partially aggregated
    map-side — in ONE pass, cached for the call (single-generation
    dedup cache); the distribution is Σ cnt per bucket and the per-doc
    score is Σ cnt·r, exact integer sums that commute with the
    per-feature formulation bit-for-bit, which the unchanged oracle
    re-proves."""
    d = load_table(spark, sf_dir, "documents")
    release_dedup_caches()  # evict the previous call's generation
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    base = d.select("doc_id", "lang", toks.alias("t"))
    feats = base.select(
        "doc_id", "lang", F.explode(F.expr(_DSIR_FEATS_EXPR)).alias("f")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("f")), 7, 2), 16, 10).cast("bigint")
        % DSIR_BUCKETS
    )
    bucketed = feats.select("doc_id", "lang", bucket.alias("b"))
    pdb = _cache(
        bucketed.groupBy("doc_id", "lang", "b").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    dist = pdb.groupBy("b").agg(
        F.sum("cnt").alias("raw_n"),
        F.sum(
            F.when(F.col("lang") == "en", F.col("cnt")).otherwise(F.lit(0))
        ).alias("tgt_n"),
    )
    ratio = dist.select(
        "b", F.expr(f"({DSIR_UNIT} * (tgt_n + 1)) div (raw_n + 1)").alias("r")
    )
    per_doc = (
        pdb.join(ratio, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("r")).alias("dsir_units"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("dsir_units", F.lit(0)).alias("dsir_units"),
            F.when(
                F.col("n_feats") > 0,
                F.col("dsir_units").cast("double") / F.col("n_feats"),
            ).alias("mean_units"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters: the bounded-memory frequency sketch for
# vocabularies too large to count exactly (heavy-hitter detection over a
# web-scale token stream). Depth x width counters are fixed BY CONSTRUCTION,
# and CMS never under-estimates — both properties are gated below.

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 20


def _cms_bucket_sql(row: int, tok: str) -> str:
    h = f"MD5('{row}:' || {tok})"
    return (
        f"((STRPOS('0123456789abcdef', SUBSTRING({h}, 7, 1)) - 1) * 16"
        f" + (STRPOS('0123456789abcdef', SUBSTRING({h}, 8, 1)) - 1)) % {CMS_WIDTH}"
    )


def _cms_bucket_col(row: int, tok) -> "F.Column":
    h = F.md5(F.concat(F.lit(f"{row}:"), tok))
    return F.conv(F.substring(h, 7, 2), 16, 10).cast("bigint") % CMS_WIDTH


@register(
    "term_cms_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
exact AS (
  SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY tok
),
top AS (
  SELECT tok, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, tok LIMIT {CMS_TOPK}
),
counters AS (
  SELECT t.r,
         CASE t.r {" ".join(f"WHEN {i} THEN {_cms_bucket_sql(i, 'tok')}" for i in range(CMS_DEPTH))} END AS bkt,
         COUNT(*) AS c
  FROM toks, RANGE({CMS_DEPTH}) t(r)
  GROUP BY 1, 2
),
est AS (
  SELECT top.tok, top.exact_cnt, MIN(c.c) AS cms_estimate
  FROM top, RANGE({CMS_DEPTH}) t(r)
  JOIN counters c
    ON c.r = t.r
   AND c.bkt = (CASE t.r {" ".join(f"WHEN {i} THEN {_cms_bucket_sql(i, 'top.tok')}" for i in range(CMS_DEPTH))} END)
  GROUP BY top.tok, top.exact_cnt
)
SELECT tok, exact_cnt, cms_estimate,
       (cms_estimate >= exact_cnt) AS never_underestimates
FROM est
ORDER BY exact_cnt DESC, tok
""",
)
def term_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, gated against exact
    counts for the top-{CMS_TOPK} heavy hitters. The sketch is
    {CMS_DEPTH}x{CMS_WIDTH} integer counters — bounded BY CONSTRUCTION
    (the hash space fixes the size, not the vocabulary), so at 100 TB
    the counter table broadcasts while exact per-term counting would
    shuffle a billion-term vocabulary; the estimate is the min over
    {CMS_DEPTH} independent md5 rows and can only over-count
    (collisions add, never subtract) — the `never_underestimates`
    column pins that invariant cross-engine, the same
    estimate-plus-exact-companion gating the HLL/t-digest sketches use.
    Plan: ONE explode feeds both the exact aggregate (for the gate) and
    the counter aggregate ({CMS_DEPTH} rows per token via a literal
    explode; partial aggregation collapses map-side); the per-term
    lookup joins the {CMS_DEPTH * CMS_WIDTH}-row counter relation,
    which AQE broadcasts at runtime."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).alias("tok")
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "tok").limit(CMS_TOPK)
    hashed = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_bucket_col(i, F.col("tok")).alias("bkt"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("s")
    ).select("s.r", "s.bkt")
    counters = hashed.groupBy("r", "bkt").agg(F.count(F.lit(1)).alias("c"))
    probes = top.select(
        "tok",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_bucket_col(i, F.col("tok")).alias("bkt"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("tok", "exact_cnt", "p.r", "p.bkt")
    est = (
        probes.join(counters, ["r", "bkt"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_cnt")).alias(
            "never_underestimates"
        ),
    ).orderBy(F.desc("exact_cnt"), "tok")


# ---------------------------------------------------------------------------
# Bloom-filter candidate pruning for decontamination: the membership sketch
# that lets the corpus side discard non-candidate n-grams MAP-SIDE before
# any exact join. A Bloom filter can only err toward inclusion — the
# companion exact count gates the no-false-negative invariant cross-engine,
# the same estimate-plus-exact pattern as the count-min sketch above.

# 16^5 = 2^20 bits: five md5 nibbles address the bit space exactly. Sizing
# rule (standard Bloom math): set-bit fraction ≈ 1 - e^(-k·n/m); with the
# sf0.1 eval slice's ~25k distinct 5-grams, k·n/m ≈ 0.07 → per-gram FP
# ≈ (0.07)³ ~ 4e-4. The first cut used 4096 bits and saturated (84% set,
# 60% FP at sf0.01) — a Bloom filter sized below ~1.44·k·n admits nearly
# everything and the "prune" forwards the whole corpus.
BLOOM_BITS = 16**5
BLOOM_K = 3  # independent salted hash functions


def _bloom_bit_sql(i: int, gram: str) -> str:
    h = f"MD5('bloom{i}:' || {gram})"
    n = "STRPOS('0123456789abcdef', SUBSTRING({h}, {p}, 1)) - 1"
    return (
        "("
        + " + ".join(
            f"({n.format(h=h, p=p + 1)}) * {16 ** (4 - p)}" for p in range(5)
        )
        + ")"
    )


def _bloom_bit_col(i: int, gram) -> "F.Column":
    h = F.md5(F.concat(F.lit(f"bloom{i}:"), gram))
    return F.conv(F.substring(h, 1, 5), 16, 10).cast("bigint")


@register(
    "decontam_bloom_prune",
    oracle=f"""
WITH shingles AS ({_shingles_sql(DECON_NGRAM)}),
eval_grams AS (
  SELECT DISTINCT shingle FROM shingles WHERE doc_id % {EVAL_MOD} = 0
),
bloom AS (
  SELECT DISTINCT UNNEST([{", ".join(_bloom_bit_sql(i, "shingle") for i in range(BLOOM_K))}]) AS bit
  FROM eval_grams
),
corpus AS (
  SELECT DISTINCT doc_id, shingle FROM shingles WHERE doc_id % {EVAL_MOD} <> 0
),
probe AS (
  SELECT doc_id, shingle,
         UNNEST([{", ".join(_bloom_bit_sql(i, "shingle") for i in range(BLOOM_K))}]) AS bit
  FROM corpus
),
cand AS (
  SELECT doc_id, shingle
  FROM probe JOIN bloom USING (bit)
  GROUP BY doc_id, shingle
  HAVING COUNT(*) = {BLOOM_K}
),
bl AS (
  SELECT doc_id, COUNT(*) AS n_bloom_candidates FROM cand GROUP BY doc_id
),
ex AS (
  SELECT doc_id, COUNT(*) AS n_exact_shared
  FROM corpus
  WHERE shingle IN (SELECT shingle FROM eval_grams)
  GROUP BY doc_id
)
SELECT bl.doc_id, bl.n_bloom_candidates,
       COALESCE(ex.n_exact_shared, 0) AS n_exact_shared
FROM bl LEFT JOIN ex ON bl.doc_id = ex.doc_id
ORDER BY bl.doc_id
""",
)
def decontam_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter candidate pruning for benchmark decontamination: build
    a {BLOOM_BITS}-bit / {BLOOM_K}-hash Bloom filter from the eval set's
    word-{DECON_NGRAM}-grams, probe every corpus gram against it, and
    report per doc the Bloom-positive candidate count next to the exact
    shared-gram count. A Bloom filter never has false negatives
    (candidates ⊇ exact hits — pinned by pytest per doc), so the exact
    decontamination join can run over the candidate subset only.

    Why this matters at 100 TB: benchmark_decontamination must move
    corpus-side grams to the join. The Bloom relation is bounded BY
    CONSTRUCTION ({BLOOM_BITS} bits regardless of eval size — at real
    scale sized m ≈ 1.44·k·n for the target FP rate, still a bitset
    measured in MBs for billions of eval grams, always broadcastable
    even when the r3-verdict probe says the raw eval gram SET is not).
    Every non-candidate gram dies map-side against that bitset and never
    enters the exchange; only candidates (exact hits + FP noise) shuffle.
    This is exactly Spark's own runtime row-level BloomFilter rewrite
    (InjectRuntimeFilter), expressed declaratively so the driver can
    oracle-check the membership math. Plan here: the {BLOOM_K} bit
    probes are a literal-array explode (narrow); the bloom-bits relation
    (≤{BLOOM_BITS} rows) joins via AQE-runtime broadcast; the
    all-{BLOOM_K}-bits-matched test is COUNT(*)={BLOOM_K} per gram, and
    the per-doc rollup shuffles doc_id once.

    The exact verification deliberately runs over the CANDIDATE set only
    — the pruned pipeline's real dataflow — while the ORACLE computes
    exact counts over the full un-pruned corpus. Equality of the two is
    therefore itself a proof of the no-false-negative property on this
    corpus (a dropped true hit would make the Spark count fall short of
    the oracle's), on top of the per-doc pytest invariant."""
    d = load_table(spark, sf_dir, "documents")
    grams = _word_shingles(d, DECON_NGRAM)
    eval_grams = (
        grams.where(F.col("doc_id") % EVAL_MOD == 0).select("shingle").distinct()
    )
    bloom = (
        eval_grams.select(
            F.explode(
                F.array(
                    *[_bloom_bit_col(i, F.col("shingle")) for i in range(BLOOM_K)]
                )
            ).alias("bit")
        )
        .distinct()
    )
    corpus = grams.where(F.col("doc_id") % EVAL_MOD != 0)
    probe = corpus.select(
        "doc_id",
        "shingle",
        F.explode(
            F.array(*[_bloom_bit_col(i, F.col("shingle")) for i in range(BLOOM_K)])
        ).alias("bit"),
    )
    cand = (
        probe.join(bloom, "bit")
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .where(F.col("nbits") == BLOOM_K)
    )
    flagged = cand.join(
        eval_grams.withColumn("in_eval", F.lit(1)), "shingle", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bloom_candidates"),
            F.count("in_eval").alias("n_exact_shared"),
        )
        .orderBy("doc_id")
    )


QUALITY_UNIT = 10**6  # integer quality-ratio units (stop/token * 1e6)


@register(
    "budgeted_mixture_selection",
    oracle=f"""
WITH per_doc AS (
  SELECT doc_id, source,
         CAST(LEN(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens,
         CAST(LEN(list_filter(string_split(text, ' '),
                              x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'for'))) AS BIGINT) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, source, n_tokens,
         CASE WHEN n_tokens > 0
              THEN (n_stop * {QUALITY_UNIT}) // n_tokens ELSE 0 END AS q_units
  FROM per_doc
),
src AS (
  SELECT source, SUM(n_tokens) AS src_tokens,
         CAST(FLOOR(SQRT(CAST(SUM(n_tokens) AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS weight_units
  FROM scored GROUP BY source
),
tot AS (
  SELECT CAST(SUM(weight_units) AS BIGINT) AS denom_units,
         CAST(SUM(src_tokens) // 2 AS BIGINT) AS global_budget
  FROM src
),
budgets AS (
  SELECT s.source,
         CAST((t.global_budget * s.weight_units) // t.denom_units AS BIGINT)
           AS budget_tokens
  FROM src s CROSS JOIN tot t
),
ranked AS (
  SELECT sc.source, sc.doc_id, sc.n_tokens, b.budget_tokens,
         SUM(sc.n_tokens) OVER (
           PARTITION BY sc.source
           ORDER BY sc.q_units DESC, sc.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM scored sc JOIN budgets b USING (source)
)
SELECT source,
       CAST(COUNT(*) FILTER (WHERE cum_tokens <= budget_tokens) AS BIGINT)
         AS n_selected,
       CAST(COALESCE(SUM(n_tokens) FILTER (WHERE cum_tokens <= budget_tokens), 0)
         AS BIGINT) AS tokens_selected,
       MIN(budget_tokens) AS budget_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ranked
GROUP BY source
ORDER BY source
""",
)
def budgeted_mixture_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGETED corpus selection under temperature mixture weights —
    the step that turns ``source_mixture_weights`` into an actual training
    set: a global token budget (half the corpus here) is split across
    sources proportionally to their alpha=0.5 temperature weights, and
    within each source documents are admitted greedily in quality order
    (stopword-ratio heuristic) until the source's budget is exhausted.
    Returns per-source accounting: docs and tokens admitted vs budget.

    Everything is exact integer arithmetic — quality ranks as
    ratio-units (n_stop * 1e6 // n_tokens), budgets as bigint
    floor-division shares, admission as a cumulative-sum threshold — so
    both engines select the IDENTICAL document set (ties broken by
    doc_id). The hash match certifies the selection itself, not just
    the counts: a single differently-admitted doc shifts tokens_selected.

    Plan: one corpus scan computes per-doc tokens + quality; the
    source-level weight/budget relations are tiny and broadcast; the
    admission is ONE per-source window cumulative sum (the sequence-
    packing prefix-sum pattern) — no global sort, no driver loop. At
    100 TB this is the standard data-recipe materialization: shuffle
    once on source (salt a mega-source's window by quality-band if one
    source dominates), emit admitted shards."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    n_tokens = F.size(toks).cast("bigint")
    scored = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.when(
            n_tokens > 0,
            F.expr(
                "div(CAST(size(filter(split(text, ' '), "
                "x -> x IN ('the','a','and','of','to','in','is','for'))) AS BIGINT)"
                f" * {QUALITY_UNIT}, "
                "CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("q_units"),
    )
    src = scored.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens"),
        F.floor(F.sqrt(F.sum("n_tokens").cast("double")) * F.lit(1000000.0))
        .cast("bigint")
        .alias("weight_units"),
    )
    tot = src.agg(
        F.sum("weight_units").cast("bigint").alias("denom_units"),
        F.expr("CAST(div(SUM(src_tokens), 2) AS BIGINT)").alias("global_budget"),
    )
    budgets = src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(
            "CAST(div(global_budget * weight_units, denom_units) AS BIGINT)"
        ).alias("budget_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("q_units"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = scored.join(budgets, "source").select(
        "source",
        "n_tokens",
        "budget_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    )
    admitted = F.col("cum_tokens") <= F.col("budget_tokens")
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.when(admitted, 1)).cast("bigint").alias("n_selected"),
            F.coalesce(F.sum(F.when(admitted, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias("tokens_selected"),
            F.min("budget_tokens").alias("budget_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Incremental decontamination: the eval set GROWS, the rescan stays O(delta).
# --------------------------------------------------------------------------


@register(
    "incremental_decontamination",
    oracle=f"""
WITH shingles AS ({_shingles_sql(DECON_NGRAM)}),
eval_grams AS (
  SELECT DISTINCT shingle FROM shingles WHERE doc_id % {EVAL_MOD} = 0
),
hits AS (
  SELECT DISTINCT c.doc_id, c.shingle
  FROM shingles c JOIN eval_grams USING (shingle)
  WHERE c.doc_id % {EVAL_MOD} <> 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
FROM hits
GROUP BY doc_id
HAVING COUNT(*) >= {DECON_MIN_SHARED}
ORDER BY doc_id
""",
)
def incremental_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination under a GROWING eval set — the refresh problem a
    one-shot ``benchmark_decontamination`` cannot answer: new benchmark
    shards arrive and re-running the full eval x corpus pass each time
    is O(corpus) per shard. The incremental contract exploits that the
    maintained statistic (per corpus doc, |distinct shingles shared
    with the eval SET|) is a set-cardinality over a monotonically
    growing shingle set: a new shard's contribution is the corpus
    match against its NOVEL shingles only (anti-joined against the
    already-indexed set), which is DISJOINT from every prior match by
    construction — so matches append, counts re-aggregate from the
    bounded matched relation, and no prior match is ever recomputed.
    The matched (doc_id, shingle) state lives in an ops.versioned
    table: each shard's delta is one APPEND commit (atomic, auditable,
    time-travelable — 'which shard contaminated this doc' is a feed
    question).

    Here shard 1 = even-tens eval docs, shard 2 = odd-tens; the oracle
    recomputes against the WHOLE eval set from scratch, so the hash
    match proves delta-apply == full recompute (the feed-apply ==
    recompute contract, decontamination-shaped). A pytest asserts the
    delta pass joined strictly fewer shingles than the full set.

    Scale: per refresh, the novel-shingle relation is bounded by the
    new shard (broadcast when small, like the one-shot query's probe);
    the corpus gram pass is the unavoidable linear scan and would run
    against the stored corpus shingle INDEX (substring-dedup family) in
    production, making the refresh sublinear in corpus size too."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_version,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    d = load_table(spark, sf_dir, "documents")
    grams = _word_shingles_raw(d, DECON_NGRAM)
    corpus = grams.where(F.col("doc_id") % EVAL_MOD != 0)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    shard1 = (
        grams.where(is_eval & (F.col("doc_id") % (2 * EVAL_MOD) == 0))
        .select("shingle")
        .distinct()
    )
    shard2_raw = (
        grams.where(is_eval & (F.col("doc_id") % (2 * EVAL_MOD) != 0))
        .select("shingle")
        .distinct()
    )
    tbl = scratch_dir("sg-decon-") + "/matched"
    commit_version(
        spark,
        corpus.join(F.broadcast(shard1), "shingle")
        .select("doc_id", "shingle")
        .distinct(),
        tbl,
    )
    # the O(delta) step: only shingles NOVEL to the index rescan the corpus
    novel = shard2_raw.join(shard1, "shingle", "left_anti")
    commit_append(
        spark,
        corpus.join(F.broadcast(novel), "shingle")
        .select("doc_id", "shingle")
        .distinct(),
        tbl,
        meta={"shard": 2},
    )
    return (
        read_version(spark, tbl)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
        .where(F.col("n_shared_ngrams") >= DECON_MIN_SHARED)
        .orderBy("doc_id")
    )
