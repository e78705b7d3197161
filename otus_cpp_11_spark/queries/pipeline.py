"""Composed training-data pipeline queries — the end-to-end shapes a
corpus-curation job actually runs, built entirely from the registered
operator surface (text analysis + dedup + clustering + joins). Each stays
one lazy DataFrame, so Catalyst optimizes ACROSS pipeline stages (filter
pushdown through the dedup joins, shared scans) — the advantage of
declaring the whole pipeline over running stages as separate jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from otus_cpp_11_spark.catalog import load_table, spread
from otus_cpp_11_spark.queries.dedup import (
    _NEAR_PAIRS_CTES,
    _NORM_SQL,
    _normalized,
    doc_dedup_clusters,
)
from otus_cpp_11_spark.queries.text import (
    _QC_CTES,
    _STOP_SQL,
    QC_BIAS,
    QUALITY_MIN_STOP_RATIO,
    QUALITY_MIN_TOKENS,
    STOPWORDS,
    doc_quality_score,
)
from otus_cpp_11_spark.registry import register

SAMPLE_PER_SOURCE = 5


@register(
    "corpus_curation_pipeline",
    bench=True,
    oracle=f"""
WITH RECURSIVE {_NEAR_PAIRS_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM near_pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM near_pairs
),
cc_nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM cc_nodes
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
exact_keepers AS (
  SELECT MIN(doc_id) AS doc_id
  FROM documents GROUP BY MD5({_NORM_SQL})
),
{_QC_CTES},
scored AS (
  SELECT doc_id, source,
         LEN(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         LEN(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS n_stop,
         LEN(list_filter(string_split(LOWER(text), ' '), x -> x IN ({_STOP_SQL}))) AS en_hits,
         LEN(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS n_lower_tokens
  FROM documents
),
kept AS (
  SELECT s.doc_id, s.source, s.n_tokens
  FROM scored s
  JOIN exact_keepers k ON k.doc_id = s.doc_id
  JOIN qc_scores q ON q.doc_id = s.doc_id
  LEFT JOIN clusters c ON c.doc_id = s.doc_id
  WHERE (c.doc_id IS NULL OR c.cluster_id = s.doc_id)
    AND s.n_tokens >= 20
    AND CAST(s.n_stop AS DOUBLE) / s.n_tokens >= 0.05
    AND s.n_lower_tokens > 0
    AND CAST(s.en_hits AS DOUBLE) / s.n_lower_tokens >= 0.02
    AND (q.score_units + {QC_BIAS} * q.n_tokens) > 0
)
SELECT source, COUNT(*) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM kept
GROUP BY source
ORDER BY source
""",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical curation job in one declarative plan: exact-dedup
    keepers (min doc_id per normalized hash) ∩ near-dup cluster keepers
    (cluster_id == doc_id from the iterative CC over verified MinHash
    pairs; unclustered docs keep themselves) → composite quality gate
    (heuristic: >= 20 tokens, stopword ratio >= 0.05; learned: hashed-
    feature classifier score above the intercept — text.classifier_scores)
    → language gate (en by stopword hit rate) → per-source kept-doc and
    token accounting. Keeper selection runs on the full corpus, then gates
    filter keepers (order documented — reversing it changes which
    near-dups anchor clusters)."""
    from otus_cpp_11_spark.ops.graph import connected_components
    from otus_cpp_11_spark.queries.dedup import near_dup_pairs_minhash
    from otus_cpp_11_spark.queries.text import QC_BUCKETS, QC_WEIGHTS

    d = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs_minhash(spark, sf_dir).select("doc_a", "doc_b")
    clusters = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").alias("c_doc"), F.col("component").alias("cluster_id")
    )
    # r14 (guide §2.3/§6, verdict item 5): the exact-keeper md5 pass, the
    # heuristic token-count pass and the classifier pass were THREE
    # separate corpus scans (plus two corpus-sized semi-joins to stitch
    # them back onto doc_id). All three now ride ONE projection over one
    # scan: the md5 fingerprint and the token counts are per-row columns,
    # the classifier keeps its codegen explode+groupBy shape (HOF-lambda
    # scoring would run interpreted per token — the knn_join_lsh_top3
    # lesson) but explodes FROM this projection, so the per-doc aggregate
    # carries every gate column through its map-side partial aggregation.
    # The exact-keeper semi-join becomes min(doc_id) over a window on the
    # fingerprint. Equivalence: all predicates are per-row and commute
    # with the semi-joins they replace; docs whose normalized text is
    # empty (the only rows the explode drops) tokenize to zero raw tokens
    # as well, so they fail both the old qc semi-join and the n_tokens
    # gate, and they are the ONLY members of their md5('') fingerprint
    # group — dropping them changes no other doc's keeper status.
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    low = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit(""))
    wq = F.filter(F.split(_normalized(), " "), lambda x: x != F.lit(""))
    base = spread(d).select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin([*STOPWORDS]))).alias("n_stop"),
        F.size(F.filter(low, lambda x: x.isin([*STOPWORDS]))).alias("en_hits"),
        F.size(low).alias("n_lower_tokens"),
        F.md5(_normalized()).alias("h"),
        F.explode(wq).alias("term"),
    )
    weights = F.array(*[F.lit(w) for w in QC_WEIGHTS])
    bucket = (
        F.conv(F.substring(F.md5("term"), 7, 2), 16, 10).cast("bigint")
        % QC_BUCKETS
    )
    per_doc = (
        base.select(
            "doc_id",
            "source",
            "n_tokens",
            "n_stop",
            "en_hits",
            "n_lower_tokens",
            "h",
            F.element_at(weights, (bucket + 1).cast("int")).alias("w"),
        )
        .groupBy(
            "doc_id", "source", "n_tokens", "n_stop", "en_hits",
            "n_lower_tokens", "h",
        )
        .agg(
            F.count(F.lit(1)).alias("qc_n"),
            F.sum("w").cast("bigint").alias("qc_score"),
        )
    )
    keeper_min = F.min("doc_id").over(Window.partitionBy("h"))
    kept = (
        per_doc.withColumn("min_id", keeper_min)
        .where(F.col("doc_id") == F.col("min_id"))
        .where((F.col("qc_score") + QC_BIAS * F.col("qc_n")) > 0)
        .join(clusters, per_doc["doc_id"] == clusters["c_doc"], "left")
        .where(F.col("c_doc").isNull() | (F.col("cluster_id") == F.col("doc_id")))
        .where(
            (F.col("n_tokens") >= 20)
            & (F.col("n_stop").cast("double") / F.col("n_tokens") >= 0.05)
            & (F.col("n_lower_tokens") > 0)
            & (F.col("en_hits").cast("double") / F.col("n_lower_tokens") >= 0.02)
        )
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


@register(
    "cross_modal_doc_features",
    oracle="""
SELECT d.doc_id,
       LEN(list_filter(string_split(d.text, ' '), x -> x <> '')) AS n_tokens,
       e.label,
       CAST(LIST_SUM([CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000000000.0) AS DECIMAL(38,0)) FOR x IN e.embedding]) AS DOUBLE) / 1000000000000000.0 AS norm_sq
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
""",
)
def cross_modal_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal feature join: text-side token count with embedding-side
    squared norm and cluster label, one row per document. The 1:1 key join
    (doc_id = vec_id) is the standard text↔embedding co-table layout; at
    scale both sides bucket on the id so feature assembly is shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    sq = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") * x.cast("double") * F.lit(1e15)
            ).cast("decimal(38,0)"),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, p: (acc + p).cast("decimal(38,0)"),
    )
    return (
        d.join(e, d["doc_id"] == e["vec_id"])
        .select(
            d["doc_id"],
            F.size(toks).alias("n_tokens"),
            "label",
            (sq.cast("double") / F.lit(1e15)).alias("norm_sq"),
        )
        .orderBy("doc_id")
    )


@register(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id AS latest_event_id, event_type AS latest_type, ts AS latest_ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup (the CDC/compaction primitive: newest record per
    key) via struct-max argmax — one partial-aggregated hash aggregate;
    the shuffle carries one record per user per partition instead of the
    window formulation's full sort of every event."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("m"))
        .select(
            "user_id",
            F.col("m.event_id").alias("latest_event_id"),
            F.col("m.event_type").alias("latest_type"),
            F.col("m.ts").alias("latest_ts"),
        )
        .orderBy("user_id")
    )


@register(
    "dedup_canonical_by_quality",
    oracle=f"""
WITH RECURSIVE {_NEAR_PAIRS_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM near_pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM near_pairs
),
cc_nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM cc_nodes
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
q AS (
  SELECT doc_id,
         LEN(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         LEN(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS n_stop
  FROM documents
),
scored AS (
  SELECT c.doc_id, c.cluster_id, q.n_tokens,
         CASE WHEN q.n_tokens >= {QUALITY_MIN_TOKENS}
               AND CAST(q.n_stop AS DOUBLE) / q.n_tokens >= {QUALITY_MIN_STOP_RATIO}
              THEN 1 ELSE 0 END AS quality_ok
  FROM clusters c JOIN q USING (doc_id)
),
canon AS (
  SELECT cluster_id,
         FIRST(doc_id ORDER BY quality_ok DESC, n_tokens DESC, doc_id ASC)
           AS canonical_doc
  FROM scored GROUP BY cluster_id
)
SELECT s.doc_id, s.cluster_id, s.quality_ok, s.n_tokens, c.canonical_doc,
       CASE WHEN s.doc_id = c.canonical_doc THEN 1 ELSE 0 END AS keep
FROM scored s JOIN canon c USING (cluster_id)
ORDER BY doc_id
""",
)
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-priority dedup canonicalization: WHICH duplicate survives
    is a curation decision, not an accident of doc_id order — within each
    transitive near-dup cluster the survivor is the best document by
    (quality gate, length, lowest id) in that priority. Production
    pipelines (e.g. keep-longest / keep-highest-score dedup policies)
    need exactly this operator; min-id canonicalization keeps whatever
    crawled first, which is often the truncated or boilerplate copy.

    Plan: clusters (the oracle-gated CC fixpoint) joined to the
    oracle-gated quality relation, then survivor selection as ONE
    partial-aggregated struct-max argmax per cluster — one row per
    cluster crosses the shuffle regardless of cluster size, so a
    boilerplate mega-cluster (the classic dedup skew case) costs its
    members only map-side; the window formulation was rejected because
    it must shuffle AND sort every member of exactly those hot clusters.
    The canonical relation joins back unhinted (cluster count is
    corpus-sized at 100 TB; AQE decides — the unbounded-key policy).
    The struct's integer triple (quality_ok, n_tokens, -doc_id) makes
    lexicographic max equal the SQL ordered-FIRST, tie-broken totally."""
    clusters = doc_dedup_clusters(spark, sf_dir)
    quality = doc_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_ok"
    )
    scored = clusters.join(quality, "doc_id")
    canon = (
        scored.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    "quality_ok", "n_tokens", (-F.col("doc_id")).alias("neg_id")
                )
            ).alias("m")
        )
        .select(
            "cluster_id",
            (-F.col("m.neg_id")).cast("bigint").alias("canonical_doc"),
        )
    )
    return (
        scored.join(canon, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "quality_ok",
            "n_tokens",
            "canonical_doc",
            F.when(F.col("doc_id") == F.col("canonical_doc"), 1)
            .otherwise(0)
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "balanced_doc_sample",
    oracle=f"""
SELECT source, doc_id
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) t
WHERE rn <= {SAMPLE_PER_SOURCE}
ORDER BY source, doc_id
""",
)
def balanced_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced (stratified, exact-k) sampling: k docs per source, chosen
    by md5-of-id order — a deterministic pseudo-random permutation both
    engines compute identically (rand(seed) is partitioning-dependent and
    engine-specific, so it can never be oracle-checked). The per-stratum
    window is one shuffle on source; at scale prefilter with a cheap
    hash-prefix predicate so the window only sees ~k×10 rows per stratum."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= SAMPLE_PER_SOURCE)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )
