"""Deduplication operators over the documents table (driver extension
mandate — SURVEY.md §2.2 'extension operators'): exact (hash-groupBy) and
MinHash LSH near-dup detection with banded candidate generation + exact-
Jaccard verification.

Determinism strategy shared with the DuckDB oracle: all hashing is md5-hex
(identical in both engines), minhash minima are *lexicographic* minima over
md5 hex strings (uniform → a valid minhash family, no integer parsing
needed), and Jaccard is an int/int division in double.

Parameter choice (measured on the corpus): word-trigram shingles put
unrelated docs at jaccard ~0.01-0.03 while planted near-duplicates sit at
>=0.7 — char-5-gram shingles were tried first and left the background at
~0.2-0.26, which no LSH banding can separate from a 0.3 threshold (every
pair became a candidate: quadratic blowup, 433 s at sf0.1). With b=8 bands
of r=2 rows the candidate probability is 1-(1-j²)⁸: ~0.5% at background
similarity, ~90% at the 0.5 threshold, ~100% for the planted pairs.

Scale: signatures are one hash-aggregate over shingles (16 mins computed
per-row, no hash-index explode); candidates join on (band, band_signature)
buckets so the doc×doc cross product never materializes; the exact-Jaccard
verify join touches candidate pairs only. At 100 TB: salt hot band buckets
(identical boilerplate docs) or cap bucket size; AQE skew-join covers
moderate skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.registry import register

SHINGLE_WORDS = 3
NUM_HASHES = 16
NUM_BANDS = 8  # r = NUM_HASHES / NUM_BANDS = 2 rows per band
JACCARD_THRESHOLD = 0.5

_NORM_SQL = "TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))"


def _normalized(col: str = "text") -> Column:
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct word-trigram shingles of the normalized
    text. Array ops stay JVM-side; the explode is the flatMap (reference
    O3's 1→N mapper shape, src/mapreduce.hpp:26). Docs with < 3 words have
    no shingles and drop out (mirrored by the oracle's empty RANGE)."""
    words = F.filter(F.split(_normalized(), " "), lambda x: x != F.lit(""))
    n = F.size(words)
    idx = F.when(n >= SHINGLE_WORDS, F.sequence(F.lit(1), n - (SHINGLE_WORDS - 1))).otherwise(
        F.array().cast("array<int>")
    )
    arr = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(words, i + off) for off in range(SHINGLE_WORDS)],
            ),
        )
    )
    return df.select("doc_id", F.explode(arr).alias("shingle"))


_SHINGLES_SQL = f"""
  SELECT doc_id, UNNEST(LIST_DISTINCT([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                 FOR i IN RANGE(1, GREATEST(LEN(w) - {SHINGLE_WORDS - 1}, 0) + 1)])) AS shingle
  FROM (SELECT doc_id,
               LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '') AS w
        FROM documents) t
"""


@register(
    "corpus_dedup_stats",
    oracle="""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT MD5(text)) AS n_distinct_exact,
       COUNT(DISTINCT MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))) AS n_distinct_normalized
FROM documents
""",
)
def corpus_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup accounting: raw vs md5 vs normalized-md5 distinct counts
    (the 'how much would dedup remove' dashboard number)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_distinct_exact"),
        F.count_distinct(F.md5(_normalized())).alias("n_distinct_normalized"),
    )


@register(
    "exact_dup_groups",
    oracle="""
SELECT MD5(text) AS content_hash, COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper_doc_id
FROM documents
GROUP BY content_hash
HAVING COUNT(*) > 1
ORDER BY content_hash
""",
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min doc_id (the
    deterministic survivor policy). Hash-groupBy — one shuffle on the hash."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


def _min_sig(h: int) -> Column:
    return F.min(
        F.md5(F.concat(F.lit(f"{h}:"), F.col("shingle")))
    ).alias(f"s{h}")


_SIGS_SQL = ",\n         ".join(
    f"MIN(MD5('{h}:' || shingle)) AS s{h}" for h in range(NUM_HASHES)
)
_R = NUM_HASHES // NUM_BANDS
_BANDS_SQL = ", ".join(
    "MD5(" + " || '|' || ".join(f"s{b * _R + i}" for i in range(_R)) + f") AS b{b}"
    for b in range(NUM_BANDS)
)
_BAND_UNPIVOT_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, b{b} AS band_sig FROM band_cols"
    for b in range(NUM_BANDS)
)


@register(
    "near_dup_pairs_minhash",
    oracle=f"""
WITH shingles AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
         {_SIGS_SQL}
  FROM shingles
  GROUP BY doc_id
),
band_cols AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
bands AS ({_BAND_UNPIVOT_SQL}),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common, sa.n AS n_a, sb.n AS n_b
  FROM candidates c
  JOIN shingles x ON x.doc_id = c.doc_a
  JOIN shingles y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  GROUP BY c.doc_a, c.doc_b, sa.n, sb.n
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
FROM verified
WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
""",
    bench=True,
)
def near_dup_pairs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-duplicate detection, verified with exact Jaccard:
    word-trigram shingles → 16 lexicographic-min md5 signatures (one
    aggregate, no explode) → 8 banded signatures of 2 rows → candidate
    pairs sharing any band bucket → exact shingle-set Jaccard >= 0.5."""
    d = load_table(spark, sf_dir, "documents")
    shingles = _shingles(d).cache()
    sigs = shingles.groupBy("doc_id").agg(
        *[_min_sig(h) for h in range(NUM_HASHES)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"s{b * _R + i}") for i in range(_R)]
                    )
                ).alias("band_sig"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.explode(band_structs).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))

    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = shingles.alias("x")
    y = shingles.alias("y")
    common = (
        candidates.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b"))
            & (F.col("y.shingle") == F.col("x.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        common.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= JACCARD_THRESHOLD).orderBy("doc_a", "doc_b")
