"""Deduplication operators over the documents table (driver extension
mandate — SURVEY.md §2.2 'extension operators'): exact (hash-groupBy) and
MinHash LSH near-dup detection with banded candidate generation + exact-
Jaccard verification.

Determinism strategy shared with the DuckDB oracle: all hashing is md5-hex
(identical in both engines); the 16 minhash functions derive from ONE md5
per shingle via the 2-universal family (a + i*b) mod 2^32 over the
digest's 32-bit halves (see the _SIGS_SQL comment); Jaccard is an int/int
division in double.

Parameter choice (measured on the corpus): word-trigram shingles put
unrelated docs at jaccard ~0.01-0.03 while planted near-duplicates sit at
>=0.7 — char-5-gram shingles were tried first and left the background at
~0.2-0.26, which no LSH banding can separate from a 0.3 threshold (every
pair became a candidate: quadratic blowup, 433 s at sf0.1). With b=8 bands
of r=2 rows the candidate probability is 1-(1-j²)⁸: ~0.5% at background
similarity, ~90% at the 0.5 threshold, ~100% for the planted pairs.

Scale: shingle sets stay array-typed per doc, so exact-Jaccard
verification is array_intersect on candidate pairs only (the exploded
shingle relation is never shuffled for verification); signatures go
explode + groupBy with map-side partial min, so that shuffle carries
~16 hashes per doc; candidates join on (band, band_signature) buckets
so the doc×doc cross product never materializes. Hot band buckets (identical
boilerplate docs hashing to one signature) are split over a salt grid —
``banded_candidate_pairs`` — so one bucket never pins one task; AQE
skew-join covers moderate residual skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table, spread
from otus_cpp_11_spark.registry import register

SHINGLE_WORDS = 3
NUM_HASHES = 16
NUM_BANDS = 8  # r = NUM_HASHES / NUM_BANDS = 2 rows per band
JACCARD_THRESHOLD = 0.5

_NORM_SQL = "TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))"


def _normalized(col: str = "text") -> Column:
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def _word_shingles(df: DataFrame, k: int, *extra_cols: str) -> DataFrame:
    """(doc_id, *extra_cols, shingle): distinct word-k-gram shingles of the
    normalized text. Array ops stay JVM-side; the explode is the flatMap
    (reference O3's 1→N mapper shape, src/mapreduce.hpp:26). Docs with < k
    words have no shingles and drop out (mirrored by the oracle's empty
    RANGE).

    The words array is materialized in its own projection BEFORE the
    higher-order transform: HOF lambdas are interpreted (no whole-stage
    codegen / subexpression elimination), so inlining the split expression
    into each element_at re-runs the regex+split over the full text once
    per element_at call — measured 15.4s → 0.7s at sf0.1 for the trigram
    shingle set."""
    arrays = _word_shingle_arrays(df, k, *extra_cols)
    return arrays.select(
        "doc_id", *extra_cols, F.explode("shingle_set").alias("shingle")
    )


def _word_shingle_arrays_raw(df: DataFrame, k: int, *extra_cols: str) -> DataFrame:
    """(doc_id, *extra_cols, shingle_arr): every word-k-gram occurrence of
    the normalized text as one array column — THE shingle construction
    every variant (raw explode, distinct set) builds on, so the tuned
    form below can never drift between the dedup and decontamination
    families.

    Construction is zip_with over k shifted slices of the words array, NOT
    transform(sequence, i -> element_at(w, i+off)): HOF lambdas are
    interpreted with no subexpression elimination, so any reference to
    ``w`` INSIDE a lambda re-evaluates the regex+split over the full text
    once per element whenever Catalyst collapses the projections (which it
    does everywhere except under a Generate) — measured 14.2s vs 3.6s for
    the trigram sets at sf0.1. Here ``w`` appears only in non-HOF contexts
    (slice/size), where whole-stage codegen CSE evaluates it once per row;
    the zip_with lambdas touch only their own element arguments."""
    wdf = spread(df).select(
        "doc_id",
        *extra_cols,
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
    return wdf.select("doc_id", *extra_cols, acc.alias("shingle_arr"))


def _word_shingles_raw(df: DataFrame, k: int) -> DataFrame:
    """(doc_id, shingle) WITHOUT per-doc dedup: every word-k-gram occurrence.
    For consumers that aggregate with their own DISTINCT (e.g.
    decontamination's count_distinct), the set construction's per-doc
    array_distinct hash build is pure waste — measured 2.8s -> 0.9s on the
    decontamination query at sf0.1."""
    arrays = _word_shingle_arrays_raw(df, k)
    return arrays.select("doc_id", F.explode("shingle_arr").alias("shingle"))


def _word_shingle_arrays(df: DataFrame, k: int, *extra_cols: str) -> DataFrame:
    """(doc_id, *extra_cols, shingle_set): the distinct word-k-gram shingle
    SET of each doc as one array column — the un-exploded form of
    _word_shingles. Staying array-typed lets exact-Jaccard verification run
    as array_intersect on candidate pairs (no re-shuffle of the exploded
    shingle relation)."""
    arrays = _word_shingle_arrays_raw(df, k, *extra_cols)
    return arrays.select(
        "doc_id",
        *extra_cols,
        F.array_distinct("shingle_arr").alias("shingle_set"),
    )


# Single-generation dedup cache: near_dup_pairs_minhash references the
# shingle relation four times (signatures, sizes, both sides of the verify
# join) and the banded-signature relation five times (bucket sizes, cold
# self-join both sides, hot grid both sides), so it caches both — but the
# query returns a LAZY DataFrame, so the caches can't be unpersisted
# inside the call. Instead each new call evicts the previous call's
# caches (bounding retention at one generation per session, not one per
# call) and release_dedup_caches() drops even those.
_dedup_caches: list[DataFrame] = []


def _cache(df: DataFrame) -> DataFrame:
    c = df.cache()
    _dedup_caches.append(c)
    return c


def release_dedup_caches() -> None:
    """Unpersist the retained dedup relations (call after the consumers of
    the last near_dup_pairs_minhash result have run their actions)."""
    while _dedup_caches:
        try:
            # blocking so persistent-RDD counts observed right after the
            # call are deterministic (async unpersist races observers)
            _dedup_caches.pop().unpersist(blocking=True)
        except Exception:
            pass  # session already stopped; nothing retained



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


# All 16 minhash functions derive from ONE md5 per shingle: the digest's
# two 32-bit halves (a, b) feed the 2-universal family
# h_i(s) = (a_s + i*b_s) mod 2^32 — the standard Carter-Wegman trick that
# replaces 16 cryptographic hashes per shingle with 1 md5 + 16 integer
# fused-multiply-adds (the md5s were 60% of the query's CPU at sf0.1;
# minima also shuffle as 8-byte ints, not 32-char hex strings).
# Verification is exact Jaccard downstream, so hash-family quality only
# affects candidate recall, where 2-universal is the textbook choice.
_M32 = 4294967296
_NIB = "(STRPOS('0123456789abcdef', SUBSTRING(h, {j}, 1)) - 1)"
_A_SQL = " + ".join(f"{_NIB.format(j=j)} * {16 ** (8 - j)}" for j in range(1, 9))
_B_SQL = " + ".join(f"{_NIB.format(j=j)} * {16 ** (16 - j)}" for j in range(9, 17))
_SIGS_SQL = ",\n         ".join(
    f"MIN((a + {h} * b) % {_M32}) AS s{h}" for h in range(NUM_HASHES)
)
_R = NUM_HASHES // NUM_BANDS
_BANDS_SQL = ", ".join(
    "MD5("
    + " || '|' || ".join(f"CAST(s{b * _R + i} AS VARCHAR)" for i in range(_R))
    + f") AS b{b}"
    for b in range(NUM_BANDS)
)
_BAND_UNPIVOT_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, b{b} AS band_sig FROM band_cols"
    for b in range(NUM_BANDS)
)


# Shared CTE chain producing verified near-dup pairs — used by the pairs
# oracle and by the connected-components clustering oracle below.
_NEAR_PAIRS_CTES = f"""shingles AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
         {_SIGS_SQL}
  FROM (SELECT doc_id, ({_A_SQL}) AS a, ({_B_SQL}) AS b
        FROM (SELECT doc_id, MD5(shingle) AS h FROM shingles) hashed) ab
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
),
near_pairs AS (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
  FROM verified
  WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= {JACCARD_THRESHOLD}
)"""


def _minhash_sigs(shingles: DataFrame) -> DataFrame:
    """(doc_id, s0..s{NUM_HASHES-1}): the Carter-Wegman min-signature
    family from an exploded (doc_id, shingle) relation — ONE definition
    shared by banding (_minhash_bands) and the accuracy gate
    (minhash_estimate_accuracy), so the gate always measures the exact
    sketch candidate generation uses; a change to NUM_HASHES, the a/b
    split, or the modulus can never diverge the two."""
    ab = shingles.select("doc_id", F.md5("shingle").alias("h")).select(
        "doc_id",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint").alias("a"),
        F.conv(F.substring("h", 9, 8), 16, 10).cast("bigint").alias("b"),
    )
    return ab.groupBy("doc_id").agg(
        *[
            F.min((F.col("a") + F.lit(h) * F.col("b")) % F.lit(_M32)).alias(f"s{h}")
            for h in range(NUM_HASHES)
        ]
    )


def _minhash_bands(sets: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) for every doc in the shingle-SET relation:
    16 Carter-Wegman min-signatures (one md5 per shingle; see the
    _SIGS_SQL comment) folded into NUM_BANDS banded signatures of _R rows.
    Shared by the self-join near-dup family (_lsh_candidate_pair_sets)
    and the incremental index-vs-incoming variant — in production the
    INDEX side of this relation is computed once at ingest and stored.

    The 16 min-signatures deliberately go through explode + groupBy, NOT
    array_min(transform(...)): HOF lambdas are interpreted per element
    while the exploded md5 runs in whole-stage codegen (measured 4x the
    whole query at sf0.1), and the groupBy's map-side partial min means
    the shuffle carries 16 ints per doc, not the shingle relation."""
    shingles = sets.select("doc_id", F.explode("shingle_set").alias("shingle"))
    sigs = _minhash_sigs(shingles)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"s{b * _R + i}").cast("string")
                            for i in range(_R)
                        ],
                    )
                ).alias("band_sig"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.band_sig").alias("band_sig"),
    )



HOT_BUCKET_THRESHOLD = 4096  # band-bucket size above which the grid path kicks in
HOT_BUCKET_SALTS = 8


def banded_candidate_pairs(
    bands: DataFrame,
    hot_threshold: int = HOT_BUCKET_THRESHOLD,
    num_salts: int = HOT_BUCKET_SALTS,
) -> DataFrame:
    """All ``(doc_a < doc_b)`` pairs sharing a ``(band, band_sig)`` bucket —
    the LSH candidate-generation self-join — with hot buckets (identical
    boilerplate docs hashing to one signature) split over a
    ``num_salts x num_salts`` grid so one bucket of B docs becomes S^2
    tasks of ~(B/S)^2 pairs instead of one task of B^2.

    Pair-set equivalence (tested property): a pair with salts (g_a, g_b)
    meets in exactly one grid cell — the left side replicates doc_a to
    cells (g_a, *), the right side replicates doc_b to cells (*, g_b), so
    the only matching cell is (g_a, g_b). Salts are deterministic hashes
    of doc_id (retry-safe, same argument as ops.skew.salted_join).

    Cold buckets take the plain self-join; routing costs one map-side
    bucket-size aggregate and a broadcast of the (tiny) hot-bucket list.
    Adaptive short-circuit (same pattern as ops.graph.connected_components):
    one cheap driver probe of the bucket-size aggregate, and when NO bucket
    exceeds the threshold — the common case — the plain self-join plan is
    returned with zero routing stages, so well-distributed corpora don't
    pay for skew insurance they don't need.
    """
    sizes = bands.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("_bn"))
    hot = sizes.where(F.col("_bn") > hot_threshold).select(
        "band", "band_sig", F.lit(True).alias("_hot")
    )

    def bucket_self_join(df, dedupe):
        # ONE definition of the (band, band_sig, doc_id<) candidate join,
        # used by both the no-hot-bucket short circuit (deduped here) and
        # the skew path's cold slice (deduped after the hot union) — the
        # bucketing key can never drift between the two paths
        a, b = df.alias("a"), df.alias("b")
        pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        return pairs.distinct() if dedupe else pairs

    if hot.limit(1).count() == 0:
        return bucket_self_join(bands, dedupe=True)

    tagged = bands.join(F.broadcast(hot), ["band", "band_sig"], "left")
    cold = tagged.where(F.col("_hot").isNull()).drop("_hot")
    hotb = tagged.where(F.col("_hot").isNotNull()).drop("_hot")

    def pair_select(j):
        return j.select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )

    cold_pairs = bucket_self_join(cold, dedupe=False)

    cells = F.array(*[F.lit(i) for i in range(num_salts)])
    g = F.pmod(F.hash("doc_id"), F.lit(num_salts))
    left = hotb.select(
        "band", "band_sig", "doc_id", g.alias("_ci"), F.explode(cells).alias("_cj")
    )
    right = hotb.select(
        "band", "band_sig", "doc_id", F.explode(cells).alias("_ci"), g.alias("_cj")
    )
    hot_pairs = pair_select(
        left.alias("a").join(
            right.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a._ci") == F.col("b._ci"))
            & (F.col("a._cj") == F.col("b._cj"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
    )

    return cold_pairs.unionByName(hot_pairs).distinct()


def _lsh_candidate_pair_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared LSH candidate generation + set retrieval for the minhash
    near-dup family: (doc_a, doc_b, _seta, _setb) for every band-bucket
    candidate pair, with each side's word-trigram shingle SET attached.
    Jaccard (symmetric) and containment (asymmetric) verification are both
    one projection over this relation.

    Verification joins candidates back to the shingle-set relation on
    doc_a then doc_b; both joins have a candidate-bounded small side, so
    AQE picks broadcast here and falls back to shuffle-on-doc_id joins
    when the candidate volume grows at 100 TB — either way the exploded
    shingle relation is never shuffled for verification. Docs with no
    shingles (< k words) are excluded up front, matching the oracle's
    sigs-over-shingles grouping.

    The 16 min-signatures deliberately go through explode + groupBy, NOT
    array_min(transform(...)): HOF lambdas are interpreted per element
    while the exploded md5 runs in whole-stage codegen (measured 4x the
    whole query at sf0.1), and the groupBy's map-side partial min means
    the shuffle carries 16 ints per doc, not the shingle relation. All 16
    derive from one md5 per shingle (see the _SIGS_SQL comment)."""
    d = load_table(spark, sf_dir, "documents")
    release_dedup_caches()  # evict the previous call's generation
    # r13: filter AFTER the cache pin, not inside the fill — pushdown
    # inlines a pre-cache `where(size(shingle_set) > 0)` below the
    # spread() exchange, re-evaluating the whole normalize+zip_with+
    # array_distinct chain per row in the single-partition scan stage
    # (plans/r13/near_dup_pairs_minhash_noinfer.txt ops 7/13). On the
    # cached column the same predicate is one size() per materialized
    # row; contents differ only by empty-set docs, which produce no
    # bands and join no candidates.
    sets = _cache(_word_shingle_arrays(d, SHINGLE_WORDS)).where(
        F.size("shingle_set") > 0
    )
    bands = _cache(_minhash_bands(sets))

    candidates = banded_candidate_pairs(bands)
    a = sets.select(
        F.col("doc_id").alias("_ida"), F.col("shingle_set").alias("_seta")
    )
    b = sets.select(
        F.col("doc_id").alias("_idb"), F.col("shingle_set").alias("_setb")
    )
    return candidates.join(a, F.col("_ida") == F.col("doc_a")).join(
        b, F.col("_idb") == F.col("doc_b")
    )


@register(
    "near_dup_pairs_minhash",
    oracle=f"""
WITH {_NEAR_PAIRS_CTES}
SELECT doc_a, doc_b, jaccard
FROM near_pairs
ORDER BY doc_a, doc_b
""",
    bench=True,
)
def near_dup_pairs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-duplicate detection, verified with exact Jaccard:
    word-trigram shingle SETS (array per doc) → 16 min-signatures (one md5
    per shingle, Carter-Wegman derivation) → 8 banded signatures of 2
    rows → candidate pairs sharing any band bucket → exact Jaccard via
    array_intersect on the candidate pairs only (pipeline details:
    ``_lsh_candidate_pair_sets``)."""
    paired = _lsh_candidate_pair_sets(spark, sf_dir)
    n_common = F.size(F.array_intersect("_seta", "_setb"))
    jac = paired.select(
        "doc_a",
        "doc_b",
        (
            n_common.cast("double")
            / (F.size("_seta") + F.size("_setb") - n_common)
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= JACCARD_THRESHOLD).orderBy("doc_a", "doc_b")


CONTAINMENT_THRESHOLD = 0.8


@register(
    "near_dup_containment",
    oracle=f"""
WITH {_NEAR_PAIRS_CTES}
SELECT doc_a, doc_b, n_a AS size_a, n_b AS size_b,
       CAST(n_common AS DOUBLE) / LEAST(n_a, n_b) AS containment
FROM verified
WHERE CAST(n_common AS DOUBLE) / LEAST(n_a, n_b) >= {CONTAINMENT_THRESHOLD}
ORDER BY doc_a, doc_b
""",
)
def near_dup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-duplicate detection by shingle-set CONTAINMENT:
    |A∩B| / min(|A|,|B|) >= 0.8. Catches the quote/excerpt/boilerplate
    case symmetric Jaccard misses — a short doc fully embedded in a long
    one has tiny Jaccard (union is dominated by the long doc) but
    containment ~1. Candidate generation is the same banded MinHash join
    as near_dup_pairs_minhash (``_lsh_candidate_pair_sets``), so this
    reports containment ON the LSH candidate set: the full-corpus recall
    caveat (extreme length ratios hash to different bands) is inherent to
    minhash blocking and documented here; the oracle applies the identical
    candidate set, so the gate checks the verification math exactly."""
    paired = _lsh_candidate_pair_sets(spark, sf_dir)
    n_common = F.size(F.array_intersect("_seta", "_setb"))
    cont = paired.select(
        "doc_a",
        "doc_b",
        F.size("_seta").alias("size_a"),
        F.size("_setb").alias("size_b"),
        (
            n_common.cast("double") / F.least(F.size("_seta"), F.size("_setb"))
        ).alias("containment"),
    )
    return cont.where(F.col("containment") >= CONTAINMENT_THRESHOLD).orderBy(
        "doc_a", "doc_b"
    )


# --------------------------------------------------------------------------
# SimHash: 32-bit signatures + banded hamming-distance near-dup pairs.
# --------------------------------------------------------------------------

SIMHASH_BITS = 32
HAMMING_MAX = 3

# Engine-portable bit math: nibble j of md5(word) via strpos/instr on the
# hex alphabet; bit extraction via FLOOR(nib / 2^b) % 2 (no engine-specific
# shift operators); signature packing via SUM(bit_k * 2^k).
_TOKENS_SQL = f"""
  SELECT DISTINCT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '')) AS word
  FROM documents
"""

_SIMHASH_SQL = f"""
WITH toks AS ({_TOKENS_SQL}),
bits AS (
  SELECT doc_id, word, k,
         STRPOS('0123456789abcdef',
                SUBSTRING(MD5(word), CAST(FLOOR(k / 4) AS INT) + 1, 1)) - 1 AS nib
  FROM toks CROSS JOIN (SELECT UNNEST(RANGE(0, {SIMHASH_BITS})) AS k) ks
),
contrib AS (
  SELECT doc_id, k,
         SUM(2 * (CAST(FLOOR(nib / POW(2.0, k % 4)) AS INT) % 2) - 1) AS s
  FROM bits GROUP BY doc_id, k
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(POW(2.0, k) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM contrib GROUP BY doc_id
"""


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature pipeline, shaped for scale: md5 is computed ONCE per token
    and materialized (an exploded tokens×32-bits formulation re-ran md5 per
    bit row — 16M hashes at sf0.1, 22.7s); the 8 nibbles are cheap
    substring/instr columns; all 32 vote sums happen in a single per-doc
    hash aggregate (map-side combined, shuffle carries 5000×32 ints), and
    the final sign+pack is a projection. No bit-level explode exists, so
    shuffle volume is O(docs), not O(tokens×bits)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(_normalized(), " "), lambda x: x != F.lit(""))
    toks = spread(d).select("doc_id", F.explode(words).alias("word")).distinct()
    nibs = toks.select("doc_id", F.md5("word").alias("h")).select(
        "doc_id",
        *[
            F.expr(f"instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1").alias(
                f"n{j}"
            )
            for j in range(SIMHASH_BITS // 4)
        ],
    )
    sums = nibs.groupBy("doc_id").agg(
        *[
            F.sum(
                2 * (F.expr(f"cast(floor(n{k // 4} / {2 ** (k % 4)}) as int)") % 2) - 1
            ).alias(f"v{k}")
            for k in range(SIMHASH_BITS)
        ]
    )
    pack = " + ".join(
        f"(case when v{k} > 0 then {2 ** k} else 0 end)" for k in range(SIMHASH_BITS)
    )
    return sums.select(
        "doc_id", F.expr(f"cast({pack} as bigint)").alias("simhash")
    )


@register(
    "doc_simhash32",
    oracle=f"""
{_SIMHASH_SQL}
ORDER BY doc_id
""",
)
def doc_simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document over distinct word tokens: each md5
    nibble votes ±1 on its 4 bits; the majority sign becomes the bit.
    One hash per token, one per-doc aggregate with 32 vote-sum columns —
    no Python and no bit-level explode in the path (see _simhash_df)."""
    return _simhash_df(spark, sf_dir).orderBy("doc_id")


@register(
    "simhash_near_pairs",
    oracle=f"""
WITH sims AS ({_SIMHASH_SQL}),
bands AS (
  SELECT doc_id, simhash, b,
         CAST(FLOOR(simhash / POW(2.0, 8 * b)) AS BIGINT) % 256 AS band_val
  FROM sims CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS b) bs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, BIT_COUNT(XOR(sim_a, sim_b)) AS hamming
FROM cand
WHERE BIT_COUNT(XOR(sim_a, sim_b)) <= {HAMMING_MAX}
ORDER BY doc_a, doc_b
""",
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicates: pairs within hamming distance <= 3 of the
    32-bit signature. Pigeonhole banding (4 bytes — any pair within
    hamming 3 shares at least one untouched byte) keeps candidate
    generation to equi-join buckets, never an all-pairs join.

    Not in the bench headline set: on this templated synthetic corpus a
    32-bit token-set SimHash is collision-heavy, so the OUTPUT is
    quadratic in cluster size (~1.5M pairs at sf0.1) — the cost is the
    legitimate result volume, not the plan. The jaccard-verified MinHash
    query is the production dedup path and the bench representative."""
    sims = _simhash_df(spark, sf_dir)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b"),
    ).select(
        "doc_id",
        "simhash",
        "b",
        F.expr("cast(floor(simhash / pow(2.0, 8 * b)) as bigint) % 256").alias(
            "band_val"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Direct n-gram Jaccard with attribute blocking (no LSH).
# --------------------------------------------------------------------------

BIGRAM_THRESHOLD = 0.2

_BIGRAMS_SQL = f"""
  SELECT doc_id, source, UNNEST(LIST_DISTINCT([w[i] || ' ' || w[i+1]
                 FOR i IN RANGE(1, GREATEST(LEN(w) - 1, 0) + 1)])) AS shingle
  FROM (SELECT doc_id, source,
               LIST_FILTER(STRING_SPLIT({_NORM_SQL}, ' '), x -> x <> '') AS w
        FROM documents) t
"""


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH sh AS ({_BIGRAMS_SQL}),
sizes AS (SELECT doc_id, ANY_VALUE(source) AS source, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {BIGRAM_THRESHOLD}
ORDER BY doc_a, doc_b
""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard similarity with attribute blocking (same-source
    pairs only) and inverted-index candidate generation: only pairs sharing
    at least one shingle materialize, via the shingle equi-join — the
    classic blocking+verify pattern when metadata already partitions the
    corpus."""
    d = load_table(spark, sf_dir, "documents")
    sh = _word_shingles(d, 2, "source")
    sizes = sh.groupBy("doc_id").agg(
        F.any_value("source").alias("source"), F.count(F.lit(1)).alias("n")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("c").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= BIGRAM_THRESHOLD).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# Transitive dedup clusters: iterative connected components over the
# verified near-dup pair graph.
# --------------------------------------------------------------------------


@register(
    "doc_dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_NEAR_PAIRS_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM near_pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM near_pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id
FROM reach
GROUP BY id
ORDER BY doc_id
""",
)
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters (the dedup survivor-group primitive:
    A~B and B~C put A,C in one cluster even when A!~C directly): iterative
    min-label propagation over the jaccard-verified pair graph —
    ops.graph.connected_components, the reference's driver-loop shape
    (src/main.cpp:59-99) generalized to a graph fixpoint. Oracle is a
    DuckDB recursive CTE computing the same closure."""
    from otus_cpp_11_spark.ops.graph import connected_components

    pairs = near_dup_pairs_minhash(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


BLAST_MAX_HOPS = 4
BLAST_N_SEEDS = 3

_BLAST_RECURSION_SQL = f"""
uedges AS (
  SELECT doc_a AS s, doc_b AS d FROM near_pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM near_pairs
),
seeds AS (
  SELECT DISTINCT s AS id FROM uedges ORDER BY id LIMIT {BLAST_N_SEEDS}
),
reach(seed_id, id, hop) AS (
  SELECT id, id, 0 FROM seeds
  UNION ALL
  SELECT DISTINCT r.seed_id, e.d, r.hop + 1
  FROM reach r JOIN uedges e ON e.s = r.id
  WHERE r.hop < {BLAST_MAX_HOPS}
)
SELECT seed_id, id AS doc_id, CAST(MIN(hop) AS BIGINT) AS hops
FROM reach
GROUP BY seed_id, id
ORDER BY seed_id, doc_id"""


@register(
    "dup_blast_radius",
    oracle=f"""
WITH RECURSIVE {_NEAR_PAIRS_CTES},{_BLAST_RECURSION_SQL}
""",
)
def dup_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination blast radius by NATIVE recursive SQL: BFS hop
    distance from seed documents through the verified near-dup graph,
    bounded at {BLAST_MAX_HOPS} hops — the quarantine sweep a curation
    pipeline runs when a document is found contaminated (benchmark
    leakage, PII, licence): everything within a few near-dup hops is
    suspect even when not directly similar to the seed (A~B~C chains,
    the same transitivity ``doc_dedup_clusters`` exploits). Spark 4.1
    executes the ``WITH RECURSIVE`` itself (UnionLoop), so the SAME SQL
    text runs on both engines — this row is also a cross-engine check
    on the recursion machinery that ``doc_dedup_clusters``'s oracle has
    always used one-sidedly.

    Recursion discipline (what makes UNION ALL recursion terminate and
    scale): the working table carries (seed_id, node, hop); each level
    is ONE frontier-sized join against the edge list plus a per-step
    DISTINCT, so the level never exceeds seeds × nodes rows no matter
    how many walks exist; the hop bound caps the number of rounds. At
    100 TB the edge list is the (already bounded) LSH-verified pair
    set, each round is an AQE-planned shuffle join sized by the
    FRONTIER (the blast radius, not the corpus), and {BLAST_MAX_HOPS}
    rounds is the whole cost — the full-closure alternative stays
    ``ops.graph.connected_components`` (label propagation), which this
    query's min-hop output refines with distance. Reference parity:
    extension mandate (dedup/curation battery)."""
    pairs = near_dup_pairs_minhash(spark, sf_dir).select("doc_a", "doc_b")
    pairs.createOrReplaceTempView("sg_blast_near_pairs")
    return spark.sql(
        "WITH RECURSIVE "
        + _BLAST_RECURSION_SQL.lstrip().replace(
            "FROM near_pairs", "FROM sg_blast_near_pairs"
        )
    )


@register(
    "near_dup_edit_distance",
    oracle=f"""
WITH {_NEAR_PAIRS_CTES}
SELECT p.doc_a, p.doc_b, p.jaccard,
       LEVENSHTEIN(da.text, db.text) AS edit_dist,
       CAST(LEVENSHTEIN(da.text, db.text) AS DOUBLE)
         / GREATEST(LENGTH(da.text), LENGTH(db.text)) AS edit_ratio
FROM near_pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
""",
)
def near_dup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level verification of MinHash near-dup pairs: Levenshtein
    distance and length-normalized ratio per verified pair. Edit distance
    is O(len_a * len_b) so it NEVER runs corpus x corpus — only on the
    LSH-verified pair set (|pairs| ~ |duplicate docs|), joined back to the
    text via two broadcast-friendly joins on doc_id. The second opinion a
    curation pipeline logs before dropping a near-duplicate."""
    d = load_table(spark, sf_dir, "documents")
    pairs = near_dup_pairs_minhash(spark, sf_dir)
    da = d.select(F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"))
    db = d.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"))
    dist = F.levenshtein("a_text", "b_text")
    return (
        pairs.join(da, F.col("doc_a") == F.col("a_id"))
        .join(db, F.col("doc_b") == F.col("b_id"))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            dist.alias("edit_dist"),
            (
                dist.cast("double")
                / F.greatest(F.length("a_text"), F.length("b_text"))
            ).alias("edit_ratio"),
        )
        .orderBy("doc_a", "doc_b")
    )


_EST_MATCH_SQL = " + ".join(
    f"CASE WHEN sa.s{h} = sb.s{h} THEN 1 ELSE 0 END" for h in range(NUM_HASHES)
)


@register(
    "minhash_estimate_accuracy",
    oracle=f"""
WITH {_NEAR_PAIRS_CTES}
SELECT p.doc_a, p.doc_b, p.jaccard,
       ({_EST_MATCH_SQL}) / {NUM_HASHES}.0 AS jaccard_est,
       ABS(({_EST_MATCH_SQL}) / {NUM_HASHES}.0 - p.jaccard) <= 0.4 AS within_bound
FROM near_pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
""",
)
def minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy gate for MinHash (the HLL-gate pattern applied to
    signatures): for every verified near-dup pair, the signature-agreement
    Jaccard estimate (matching components / 16) next to the exact
    array_intersect Jaccard, plus a 0.4 error-bound boolean the oracle
    asserts literally TRUE — a signature family drifting out of spec flips
    the boolean and fails the value hash. Estimate and exact are both
    rational arithmetic, so the comparison is engine-exact. Signatures are
    one extra pass over shingles; the pair relation is candidate-sized."""
    pairs = near_dup_pairs_minhash(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    shingles = _word_shingles(d, SHINGLE_WORDS)
    sigs = _minhash_sigs(shingles)
    sa = sigs.select(
        F.col("doc_id").alias("_sa_id"), *[F.col(f"s{h}").alias(f"sa{h}") for h in range(NUM_HASHES)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("_sb_id"), *[F.col(f"s{h}").alias(f"sb{h}") for h in range(NUM_HASHES)]
    )
    matches = sum(
        F.when(F.col(f"sa{h}") == F.col(f"sb{h}"), 1).otherwise(0)
        for h in range(NUM_HASHES)
    )
    est = matches / F.lit(float(NUM_HASHES))
    return (
        pairs.join(sa, F.col("_sa_id") == F.col("doc_a"))
        .join(sb, F.col("_sb_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            est.alias("jaccard_est"),
            (F.abs(est - F.col("jaccard")) <= 0.4).alias("within_bound"),
        )
        .orderBy("doc_a", "doc_b")
    )


INCREMENTAL_MOD = 4
INCREMENTAL_REM = 3  # doc_id % 4 == 3 plays the incoming shard


@register(
    "incremental_near_dup",
    bench=True,
    oracle=f"""
WITH shingles AS ({_SHINGLES_SQL}),
sigs AS (
  SELECT doc_id,
         {_SIGS_SQL}
  FROM (SELECT doc_id, ({_A_SQL}) AS a, ({_B_SQL}) AS b
        FROM (SELECT doc_id, MD5(shingle) AS h FROM shingles) hashed) ab
  GROUP BY doc_id
),
band_cols AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
bands AS ({_BAND_UNPIVOT_SQL}),
candidates AS (
  SELECT DISTINCT i.doc_id AS new_doc, x.doc_id AS index_doc
  FROM bands i JOIN bands x ON i.band = x.band AND i.band_sig = x.band_sig
  WHERE i.doc_id % {INCREMENTAL_MOD} = {INCREMENTAL_REM}
    AND x.doc_id % {INCREMENTAL_MOD} <> {INCREMENTAL_REM}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
verified AS (
  SELECT c.new_doc, c.index_doc, COUNT(*) AS n_common, sa.n AS n_a, sb.n AS n_b
  FROM candidates c
  JOIN shingles x ON x.doc_id = c.new_doc
  JOIN shingles y ON y.doc_id = c.index_doc AND y.shingle = x.shingle
  JOIN sizes sa ON sa.doc_id = c.new_doc
  JOIN sizes sb ON sb.doc_id = c.index_doc
  GROUP BY c.new_doc, c.index_doc, sa.n, sb.n
)
SELECT new_doc, index_doc,
       CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
FROM verified
WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= {JACCARD_THRESHOLD}
ORDER BY new_doc, index_doc
""",
)
def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: dedup an INCOMING shard against the EXISTING
    corpus index — the shape a production ingest actually runs (nobody
    re-dedups 100 TB for each new crawl; new docs are checked against a
    stored signature index and only accepted if novel). doc_id % 4 == 3
    models the incoming shard; everything else is the index.

    Candidate generation joins the incoming band signatures against the
    index band signatures on (band, band_sig) — never doc x doc, and
    unlike the self-join family there is no a<b ordering trick: the roles
    are asymmetric (new_doc, index_doc). Verification is the same
    candidate-bounded array_intersect.

    Scale: at 100 TB the index side of _minhash_bands is PRECOMPUTED and
    stored (signatures are write-once at ingest — 16 ints + 8 band hashes
    per doc, ~0.1% of corpus bytes); only the incoming shard pays
    shingling. The incoming side is small, so AQE broadcasts its band
    relation and the index is probed in place without shuffling; no
    explicit hint — a backfill-sized 'incoming' batch degrades to a
    shuffle join instead of OOMing (same policy as decontamination's
    probe gate). Hot band buckets from boilerplate are index-side; AQE
    skew-join splits them."""
    d = load_table(spark, sf_dir, "documents")
    release_dedup_caches()
    # r13: filter on the CACHED column (see _lsh_candidate_pair_sets) —
    # a pre-cache where() is pushed below the spread() exchange and
    # re-runs the shingle chain serially in the scan stage.
    sets = _cache(_word_shingle_arrays(d, SHINGLE_WORDS)).where(
        F.size("shingle_set") > 0
    )
    bands = _cache(_minhash_bands(sets))
    is_inc = F.col("doc_id") % INCREMENTAL_MOD == INCREMENTAL_REM
    inc = bands.where(is_inc).select(
        F.col("doc_id").alias("new_doc"), "band", "band_sig"
    )
    idx = bands.where(~is_inc).select(
        F.col("doc_id").alias("index_doc"), "band", "band_sig"
    )
    candidates = (
        inc.join(idx, ["band", "band_sig"]).select("new_doc", "index_doc").distinct()
    )
    a = sets.select(F.col("doc_id").alias("_ida"), F.col("shingle_set").alias("_seta"))
    b = sets.select(F.col("doc_id").alias("_idb"), F.col("shingle_set").alias("_setb"))
    paired = candidates.join(a, F.col("_ida") == F.col("new_doc")).join(
        b, F.col("_idb") == F.col("index_doc")
    )
    n_common = F.size(F.array_intersect("_seta", "_setb"))
    jac = paired.select(
        "new_doc",
        "index_doc",
        (
            n_common.cast("double")
            / (F.size("_seta") + F.size("_setb") - n_common)
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= JACCARD_THRESHOLD).orderBy(
        "new_doc", "index_doc"
    )


@register(
    "leakage_safe_split",
    oracle=f"""
WITH RECURSIVE {_NEAR_PAIRS_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM near_pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM near_pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
),
clusters AS (
  SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
),
grouped AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_key
  FROM documents d LEFT JOIN clusters c USING (doc_id)
)
SELECT doc_id, group_key,
       CASE WHEN ((STRPOS('0123456789abcdef',
                          SUBSTRING(MD5(CAST(group_key AS VARCHAR)), 7, 1)) - 1) * 16
                + (STRPOS('0123456789abcdef',
                          SUBSTRING(MD5(CAST(group_key AS VARCHAR)), 8, 1)) - 1)) % 8 = 0
            THEN 'val' ELSE 'train' END AS split
FROM grouped
ORDER BY doc_id
""",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: the fold is hashed from the doc's
    NEAR-DUP CLUSTER root (singleton docs fall back to their own id), so
    a document and all its near-duplicates land in the SAME fold by
    construction — the split discipline that keeps paraphrased copies of
    a val document out of train (the eval-contamination channel plain
    per-doc random splits leave open; same motivation as benchmark
    decontamination, applied at split time). Deterministic md5 fold
    hash (two-nibble arithmetic, identical in both engines), expected
    1/8 of groups in val.

    Scale shape: reuses the LSH near-dup pair graph + iterative
    connected components (never all-pairs); the cluster relation is
    |duplicated docs| rows — orders of magnitude smaller than the corpus
    — so the left join back to documents is AQE-broadcastable at
    moderate duplication rates and degrades to shuffle when half the
    web is a copy of the other half. The fold hash is a pure column
    expression over the group key, so the split column can be computed
    at write time and used as a partition key (train/val live in
    separate partitions; no scan-time filtering)."""
    d = load_table(spark, sf_dir, "documents")
    clusters = doc_dedup_clusters(spark, sf_dir)
    grouped = (
        d.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("group_key"),
        )
    )
    h = (
        F.conv(
            F.substring(F.md5(F.col("group_key").cast("string")), 7, 2), 16, 10
        ).cast("bigint")
        % 8
    )
    return grouped.select(
        "doc_id",
        "group_key",
        F.when(h == 0, "val").otherwise("train").alias("split"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Exact similarity join via PREFIX FILTERING (the PPJoin family, Xiao et
# al.): the deterministic-complete alternative to MinHash banding — zero
# false negatives by construction, candidates bounded by a pigeonhole
# argument instead of probability.
# --------------------------------------------------------------------------


@register(
    "jaccard_prefix_filter_pairs",
    bench=True,
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, n_common, sa.n AS n_a, sb.n AS n_b,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 3 * n_common >= sa.n + sb.n
ORDER BY doc_a, doc_b
""",
)
def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard >= 0.5 similarity join via prefix filtering: each
    doc's shingle set is ordered by global frequency (rarest first) and
    only its PREFIX — the first n - ceil(n/2) + 1 shingles — enters the
    candidate index. Completeness is pigeonhole, not probability: for the
    globally-smallest common shingle e of a qualifying pair, every
    earlier shingle in either doc is non-shared, and J >= 1/2 forces
    n_common >= ceil(n/2) on each side, so e sits inside BOTH prefixes —
    the ORACLE runs the full inverted-index formulation, and the
    cross-engine match is a machine-checked proof the pruning lost no
    pair. The threshold predicate is pure integers (3c >= n_a + n_b);
    jaccard itself is the exact int/int double.

    This is the deterministic-complete sibling of near_dup_pairs_minhash:
    banding trades false negatives for candidate volume; prefix filtering
    keeps exactness and still indexes only ~half of each set, with the
    rare-first ordering steering candidates toward low-frequency shingles
    (hot boilerplate shingles land in the suffix, OUT of the index — the
    skew the banded join must salt away never materializes here). At
    100 TB the shingle-frequency relation is vocabulary-sized and
    AQE-planned (it scales, so no broadcast hint), the per-doc prefix cut
    is one bounded window per doc, and the verify join touches only
    candidate pairs.

    The shingle relation feeds FIVE consumers in this one plan (sizes,
    frequency, prefix positions, both verify sides), so it is cached
    for the call — the minhash family's single-generation pattern;
    without it every consumer re-ran the shingling regex (r8 bench
    audit: ~2x the whole query).

    r12 plan rework, output byte-identical (A/B-proven at sf0.1, ~25%
    faster end to end): (a) the classic PPJoin LENGTH filter rides in
    the candidate join — J >= 1/2 forces max(n_a, n_b) <= 2·min(n_a,
    n_b) because n_common <= min and 3·n_common >= n_a + n_b, so
    unbalanced pairs are dismissed losslessly BEFORE the distinct and
    the verify; (b) verification intersects per-doc shingle ARRAYS
    (one hash-set intersect per candidate pair, the minhash family's
    verify shape) instead of re-exploding both sides through a
    (pair × shingle) join — the explode path shuffled every candidate's
    full shingle multiset twice; the array path ships each doc's set
    once via two vec-id equi-joins.

    r13 optimization (guide §2.4 — remove duplicated subtrees feeding a
    self-join): the PREFIX relation (freq aggregate + sizes aggregate +
    two joins + per-doc window) and the SETS relation (per-doc
    collect_list) each feed BOTH sides of a self-join, and Catalyst
    plans self-joined subtrees twice — the r12 plan ran the whole
    freq/sizes/window chain and the collect_list aggregate twice each
    (plans/r13/jaccard_prefix_filter_pairs_before.txt, operators 10-33
    vs 34-59 and 68-70 vs 77-79). Both now join the single-generation
    dedup cache, so each heavy subtree executes once per call; output
    is unchanged (same relation read twice instead of computed twice)
    and the oracle re-proves it."""
    d = load_table(spark, sf_dir, "documents")
    release_dedup_caches()  # evict the previous call's generation
    sh = _cache(_word_shingles(d, SHINGLE_WORDS))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    pos = (
        sh.join(freq, "shingle")
        .join(sizes, "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("freq", "shingle")
            ),
        )
    )
    prefix = _cache(
        pos.where(F.col("pos") <= F.expr("n - ((n + 1) div 2) + 1")).select(
            "doc_id", "shingle", "n"
        )
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cands = (
        pa.join(
            pb,
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & (F.col("pa.n") <= 2 * F.col("pb.n"))
            & (F.col("pb.n") <= 2 * F.col("pa.n")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sets = _cache(
        sh.groupBy("doc_id").agg(
            F.collect_list("shingle").alias("s"), F.count(F.lit(1)).alias("n")
        )
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("_sa"),
        F.col("n").alias("n_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("_sb"),
        F.col("n").alias("n_b"),
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_common"),
            "n_a",
            "n_b",
        )
        .where(3 * F.col("n_common") >= F.col("n_a") + F.col("n_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
