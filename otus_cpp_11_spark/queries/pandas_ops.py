"""Arrow-batched Python surfaces the reference's generic functor API maps
onto when logic genuinely can't be a Column expression (SURVEY.md §2.2
'UDF/UDAF/UDTF surface'; the reference's user mapper is UDTF-shaped and its
reducer UDAF-shaped, src/mapreduce.hpp:26-27):

* ``applyInPandas`` (grouped map) — per-group numpy math over Arrow
  batches; here, per-label embedding whitening (residuals vs the label
  centroid). The group is the parallelism unit: each label's vectors
  arrive as one pandas frame, labels process in parallel across the
  cluster after one shuffle on the grouping key.
* Python UDTF (Spark 4) — the 1→N row expansion shape as a first-class
  lateral table function; here, RAG-style passage chunking.

Both are oracle-gated like every Column-expression query: the numpy math
uses the same fixed-point integer domains as the SQL mirror, so even the
Python path hash-matches DuckDB bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.registry import register

CENT_SCALE = 10**7  # centroid fixed point — matches label_centroids
SSE_SCALE = 10**12  # residual fixed point


@register(
    "label_whitening_residuals",
    oracle=f"""
WITH expl AS (
  SELECT vec_id, label,
         UNNEST([{{'pos': i - 1, 'v': embedding[i]}} FOR i IN RANGE(1, LEN(embedding) + 1)]) AS t
  FROM embeddings
),
cent AS (
  SELECT label, t.pos AS pos,
         (CAST(SUM(CAST(FLOOR(CAST(t.v AS DOUBLE) * {CENT_SCALE}.0) AS DECIMAL(38,0))) AS DOUBLE)
          / {CENT_SCALE}.0) / COUNT(*) AS c
  FROM expl GROUP BY label, t.pos
)
SELECT e.vec_id, e.label,
       CAST(SUM(CAST(FLOOR((CAST(e.t.v AS DOUBLE) - c.c) * (CAST(e.t.v AS DOUBLE) - c.c)
                           * {SSE_SCALE}.0) AS BIGINT)) AS BIGINT) AS residual_sse_units
FROM expl e JOIN cent c ON c.label = e.label AND c.pos = e.t.pos
GROUP BY e.vec_id, e.label
ORDER BY e.vec_id
""",
)
def label_whitening_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding whitening via applyInPandas: each label group
    computes its centroid (same fixed-point mean as label_centroids) and
    every vector's squared residual against it, in vectorized numpy over
    one Arrow batch per label. All sums run in exact integer domains, so
    this Python path hash-matches the SQL oracle. One shuffle on label;
    at 100 TB, labels fan out across executors and a hot label is split
    with a two-pass salted mean."""
    e = load_table(spark, sf_dir, "embeddings")

    def whiten(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n = mat.shape[0]
        units = np.floor(mat * CENT_SCALE).astype(np.int64).sum(axis=0)
        centroid = (units.astype(np.float64) / CENT_SCALE) / n
        resid = mat - centroid
        sse = np.floor(resid * resid * SSE_SCALE).astype(np.int64).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "residual_sse_units": sse,
            }
        )

    return (
        e.select("vec_id", "label", "embedding")
        .groupBy("label")
        .applyInPandas(
            whiten, schema="vec_id long, label int, residual_sse_units long"
        )
        .orderBy("vec_id")
    )


_CHUNK_ORACLE = """
WITH w AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS w
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       ARRAY_TO_STRING(w[i * 10 + 1 : i * 10 + 10], ' ') AS passage
FROM w, (SELECT UNNEST(RANGE(0, 1000)) AS i) idx
WHERE i * 10 < LEN(w)
ORDER BY doc_id, chunk_id
"""


@register("doc_passage_chunks", oracle=_CHUNK_ORACLE)
def doc_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage chunking, production path: pure Column expressions (slice +
    posexplode), no Python in the row loop — whole-stage codegen end to
    end, ~10-100x the UDTF variant below on wide corpora. Same oracle as
    doc_passage_chunks_udtf, so both surfaces are value-gated against the
    identical spec."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    with_words = d.select("doc_id", words.alias("w")).where(F.size("w") > 0)
    n_chunks = F.ceil(F.size("w") / F.lit(10)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(F.col("w"), i * 10 + 1, 10), " "),
    )
    return with_words.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "passage")
    ).orderBy("doc_id", "chunk_id")


@register("doc_passage_chunks_udtf", oracle=_CHUNK_ORACLE)
def doc_passage_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage chunking (the RAG / context-window prep op: fixed 10-word
    chunks per document) as a Python UDTF — Spark 4's lateral table
    function, the reference's flatMap-shaped user mapper
    (src/mapreduce.hpp:26) as a first-class SQL-callable 1→N expansion.
    Row-at-a-time Python is the deliberate slow path; the Column-expression
    equivalent is registered as ``doc_passage_chunks`` (same oracle) —
    this entry proves the UDTF surface."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: int, passage: string")
    class ChunkWords:
        def eval(self, text: str):
            words = [w for w in text.split(" ") if w]
            for i in range(0, len(words), 10):
                yield i // 10, " ".join(words[i : i + 10])

    spark.udtf.register("chunk_words", ChunkWords)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        """
        SELECT doc_id, c.chunk_id, c.passage
        FROM _docs_for_udtf, LATERAL chunk_words(text) AS c
        ORDER BY doc_id, chunk_id
        """
    )


@register(
    "doc_arrow_byte_stats",
    oracle="""
SELECT doc_id,
       OCTET_LENGTH(ENCODE(text)) AS n_bytes,
       LEN(text) AS n_chars,
       CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) / GREATEST(LEN(text), 1) AS bytes_per_char
FROM documents
ORDER BY doc_id
""",
)
def doc_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow demonstration — the lowest-overhead Python boundary:
    RecordBatches flow in and out with ZERO pandas conversion, and the
    computation itself runs in Arrow compute kernels (C++), so Python only
    orchestrates. Per doc: UTF-8 byte length, character length, and
    bytes/char (a multilingual-content signal — ASCII ~1.0, CJK ~3.0).
    Use this path over mapInPandas whenever the kernel exists in
    pyarrow.compute; pandas adds a copy + index machinery per batch."""
    import pyarrow as pa

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batches(it):
        import pyarrow.compute as pc

        for batch in it:
            text = batch.column(1)
            n_bytes = pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64())
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            ratio = pc.divide(
                pc.cast(n_bytes, pa.float64()),
                pc.cast(pc.max_element_wise(n_chars, pa.scalar(1, pa.int64())), pa.float64()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), n_bytes, n_chars, ratio],
                names=["doc_id", "n_bytes", "n_chars", "bytes_per_char"],
            )

    return d.mapInArrow(
        batches,
        schema="doc_id bigint, n_bytes bigint, n_chars bigint, bytes_per_char double",
    ).orderBy("doc_id")


@register(
    "events_props_variant",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       COUNT(*) AS n
FROM events
GROUP BY k_value
ORDER BY k_value NULLS FIRST
""",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): props parses ONCE into the
    binary VARIANT encoding and extraction navigates that encoding —
    unlike get_json_object (events_json_props), which re-parses the JSON
    string per call site. With several extractions per row the VARIANT
    form amortizes the parse; this is the open-lakehouse semi-structured
    type (also Parquet-storable, so at scale the parse happens once at
    ingest, not per query)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.parse_json("props").alias("v"))
        .select(F.try_variant_get("v", "$.k", "bigint").alias("k_value"))
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n"))
        # explicit NULLS FIRST on both sides: Spark defaults ASC NULLS
        # FIRST but DuckDB defaults NULLS LAST, so an event without an
        # integer '$.k' would otherwise land at opposite ends and flip
        # the row-order hash
        .orderBy(F.col("k_value").asc_nulls_first())
    )


@register(
    "python_datasource_checksum",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT i % 97) AS n_users,
       CAST(SUM((i * 31) % 1000) AS BIGINT) AS value_decisum
FROM RANGE(0, 5000) t(i)
""",
)
def python_datasource_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource connector (sources.SyntheticEventsDataSource)
    read through the standard spark.read.format path: the connector plans
    8 input partitions and each task generates only its slice — the
    arbitrary-connector contract (Kafka/JDBC/REST all reduce to
    partitions() + read(partition)). The aggregate checksums the whole
    stream; the oracle recomputes it from the closed form without reading
    the source at all."""
    from otus_cpp_11_spark.sources import register_synthetic_source

    register_synthetic_source(spark)
    df = spark.read.format("synthetic_events").option("rows", 5000).load()
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        # round, not truncate: value = n/10.0, and (n/10.0)*10.0 is not
        # guaranteed to land >= n after FP rounding — a bare cast would
        # truncate such a value to n-1 and break the oracle's exact
        # integer sum; round() is robust to representation error
        F.sum(F.round(F.col("value") * 10).cast("bigint")).alias("value_decisum"),
    )


@register(
    "python_datasource_stream_checksum",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT i % 97) AS n_users,
       CAST(SUM((i * 31) % 1000) AS BIGINT) AS value_decisum
FROM RANGE(0, 5000) t(i)
""",
)
def python_datasource_stream_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource, STREAMING face: the same synthetic
    connector read through spark.readStream — offsets are row indices,
    each micro-batch advances by batch_rows, and readBetweenOffsets
    replays committed ranges (the cursor-connector recovery contract).
    The stream drains through a memory sink (one append per micro-batch,
    five 1000-row batches here) and the checksum over the materialized
    table must equal the closed form no matter how the offsets were
    micro-batched — exactly the invariant a Kafka/CDC ingest relies on.
    AvailableNow advances a simple stream reader by only one batch per
    start, so the drain runs on a processing-time trigger with a bounded
    catch-up poll instead."""
    import time

    from otus_cpp_11_spark.sources import register_synthetic_source

    n = 5000
    register_synthetic_source(spark)
    df = (
        spark.readStream.format("synthetic_events")
        .option("rows", n)
        .option("batch_rows", 1000)
        .load()
    )
    name = "synthetic_events_stream"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and spark.table(name).count() < n:
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.table(name).count()
    if got < n:
        # An environment stall must report as an ERROR, not as a checksum
        # over a partial table — a red hash row would be indistinguishable
        # from a real correctness bug.
        raise TimeoutError(
            f"stream drained only {got}/{n} rows within the 120 s deadline"
        )
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 10).cast("bigint")).alias("value_decisum"),
    )


@register(
    "user_value_udaf_sum",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS BIGINT) AS value_units
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def user_value_udaf_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the UDAF face of the Python surface
    (completing UDTF / applyInPandas / mapInPandas / mapInArrow): a
    custom vectorized aggregate used INSIDE a regular .agg(),
    Arrow-batched per group with map-side partial application
    by Spark. The aggregate is the engine's exact fixed-point sum
    (floor(value*1e6) summed in int64 — numpy float64 floor is the same
    IEEE op both engines run), so even the custom-UDAF path hash-matches
    the oracle bit-for-bit. For a plain sum the built-in is always
    preferable (see dsum); the value here is the surface contract —
    production UDAFs carry logic built-ins lack (custom sketches,
    online-moment updates) and this is the shape they plug in as."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def decisum(v: pd.Series) -> int:
        return int(
            np.floor(v.to_numpy(dtype="float64") * 1e6).astype("int64").sum()
        )

    # Spark rejects mixing GROUPED_AGG pandas UDFs with non-pandas
    # aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count rides as a pandas aggregate too.
    @pandas_udf("long")
    def pcount(v: pd.Series) -> int:
        return int(len(v))

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            pcount(F.col("value")).alias("n_events"),
            decisum(F.col("value")).alias("value_units"),
        )
        .orderBy("user_id")
    )
