"""The reference's flagship query: minimal prefix length that uniquely
identifies every line of a text dataset.

Reference behavior (/root/reference/src/main.cpp:59-99): loop L = 1, 2, 3;
each iteration runs a full MapReduce job whose mapper emits
``(line.substr(0, L), 1)`` (main.cpp:62-74) and whose reducer votes false on
any adjacent duplicate key in the sorted stream (main.cpp:75-91); stop at the
first L where every prefix is unique. Semantic quirks we deliberately fix
(SURVEY.md §2.3): the L < 4 cap becomes a parameter defaulting to the longest
line; identical full lines are reported as "no answer" (None) instead of the
cap value.

Spark-first design — two strategies, both built on ``groupBy`` (the sorted
adjacency + key co-location contract of the reference shuffle,
description/homework/mapreduce.h:41-44, is exactly what a hash aggregate
guarantees for free):

* ``iterative``  — the reference's own loop shape. One Spark job per L over a
  cached input; each job is a partial-aggregated groupBy + short-circuit
  existence check (``cnt > 1 LIMIT 1``), so per-iteration shuffle traffic is
  small (distinct prefixes only, map-side combined). Scales to 100 TB: the
  cache is the only full materialization and each pass is embarrassingly
  parallel.
* ``single_pass`` — impossible in the reference's model, trivial in SQL:
  explode every row into (L, prefix) for L = 1..len(line) and aggregate once.
  Shuffle volume is O(rows * avg_len) — right when line width is bounded
  (keys, ids), wrong for long documents; callers pick.

Note the single-pass explodes each line only to its *own* length, not the
global max — shuffle volume stays proportional to data size, not data size x
global max length. This is sound because at any L, a line shorter than L
contributes its full text as its prefix, which can only compare equal to
another prefix string of the same (sub-L) length — i.e. to another short
line's *identical* full text. That is precisely the duplicate-full-line case,
which is handled by an explicit (cheap) duplicate guard: when any full line
occurs twice the answer is NULL regardless of L.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def prefix_counts(df: DataFrame, col: str, length: int) -> DataFrame:
    """(prefix, cnt) at a fixed prefix length — the reference's one MapReduce
    job (map: substr+lit(1), src/main.cpp:62-74; reduce: count per key)."""
    return df.groupBy(F.substring(F.col(col), 1, length).alias("prefix")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def has_duplicate_prefix(df: DataFrame, col: str, length: int) -> bool:
    """True iff some prefix of ``length`` occurs more than once.

    Short-circuits via LIMIT 1 over the post-aggregation filter — the
    reference's reducer early-false (src/main.cpp:83-88) expressed as an
    existence query.
    """
    return prefix_counts(df, col, length).where(F.col("cnt") > 1).limit(1).count() > 0


def min_unique_prefix_length(
    spark: SparkSession,
    df: DataFrame,
    col: str = "value",
    max_len: int | None = None,
    cache: bool = True,
    on_iteration=None,
) -> int | None:
    """Iterative driver loop, reference shape (src/main.cpp:61-99) minus the
    hard L<4 cap. Returns None when no unique prefix exists (duplicate full
    lines — SURVEY.md §2.3.5/§2.3.7).

    The input is cached once and reused across iterations (the reference
    re-reads the input file every pass; Spark lets us not).

    ``on_iteration(length, unique)`` is called after each pass — the CLI
    uses it to mirror the reference's per-iteration ``iter{L}/result.txt``
    output layout (src/runner.cpp:65).
    """
    if max_len is None:
        max_len = df.agg(F.max(F.length(F.col(col)))).first()[0] or 0
    if max_len == 0:
        return None
    if cache:
        df = df.cache()
    try:
        # A duplicate at max_len means duplicate full lines: no L can succeed.
        if has_duplicate_prefix(df, col, max_len):
            return None
        for length in range(1, max_len + 1):
            unique = not has_duplicate_prefix(df, col, length)
            if on_iteration is not None:
                on_iteration(length, unique)
            if unique:
                return length
        return max_len
    finally:
        if cache:
            df.unpersist()


def prefix_uniqueness_by_length(df: DataFrame, col: str = "value") -> DataFrame:
    """Single-pass per-L verdict table: ``[L, max_count]`` where
    ``max_count == 1`` marks lengths at which all prefixes are unique.

    Empty lines are filtered before the explode (Spark's ``sequence(1, 0)``
    would otherwise emit a descending [1, 0]); an empty line's prefix ""
    can only collide with another empty line — the duplicate-full-line case
    the caller's guard handles.
    """
    exploded = (
        df.where(F.length(F.col(col)) >= 1)
        .select(
            F.col(col).alias("_line"),
            F.explode(F.sequence(F.lit(1), F.length(F.col(col)))).alias("L"),
        )
        .select("L", F.expr("substring(_line, 1, L)").alias("prefix"))
    )
    return (
        exploded.groupBy("L", "prefix")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("L")
        .agg(F.max("cnt").alias("max_count"))
    )


def min_unique_prefix_length_single_pass(
    df: DataFrame, col: str = "value"
) -> DataFrame:
    """One-row DataFrame ``[min_unique_prefix_len: bigint]`` (NULL = no unique
    prefix exists, i.e. duplicate full lines).

    The duplicate guard (see module docstring) is a scalar aggregate cross-
    joined in — one extra row, no extra shuffle of the exploded data.
    """
    per_len = prefix_uniqueness_by_length(df, col)
    candidate = per_len.where(F.col("max_count") == 1).agg(
        F.min("L").cast("long").alias("_cand")
    )
    dup_guard = df.agg(
        (F.count(F.col(col)) > F.count_distinct(F.col(col))).alias("_has_dups")
    )
    return candidate.crossJoin(dup_guard).select(
        F.when(F.col("_has_dups"), F.lit(None).cast("long"))
        .otherwise(F.col("_cand"))
        .alias("min_unique_prefix_len")
    )
