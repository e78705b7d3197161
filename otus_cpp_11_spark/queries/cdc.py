"""Change-data-capture / lakehouse-maintenance operators: SCD2 dimension
history, MERGE INTO (upsert + delete apply), and the streaming CDC-apply
face of the same contract.

The reference's pipeline is append-only batch (src/runner.cpp:5-83 runs
one job over immutable inputs and exits); a 100 TB production lake also
has to ABSORB CHANGE — dimension attributes drift, upstream rows are
corrected or deleted, and a training-data refresh must see exactly the
post-merge state. These operators are the standard shapes for that
(Kimball SCD type 2; SQL MERGE; Debezium-style keyed changelogs), each
expressed as declarative DataFrame plans the driver can oracle-check.

Changelog modeling: the synthetic ``events`` table plays the CDC feed —
``user_id`` is the key, ``(ts, event_id)`` the total recency order, and
``event_type = 'error'`` is read as a delete tombstone (every other type
is an upsert). That mapping is arbitrary but deterministic, so both
engines derive the identical changelog from the same parquet.

Scale notes (beyond each docstring):

* Changelog compaction is ALWAYS struct-max argmax (partial-aggregated,
  one record per key per map task crosses the shuffle), never a window
  sort over raw changes — the same choice queries/pipeline.py makes for
  latest_event_per_user, and the difference between shuffling a day of
  CDC and shuffling one row per touched key.
* The merge join's strategy is left to AQE: a trickle batch broadcasts,
  a backfill sort-merges. No hints (the r3/r4 verdict rule: never force
  a broadcast on an unbounded-cardinality key).
* SCD2 windows partition by the natural key, so skew equals per-key
  change volume — bounded in any real dimension feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries import dsum, dsum_sql
from otus_cpp_11_spark.registry import register

# event_type read as a CDC delete tombstone (all other types upsert).
CDC_DELETE_TYPE = "error"
# synthetic key mapping events.user_id into (and deliberately past) the
# customer.c_custkey domain, so one changelog exercises every MERGE arm:
# update, delete, insert (key beyond the base table), and delete-miss.
CDC_KEY_MULT = 11
CDC_KEY_OFF = 7


# SCD2 history as a DuckDB CTE chain (shared by the history build and the
# point-in-time enrich oracles).
_SCD2_HIST_SQL = """
ordered AS (
  SELECT user_id, event_type AS state, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_state
  FROM events
),
changes AS (
  SELECT user_id, state, ts, event_id
  FROM ordered
  WHERE prev_state IS NULL OR state <> prev_state
),
hist AS (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS version,
         state,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
)
"""


def _scd2_history(events: DataFrame) -> DataFrame:
    """(user_id, version, state, valid_from, valid_to): the SCD2 history
    plan shared by user_state_scd2 and events_pit_enrich — collapse the
    change feed to state transitions, then stamp versions and validity
    over the same per-key order. BOTH windows tie-break on event_id: two
    transitions of one user at the same timestamp would otherwise get
    plan-dependent version/validity assignment (and the engines could
    legally disagree); with the tie-break the earlier-id version gets an
    empty [T, T) validity — deterministic bookkeeping both engines
    compute identically."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        F.lag("event_type").over(order).alias("prev_state"),
    ).where(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
    return changes.select(
        "user_id",
        F.row_number().over(order).cast("bigint").alias("version"),
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(order).alias("valid_to"),
    )


@register(
    "user_state_scd2",
    bench=True,
    oracle=f"""
WITH {_SCD2_HIST_SQL}
SELECT user_id, version, state, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM hist
ORDER BY user_id, version
""",
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: collapse the raw
    change feed to STATE TRANSITIONS (drop rows equal to the previous
    state — SCD2 records changes, not observations), then stamp each
    surviving version with ``[valid_from, valid_to)`` validity and an
    ``is_current`` flag via lead() over the same per-key order. Point-in-
    time training snapshots ("the dimension as of the data cutoff") are
    then a pure filter: valid_from <= t < coalesce(valid_to, inf).

    Plan shape: ONE shuffle on user_id; the lag-filter and the
    lead/row_number run over the same (user_id | ts, event_id) sort, so
    Catalyst reuses the exchange and the filtered re-sort is partition-
    local. At 100 TB of changelog the cost is that single key shuffle —
    identical to the sessionization family — and per-key skew equals
    per-key change volume, bounded in any real dimension feed."""
    e = load_table(spark, sf_dir, "events")
    return (
        _scd2_history(e)
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "version")
    )


_CDC_KEY_SQL = f"user_id * {CDC_KEY_MULT} + {CDC_KEY_OFF}"


@register(
    "customer_cdc_merge",
    bench=True,
    oracle=f"""
WITH latest AS (
  SELECT {_CDC_KEY_SQL} AS key, event_type, value
  FROM (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) t
  WHERE rn = 1
),
changes AS (
  SELECT key,
         CASE WHEN event_type = '{CDC_DELETE_TYPE}' THEN 'D' ELSE 'U' END AS op,
         value AS new_acctbal
  FROM latest
)
SELECT COALESCE(c.c_custkey, g.key) AS c_custkey,
       COALESCE(c.c_name, 'Customer#' || CAST(g.key AS VARCHAR)) AS c_name,
       COALESCE(c.c_nationkey, CAST(g.key % 25 AS INTEGER)) AS c_nationkey,
       COALESCE(c.c_mktsegment, 'STREAM') AS c_mktsegment,
       CASE WHEN g.op = 'U' THEN g.new_acctbal ELSE c.c_acctbal END AS c_acctbal,
       CASE WHEN g.key IS NULL THEN 'none'
            WHEN c.c_custkey IS NULL THEN 'insert'
            ELSE 'update' END AS op_applied
FROM customer c FULL OUTER JOIN changes g ON c.c_custkey = g.key
WHERE g.op IS NULL OR g.op = 'U'
ORDER BY c_custkey
""",
)
def customer_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SQL:2003 / lakehouse upsert): apply a keyed changelog
    to the customer base table in one declarative plan — WHEN MATCHED
    AND op='U' THEN UPDATE (acctbal), WHEN MATCHED AND op='D' THEN
    DELETE, WHEN NOT MATCHED AND op='U' THEN INSERT (a synthesized
    dimension row), delete-of-absent-key a no-op. The changelog is first
    compacted to newest-per-key (struct-max argmax — one shuffled row
    per key), because SQL MERGE requires at most one source row per
    target key; the merge itself is a single full-outer join + CASE.

    Scale notes: the compaction is partial-aggregated map-side; the
    full-outer join's strategy is AQE's call (trickle batch → broadcast,
    backfill → sort-merge; no hint on the unbounded key). On an ACID
    table format the identical plan runs as MERGE INTO and rewrites only
    files containing matched keys — with the z-order layout cells of
    queries/sampling.py deciding WHICH files those are. Emitting the
    full post-merge table here (1500 rows at sf0.01) makes every arm of
    the merge driver-checkable, including untouched carry-through."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    latest = (
        e.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m"))
        .select(
            (F.col("user_id") * CDC_KEY_MULT + CDC_KEY_OFF).alias("key"),
            F.when(F.col("m.event_type") == CDC_DELETE_TYPE, "D")
            .otherwise("U")
            .alias("op"),
            F.col("m.value").alias("new_acctbal"),
        )
    )
    merged = c.join(latest, c.c_custkey == latest.key, "full_outer")
    return (
        merged.where(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            F.coalesce("c_custkey", "key").alias("c_custkey"),
            F.coalesce(
                "c_name", F.concat(F.lit("Customer#"), F.col("key").cast("string"))
            ).alias("c_name"),
            F.coalesce("c_nationkey", (F.col("key") % 25).cast("int")).alias(
                "c_nationkey"
            ),
            F.coalesce("c_mktsegment", F.lit("STREAM")).alias("c_mktsegment"),
            F.when(F.col("op") == "U", F.col("new_acctbal"))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(F.col("key").isNull(), "none")
            .when(F.col("c_custkey").isNull(), "insert")
            .otherwise("update")
            .alias("op_applied"),
        )
        .orderBy("c_custkey")
    )


@register(
    "user_state_cdc_streamed",
    oracle=f"""
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_state, value AS last_value
FROM (
  SELECT user_id, ts, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1 AND event_type <> '{CDC_DELETE_TYPE}'
ORDER BY user_id
""",
)
def user_state_cdc_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming, driver-visible: replay the events table as a
    change stream through the foreachBatch CDC-apply maintainer
    (streaming.cdc_upsert_user_state) under Trigger.AvailableNow, then
    read the maintained keyed table back, filtering delete tombstones.
    The oracle is the BATCH newest-per-key compaction over the whole
    changelog — the CDC contract: however the stream was micro-batched,
    the maintained table equals a from-scratch compaction, because merge
    is latest-wins on the total (ts, event_id) recency order and
    tombstones stay in the stored table so no later-arriving older
    record can resurrect a deleted key (see cdc_upsert_user_state).

    This is the streaming face of customer_cdc_merge's batch MERGE:
    same compaction, same recency order, applied incrementally. Since r7
    the maintainer commits each batch as a VERSION of a manifest table
    (ops.versioned — file-pruned MERGE, batch id in the commit header),
    so the read-back goes through ``read_version``: the snapshot a
    reader binds to is immutable under any concurrent batch."""
    from otus_cpp_11_spark.ops.versioned import read_version
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.streaming import cdc_upsert_user_state, read_events_stream

    target = scratch_dir("sg-cdc-") + "/user_state"
    q = cdc_upsert_user_state(read_events_stream(spark, sf_dir), target)
    q.awaitTermination()
    return (
        read_version(spark, target)
        .where(F.col("m.event_type") != CDC_DELETE_TYPE)
        .select(
            "user_id",
            F.col("m.ts").alias("last_ts"),
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.event_type").alias("last_state"),
            F.col("m.value").alias("last_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_pit_enrich",
    oracle=f"""
WITH {_SCD2_HIST_SQL}
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       h.state AS prior_state, h.version AS prior_version
FROM events e
LEFT JOIN hist h
  ON h.user_id = e.user_id AND h.valid_from < e.ts
     AND (h.valid_to IS NULL OR h.valid_to >= e.ts)
ORDER BY e.event_id
""",
)
def events_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join (the feature-store staple): each
    fact row is enriched with the dimension version that was valid
    STRICTLY BEFORE its event time — never the version the event itself
    created, never a later one. Using future attribute values is the
    classic training-data leakage bug; the PIT join is the operator that
    prevents it. Here each event gets the state the user was
    transitioning FROM (its first event gets NULL), against the SCD2
    history of ``user_state_scd2``.

    Implementation is the backward as-of join (ops.joins.asof_join —
    union+window, ONE key shuffle, linear in |facts|+|versions|) with
    the fact timestamp shifted by -1 microsecond so ``valid_from <= t``
    becomes the strict ``valid_from < ts`` (timestamps are
    µs-quantized, so the shift is exact). The ORACLE deliberately uses
    the other formulation — an interval join on
    ``valid_from < ts AND (valid_to IS NULL OR valid_to >= ts)`` — so
    the cross-engine match also proves the two PIT formulations agree,
    which only holds when the history's validity intervals are exactly
    contiguous and disjoint. At 100 TB the as-of form wins: the interval
    join materializes (fact × candidate-version) pairs before filtering,
    the as-of form never builds a pair."""
    from otus_cpp_11_spark.ops.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    facts = e.select("event_id", "user_id", "ts", "event_type").withColumn(
        "_pit_ts", F.expr("ts - interval 1 microsecond")
    )
    # drop empty [T, T) versions (same-timestamp transition bookkeeping):
    # they can never be active at any instant — the oracle's interval
    # predicate excludes them arithmetically — and removing them resolves
    # the as-of join's right-side (key, time) tie, which asof_join's
    # contract requires the caller to do
    hist = (
        _scd2_history(e)
        .where(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
        .select("user_id", F.col("valid_from").alias("vts"), "state", "version")
    )
    return (
        asof_join(
            facts,
            hist,
            on="user_id",
            left_time="_pit_ts",
            right_time="vts",
            right_cols=["state", "version"],
            prefix="prior_",
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            "prior_state",
            "prior_version",
        )
        .orderBy("event_id")
    )


@register(
    "user_state_scd2_streamed",
    oracle=f"""
WITH {_SCD2_HIST_SQL}
SELECT user_id, version, state, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM hist
ORDER BY user_id, version
""",
)
def user_state_scd2_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming, driver-visible: replay the change feed
    through the INCREMENTAL SCD2 maintainer
    (streaming.incremental_scd2_history — per-batch scoped recompute of
    touched keys only, late events rewriting their key's validity
    chain), now COMMITTING each batch's touched-key rewrite as a
    VERSION of an ops.versioned manifest table (r8: the second
    maintainer to graduate off staging+swap — batch id in both commit
    headers, file-pruned keyed upsert for the history replace) under
    Trigger.AvailableNow, then return the maintained history read
    through ``read_version``. The oracle is the from-scratch batch
    SCD2 — the maintained chain must be bit-identical no matter how
    the stream was micro-batched, the same streaming=backfill contract
    as the rollup tier and the CDC-apply table."""
    from otus_cpp_11_spark.ops.versioned import read_version
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.streaming import (
        incremental_scd2_history,
        read_events_stream,
    )

    base = scratch_dir("sg-scd2-")
    q = incremental_scd2_history(
        read_events_stream(spark, sf_dir), base + "/hist", base + "/raw"
    )
    q.awaitTermination()
    return (
        read_version(spark, base + "/hist")
        .select(
            "user_id",
            "version",
            "state",
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


@register(
    "forget_sweep_accounting",
    oracle=f"""
WITH latest AS (
  SELECT user_id, event_type
  FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) t
  WHERE rn = 1
),
forget AS (
  SELECT user_id FROM latest WHERE event_type = '{CDC_DELETE_TYPE}'
),
{_SCD2_HIST_SQL}
SELECT 'events' AS table_name,
       COUNT(*) AS n_rows_to_forget,
       COUNT(DISTINCT user_id) AS n_keys
FROM events WHERE user_id IN (SELECT user_id FROM forget)
UNION ALL
SELECT 'customer',
       COUNT(*), COUNT(DISTINCT c_custkey)
FROM customer
WHERE c_custkey IN (SELECT {_CDC_KEY_SQL} FROM forget)
UNION ALL
SELECT 'user_state_history',
       COUNT(*), COUNT(DISTINCT user_id)
FROM hist WHERE user_id IN (SELECT user_id FROM forget)
ORDER BY table_name
""",
)
def forget_sweep_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep planning (GDPR Art. 17): given the
    forget list (keys whose latest change is a delete tombstone — the
    same population customer_cdc_merge deletes), account for every row
    the erasure must touch across the lake: the raw change feed, the
    customer dimension (via the CDC key mapping), and the SCD2 history.
    The accounting step is what a compliance pipeline runs FIRST — the
    deletes themselves are then per-table MERGEs (customer_cdc_merge's
    delete arm), and this query is the audit evidence that they reached
    everything.

    Plan shape: the forget list is one struct-max argmax over the feed
    (partial-aggregated, one row per key), then three left-semi probes —
    each a scan of its table against the small key relation, which AQE
    broadcasts at runtime (bounded by the tombstoned-key count, no hint
    — the standard rule). At 100 TB each probe is one pruned scan; with
    the key-partitioned/z-ordered layouts the scans skip to matching
    files. Nothing shuffles except the three 1-row aggregates."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    forget = (
        e.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("m"))
        .where(F.col("m.event_type") == CDC_DELETE_TYPE)
        .select("user_id")
    )
    fkeys = forget.select(
        (F.col("user_id") * CDC_KEY_MULT + CDC_KEY_OFF).alias("key")
    )

    def acct(df, name, key_col):
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows_to_forget"),
            F.count_distinct(F.col(key_col)).alias("n_keys"),
        )

    ev = e.join(forget, "user_id", "left_semi")
    cu = c.join(fkeys, c.c_custkey == fkeys.key, "left_semi")
    hi = _scd2_history(e).join(forget, "user_id", "left_semi")
    return (
        acct(ev, "events", "user_id")
        .unionByName(acct(cu, "customer", "c_custkey"))
        .unionByName(acct(hi, "user_state_history", "user_id"))
        .orderBy("table_name")
    )


# --------------------------------------------------------------------------
# Change data feed between committed snapshots (versioned tables).
# --------------------------------------------------------------------------


@register(
    "cdc_change_data_feed",
    oracle=f"""
WITH mx AS (SELECT MAX(event_id) AS m FROM events),
v1 AS (
  SELECT user_id, event_id, event_type FROM (
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, mx WHERE event_id <= m // 2
  ) t WHERE rn = 1 AND event_type <> '{CDC_DELETE_TYPE}'
),
v2 AS (
  SELECT user_id, event_id, event_type FROM (
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) t WHERE rn = 1 AND event_type <> '{CDC_DELETE_TYPE}'
)
SELECT COALESCE(v1.user_id, v2.user_id) AS user_id,
       CASE WHEN v1.user_id IS NULL THEN 'insert'
            WHEN v2.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       v1.event_id AS old_event_id,
       v2.event_id AS new_event_id,
       v1.event_type AS old_state,
       v2.event_type AS new_state
FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
WHERE v1.user_id IS NULL OR v2.user_id IS NULL
   OR v1.event_id <> v2.event_id
ORDER BY user_id
""",
)
def cdc_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two COMMITTED snapshots of the maintained
    keyed state — Delta CDF's contract over ops/versioned.py's pointer
    tables: commit the live state as of the changelog's first half
    (event_id <= max/2, an engine-independent cutoff), commit the full
    state, then diff the two IMMUTABLE snapshots via time-travel reads.
    insert = key live only in v2, delete = key live only in v1 (a later
    tombstone killed it), update = both live with different latest
    records — detected on last_event_id alone, exact because (ts,
    event_id) is a total recency order, so equal event ids imply equal
    records (no float comparisons in the gate).

    Plan: each snapshot is ONE struct-max compaction (partial-aggregated
    argmax, one row per key over the shuffle); the diff is a full-outer
    join of two key-sized relations, strategy AQE-decided (unbounded
    key, no hint). The versioned commits give the diff snapshot
    isolation by construction: a concurrent maintainer run cannot
    disturb either side mid-query — exactly why production CDF reads
    version pairs, not live tables. The 1-scalar cutoff collect is a
    bounded model artifact (zorder-bounds precedent)."""
    from otus_cpp_11_spark.ops.versioned import commit_version, read_version
    from otus_cpp_11_spark.session import scratch_dir

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(F.max("event_id")).first()[0] // 2
    rec = F.struct("ts", "event_id", "event_type")

    def live_state(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(F.max(rec).alias("m"))
            .where(F.col("m.event_type") != CDC_DELETE_TYPE)
            .select(
                "user_id",
                F.col("m.event_id").alias("event_id"),
                F.col("m.event_type").alias("state"),
            )
        )

    tbl = scratch_dir("sg-cdf-") + "/user_state"
    n1 = commit_version(spark, live_state(ev.where(F.col("event_id") <= cutoff)), tbl)
    n2 = commit_version(spark, live_state(ev), tbl)
    s1 = read_version(spark, tbl, n1).select(
        F.col("user_id").alias("u1"),
        F.col("event_id").alias("old_event_id"),
        F.col("state").alias("old_state"),
    )
    s2 = read_version(spark, tbl, n2).select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("new_event_id"),
        F.col("state").alias("new_state"),
    )
    return (
        s1.join(s2, s1.u1 == s2.u2, "full_outer")
        .where(
            F.col("u1").isNull()
            | F.col("u2").isNull()
            | (F.col("old_event_id") != F.col("new_event_id"))
        )
        .select(
            F.coalesce("u1", "u2").alias("user_id"),
            F.when(F.col("u1").isNull(), "insert")
            .when(F.col("u2").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
            "old_event_id",
            "new_event_id",
            "old_state",
            "new_state",
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Versioned-lakehouse read/maintenance family (r7): stats-pruned scans,
# OPTIMIZE as a commit, netted change feeds, additive schema evolution.
# --------------------------------------------------------------------------


@register(
    "versioned_scan_skipping",
    oracle=f"""
WITH b AS (SELECT MAX(o_orderkey) // 4 AS lo, MAX(o_orderkey) // 2 AS hi
           FROM orders)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice', 2)} AS total_price
FROM orders, b
WHERE o_orderkey BETWEEN b.lo AND b.hi
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def versioned_scan_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats data skipping on READ (ops.versioned.scan_version):
    commit orders as a versioned table range-clustered on o_orderkey with
    per-file key extents recorded in the manifest, then answer a
    key-range aggregate through the pruned scan. The oracle computes the
    same aggregate from the raw table, so the hash match proves pruning
    is a pure IO optimization — a superset selection with the predicate
    re-applied, never a filter substitute. The companion plan test
    asserts files_scanned < files_total (real skipping happened).

    At 100 TB this is the read path that makes versioned tables
    queryable: a narrow key range dismisses nearly every file from the
    manifest header alone — no footer opens, no scan planning over
    irrelevant files — exactly Delta/Iceberg min-max skipping. The
    1-scalar max collect mirrors the zorder-bounds precedent."""
    from otus_cpp_11_spark.ops.versioned import commit_version, scan_version
    from otus_cpp_11_spark.session import scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderkey")).first()[0]
    lo, hi = mx // 4, mx // 2
    tbl = scratch_dir("sg-vscan-") + "/orders"
    commit_version(
        spark,
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartitionByRange(8, "o_orderkey"),
        tbl,
        stats_cols=["o_orderkey"],
    )
    df, _acct = scan_version(spark, tbl, {"o_orderkey": (lo, hi)})
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "versioned_optimize_roundtrip",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice', 2)} AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def versioned_optimize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE as a COMMIT (ops.versioned.commit_compaction): ingest
    orders as three append commits of 4 shuffled files each (the
    small-file problem incremental ingest creates), then compact the 12
    files into 4 range-clustered on o_orderkey — published as a new
    VERSION, so readers pinned to the fragmented snapshot are
    undisturbed and a crash mid-rewrite costs nothing. The oracle
    aggregates the raw table; the hash match is the row-conservation
    proof across ingest + compaction. Companion tests assert the header
    accounting (files 12 -> 4), time travel to the pre-compaction
    layout, and that vacuum afterwards reclaims the superseded files.

    At 100 TB: compaction bytes scale with the files being packed (here
    the whole table; in production you'd pass only fragmented
    partitions), the commit itself is O(1) metadata, and the clustered
    layout is what gives scan_version/commit_upsert their tight
    extents."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_compaction,
        commit_version,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tbl = scratch_dir("sg-vopt-") + "/orders"
    for i in range(3):
        part = orders.where(F.col("o_orderkey") % 3 == i).repartition(4)
        if i == 0:
            commit_version(spark, part, tbl, stats_cols=["o_orderkey"])
        else:
            commit_append(spark, part, tbl, stats_cols=["o_orderkey"])
    n = read_version(spark, tbl).count()
    commit_compaction(spark, tbl, -(-n // 4), ["o_orderkey"])
    return (
        read_version(spark, tbl)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "cdf_netting_across_versions",
    oracle=f"""
WITH mx AS (SELECT MAX(event_id) AS m FROM events),
v1 AS (
  SELECT user_id, event_id, event_type FROM (
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, mx WHERE event_id <= m // 3
  ) t WHERE rn = 1 AND event_type <> '{CDC_DELETE_TYPE}'
),
v3 AS (
  SELECT user_id, event_id, event_type FROM (
    SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) t WHERE rn = 1 AND event_type <> '{CDC_DELETE_TYPE}'
)
SELECT COALESCE(v1.user_id, v3.user_id) AS user_id,
       CASE WHEN v1.user_id IS NULL THEN 'insert'
            WHEN v3.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       v1.event_id AS old_event_id,
       v3.event_id AS new_event_id,
       v1.event_type AS old_state,
       v3.event_type AS new_state
FROM v1 FULL OUTER JOIN v3 ON v1.user_id = v3.user_id
WHERE v1.user_id IS NULL OR v3.user_id IS NULL
   OR v1.event_id <> v3.event_id
ORDER BY user_id
""",
)
def cdf_netting_across_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed NETTING — the consumer-side contract that makes an
    incremental CDF usable: commit the keyed live state at three
    changelog cutoffs (thirds of event_id), compute the per-step feeds
    diff(v1,v2) and diff(v2,v3) with ops.versioned.diff_versions, and
    net them into one v1->v3 feed. The ORACLE diffs the two ENDPOINT
    states directly, so the hash match is the exact identity
    'composition of incremental diffs == direct diff' — including the
    cases netting must cancel (insert-then-delete nets to nothing;
    update-back-to-original nets to nothing) and the cases it must
    rewrite (insert-then-update nets to insert of the final value;
    delete-then-insert nets to update).

    Presence is derived from the feeds' change_type flags, never from
    struct nullness — robust whether an absent side surfaces as a NULL
    struct (struct built before the outer join, as diff_versions does)
    or a struct OF nulls (struct built after). Plan: two key-sized
    feeds, one full-outer join on the key,
    AQE-decided strategy — a consumer nets a day of increments without
    ever touching the snapshots themselves, which is the whole point at
    100 TB."""
    from otus_cpp_11_spark.ops.versioned import commit_version, diff_versions
    from otus_cpp_11_spark.session import scratch_dir

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("event_id")).first()[0]
    rec = F.struct("ts", "event_id", "event_type")

    def live_state(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(F.max(rec).alias("m"))
            .where(F.col("m.event_type") != CDC_DELETE_TYPE)
            .select(
                "user_id",
                F.col("m.event_id").alias("event_id"),
                F.col("m.event_type").alias("state"),
            )
        )

    tbl = scratch_dir("sg-cdfnet-") + "/state"
    commit_version(spark, live_state(ev.where(F.col("event_id") <= mx // 3)), tbl)
    commit_version(
        spark, live_state(ev.where(F.col("event_id") <= 2 * mx // 3)), tbl
    )
    commit_version(spark, live_state(ev), tbl)
    d12 = diff_versions(spark, tbl, 1, 2, ["user_id"])
    d23 = diff_versions(spark, tbl, 2, 3, ["user_id"])
    a = d12.select(
        "user_id",
        F.col("change_type").alias("ct1"),
        F.col("old").alias("o1"),
        F.col("new").alias("n1"),
    )
    b = d23.select(
        "user_id",
        F.col("change_type").alias("ct2"),
        F.col("old").alias("o2"),
        F.col("new").alias("n2"),
    )
    j = a.join(b, "user_id", "full_outer")
    old_present = F.when(
        F.col("ct1").isNotNull(), F.col("ct1") != "insert"
    ).otherwise(F.col("ct2") != "insert")
    new_present = F.when(
        F.col("ct2").isNotNull(), F.col("ct2") != "delete"
    ).otherwise(F.col("ct1") != "delete")
    old_s = F.when(F.col("ct1").isNotNull(), F.col("o1")).otherwise(F.col("o2"))
    new_s = F.when(F.col("ct2").isNotNull(), F.col("n2")).otherwise(F.col("n1"))
    return (
        j.select(
            "user_id",
            old_present.alias("op"),
            new_present.alias("np"),
            old_s.alias("old"),
            new_s.alias("new"),
        )
        .where(
            (F.col("op") | F.col("np"))
            & ~(
                F.col("op")
                & F.col("np")
                & F.col("old").eqNullSafe(F.col("new"))
            )
        )
        .select(
            "user_id",
            F.when(~F.col("op"), "insert")
            .when(~F.col("np"), "delete")
            .otherwise("update")
            .alias("change_type"),
            F.col("old.event_id").alias("old_event_id"),
            F.col("new.event_id").alias("new_event_id"),
            F.col("old.state").alias("old_state"),
            F.col("new.state").alias("new_state"),
        )
        .orderBy("user_id")
    )


@register(
    "versioned_schema_evolution",
    oracle="""
WITH k AS (SELECT MAX(c_custkey) // 2 AS cut FROM customer)
SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS acctbal
FROM customer, k WHERE c_custkey <= k.cut
UNION ALL
SELECT c_custkey, c_name, c_acctbal AS acctbal
FROM customer, k WHERE c_custkey > k.cut
ORDER BY c_custkey
""",
)
def versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution (commit_append(merge_schema=True)) —
    Delta's mergeSchema contract: the table starts as (c_custkey,
    c_name), a later append arrives with a new ``acctbal`` column, and
    the manifest schema evolves to the union WITHOUT rewriting a single
    committed file — the reader's explicit manifest schema fills the
    old files' missing column with NULL straight from the parquet
    reader. The oracle builds the same union with CAST(NULL AS DOUBLE),
    so the hash match pins the exact NULL-fill semantics. Companion
    tests cover the refusals (type change, dropped column) — evolution
    that would REINTERPRET committed bytes is not evolution.

    At 100 TB this is the difference between adding a feature column to
    a training table as an O(delta) metadata commit versus a
    rewrite-the-world migration."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_version,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    cust = load_table(spark, sf_dir, "customer")
    cut = cust.agg(F.max("c_custkey")).first()[0] // 2
    tbl = scratch_dir("sg-vevo-") + "/cust"
    commit_version(
        spark,
        cust.where(F.col("c_custkey") <= cut).select("c_custkey", "c_name"),
        tbl,
    )
    commit_append(
        spark,
        cust.where(F.col("c_custkey") > cut).select(
            "c_custkey", "c_name", F.col("c_acctbal").alias("acctbal")
        ),
        tbl,
        merge_schema=True,
    )
    return read_version(spark, tbl).orderBy("c_custkey")


@register(
    "versioned_metadata_count",
    oracle="""
SELECT COUNT(*) AS n_rows
FROM orders
WHERE o_orderkey % 30 <> 0
""",
)
def versioned_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) answered from the MANIFEST, zero data IO
    (ops.versioned.metadata_count): every commit records per-file row
    counts (carried forward for referenced files, one parquet FOOTER
    read for new ones — O(delta) metadata), so a bare count is a sum
    over the current manifest's entries. The lifecycle here exercises
    every arm that must keep the counts exact: a base commit, an
    append, and a file-pruned MERGE that both inserts and tombstones;
    strict=True proves no scan fallback fired. The oracle recomputes
    the surviving-row count from the raw table, so the hash match is
    'manifest arithmetic == actual data'.

    At 100 TB this is the difference between a dashboard count that
    returns in milliseconds from one cached manifest and a
    full-table scan — the exact trick Delta/Iceberg pull with
    numRecords in the transaction log."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_upsert,
        commit_version,
        metadata_count,
    )
    from otus_cpp_11_spark.session import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tbl = scratch_dir("sg-vcount-") + "/orders"
    key = F.col("o_orderkey")
    commit_version(
        spark,
        orders.where(key % 3 == 0).repartitionByRange(4, "o_orderkey"),
        tbl,
        stats_cols=["o_orderkey"],
    )
    commit_append(spark, orders.where(key % 3 == 1), tbl, stats_cols=["o_orderkey"])
    delta = orders.where(key % 3 == 2).withColumn(
        "_deleted", F.lit(False)
    ).unionByName(
        orders.where(key % 30 == 0).withColumn("_deleted", F.lit(True))
    )
    commit_upsert(spark, delta, tbl, ["o_orderkey"], delete_col="_deleted")
    n = metadata_count(spark, tbl, strict=True)
    return spark.createDataFrame([(n,)], "n_rows long")


@register(
    "versioned_stream_rollup",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {dsum_sql('value', 2)} AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def versioned_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned table as a STREAMING SOURCE (sources.py
    ``versioned_table`` connector) — Delta's `readStream` on a table:
    the events changelog lands as three append commits, then a
    Structured Streaming query tails the table by COMMIT VERSION
    offsets, reading exactly the files each commit added (one executor
    InputPartition per file, Arrow batches — the driver touches only
    manifests). The drained stream's per-type rollup must equal the
    oracle's batch aggregate over the raw table: ingest-through-
    versions loses and duplicates nothing. Non-append commits fail the
    stream loudly (or are skipped with skipChangeCommits=true) —
    covered by connector tests.

    At 100 TB this is the ingest fan-out shape: writers commit
    append-only versions, any number of downstream training pipelines
    tail the manifest log independently, each with its own checkpointed
    version offset, replaying any committed range from the immutable
    manifests."""
    from otus_cpp_11_spark.ops.versioned import commit_append, commit_version
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.sources import register_versioned_table_source

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    mx = ev.agg(F.max("event_id")).first()[0]
    tbl = scratch_dir("sg-vstream-") + "/events"
    eid = F.col("event_id")
    commit_version(spark, ev.where(eid <= mx // 3), tbl)
    commit_append(spark, ev.where((eid > mx // 3) & (eid <= 2 * mx // 3)), tbl)
    commit_append(spark, ev.where(eid > 2 * mx // 3), tbl)
    register_versioned_table_source(spark)
    name = "versioned_stream_rollup_sink"
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum(F.col("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "events_versioned_ingest_streamed",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       MAX(event_id) AS max_event_id,
       {dsum_sql('value', 2)} AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_versioned_ingest_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned table as a STREAMING SINK
    (streaming.append_stream_to_versioned) — the other half of the pipe
    ``versioned_stream_rollup`` proves: a Structured Streaming job lands
    each micro-batch as an APPEND COMMIT (batch id in the commit header
    = exactly-once across foreachBatch retries), producing the manifest
    log the ``versioned_table`` streaming SOURCE tails. The changelog is
    re-sharded to 4 files and streamed with maxFilesPerTrigger=1, so the
    ingest genuinely exercises multiple commits (asserted: final version
    >= 2 and metadata-only COUNT == table count). The rollup of the
    CURRENT VERSION must equal the oracle's batch aggregate over the raw
    table — micro-batched versioned ingest loses and duplicates
    nothing.

    At 100 TB this is the write half of the ingest fan-out: one
    streaming writer commits O(batch) bytes + one manifest rename per
    trigger (sink cost flat in table size), per-file event_id extents
    land in the manifest for downstream scan pruning, and every
    downstream pipeline — batch time travel, metadata COUNT, streaming
    tail — reads the same committed log."""
    from otus_cpp_11_spark.ops.versioned import (
        current_version,
        metadata_count,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.streaming import append_stream_to_versioned

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    src = scratch_dir("sg-vsink-") + "/changelog"
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tbl = scratch_dir("sg-vsink-") + "/events_versioned"
    q = append_stream_to_versioned(stream, tbl, stats_cols=["event_id"])
    q.awaitTermination()
    cur = current_version(spark, tbl)
    assert cur is not None and cur >= 2, f"expected multi-commit ingest, got {cur}"
    out = read_version(spark, tbl)
    assert metadata_count(spark, tbl, strict=True) == out.count()
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("event_id").alias("max_event_id"),
            dsum(F.col("value"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "versioned_dml_lifecycle",
    bench=True,
    oracle=f"""
WITH b AS (SELECT MAX(o_orderkey) // 4 AS lo,
                  MAX(o_orderkey) AS mx
           FROM orders),
     f AS (
       SELECT o_orderstatus,
              CASE WHEN o_orderstatus = 'O'
                   THEN 'X-' || o_orderpriority
                   ELSE o_orderpriority END AS o_orderpriority,
              o_totalprice
       FROM orders, b
       WHERE o_orderkey > b.lo AND o_orderkey <> b.mx
     )
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice', 2)} AS total_price
FROM f
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
""",
)
def versioned_dml_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full versioned-DML lifecycle as one oracle-gated pipeline:
    CLONE orders into a scratch table (zero-copy, absolute-path manifest
    references), run a BOTCHED predicate DELETE, RESTORE it away
    (audit-preserving rollback — the bad version stays in the history),
    then the real DELETE (drop the low-key quarter; manifest-stats
    bounds dismiss the untouched files), an UPDATE (prefix the
    priority of open orders; RHS evaluated against the old row), and
    an RTBF-style POINT DELETE of the single max-key order that takes
    the DELETION-VECTOR path (``dv_max_fraction``: the commit is
    asserted to rewrite ZERO files — O(deleted rows) metadata, the
    Delta DV design), and aggregate the final snapshot. The oracle
    replays the surviving operations as plain SQL WHERE + CASE over
    the raw table, so the hash match proves predicate DML composes to
    exactly the SQL semantics — including that the restore really
    undid the botched delete and that DV-masked rows are invisible to
    every aggregate. ``table_history`` ops are asserted so each
    lifecycle step actually committed.

    At 100 TB: every step here is O(touched files) or better — the
    clone writes zero data bytes, each delete/update rewrites only
    match-bearing files discovered via manifest extents + an exact
    file probe, the restore is a manifest-only commit, and the point
    delete writes no data files at all. Nothing in the lifecycle ever
    rewrites the table wholesale."""
    from otus_cpp_11_spark.ops.versioned import (
        clone_version,
        commit_delete,
        commit_update,
        commit_version,
        read_version,
        restore_version,
        table_history,
        version_header,
    )
    from otus_cpp_11_spark.session import scratch_dir

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    mx = orders.agg(F.max("o_orderkey")).first()[0]  # 1-scalar collect
    lo = mx // 4
    base = scratch_dir("sg-vdml-")
    src, tbl = base + "/orders_src", base + "/orders_work"
    commit_version(
        spark,
        orders.repartitionByRange(8, "o_orderkey"),
        src,
        stats_cols=["o_orderkey"],
    )
    clone_version(spark, src, tbl)
    # botched job: deletes the TOP half by mistake...
    commit_delete(
        spark, tbl, f"o_orderkey > {mx // 2}",
        bounds={"o_orderkey": (mx // 2 + 1, mx)},
    )
    # ...rolled back without erasing the evidence
    restore_version(spark, tbl, 1, meta={"reason": "botched delete"})
    # the real retention delete: drop the low-key quarter
    commit_delete(
        spark, tbl, f"o_orderkey <= {lo}", bounds={"o_orderkey": (0, lo)}
    )
    # and a business correction evaluated against the OLD row
    commit_update(
        spark,
        tbl,
        "o_orderstatus = 'O'",
        {"o_orderpriority": "concat('X-', o_orderpriority)"},
    )
    # RTBF point delete: one key, deletion-vector path — asserted to
    # rewrite nothing (the r8 'one-row delete commits O(rows) bytes')
    v_dv = commit_delete(
        spark,
        tbl,
        f"o_orderkey = {mx}",
        bounds={"o_orderkey": (mx, mx)},
        dv_max_fraction=0.05,
    )
    dv_io = version_header(spark, tbl, v_dv)["delete_io"]
    assert dv_io["rewritten"] == 0 and dv_io["dv_files"] >= 1, dv_io
    # time travel still sees the forgotten row (until vacuum+compact)
    assert (
        read_version(spark, tbl, v_dv - 1)
        .where(F.col("o_orderkey") == mx)
        .count()
        == 1
    )
    ops = [r["op"] for r in table_history(spark, tbl).collect()]
    assert ops == ["delete", "update", "delete", "restore", "delete", "clone"], ops
    return (
        read_version(spark, tbl)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "versioned_rtbf_deletion_vectors",
    oracle=f"""
WITH victims AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
),
v1 AS (
  SELECT 1 AS version, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         (SELECT COUNT(*) FROM victims) AS victims_visible
  FROM customer
),
v2 AS (
  SELECT 2 AS version, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         CAST(0 AS BIGINT) AS victims_visible
  FROM customer
  WHERE c_custkey % 97 <> 0
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2
ORDER BY version
""",
)
def versioned_rtbf_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten via DELETION VECTORS (r8): commit customer
    as a versioned table, DV-delete every 97th customer key (~1% of
    rows, spread across every file — the worst case for file-level
    rewrite DML and the best case for DVs), and emit per-version
    (row count, exact balance sum, victims still visible). The commit
    is asserted to rewrite ZERO data files — the delete's footprint is
    the row positions alone, Delta's DV / Iceberg's positional-delete
    economics — while ``metadata_count(strict=True)`` stays exact
    (DV counts subtract from manifest row counts without IO) and the
    pre-delete version still shows the victims (time travel for audit;
    physical forgetting = compaction applying the DV, proven in
    tests/test_versioned_r8.py). The oracle replays both versions as
    plain SQL over the raw table, so the hash match proves the masked
    read path drops exactly the victim rows and nothing else.

    At 100 TB: an RTBF sweep of k scattered rows commits O(k) metadata
    bytes instead of rewriting every file that holds one victim — the
    difference between minutes and a full-table rewrite. Reference:
    the C++ engine (src/mapreduce.cpp) has no mutation story at all;
    this family exists for the lakehouse mandate."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_delete,
        commit_version,
        metadata_count,
        read_version,
        version_header,
    )
    from otus_cpp_11_spark.session import scratch_dir

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    tbl = scratch_dir("sg-rtbf-") + "/customer_v"
    commit_version(
        spark,
        cust.repartitionByRange(4, "c_custkey"),
        tbl,
        stats_cols=["c_custkey"],
    )
    v2 = commit_delete(spark, tbl, "c_custkey % 97 = 0", dv_max_fraction=0.1)
    io = version_header(spark, tbl, v2)["delete_io"]
    assert io["rewritten"] == 0 and io["dv_files"] >= 1, io
    assert metadata_count(spark, tbl, strict=True) == read_version(spark, tbl).count()

    def snap(version: int, victims_col):
        df = read_version(spark, tbl, version)
        return df.agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
            victims_col.alias("victims_visible"),
        )

    v1_snap = snap(1, F.sum((F.col("c_custkey") % 97 == 0).cast("long")))
    v2_snap = snap(2, F.sum((F.col("c_custkey") % 97 == 0).cast("long")))
    return v1_snap.unionByName(v2_snap).orderBy("version")


_CDF_FEED_ORACLE = """
WITH mx AS (SELECT MAX(event_id) AS m FROM events),
s1 AS (
  SELECT user_id, ts, event_id, event_type FROM (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, mx WHERE event_id <= m // 2
  ) t WHERE rn = 1
),
d2 AS (
  SELECT user_id, ts, event_id, event_type FROM (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, mx WHERE event_id > m // 2
  ) t WHERE rn = 1
),
merged AS (
  SELECT user_id, ts, event_id, event_type FROM (
    SELECT u.user_id, u.ts, u.event_id, u.event_type,
           ROW_NUMBER() OVER (PARTITION BY u.user_id
                              ORDER BY u.ts DESC, u.event_id DESC) AS rn
    FROM (
      SELECT * FROM s1 WHERE user_id IN (SELECT user_id FROM d2)
      UNION ALL SELECT * FROM d2
    ) u
  ) t WHERE rn = 1
)
SELECT * FROM (
  SELECT user_id, 'insert' AS _change_type, event_id,
         event_type AS state, CAST(1 AS BIGINT) AS _commit_version
  FROM s1
  UNION ALL
  SELECT user_id, 'update_preimage', event_id, event_type, 2
  FROM s1 WHERE user_id IN (SELECT user_id FROM d2)
  UNION ALL
  SELECT user_id, 'update_postimage', event_id, event_type, 2
  FROM merged WHERE user_id IN (SELECT user_id FROM s1)
  UNION ALL
  SELECT user_id, 'insert', event_id, event_type, 2
  FROM merged WHERE user_id NOT IN (SELECT user_id FROM s1)
)
ORDER BY _commit_version, user_id, _change_type
"""


def _cdf_feed_table(spark: SparkSession, sf_dir: str) -> str:
    """Build the two-commit CDF-enabled user-state table both change-feed
    queries read: v1 = full snapshot of the first-half latest state,
    v2 = a latest-wins keyed MERGE of the second half's per-user deltas
    committed with ``change_feed=True`` (write-time change files)."""
    from otus_cpp_11_spark.ops.versioned import commit_upsert, commit_version
    from otus_cpp_11_spark.session import scratch_dir

    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(F.max("event_id")).first()[0] // 2
    rec = F.struct("ts", "event_id", "event_type")

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.groupBy("user_id")
            .agg(F.max(rec).alias("m"))
            .select(
                "user_id",
                F.col("m.ts").alias("ts"),
                F.col("m.event_id").alias("event_id"),
                F.col("m.event_type").alias("state"),
            )
        )

    tbl = scratch_dir("sg-cdfw-") + "/user_state"
    commit_version(
        spark,
        latest(ev.where(F.col("event_id") <= cutoff)),
        tbl,
        stats_cols=["user_id"],
    )
    latest_wins = lambda matched, inserts: (  # noqa: E731
        matched.unionByName(inserts)
        .groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "state")).alias("m"))
        .select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.state").alias("state"),
        )
    )
    commit_upsert(
        spark,
        latest(ev.where(F.col("event_id") > cutoff)),
        tbl,
        ["user_id"],
        merge_fn=latest_wins,
        stats_cols=["user_id"],
        change_feed=True,
    )
    return tbl


_CDF_FEED_COLS = [
    "user_id",
    "_change_type",
    "event_id",
    "state",
    "_commit_version",
]


@register("versioned_change_feed", oracle=_CDF_FEED_ORACLE, bench=True)
def versioned_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-TIME change data feed — Delta's enableChangeDataFeed +
    table_changes, completing the CDF story the snapshot-diff face
    (``cdc_change_data_feed`` / ``diff_versions``) started: the MERGE
    commit itself records its row-level insert / update_preimage /
    update_postimage / delete rows as change files referenced by the
    commit header, and ``read_change_feed`` serves the feed across a
    version range with ZERO joins — O(change bytes), never table size.
    Version 1's rows come straight from its added files as inserts (the
    AddFile derivation Delta uses), so appends pay nothing extra at
    write time either.

    The oracle rebuilds the exact feed relationally: first-half latest
    state (v1 inserts), then per-user second-half deltas folded
    latest-wins — every delta-touched user emits a pre/post pair (or a
    bare insert when new), the same classification the commit wrote.
    Hash equality therefore proves the write path recorded EXACTLY the
    changes the merge performed — the replay-to-table property CDC
    consumers rely on.

    Scale: the feed read is one marker read per version plus the change
    files themselves; the write-side classification joins are all
    delta-bounded (see commit_upsert). Reference parity: extension
    mandate (the reference has no table format at all)."""
    from otus_cpp_11_spark.ops.versioned import read_change_feed

    tbl = _cdf_feed_table(spark, sf_dir)
    return (
        read_change_feed(spark, tbl, 1, 2)
        .select(*_CDF_FEED_COLS)
        .orderBy("_commit_version", "user_id", "_change_type")
    )


@register("versioned_change_feed_streamed", oracle=_CDF_FEED_ORACLE)
def versioned_change_feed_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING face of the write-time change feed — Delta's
    ``readStream.option("readChangeFeed", "true")``: the versioned-table
    connector tails commits by version-number offsets and emits the
    row-level change stream (appends' added files as inserts, DML
    commits' writer-recorded change files verbatim), stamping
    ``_commit_version`` executor-side. Same oracle as the batch face:
    the streamed feed must be row-identical to the relational rebuild,
    proving offset planning loses/duplicates nothing across micro-batch
    boundaries. Plan: O(changes) driver planning (one marker read per
    version, no snapshot replay), Arrow-batched executor reads."""
    from otus_cpp_11_spark.sources import register_versioned_table_source

    register_versioned_table_source(spark)
    tbl = _cdf_feed_table(spark, sf_dir)
    stream = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .load()
    )
    name = f"cdf_feed_{abs(hash(tbl)) % 10**8}"
    (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.table(name)
        .select(*_CDF_FEED_COLS)
        .orderBy("_commit_version", "user_id", "_change_type")
    )


@register(
    "cdf_incremental_state_counts",
    oracle="""
WITH mx AS (SELECT MAX(event_id) AS m FROM events),
s1 AS (
  SELECT user_id, ts, event_id, event_type FROM (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, mx WHERE event_id <= m // 2
  ) t WHERE rn = 1
),
d2 AS (
  SELECT user_id, ts, event_id, event_type FROM (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, mx WHERE event_id > m // 2
  ) t WHERE rn = 1
),
merged AS (
  SELECT user_id, event_type FROM (
    SELECT u.user_id, u.event_type,
           ROW_NUMBER() OVER (PARTITION BY u.user_id
                              ORDER BY u.ts DESC, u.event_id DESC) AS rn
    FROM (
      SELECT * FROM s1 WHERE user_id IN (SELECT user_id FROM d2)
      UNION ALL SELECT * FROM d2
    ) u
  ) t WHERE rn = 1
),
final AS (
  SELECT user_id, event_type FROM merged
  UNION ALL
  SELECT user_id, event_type FROM s1
  WHERE user_id NOT IN (SELECT user_id FROM d2)
)
SELECT event_type AS state, COUNT(*) AS n_users
FROM final GROUP BY state
ORDER BY state
""",
)
def cdf_incremental_state_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed put to its PURPOSE — an incremental downstream
    consumer: a per-state user-count aggregate maintained purely by
    APPLYING CDF deltas (insert/update_postimage: +1 its state,
    update_preimage/delete: -1), never recomputing from the source
    table. The pipeline is the full CDC loop this family has been
    building: versioned producer table (snapshot + CDF-enabled MERGE)
    -> readChangeFeed stream -> additive maintainer committing each
    micro-batch as a versioned upsert of the aggregate table. The
    oracle recomputes the final state's counts from scratch, so hash
    equality proves feed-apply == recompute — the exact contract that
    lets a 100 TB consumer avoid rescanning the source per refresh
    (work is O(changes), source never re-read).

    Signed counts are the standard changelog-to-aggregate reduction
    (Flink retraction streams / Materialize diffs): every feed row
    carries weight +1 or -1 and the aggregate is the running signed
    sum — associative, so micro-batch boundaries cannot change the
    result. States whose net count reaches zero are filtered like the
    recompute never saw them (the stored 0 row is the retraction
    ledger, not a live state)."""
    from otus_cpp_11_spark.ops.versioned import read_version
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.sources import register_versioned_table_source
    from otus_cpp_11_spark.streaming import (
        _additive_lattice_merge,
        _run_incremental_maintainer,
    )

    register_versioned_table_source(spark)
    tbl = _cdf_feed_table(spark, sf_dir)
    feed = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .load()
    )

    def delta_fn(batch: DataFrame) -> DataFrame:
        w = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        return (
            batch.groupBy(F.col("state"))
            .agg(F.sum(w).cast("bigint").alias("n_users"))
        )

    merge_fn = _additive_lattice_merge("state", sums=("n_users",))
    agg = scratch_dir("sg-cdfagg-") + "/state_counts"
    _run_incremental_maintainer(
        feed, agg, delta_fn, "state", merge_fn, None
    ).awaitTermination()
    return (
        read_version(spark, agg)
        .where(F.col("n_users") > 0)
        .orderBy("state")
    )


@register(
    "versioned_dv_pressure_valve",
    oracle=f"""
WITH live AS (SELECT c_custkey, c_acctbal FROM customer),
gone AS (SELECT COUNT(*) AS n FROM live WHERE c_custkey % 3 = 0),
v1 AS (
  SELECT 1 AS version, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         CAST(0 AS BIGINT) AS dv_rows
  FROM live
),
v2 AS (
  SELECT 2 AS version, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         (SELECT CAST(n AS BIGINT) FROM gone) AS dv_rows
  FROM live WHERE c_custkey % 3 <> 0
),
v3 AS (
  SELECT 3 AS version, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         CAST(0 AS BIGINT) AS dv_rows
  FROM live WHERE c_custkey % 3 <> 0
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
ORDER BY version
""",
)
def versioned_dv_pressure_valve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GLOBAL deleted-row pressure valve, end to end (r9 verdict
    item 2): a wide DV delete (every third customer — far past the
    demo threshold) auto-triggers ``commit_apply_dvs`` at the same
    call, so the table lands at version 3 with ZERO deletion vectors
    and the deleted bytes physically gone — no read ever pays the
    over-cap shuffle-anti-join fallback, and no human had to run
    OPTIMIZE. Asserted in-flight: the delete itself rewrote no files
    (DV economics), the purge rewrote ONLY the DV'd files, the final
    manifest carries no DVs, and physical parquet rows equal the
    logical count (the forget is real). The emitted rows replay all
    three versions (count, exact balance sum, snapshot DV-row gauge);
    the oracle recomputes each from the raw table, so the hash match
    proves the valve preserved exactly the surviving rows. At 100 TB
    the default threshold is ``DV_BROADCAST_MAX_ROWS``: the valve
    fires exactly when reads would degrade, and the purge's cost is
    O(DV'd file bytes) — the same bytes every subsequent read would
    otherwise re-shuffle. Reference: the C++ engine has no mutation
    story; lakehouse mandate."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_delete,
        commit_version,
        manifest_dvs,
        metadata_count,
        read_manifest,
        read_version,
        snapshot_dv_rows,
        version_header,
    )
    from otus_cpp_11_spark.session import scratch_dir

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    tbl = scratch_dir("sg-dv-valve-") + "/customer_v"
    commit_version(
        spark,
        cust.repartitionByRange(4, "c_custkey"),
        tbl,
        stats_cols=["c_custkey"],
    )
    v2 = commit_delete(
        spark,
        tbl,
        "c_custkey % 3 = 0",
        dv_max_fraction=0.5,
        dv_auto_apply_rows=10,  # demo budget; default is the broadcast cap
    )
    assert v2 == 2
    io = version_header(spark, tbl, v2)["delete_io"]
    assert io["rewritten"] == 0 and io["dv_files"] >= 1, io
    hdr3, files3 = read_manifest(spark, tbl, 3)  # the valve's purge commit
    assert hdr3["op"] == "optimize" and hdr3["trigger"] == "dv_pressure_valve"
    assert manifest_dvs(hdr3) == {}
    # the forget is physical: parquet footer rows == logical count
    import pyarrow.parquet as pq

    physical = sum(
        pq.ParquetFile(f"{tbl}/{f}").metadata.num_rows for f in files3
    )
    assert physical == metadata_count(spark, tbl, 3, strict=True)

    def snap(version: int) -> DataFrame:
        return read_version(spark, tbl, version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
            F.lit(snapshot_dv_rows(spark, tbl, version))
            .cast("bigint")
            .alias("dv_rows"),
        )

    return snap(1).unionByName(snap(2)).unionByName(snap(3)).orderBy("version")


@register(
    "versioned_column_mapping_lifecycle",
    oracle=f"""
WITH src AS (SELECT c_custkey, c_acctbal FROM customer),
v1 AS (
  SELECT 1 AS version, 'c_custkey,c_acctbal' AS columns, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS key_or_bal_sum
  FROM src
),
v2 AS (
  SELECT 2 AS version, 'customer_id,c_acctbal' AS columns, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS key_or_bal_sum
  FROM src
),
v3 AS (
  SELECT 3 AS version, 'customer_id' AS columns, COUNT(*) AS n_rows,
         CAST(CAST(SUM(c_custkey) AS DECIMAL(38,0)) AS DOUBLE) AS key_or_bal_sum
  FROM src
),
v4 AS (
  SELECT 4 AS version, 'customer_id' AS columns,
         COUNT(*) + 3 AS n_rows,
         CAST(CAST(SUM(c_custkey) + 1 + 2 + 3 AS DECIMAL(38,0)) AS DOUBLE)
           AS key_or_bal_sum
  FROM src
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2
UNION ALL SELECT * FROM v3 UNION ALL SELECT * FROM v4
ORDER BY version
""",
)
def versioned_column_mapping_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta column mapping end to end (r9 verdict item 5): commit the
    customer table, RENAME c_custkey -> customer_id (metadata-only:
    asserted zero new data files), DROP c_acctbal (metadata-only, the
    physical name burned), then APPEND under the new schema — the new
    files physically carry the ORIGINAL column name, which is the
    invariant that makes the whole lifecycle rewrite-free. The emitted
    rows replay every version with ITS OWN column names (time travel is
    name-correct per snapshot) plus a content checksum; the oracle
    recomputes all four states from the raw table, so the hash match
    proves renames/drops never moved, duplicated, or dropped a row. At
    100 TB: the first schema refactor on a versioned table costs two
    O(1)-metadata commits instead of a full rewrite. Reference: the C++
    engine has no schema story; lakehouse mandate (Delta public
    column-mapping semantics)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_drop_column,
        commit_rename_column,
        commit_version,
        read_manifest,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    tbl = scratch_dir("sg-cmap-") + "/customer_v"
    commit_version(spark, cust.repartitionByRange(2, "c_custkey"), tbl,
                   stats_cols=["c_custkey"])
    _, files1 = read_manifest(spark, tbl, 1)
    commit_rename_column(spark, tbl, "c_custkey", "customer_id")
    commit_drop_column(spark, tbl, "c_acctbal")
    for v in (2, 3):  # both schema commits carried every file by reference
        _, fv = read_manifest(spark, tbl, v)
        assert fv == files1, (v, len(fv), len(files1))
    late = spark.createDataFrame(
        [(1,), (2,), (3,)], "customer_id bigint"
    )
    commit_append(spark, late, tbl, stats_cols=["customer_id"])

    def snap(version: int, sum_col: str, as_bal: bool) -> DataFrame:
        df = read_version(spark, tbl, version)
        metric = (
            dsum(F.col(sum_col), 2)
            if as_bal
            else F.sum(F.col(sum_col)).cast("decimal(38,0)").cast("double")
        )
        return df.agg(
            F.lit(version).alias("version"),
            F.lit(",".join(df.columns)).alias("columns"),
            F.count(F.lit(1)).alias("n_rows"),
            metric.alias("key_or_bal_sum"),
        )

    return (
        snap(1, "c_acctbal", True)
        .unionByName(snap(2, "c_acctbal", True))
        .unionByName(snap(3, "customer_id", False))
        .unionByName(snap(4, "customer_id", False))
        .orderBy("version")
    )


@register(
    "versioned_multi_table_txn",
    oracle=f"""
WITH ingest AS (
  SELECT doc_id, source, n_chars FROM documents
),
half1 AS (SELECT * FROM ingest WHERE doc_id % 2 = 0),
card1 AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM half1 GROUP BY source
),
card2 AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM ingest GROUP BY source
),
pre AS (
  SELECT 'pre-txn' AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM half1) AS corpus_docs,
         (SELECT CAST(SUM(n_docs) AS BIGINT) FROM card1) AS datacard_docs,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM half1) AS corpus_chars,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM card1) AS datacard_chars
),
post AS (
  SELECT 'post-txn' AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ingest) AS corpus_docs,
         (SELECT CAST(SUM(n_docs) AS BIGINT) FROM card2) AS datacard_docs,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM ingest) AS corpus_chars,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM card2) AS datacard_chars
)
SELECT stage, corpus_docs, datacard_docs, corpus_chars, datacard_chars,
       corpus_docs = datacard_docs AND corpus_chars = datacard_chars
         AS consistent
FROM pre
UNION ALL
SELECT stage, corpus_docs, datacard_docs, corpus_chars, datacard_chars,
       corpus_docs = datacard_docs AND corpus_chars = datacard_chars
         AS consistent
FROM post
ORDER BY stage DESC
""",
)
def versioned_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TABLE TRANSACTION (r10 verdict item 8 — the corpus +
    datacard shape every 100 TB pipeline has): the second half of the
    document ingest and ITS datacard delta commit to two different
    versioned tables in ONE ``commit_transaction`` — slot claims through
    the normal marker rename, one atomic final record as the single
    arbiter, both-or-neither visibility (a crashed coordinator's claims
    are force-aborted by the first reader; crash-injection pytests cover
    abort, slot theft, and connector faces). The emitted rows audit the
    invariant the transaction exists to protect: at BOTH observed
    stages the datacard's totals equal the corpus's — no state where
    the corpus ingested rows the datacard has not counted. Both claim
    headers carry the same txn id (asserted in-code); the pre-txn stage
    reads time travel. The oracle recomputes both tables' both-stage
    contents from the raw documents table."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_transaction,
        commit_version,
        read_version,
        version_header,
    )
    from otus_cpp_11_spark.session import scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = scratch_dir("sg-mtxn-")
    corpus, card, troot = (
        base + "/corpus",
        base + "/datacard",
        base + "/txns",
    )
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)

    def card_of(d: DataFrame) -> DataFrame:
        return d.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )

    commit_version(spark, half1.coalesce(1), corpus, stats_cols=["doc_id"])
    commit_version(spark, card_of(half1).coalesce(1), card)
    versions = commit_transaction(
        spark,
        [(corpus, half2.coalesce(1), ["doc_id"]), (card, card_of(half2).coalesce(1))],
        troot,
    )
    assert versions == {corpus: 2, card: 2}
    ha = version_header(spark, corpus, 2)
    hb = version_header(spark, card, 2)
    assert ha["txn"]["id"] == hb["txn"]["id"], "one txn, two tables"

    def stage(name: str, version: int) -> DataFrame:
        c = read_version(spark, corpus, version).agg(
            F.count(F.lit(1)).alias("corpus_docs"),
            F.sum("n_chars").alias("corpus_chars"),
        )
        d = read_version(spark, card, version).agg(
            F.sum("n_docs").alias("datacard_docs"),
            F.sum("n_chars").alias("datacard_chars"),
        )
        return c.join(d).select(
            F.lit(name).alias("stage"),
            "corpus_docs",
            "datacard_docs",
            "corpus_chars",
            "datacard_chars",
            (
                (F.col("corpus_docs") == F.col("datacard_docs"))
                & (F.col("corpus_chars") == F.col("datacard_chars"))
            ).alias("consistent"),
        )

    return (
        stage("pre-txn", 1)
        .unionByName(stage("post-txn", 2))
        .orderBy(F.desc("stage"))
    )


@register(
    "versioned_timestamp_round_trip",
    oracle="""
WITH c AS (
  SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS n0,
         CAST(COUNT(*) FILTER (WHERE doc_id % 3 <= 1) AS BIGINT) AS n01,
         CAST(COUNT(*) AS BIGINT) AS nall
  FROM documents
)
SELECT CAST(1 AS BIGINT) AS version, n0 AS n_rows_at_instant,
       TRUE AS round_trip, TRUE AS connector_agrees,
       TRUE AS strictly_between
FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), n01, TRUE, TRUE, TRUE FROM c
UNION ALL
SELECT CAST(3 AS BIGINT), nall, TRUE, TRUE, TRUE FROM c
ORDER BY version
""",
)
def versioned_timestamp_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-COMMIT TIMESTAMPS, driver-gated (Delta's inCommitTimestamps):
    three versions of a documents slice commit to a scratch table,
    every marker's mtime is then BACKDATED to 1970 — the copy/restore
    perturbation that collapses mtime-based time travel to 'everything
    is newest' — and the row pins, per version: (a) the snapshot ROW
    COUNT read back at the version's own recorded instant (real data —
    the oracle recomputes it from the documents table: the %3 ingest
    slices); (b) TIMESTAMP AS OF round-trip — both rounding directions
    resolve the instant to exactly its version; (c) the connector's
    plain-FS resolvers agree with the engine's; (d) an instant strictly
    BETWEEN two commits resolves down to the earlier and up to the
    later (the write-side monotone clamp guarantees >= 1 ms spacing, so
    +0.4 ms sits strictly between), with the last version's round-up
    correctly exhausting. A hash match certifies the whole timestamp
    face ignores mtimes whenever headers carry the instant."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_version,
        read_version,
        version_at_or_after_timestamp,
        version_at_timestamp,
        version_header,
    )
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.sources import (
        _vt_version_at_or_after_timestamp,
        _vt_version_at_timestamp,
    )

    import os

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    tbl = scratch_dir("sg-ict-") + "/t"
    commit_version(spark, d.where(F.col("doc_id") % 3 == 0), tbl)
    commit_append(spark, d.where(F.col("doc_id") % 3 == 1), tbl)
    commit_append(spark, d.where(F.col("doc_id") % 3 == 2), tbl)
    cdir = f"{tbl}/_commits"
    for n in os.listdir(cdir):
        os.utime(f"{cdir}/{n}", (1000.0, 1000.0))
    rows = []
    for v in (1, 2, 3):
        cts = version_header(spark, tbl, v)["commit_ts"]
        n_rows = read_version(spark, tbl, timestamp=cts).count()
        round_trip = (
            version_at_timestamp(spark, tbl, cts) == v
            and version_at_or_after_timestamp(spark, tbl, cts) == v
        )
        connector = (
            _vt_version_at_timestamp(tbl, cts) == v
            and _vt_version_at_or_after_timestamp(tbl, cts) == v
        )
        mid = cts + 0.0004  # < the 1 ms clamp: strictly between commits
        down_ok = version_at_timestamp(spark, tbl, mid) == v
        if v < 3:
            up_ok = version_at_or_after_timestamp(spark, tbl, mid) == v + 1
        else:
            try:
                version_at_or_after_timestamp(spark, tbl, mid)
                up_ok = False  # past the last commit: must exhaust
            except FileNotFoundError:
                up_ok = True
        rows.append((v, n_rows, round_trip, connector, down_ok and up_ok))
    return spark.createDataFrame(
        rows,
        "version bigint, n_rows_at_instant bigint, round_trip boolean, "
        "connector_agrees boolean, strictly_between boolean",
    ).orderBy("version")


@register(
    "txn_consistent_read",
    oracle=f"""
WITH half1 AS (SELECT doc_id, source, n_chars FROM documents
               WHERE doc_id % 2 = 0),
alln AS (SELECT doc_id, source, n_chars FROM documents),
s1 AS (
  SELECT 'resolved-current' AS stage,
         CAST(2 AS BIGINT) AS v_corpus, CAST(2 AS BIGINT) AS v_datacard,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM alln) AS corpus_docs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM alln) AS datacard_docs,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM alln) AS corpus_chars,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM alln) AS datacard_chars
),
s2 AS (
  SELECT 'repaired-pin' AS stage,
         CAST(1 AS BIGINT) AS v_corpus, CAST(1 AS BIGINT) AS v_datacard,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM half1) AS corpus_docs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM half1) AS datacard_docs,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM half1) AS corpus_chars,
         (SELECT CAST(SUM(n_chars) AS BIGINT) FROM half1) AS datacard_chars
)
SELECT stage, v_corpus, v_datacard, corpus_docs, datacard_docs,
       corpus_chars, datacard_chars,
       corpus_docs = datacard_docs AND corpus_chars = datacard_chars
         AS consistent
FROM s1
UNION ALL
SELECT stage, v_corpus, v_datacard, corpus_docs, datacard_docs,
       corpus_chars, datacard_chars,
       corpus_docs = datacard_docs AND corpus_chars = datacard_chars
FROM s2
ORDER BY stage DESC
""",
)
def txn_consistent_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ half of multi-table atomicity, driver-gated (r11
    verdict item 8): ``commit_transaction`` makes corpus + datacard
    writes both-or-neither, and ``read_transaction`` resolves a version
    VECTOR where every spanning transaction is included on all tables
    or none. Two observed stages: (a) resolved at current — the vector
    includes the transaction on both tables and the datacard's totals
    equal the corpus's; (b) a deliberately TORN pin (corpus at the
    txn-including version, datacard pinned before it) — the resolver
    lowers the corpus below the claim, and the emitted totals prove the
    repaired vector is again consistent. A resolver that let the torn
    pin through would emit corpus_docs != datacard_docs and
    hash-mismatch. Versions ride in the output (2,2 then 1,1 — the
    oracle pins the resolution itself, not just the row counts)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_transaction,
        commit_version,
        read_transaction,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    base = scratch_dir("sg-txnread-")
    corpus, card, troot = base + "/corpus", base + "/datacard", base + "/txns"
    half1 = docs.where(F.col("doc_id") % 2 == 0)
    half2 = docs.where(F.col("doc_id") % 2 == 1)

    def card_of(d: DataFrame) -> DataFrame:
        return d.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )

    commit_version(spark, half1.coalesce(1), corpus, stats_cols=["doc_id"])
    commit_version(spark, card_of(half1).coalesce(1), card)
    commit_transaction(
        spark,
        [(corpus, half2.coalesce(1), ["doc_id"]),
         (card, card_of(half2).coalesce(1))],
        troot,
    )

    def stage(name: str, vec: dict) -> DataFrame:
        c = read_version(spark, corpus, vec[corpus]).agg(
            F.count(F.lit(1)).alias("corpus_docs"),
            F.sum("n_chars").alias("corpus_chars"),
        )
        d = read_version(spark, card, vec[card]).agg(
            F.sum("n_docs").alias("datacard_docs"),
            F.sum("n_chars").alias("datacard_chars"),
        )
        return c.join(d).select(
            F.lit(name).alias("stage"),
            F.lit(vec[corpus]).cast("bigint").alias("v_corpus"),
            F.lit(vec[card]).cast("bigint").alias("v_datacard"),
            "corpus_docs",
            "datacard_docs",
            "corpus_chars",
            "datacard_chars",
            (
                (F.col("corpus_docs") == F.col("datacard_docs"))
                & (F.col("corpus_chars") == F.col("datacard_chars"))
            ).alias("consistent"),
        )

    current = read_transaction(spark, [corpus, card])
    repaired = read_transaction(spark, [corpus, card], at={corpus: 2, card: 1})
    return (
        stage("resolved-current", current)
        .unionByName(stage("repaired-pin", repaired))
        .orderBy(F.desc("stage"))
    )


FORGET_VEC_IDS = (7, 123, 321, 404)  # present at every SF (vec_id 0..499+)
_FORGET_IDS_SQL = ", ".join(str(i) for i in FORGET_VEC_IDS)


@register(
    "rtbf_forget_base_and_index_txn",
    oracle=f"""
WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
       WHERE vec_id IN ({_FORGET_IDS_SQL})),
t(table_name) AS (VALUES ('corpus'), ('ivfpq_index'))
SELECT t.table_name,
       tot.n AS rows_before,
       nf.n AS n_forget,
       tot.n - nf.n AS rows_after,
       CAST(0 AS BIGINT) AS forgotten_remaining,
       CAST(TRUE AS BOOLEAN) AS txn_paired
FROM t, tot, nf
ORDER BY table_name
""",
)
def rtbf_forget_base_and_index_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RTBF ACROSS THE SERVED ANN INDEX (r11 verdict item 4 — the gap
    where a forgotten user's embedding survived inside the index after
    the base-table sweep): delete the forgotten vec_ids from the raw
    corpus table AND the residual IVF-PQ index built over it in ONE
    ``commit_transaction`` — both-or-neither, so no observable state has
    the base row erased while the index still serves its vector (or
    vice versa). The deletes take the DV path (O(deleted rows) metadata,
    no file rewrites) staged entirely before the first slot claim;
    both claim headers carry the same txn id (asserted in-code).

    The emitted accounting is the compliance evidence: per table, the
    pre-txn row count (time travel to v1 — retention note: vacuum past
    the delete + compact to physically forget), the forget-set size
    found pre-txn, the post-txn count, and ``forgotten_remaining`` —
    measured by per-key Bloom-assisted ``scan_version`` point lookups
    against the POST-delete snapshot (the oracle pins it to the 0 the
    sweep must produce; a torn or spared delete would hash-mismatch).
    At 100 TB: each point sweep touches O(actually-containing files)
    via per-file Blooms on vec_id, the index delete touches O(forgotten
    vectors) of metadata, and the atomicity needs no lock service —
    crash-injection pytests (tests/test_rtbf_txn.py) cover a
    coordinator dying between the two claims."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_transaction,
        commit_version,
        read_version,
        scan_version,
        version_header,
    )
    from otus_cpp_11_spark.queries.similarity import (
        _ivf_trained,
        _pq_trained_res,
        encode_ivfpq,
    )
    from otus_cpp_11_spark.session import scratch_dir

    e = load_table(spark, sf_dir, "embeddings")
    base = scratch_dir("sg-rtbf-")
    corpus, index, troot = base + "/corpus", base + "/index", base + "/txns"
    cents, _, _, _ = _ivf_trained(spark, sf_dir, pre_ingest=True)
    slices, _, _, _ = _pq_trained_res(spark, sf_dir, pre_ingest=True)
    commit_version(
        spark,
        e.repartitionByRange(4, "vec_id"),
        corpus,
        stats_cols=["vec_id"],
        bloom_cols=["vec_id"],
    )
    commit_version(
        spark,
        encode_ivfpq(e, cents, slices),
        index,
        stats_cols=["cell", "vec_id"],
        bloom_cols=["vec_id"],
    )
    cond = f"vec_id IN ({_FORGET_IDS_SQL})"
    bounds = {"vec_id": (min(FORGET_VEC_IDS), max(FORGET_VEC_IDS))}
    versions = commit_transaction(
        spark,
        [],
        troot,
        deletes=[(corpus, cond, bounds, 0.5), (index, cond, bounds, 0.5)],
    )
    if versions != {corpus: 2, index: 2}:  # not assert: must survive -O
        raise RuntimeError(
            f"rtbf txn landed on unexpected versions {versions}"
        )
    paired = (
        version_header(spark, corpus, 2)["txn"]["id"]
        == version_header(spark, index, 2)["txn"]["id"]
    )
    rows = []
    for name, tbl in (("corpus", corpus), ("ivfpq_index", index)):
        before = read_version(spark, tbl, 1).count()
        n_forget = (
            read_version(spark, tbl, 1)
            .where(F.col("vec_id").isin(*FORGET_VEC_IDS))
            .count()
        )
        after = read_version(spark, tbl, 2).count()
        remaining = 0
        for i in FORGET_VEC_IDS:  # Bloom-assisted point sweeps, post-txn
            df, _acct = scan_version(spark, tbl, bounds={"vec_id": (i, i)})
            remaining += df.where(F.col("vec_id") == i).count()
        rows.append((name, before, n_forget, after, remaining, bool(paired)))
    return spark.createDataFrame(
        rows,
        "table_name string, rows_before bigint, n_forget bigint, "
        "rows_after bigint, forgotten_remaining bigint, txn_paired boolean",
    ).orderBy("table_name")


@register(
    "versioned_bloom_point_lookup",
    oracle=f"""
WITH src AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
),
present AS (
  SELECT 'present' AS probe, CAST(COUNT(*) AS BIGINT) AS n_rows,
         COALESCE({dsum_sql('c_acctbal', 2)}, 0.0) AS bal_sum,
         CAST(2 AS BIGINT) AS files_total,
         CAST(1 AS BIGINT) AS files_scanned,
         CAST(1 AS BIGINT) AS files_bloom_dismissed
  FROM src WHERE c_custkey = 44
),
absent AS (
  SELECT 'absent-in-range' AS probe, CAST(0 AS BIGINT) AS n_rows,
         0.0 AS bal_sum,
         CAST(2 AS BIGINT) AS files_total,
         CAST(0 AS BIGINT) AS files_scanned,
         CAST(2 AS BIGINT) AS files_bloom_dismissed
)
SELECT * FROM present UNION ALL SELECT * FROM absent
ORDER BY probe
""",
)
def versioned_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file BLOOM skipping on point lookups (r10 verdict item 4 —
    Delta's ``delta.bloomFilter.<col>``): the table is built so min/max
    extents can never help — even keys in one file, odd keys in the
    other, both spanning the full range — and custkeys divisible by 3
    are withheld so an IN-RANGE ABSENT key exists. The 'present' probe
    (key 88 = custkey 44) must scan exactly the even file: the odd
    file survives the range tier (88 is inside its extent) and is
    dismissed by its Bloom alone. The 'absent-in-range' probe (key 90 =
    withheld custkey 45) is dismissed from BOTH files by their Blooms —
    the RTBF point-sweep shape where a range-only planner scans every
    file whose extent straddles the key. The emitted accounting columns
    pin the file-dismissal arithmetic into the oracle hash alongside
    the row results (values deterministic: the filter hashes data, not
    RNG; verified identical at all three SFs). At 100 TB: a 128-byte
    filter per (file, column) in the manifest turns high-cardinality
    point deletes/lookups from O(straddling files) scans into manifest
    arithmetic. Reference: no stats story in the C++ engine; lakehouse
    mandate (Delta/Parquet public Bloom-skipping semantics)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_version,
        scan_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    src = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 != 0)
        .select("c_custkey", "c_acctbal")
    )
    tbl = scratch_dir("sg-bloom-") + "/keyed"
    evens = src.select(
        (F.col("c_custkey") * 2).alias("k"), F.col("c_acctbal").alias("bal")
    )
    odds = src.select(
        (F.col("c_custkey") * 2 + 1).alias("k"),
        F.col("c_acctbal").alias("bal"),
    )
    commit_version(
        spark, evens.coalesce(1), tbl, stats_cols=["k"], bloom_cols=["k"]
    )
    commit_append(
        spark, odds.coalesce(1), tbl, stats_cols=["k"], bloom_cols=["k"]
    )

    def probe(name: str, k: int) -> DataFrame:
        got, acct = scan_version(spark, tbl, bounds={"k": (k, k)})
        return got.agg(
            F.lit(name).alias("probe"),
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(dsum(F.col("bal"), 2), F.lit(0.0)).alias("bal_sum"),
            F.lit(acct["files_total"]).cast("bigint").alias("files_total"),
            F.lit(acct["files_scanned"]).cast("bigint").alias("files_scanned"),
            F.lit(acct["files_bloom_dismissed"])
            .cast("bigint")
            .alias("files_bloom_dismissed"),
        )

    return (
        probe("present", 88)
        .unionByName(probe("absent-in-range", 90))
        .orderBy("probe")
    )


_WIDEN_BIG = 3_000_000_000  # needs int64: only representable post-widening


@register(
    "versioned_type_widening_lifecycle",
    oracle=f"""
WITH src AS (
  SELECT CAST(c_custkey AS INTEGER) AS k,
         CAST(c_acctbal AS FLOAT) AS v
  FROM customer
),
base AS (
  SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS ksum FROM src
),
v1 AS (
  SELECT 'snapshot' AS face, 1 AS version, 'int' AS k_type,
         'float' AS v_type, n AS n_rows, ksum AS key_sum
  FROM base
),
v2 AS (
  SELECT 'snapshot' AS face, 2 AS version, 'bigint' AS k_type,
         'float' AS v_type, n AS n_rows, ksum AS key_sum
  FROM base
),
v3 AS (
  SELECT 'snapshot' AS face, 3 AS version, 'bigint' AS k_type,
         'double' AS v_type, n + 1 AS n_rows,
         ksum + {_WIDEN_BIG} AS key_sum
  FROM base
),
cdf AS (
  SELECT 'cdf' AS face, 3 AS version, 'bigint' AS k_type,
         'double' AS v_type, CAST(1 AS BIGINT) AS n_rows,
         CAST({_WIDEN_BIG} AS BIGINT) AS key_sum
),
conn AS (
  SELECT 'connector' AS face, 3 AS version, 'bigint' AS k_type,
         'double' AS v_type, n + 1 AS n_rows,
         ksum + {_WIDEN_BIG} AS key_sum
  FROM base
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
UNION ALL SELECT * FROM cdf UNION ALL SELECT * FROM conn
ORDER BY version, face
""",
)
def versioned_type_widening_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta type widening end to end (r10 verdict item 3): commit the
    customer table with an INT key and FLOAT balance, WIDEN the key to
    bigint as a metadata-only commit (asserted: every data file carried
    by reference, zero bytes moved), then APPEND a row whose key does
    not fit int32 with ``merge_schema=True`` — which also AUTO-WIDENS
    the balance to double from the delta frame's type. Three faces are
    then proven over the mixed-width files: time-travel snapshots read
    each version under ITS OWN schema (v1 narrow, v2 wide-key, v3 both
    wide — dtypes emitted as columns so the oracle pins them), the CDF
    face serves the append's insert under the END schema while the
    widening commit itself feeds nothing (CDF-neutral), and the
    CONNECTOR batch face plans splits from the manifest and reads the
    narrow files up-converted. The oracle recomputes every face from
    the raw table. At 100 TB: upgrading a count column to bigint is an
    O(1)-metadata commit instead of a full rewrite. Reference: the C++
    engine has no schema story; lakehouse mandate (Delta public
    type-widening semantics)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_version,
        commit_widen_column,
        read_change_feed,
        read_manifest,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir
    from otus_cpp_11_spark.sources import register_versioned_table_source

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("k"),
        F.col("c_acctbal").cast("float").alias("v"),
    )
    tbl = scratch_dir("sg-widen-") + "/customer_v"
    commit_version(spark, cust.repartitionByRange(2, "k"), tbl,
                   stats_cols=["k"])
    _, files1 = read_manifest(spark, tbl, 1)
    commit_widen_column(spark, tbl, "k", "bigint")
    _, files2 = read_manifest(spark, tbl, 2)
    assert files2 == files1, "widening must carry every file by reference"
    late = spark.createDataFrame([(_WIDEN_BIG, 0.5)], "k bigint, v double")
    commit_append(spark, late, tbl, merge_schema=True, stats_cols=["k"])

    def snap(version: int) -> DataFrame:
        df = read_version(spark, tbl, version)
        types = dict(df.dtypes)
        return df.agg(
            F.lit("snapshot").alias("face"),
            F.lit(version).alias("version"),
            F.lit(types["k"]).alias("k_type"),
            F.lit(types["v"]).alias("v_type"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").cast("bigint").alias("key_sum"),
        )

    feed = read_change_feed(spark, tbl, 2, 3)  # the widening feeds nothing
    ftypes = dict(feed.dtypes)
    cdf = feed.where(F.col("_change_type") == "insert").agg(
        F.lit("cdf").alias("face"),
        F.lit(3).alias("version"),
        F.lit(ftypes["k"]).alias("k_type"),
        F.lit(ftypes["v"]).alias("v_type"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_sum"),
    )
    register_versioned_table_source(spark)
    via = (
        spark.read.format("versioned_table").option("path", tbl).load()
    )
    vtypes = dict(via.dtypes)
    conn = via.agg(
        F.lit("connector").alias("face"),
        F.lit(3).alias("version"),
        F.lit(vtypes["k"]).alias("k_type"),
        F.lit(vtypes["v"]).alias("v_type"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_sum"),
    )
    return (
        snap(1)
        .unionByName(snap(2))
        .unionByName(snap(3))
        .unionByName(cdf)
        .unionByName(conn)
        .orderBy("version", "face")
    )


OPTWHERE_HOT_CHUNKS = 4  # hot-range ingest debris files
OPTWHERE_TARGET = 1_000_000  # pack target: the whole hot range fits one file


@register(
    "versioned_optimize_where",
    oracle=f"""
WITH k AS (
  SELECT CAST(MAX(o_orderkey) / 2 AS BIGINT) AS split FROM orders
),
hot AS (
  SELECT o.* FROM orders o, k WHERE o.o_orderkey >= k.split
),
pre AS (
  SELECT 'pre' AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
         (SELECT {dsum_sql('o_totalprice', 2)} FROM orders) AS total_price,
         CAST({OPTWHERE_HOT_CHUNKS + 1} AS BIGINT) AS n_files,
         CAST({OPTWHERE_HOT_CHUNKS + 1} AS BIGINT) AS n_carried
),
post AS (
  SELECT 'post' AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
         (SELECT {dsum_sql('o_totalprice', 2)} FROM orders) AS total_price,
         CAST(1 AS BIGINT)
           + (SELECT CAST(CEIL(COUNT(*) / {OPTWHERE_TARGET}.0) AS BIGINT)
              FROM hot) AS n_files,
         CAST(1 AS BIGINT) AS n_carried
)
SELECT * FROM post UNION ALL SELECT * FROM pre
ORDER BY stage
""",
)
def versioned_optimize_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... WHERE, end to end (Delta's predicate-scoped
    compaction, generalized to manifest-stats ranges): orders lands as
    one COLD file (keys below the median split) plus
    {OPTWHERE_HOT_CHUNKS} hot-range ingest-debris files, then ONE
    ``commit_compaction(where_bounds=...)`` scoped to the hot key range
    packs ONLY the hot files — the cold file is out of the predicate's
    extents and carried by reference byte-untouched (asserted against
    the manifests in-flight; its survival is also pinned in the
    ``n_carried`` column). Content is byte-identical across the sweep —
    the oracle recomputes both stages from the raw table plus the exact
    file arithmetic (1 carried + ceil(hot/target) packed), so the hash
    proves the scoped rewrite moved layout and nothing else. This is
    the scheduled-compaction pattern at 100 TB: the sweep's cost tracks
    the debris inside the hot ingest range, never the cold bulk of the
    table. Reference: lakehouse mandate (Delta OPTIMIZE WHERE)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_compaction,
        commit_version,
        read_manifest,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey")).collect()[0][0]  # bounded: one row
    split = int(mx) // 2
    tbl = scratch_dir("sg-optw-") + "/orders_v"
    commit_version(
        spark,
        o.where(F.col("o_orderkey") < split).coalesce(1),
        tbl,
        stats_cols=["o_orderkey"],
    )
    for i in range(OPTWHERE_HOT_CHUNKS):
        commit_append(
            spark,
            o.where(
                (F.col("o_orderkey") >= split)
                & (F.col("o_orderkey") % OPTWHERE_HOT_CHUNKS == i)
            ).coalesce(1),
            tbl,
            stats_cols=["o_orderkey"],
        )
    pre_v = OPTWHERE_HOT_CHUNKS + 1
    _, pre_files = read_manifest(spark, tbl, pre_v)
    v = commit_compaction(
        spark,
        tbl,
        max_rows_per_file=OPTWHERE_TARGET,
        cluster_cols=["o_orderkey"],
        where_bounds={"o_orderkey": (split, int(mx))},
    )
    assert v == pre_v + 1
    _, post_files = read_manifest(spark, tbl, v)
    carried = [f for f in post_files if f in set(pre_files)]
    assert len(carried) == 1, carried  # the cold file, by reference

    def snap(version: int, stage: str, nf: int, nc: int) -> DataFrame:
        return read_version(spark, tbl, version).agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), 2).alias("total_price"),
            F.lit(nf).cast("bigint").alias("n_files"),
            F.lit(nc).cast("bigint").alias("n_carried"),
        )

    return (
        snap(v, "post", len(post_files), len(carried))
        .unionByName(snap(pre_v, "pre", len(pre_files), len(pre_files)))
        .orderBy("stage")
    )


AUTOCOMPACT_CHUNKS = 6  # simulated per-micro-batch ingest commits
AUTOCOMPACT_TARGET = 100_000  # pack everything into ceil(n/target) files


@register(
    "versioned_autocompact_ingest",
    oracle=f"""
WITH src AS (SELECT c_custkey, c_acctbal FROM customer),
n AS (SELECT COUNT(*) AS c FROM src),
pre AS (
  SELECT 'pre' AS stage, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         (SELECT CAST({AUTOCOMPACT_CHUNKS} AS BIGINT) FROM n) AS n_files
  FROM src
),
post AS (
  SELECT 'post' AS stage, COUNT(*) AS n_rows,
         {dsum_sql('c_acctbal', 2)} AS total_acctbal,
         (SELECT CAST(CEIL(c / {AUTOCOMPACT_TARGET}.0) AS BIGINT) FROM n)
           AS n_files
  FROM src
)
SELECT * FROM post UNION ALL SELECT * FROM pre
ORDER BY stage
""",
)
def versioned_autocompact_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-compaction of ingest debris, end to end (the small-file
    sibling of the DV pressure valve): the customer table arrives as
    {AUTOCOMPACT_CHUNKS} per-micro-batch appends of one small file each
    — the exact fragmentation a streaming sink produces — then ONE
    ``commit_autocompact`` sweep packs every small file into
    ceil(n / target) files while untouched-size files would be carried
    by reference (asserted in the unit tests; here all files are small
    by construction so the post count is the pure bin-packing formula).
    Content is byte-identical across the sweep — the oracle recomputes
    both stages from the raw table and the exact file-count arithmetic,
    so the hash proves the sweep moved layout and nothing else. The
    rewrite is a coalesce (concatenation, shuffle-free) when the scan
    partitions suffice, an O(debris) repartition otherwise — either
    way an unattended post-ingest hook costs O(debris), not O(table). Reference: the C++ engine writes one file
    per reducer with no maintenance story (src/runner.cpp); lakehouse
    mandate (Delta autoCompact semantics)."""
    from otus_cpp_11_spark.ops.versioned import (
        commit_append,
        commit_autocompact,
        commit_version,
        read_manifest,
        read_version,
    )
    from otus_cpp_11_spark.session import scratch_dir

    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )
    tbl = scratch_dir("sg-autoc-") + "/customer_v"
    # chunk by key MODULO (r10 review): a total partition of the key
    # space whatever its base/gaps — range chunking silently dropped
    # the max key on 1-based key sets divisible by the chunk count
    chunks = [
        cust.where(F.col("c_custkey") % AUTOCOMPACT_CHUNKS == i).coalesce(1)
        for i in range(AUTOCOMPACT_CHUNKS)
    ]
    commit_version(spark, chunks[0], tbl, stats_cols=["c_custkey"])
    for ch in chunks[1:]:
        commit_append(spark, ch, tbl, stats_cols=["c_custkey"])
    pre_v = AUTOCOMPACT_CHUNKS
    _, pre_files = read_manifest(spark, tbl, pre_v)
    v = commit_autocompact(
        spark, tbl, small_file_rows=AUTOCOMPACT_TARGET,
        max_rows_per_file=AUTOCOMPACT_TARGET,
    )
    assert v == pre_v + 1
    hdr, post_files = read_manifest(spark, tbl, v)
    assert hdr["autocompact_io"]["files_selected"] == len(pre_files)

    def snap(version: int, stage: str, nf: int) -> DataFrame:
        return read_version(spark, tbl, version).agg(
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
            F.lit(nf).cast("bigint").alias("n_files"),
        )

    return (
        snap(pre_v, "pre", len(pre_files))
        .unionByName(snap(v, "post", len(post_files)))
        .orderBy("stage")
    )
