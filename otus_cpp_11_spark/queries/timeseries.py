"""Time-series / event-stream queries over the events table — the batch
faces of the streaming surface (SURVEY.md §2.2 'streaming' extension
mandate). The same windows run as Structured Streaming in
``otus_cpp_11_spark.streaming``; here they are batch + oracle-gated.

Window bucketing: Spark ``F.window`` and DuckDB ``time_bucket`` are both
epoch-aligned, so bucket starts agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import epoch_us, load_table
from otus_cpp_11_spark.ops.joins import asof_join, range_join_within
from otus_cpp_11_spark.queries import dsum
from otus_cpp_11_spark.registry import register


@register(
    "events_tumbling_5min",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    bench=True,
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregate per event type — the batch face of
    the streaming tumbling window."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "5 minutes").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 6).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_10min_5min",
    oracle="""
WITH starts AS (
  SELECT event_id, value,
         time_bucket(INTERVAL '5 minutes', ts) - offs * INTERVAL '5 minutes' AS window_start
  FROM events
  CROSS JOIN (SELECT UNNEST([0, 1]) AS offs) o
)
SELECT window_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM starts
GROUP BY window_start
ORDER BY window_start
""",
)
def events_sliding_10min_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): each event lands in two
    overlapping windows. The oracle replicates Spark's expansion explicitly
    (bucket(5m) and bucket(5m)-5m are exactly the containing starts)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 6).alias("sum_value"),
        )
        .orderBy("window_start")
    )


@register(
    "events_json_props",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       COUNT(*) AS n
FROM events
GROUP BY k_value
ORDER BY k_value
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON props column and aggregate
    by an extracted field (nested/JSON surface — no reference counterpart,
    its type system is string+uint only, SURVEY.md §1.2)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.get_json_object("props", "$.k").cast("bigint").alias("k_value")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_value")
    )


@register(
    "events_session_windows",
    bench=True,
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  -- >= not >: Spark's session_window is half-open [start, start + gap), so
  -- an event landing exactly at the previous session's end starts a NEW
  -- session; a strict > here would merge gap == 30min events (ADVICE r1).
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` (dynamic-length windows closed by 30 min
    of inactivity), batch mode — the same call streams unchanged in
    ``otus_cpp_11_spark.streaming.session_counts``. The oracle rebuilds
    session extents via lag+cumsum (session_end = last event + gap, exactly
    Spark's definition)."""
    from otus_cpp_11_spark.streaming import session_counts

    e = load_table(spark, sf_dir, "events")
    return session_counts(e).orderBy("user_id", "session_start")


@register(
    "user_event_sessions",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sessions AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def user_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative flag sum —
    the batch equivalent of session_window. One shuffle on user_id serves
    both window passes."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                epoch_us("ts") - epoch_us(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = flagged.select(
        "user_id",
        F.sum("is_new").over(w_cum).cast("bigint").alias("session_id"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_id")
    )


@register(
    "purchase_prior_click_asof",
    bench=True,
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.click_id AS asof_click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
)
def purchase_prior_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ops.joins.asof_join): each purchase event joined to the
    user's most recent click at-or-before it, plus the gap in microseconds.
    Clicks are pre-deduped per (user, ts) (max event_id) so the as-of pick
    is deterministic. One shuffle on user_id; DuckDB's native ASOF JOIN is
    the oracle."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", right_cols=["click_id", "ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("asof_click_id"),
        (epoch_us("ts") - epoch_us("asof_ts")).alias("gap_us"),
    ).orderBy("event_id")


@register(
    "view_purchase_within_6h",
    oracle="""
SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'view') a
JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '6 hours'
ORDER BY view_id, purchase_id
""",
)
def view_purchase_within_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join (ops.joins.range_join_within): view→purchase
    conversion pairs within 6 hours for the same user. Time-bucketed
    equi-join — candidate fan-out bounded by cell population, not the
    per-user cross product (see ops.joins docstring for the 100 TB story)."""
    e = load_table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join_within(
        views, purchases, on="user_id", window="'6' HOUR", left_prefix="v_", right_prefix="p_"
    )
    return pairs.select(
        F.col("v_event_id").alias("view_id"),
        F.col("p_event_id").alias("purchase_id"),
        F.col("v_user_id").alias("user_id"),
        (epoch_us("p_ts") - epoch_us("v_ts")).alias("gap_us"),
    ).orderBy("view_id", "purchase_id")


ZSCORE_MIN_EVENTS = 30
ZSCORE_CUT = 3.0


@register(
    "user_value_zscore_outliers",
    oracle=f"""
WITH stats AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS s1,
         CAST(SUM(CAST(FLOOR(value * value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS s2
  FROM events GROUP BY user_id
),
m AS (
  SELECT user_id, n, s1 / n AS mean, s2 / n - (s1 / n) * (s1 / n) AS var
  FROM stats WHERE n >= {ZSCORE_MIN_EVENTS}
)
SELECT e.event_id, e.user_id, e.value,
       (e.value - m.mean) / SQRT(m.var) AS zscore
FROM events e JOIN m ON m.user_id = e.user_id
WHERE m.var > 0 AND ABS((e.value - m.mean) / SQRT(m.var)) >= {ZSCORE_CUT}
ORDER BY e.event_id
""",
)
def user_value_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user anomaly detection: flag events whose value is >= 3 standard
    deviations from that user's mean. Mean and E[x^2] come from fixed-point
    sums (exact, order-free), so mean/var/sqrt/z are bit-identical across
    engines — sqrt is IEEE-correctly-rounded everywhere.

    Join strategy is deliberately UNHINTED (r4 verdict): user_id is not a
    bounded dimension — 10^8-10^9 users make the per-user stats relation
    GBs, and a forced broadcast would OOM every executor. The stats side
    is an aggregate output, so AQE knows its exact size the moment its
    stage completes and converts the join to broadcast only when it
    genuinely fits (no probe job needed — unlike decontamination, where
    gating before the plan mattered because the probe avoided a
    corpus-sized shuffle WRITE; here the events side's shuffle is
    replanned away by AQE before it executes)."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), 6).alias("s1"),
        dsum(F.col("value") * F.col("value"), 6).alias("s2"),
    )
    m = (
        stats.where(F.col("n") >= ZSCORE_MIN_EVENTS)
        .select(
            "user_id",
            (F.col("s1") / F.col("n")).alias("mean"),
            (
                F.col("s2") / F.col("n")
                - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
            ).alias("var"),
        )
        .where(F.col("var") > 0)
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        e.join(m, "user_id")
        .where(F.abs(z) >= ZSCORE_CUT)
        .select("event_id", "user_id", "value", z.alias("zscore"))
        .orderBy("event_id")
    )


MAVG_WINDOW = 5


@register(
    "user_value_moving_avg",
    oracle=f"""
WITH u AS (
  SELECT event_id, user_id, ts, value,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS units
  FROM events
),
w AS (
  SELECT event_id, user_id, ts, value,
         SUM(units) OVER win AS win_units,
         COUNT(*) OVER win AS win_n
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {MAVG_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, value,
       CAST(win_units AS DOUBLE) / 1000000.0 / win_n AS mavg
FROM w
ORDER BY event_id
""",
)
def user_value_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing moving average over the last 5 events (monitoring
    smoothing): one shuffle on user_id, per-partition sorted window. Values
    ride as fixed-point integer units inside the frame sum so partial
    ordering differences can't change low bits. Total tie-break order
    (ts, event_id) keeps the frame contents engine-independent."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MAVG_WINDOW - 1), 0)
    )
    units = F.floor(F.col("value") * 1e6).cast("bigint")
    return (
        e.select(
            "event_id",
            "user_id",
            "value",
            (
                F.sum(units).over(win).cast("double")
                / 1e6
                / F.count(F.lit(1)).over(win)
            ).alias("mavg"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Funnel analysis: ordered view -> click -> purchase conversion.
# --------------------------------------------------------------------------


@register(
    "user_funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS first_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.first_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
  GROUP BY e.user_id
),
u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
SELECT u.n_users,
       (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchased_after_click,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / (SELECT COUNT(*) FROM v) AS view_to_click_rate,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM c) AS click_to_purchase_rate
FROM u
""",
)
def user_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): a user
    converts a stage only with an event at-or-after their previous stage's
    first event — the event-sequence analytics shape (windowed funnels,
    attribution) that needs ORDER, not just membership.

    Three per-user conditional-min hash aggregates chained by equi-joins
    on user_id: every stage relation is user-sized (not event-sized), all
    three shuffles share the user_id key so a co-partitioned layout (or
    one repartition) makes the joins local, and each stage's events
    prefilter (event_type = ...) pushes into the parquet scan. Never a
    self-join of events x events on time ranges, which blows up
    quadratically in events-per-user."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    counts = e.agg(F.count_distinct("user_id").alias("n_users")).crossJoin(
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
    ).crossJoin(
        c.agg(F.count(F.lit(1)).alias("n_clicked_after_view"))
    ).crossJoin(
        p.agg(F.count(F.lit(1)).alias("n_purchased_after_click"))
    )
    return counts.select(
        "n_users",
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        (
            F.col("n_clicked_after_view").cast("double") / F.col("n_viewed")
        ).alias("view_to_click_rate"),
        (
            F.col("n_purchased_after_click").cast("double")
            / F.col("n_clicked_after_view")
        ).alias("click_to_purchase_rate"),
    )


@register(
    "events_tumbling_5min_streamed",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
)
def events_tumbling_5min_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of the tumbling window, driver-visible: replay
    events through streaming.tumbling_counts (watermarked window
    aggregate — the core Structured Streaming primitive) under
    Trigger.AvailableNow into a memory sink and return the completed
    result table. The oracle is the plain batch aggregate: for a bounded
    replay the watermarked streaming aggregate must converge to exactly
    the batch answer (same fixed-point units), which is the
    streaming=batch contract the pytest family proves pairwise and this
    row seals under the cross-engine gate."""
    from otus_cpp_11_spark.queries import dsum
    from otus_cpp_11_spark.streaming import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    out = run_available_now(agg, "tumbling_5min_stream", output_mode="complete")
    return out.orderBy("window_start", "event_type")


@register(
    "events_session_windows_streamed",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def events_session_windows_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of session windows, driver-visible: replay
    events through streaming.session_counts (watermarked
    ``session_window`` aggregate — dynamic-length windows are the
    hardest streaming state shape, since windows MERGE when a new event
    bridges two open sessions) under Trigger.AvailableNow into a memory
    sink. The oracle rebuilds session extents via lag+cumsum, exactly
    the batch contract: for a bounded replay the streamed sessions must
    equal the batch sessionization bit-for-bit (same >= gap boundary
    semantics as events_session_windows, the r1 ADVICE fix)."""
    from otus_cpp_11_spark.streaming import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    from otus_cpp_11_spark.streaming import session_counts

    out = run_available_now(
        session_counts(stream), "session_windows_stream", output_mode="complete"
    )
    return out.orderBy("user_id", "session_start")


@register(
    "view_purchase_within_6h_streamed",
    oracle="""
SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'view') a
JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '6 hours'
ORDER BY view_id, purchase_id
""",
)
def view_purchase_within_6h_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of the bounded range join, driver-visible: the
    stream-stream interval join (both sides watermarked so buffered join
    state is evictable — the shape that survives an unbounded stream)
    replayed under Trigger.AvailableNow and compared against the BATCH
    range join's oracle. Inner interval joins emit matches as both sides
    arrive (append mode); the watermark only bounds state, so a bounded
    replay converges to exactly the batch answer."""
    from otus_cpp_11_spark.streaming import (
        read_events_stream,
        run_available_now,
        view_purchase_stream_join,
    )

    stream = read_events_stream(spark, sf_dir)
    views = stream.where(F.col("event_type") == "view")
    purchases = stream.where(F.col("event_type") == "purchase")
    out = run_available_now(
        view_purchase_stream_join(views, purchases),
        "view_purchase_stream",
        output_mode="append",
    )
    return out.orderBy("view_id", "purchase_id")


@register(
    "events_sliding_10min_5min_streamed",
    oracle="""
WITH starts AS (
  SELECT event_id, value,
         time_bucket(INTERVAL '5 minutes', ts) - offs * INTERVAL '5 minutes' AS window_start
  FROM events
  CROSS JOIN (SELECT UNNEST([0, 1]) AS offs) o
)
SELECT window_start, COUNT(*) AS n_events
FROM starts
GROUP BY window_start
ORDER BY window_start
""",
)
def events_sliding_10min_5min_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING face of the sliding window, driver-visible:
    streaming.sliding_counts (watermarked overlapping windows — each
    event updates width/slide window states) drained under
    Trigger.AvailableNow into a memory sink, against the batch oracle's
    explicit two-offset expansion. Completes the driver-gated set for
    the three window shapes (tumbling r4, session + sliding r5)."""
    from otus_cpp_11_spark.streaming import (
        read_events_stream,
        run_available_now,
        sliding_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(
        sliding_counts(stream), "sliding_10min_stream", output_mode="complete"
    )
    return out.orderBy("window_start")


@register(
    "events_dedup_streamed",
    oracle="""
SELECT event_id, user_id, event_type
FROM events
ORDER BY event_id
""",
)
def events_dedup_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state, driver-visible: the
    events stream UNIONED WITH ITSELF (every event arrives twice, the
    at-least-once delivery a real ingest must tolerate) flows through
    dropDuplicatesWithinWatermark on event_id, which keeps a key
    fingerprint only until the watermark passes it — state is O(events
    per lateness horizon), the only dedup that survives an unbounded
    stream. A bounded double-delivery replay must drain to exactly one
    row per event: the oracle is the plain distinct event list."""
    from otus_cpp_11_spark.streaming import (
        dedup_by_event_id,
        read_events_stream,
        run_available_now,
    )

    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    out = run_available_now(
        dedup_by_event_id(doubled).select("event_id", "user_id", "event_type"),
        "dedup_stream",
        output_mode="append",
    )
    return out.orderBy("event_id")


@register(
    "running_user_counts_streamed",
    oracle="""
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def running_user_counts_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom STATEFUL streaming operator, driver-visible:
    streaming.running_user_counts (applyInPandasWithState — an
    Arrow-batched per-key fold whose state is one long per user) drained
    in update mode; each micro-batch emits the user's new cumulative
    count, so the LAST update per user equals the batch count. The
    memory sink keeps every update, hence the max-per-user collapse
    before comparing to the plain batch aggregate — the
    custom-stateful-operator analogue of the streaming=batch contract."""
    from otus_cpp_11_spark.streaming import (
        read_events_stream,
        run_available_now,
        running_user_counts,
    )

    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(
        running_user_counts(stream), "running_counts_stream", output_mode="update"
    )
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .orderBy("user_id")
    )


@register(
    "view_purchase_left_outer_streamed",
    oracle="""
WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
wm AS (
  SELECT LEAST((SELECT MAX(ts) FROM v), (SELECT MAX(ts) FROM p))
         - INTERVAL '10 minutes' AS w
)
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM v JOIN p
  ON v.user_id = p.user_id AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '6 hours'
UNION ALL
SELECT v.event_id, CAST(NULL AS BIGINT), v.user_id, CAST(NULL AS BIGINT)
FROM v, wm
WHERE v.ts < wm.w - INTERVAL '6 hours'
  AND NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.user_id = v.user_id
      AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '6 hours'
  )
ORDER BY view_id, purchase_id
""",
)
def view_purchase_left_outer_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream LEFT OUTER interval join, driver-visible: every
    view emits, matched or null-extended — but a null-extended row may
    only appear once Spark KNOWS no match can arrive, i.e. once the
    final watermark (min over both sides of max event time - 10 min)
    passes view.ts + 6 h. The oracle encodes exactly that horizon: the
    batch range join's inner pairs, plus one null row per never-matched
    view STRICTLY older than watermark - 6 h; views inside the horizon
    stay buffered when the bounded replay stops (a restart resumes them
    from the checkpoint — semantics, not loss; pinned by
    tests/test_streaming.py::test_stream_stream_outer_join_equals_batch).
    State is watermark-evictable on both sides, identical to the inner
    join — the property that lets attribution (unconverted impressions)
    run on an unbounded stream."""
    from otus_cpp_11_spark.streaming import (
        read_events_stream,
        run_available_now,
        view_purchase_stream_join_outer,
    )

    stream = read_events_stream(spark, sf_dir)
    views = stream.where(F.col("event_type") == "view")
    purchases = stream.where(F.col("event_type") == "purchase")
    out = run_available_now(
        view_purchase_stream_join_outer(views, purchases),
        "view_purchase_outer_stream",
        output_mode="append",
    )
    return out.orderBy("view_id", "purchase_id")


def _enrich_oracle() -> str:
    # interpolate the CDC key constants so the oracle can never drift from
    # the Spark-side mapping (the r4 PQ_DSUB advice rule)
    from otus_cpp_11_spark.queries.cdc import CDC_KEY_MULT, CDC_KEY_OFF

    return f"""
SELECT c.c_mktsegment AS mktsegment, e.event_type, COUNT(*) AS n_events
FROM events e
LEFT JOIN customer c ON c.c_custkey = e.user_id * {CDC_KEY_MULT} + {CDC_KEY_OFF}
GROUP BY mktsegment, e.event_type
ORDER BY mktsegment NULLS FIRST, e.event_type
"""


@register(
    "events_enriched_streamed",
    oracle=_enrich_oracle(),
)
def events_enriched_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, driver-visible: replay events through
    streaming.stream_static_enrich against the customer dimension (the
    same user_id*11+7 key mapping as the CDC family, so some events miss
    the dim — the left join's null segment is part of the contract),
    collect the enriched stream from an append memory sink, and
    aggregate per (mktsegment, event_type). The oracle is the plain
    batch left join + aggregate: stream-static is STATELESS (the dim is
    re-resolved each micro-batch), so for a bounded replay the enriched
    stream equals the batch join row-for-row however it was
    micro-batched. The r4 verdict's broadcast note is baked in:
    stream_static_enrich carries no hint, so the planner size-gates the
    per-batch dim join instead of force-shipping an unbounded dim."""
    from otus_cpp_11_spark.queries.cdc import CDC_KEY_MULT, CDC_KEY_OFF
    from otus_cpp_11_spark.streaming import (
        read_events_stream,
        run_available_now,
        stream_static_enrich,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    ev = read_events_stream(spark, sf_dir).withColumn(
        "user_id", F.col("user_id") * CDC_KEY_MULT + CDC_KEY_OFF
    )
    out = run_available_now(
        stream_static_enrich(ev, dim), "events_enriched_stream", "append"
    )
    return (
        out.groupBy(F.col("c_mktsegment").alias("mktsegment"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("mktsegment").asc_nulls_first(), "event_type")
    )


@register(
    "user_value_resample_1h_ffill",
    bench=True,
    oracle="""
WITH ranked AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
hourly AS (SELECT user_id, hour, value AS v FROM ranked WHERE rn = 1),
bounds AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT g.user_id, g.hour,
       LAST_VALUE(h.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff
FROM grid g LEFT JOIN hourly h USING (user_id, hour)
ORDER BY user_id, hour
""",
)
def user_value_resample_1h_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESAMPLE + GAP-FILL: regularize each user's irregular event series
    onto an hourly grid (bounded by the user's own first/last event hour)
    and forward-fill hours with no events from the last observed value —
    the time-series regularization every feature-store / monitoring
    pipeline runs before windowed models, and the one classic
    time-series operator this family lacked (windows, sessionization,
    as-of joins, rolling stats all exist; resampling did not).

    Per-hour observation = the LATEST record in the hour by the total
    (ts, event_id) recency order (struct-max argmax, partial-aggregated);
    the fill copies that double verbatim — no arithmetic — so both
    engines agree exactly. The grid never has a leading NULL by
    construction (the first grid hour contains the user's first event).

    Plan (r14, guide §2.4/§1.2 step 1 — fix the distributed algorithm):
    ONE events scan compacts to hour grain (partial-aggregated), then a
    per-user ``lead`` window names each observation's successor and the
    gap rows [hour, next_hour) explode map-side carrying THIS
    observation's value — which IS the forward fill, row for row: the
    grid hour h takes the value of the latest observed hour <= h, and
    every grid hour between two observations (and none outside
    [first, last]) appears exactly once. The previous shape scanned
    events twice (compaction + bounds), built the grid from bounds,
    left-joined it back and ran an ignore-nulls fill window; the lead
    formulation deletes the second scan, the grid join and the fill
    window outright. Everything still shuffles on user_id once; at
    100 TB the explode remains output-sized and the lead window's state
    is one row per user."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (
        e.groupBy("user_id", hour.alias("hour"))
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("m"))
        .select("user_id", "hour", F.col("m.value").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    return (
        hourly.withColumn("nxt", F.lead("hour").over(w))
        .select(
            "user_id",
            F.col("v").alias("value_ff"),
            F.explode(
                F.sequence(
                    F.col("hour"),
                    F.coalesce(
                        F.col("nxt") - F.expr("INTERVAL 1 HOUR"),
                        F.col("hour"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("grid_hour"),
        )
        .select(
            "user_id", F.col("grid_hour").alias("hour"), "value_ff"
        )
        .orderBy("user_id", "hour")
    )


@register(
    "user_cohort_weekly_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS n_cohort FROM firsts GROUP BY cohort_week
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
         AS week_offset,
       COUNT(*) AS n_active,
       MIN(cs.n_cohort) AS n_cohort
FROM activity a
JOIN firsts f USING (user_id)
JOIN cohort_sizes cs USING (cohort_week)
GROUP BY f.cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def user_cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple the
    sequence family lacked: users are cohorted by the week of their
    FIRST event, and each (cohort_week, week_offset) cell counts how
    many of them were active that many weeks later, alongside the cohort
    size (ratios are the consumer's one division away; the stored cells
    stay exact integers so both engines agree bit-for-bit).

    Both engines truncate weeks to Monday (Spark date_trunc('week') and
    DuckDB alike) and the offset is day-difference // 7 — exact because
    week-truncated stamps differ by whole weeks; never engine-specific
    'week diff' counters, whose boundary conventions differ.

    Plan: one per-user min aggregate (cohort), one distinct on
    (user, week) — both partial-aggregated on user_id — then a
    cohort-sized join and a cell-level aggregate. Cells are
    |weeks| x |weeks| bounded regardless of corpus size; at 100 TB
    everything before the final cell aggregate shuffles once on
    user_id."""
    e = load_table(spark, sf_dir, "events")
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    firsts = e.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = e.select(
        "user_id", week(F.col("ts")).alias("active_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        activity.join(firsts, "user_id")
        .join(sizes, "cohort_week")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.min("n_cohort").alias("n_cohort"),
        )
        .orderBy("cohort_week", "week_offset")
    )
