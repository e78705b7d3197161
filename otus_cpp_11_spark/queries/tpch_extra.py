"""Second wave of TPC-H-shape relational queries: correlated EXISTS /
NOT EXISTS, aggregate-over-aggregate, scalar-subquery comparisons, the
multi-relation "waiting supplier" decorrelation, and wide→long unpivot.

The driver's corpus lacks l_commitdate / l_receiptdate / l_shipmode /
o_comment / c_phone, so Q4/Q12/Q13/Q21/Q22 keep their *operator shapes*
(what the engine must be able to plan) with adapted predicates over the
available columns — same pattern as q19_discounted_revenue in
queries/relational.py. The reference itself has no joins or subqueries at
all (SURVEY.md §2.2); this whole surface is Spark built-ins, each query
hash-checked against DuckDB.

Scale notes (100 TB): every correlated subquery here is written in its
decorrelated join form (semi/anti/aggregate-join) — the shape Catalyst
rewrites to anyway — so the plans are shuffle-on-key joins with dims
broadcast, never nested-loop re-executions of the inner query per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries import davg_sql, dsum, dsum_sql
from otus_cpp_11_spark.registry import register


# --------------------------------------------------------------------------
# Q4 shape — correlated EXISTS: count orders having at least one
# long-latency lineitem (ships > 90 days after the order date).
# --------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (priority checking): correlated EXISTS with an
    inequality between the two relations' columns. Decorrelated to a LEFT
    SEMI join on orderkey whose join condition carries the l_shipdate >
    o_orderdate + 90d predicate — the semi join dedups multi-match orders
    for free, and the date filter on orders pushes into the scan."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"] > F.expr("o_orderdate + INTERVAL 90 DAYS")),
            "semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q12 shape — conditional two-way aggregate across a fact-to-fact join.
# --------------------------------------------------------------------------


@register(
    "q12_priority_shipping",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode→returnflag adapted): lineitem⋈orders with
    CASE-split counts. The only shuffle is the orderkey join (bucket both
    sides on orderkey at scale and it disappears); the group-by output is
    3 rows so the aggregate is all map-side."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q13 shape — aggregate over aggregate with an outer join.
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (comment-filter adapted to o_orderstatus <> 'P'): order
    count per customer including zero-order customers (LEFT join keeps
    them, COUNT(col) skips the nulls), then the distribution of those
    counts. Two aggregation levels; the second one's input is |customers|
    rows, already tiny relative to the fact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15 shape — scalar MAX subquery over a derived aggregate.
# --------------------------------------------------------------------------

_Q15_REV_SQL = f"""
  SELECT l_suppkey AS supplier_no,
         {dsum_sql("l_extendedprice * (1 - l_discount)", 6)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue0 AS ({_Q15_REV_SQL})
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The
    revenue aggregate is computed once and reused for both the scalar MAX
    and the equality filter (Spark caches nothing here — the plan just
    contains the agg twice; AQE's exchange reuse dedups the shuffle). The
    revenue totals are fixed-point sums, so the = comparison against MAX
    is exact in both engines."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"])
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q17 shape — correlated aggregate comparison (quantity below 20% of the
# part's own average).
# --------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
pa AS (
  SELECT l_partkey AS a_partkey, {davg_sql("l_quantity", 2)} AS avg_qty
  FROM li GROUP BY l_partkey
)
SELECT {dsum_sql("l_extendedprice", 2)} / 7.0 AS avg_yearly
FROM li JOIN pa ON l_partkey = a_partkey
WHERE l_quantity < 0.2 * avg_qty
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (container predicate dropped — no p_container column):
    revenue from small-quantity lineitems of one brand, where "small" is
    relative to that part's own average quantity. The correlated AVG
    decorrelates to a per-partkey aggregate joined back on partkey; the
    brand filter through part prunes BEFORE the average is computed, so
    only the brand's lineitems are scanned twice — and the avg side
    reuses the first join's output, not a second fact scan. The one-brand
    part slice and the per-part aggregate both SCALE with SF, so their
    join strategy is AQE-delegated (unbounded-key policy): AQE converts
    them to broadcast from exact runtime sizes whenever they fit."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    l = load_table(spark, sf_dir, "lineitem")
    li = l.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (dsum(F.col("l_quantity"), 2) / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(pa, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice"), 2) / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q21 shape — suppliers who were the only late shipper on a multi-supplier
# order: EXISTS + NOT EXISTS, decorrelated to one per-order aggregate.
# --------------------------------------------------------------------------


@register(
    "q21_waiting_supplier",
    bench=True,
    oracle="""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY l_orderkey
),
waiting AS (
  SELECT DISTINCT lo.l_suppkey, lo.l_orderkey
  FROM lo
  JOIN per_order p ON p.l_orderkey = lo.l_orderkey
  WHERE lo.late = 1 AND p.n_supp > 1 AND p.n_late_supp = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM waiting JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped > 60 days after order date —
    no receipt/commit dates in the corpus): suppliers who were the SOLE
    late shipper on a finished multi-supplier order. The textbook EXISTS /
    NOT EXISTS pair over two lineitem self-joins decorrelates to ONE
    per-order aggregate (distinct suppliers, distinct late suppliers)
    joined back to the late rows — one shuffle on orderkey replaces two
    self-joins of the largest table in the schema."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    lo = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"), 1
        )
        .otherwise(0)
        .alias("late"),
    )
    # Per-order supplier stats as WINDOW aggregates instead of a separate
    # groupBy joined back: lineitem⋈orders is computed once (the join-back
    # formulation plans the join subtree twice — no exchange to reuse when
    # the dim side broadcasts), and the window's one shuffle on orderkey is
    # the same shuffle the join-back would need anyway.
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    stats = lo.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late") == 1, F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    waiting = (
        stats.where(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 shape — scalar AVG subquery + anti join, grouped accounting.
# --------------------------------------------------------------------------


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
WITH avg_bal AS (
  SELECT {davg_sql("c_acctbal", 2)} AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, COUNT(*) AS numcust, {dsum_sql("c_acctbal", 2)} AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone country code → market segment; "never
    ordered" → "no order since 2000", which is non-empty at every SF):
    wealthy customers (balance above the positive-balance average) with no
    recent order. The scalar AVG is a 1-row broadcast; the NOT EXISTS is a
    LEFT ANTI join on custkey with the date filter pushed into the orders
    scan (at scale: the anti join's build input is only the filtered
    custkey column — pruning keeps it narrow)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal"), 2) / F.count("c_acctbal")).alias("ab"))
    )
    return (
        c.join(F.broadcast(avg_bal), c["c_acctbal"] > avg_bal["ab"])
        .join(o, c["c_custkey"] == o["o_custkey"], "anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Wide → long unpivot (melt): the inverse of pivot, a stock reshape the
# engine must offer for feature tables.
# --------------------------------------------------------------------------


@register(
    "lineitem_measures_unpivot",
    oracle=f"""
WITH wide AS (
  SELECT l_returnflag,
         {dsum_sql("l_quantity", 2)} AS sum_qty,
         {dsum_sql("l_extendedprice", 2)} AS sum_price,
         {dsum_sql("l_discount", 6)} AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
) t
ORDER BY l_returnflag, measure
""",
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): per-returnflag measure columns reshaped to
    (key, measure, value) rows — ``DataFrame.unpivot``, the inverse of the
    ``orderstatus_pivot`` query. Runs after the aggregate, so the reshape
    touches |groups|×|measures| rows, never the fact table."""
    l = load_table(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity"), 2).alias("sum_qty"),
        dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
        dsum(F.col("l_discount"), 6).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "measure", "value"
    ).orderBy("l_returnflag", "measure")


# --------------------------------------------------------------------------
# Q2 shape — min-cost supplier: correlated aggregate-equality subquery.
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS min_price
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM offers o
JOIN part     ON p_partkey = o.l_partkey
JOIN supplier ON s_suppkey = o.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_size BETWEEN 10 AND 15
  AND o.min_price = (SELECT MIN(min_price) FROM offers o2
                     WHERE o2.l_partkey = o.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each mid-size part, the
    EUROPE supplier(s) whose best offer price equals the regional minimum
    for that part — the classic correlated aggregate-equality subquery.
    No partsupp table in this corpus, so (l_partkey, l_suppkey,
    MIN(l_extendedprice)) from lineitem stands in as the offer relation.

    Decorrelation: the per-part regional minimum is a window MIN over the
    offers aggregate — one shuffle on partkey shared by the groupBy and
    the window, instead of re-running the inner aggregate per outer row.
    Supplier/nation/region attrs ride through the groupBy as grouping
    keys (functionally dependent on suppkey), so the dimensions are
    joined exactly once. nation⋈region keep hints (bounded); the
    region-filtered supplier slice and the size-filtered part slice
    scale with SF → AQE-delegated (unbounded-key policy)."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").where(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    offers = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name")
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    best = offers.withColumn(
        "best_price", F.min("min_price").over(Window.partitionBy("l_partkey"))
    ).where(F.col("min_price") == F.col("best_price"))
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 15)
    )
    return (
        best.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9 shape — product-type profit: 5-way join, derived measure, two-key agg.
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    bench=True,
    oracle=f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       {dsum_sql("l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity * 0.01", 4)} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): lineitem joined to part,
    supplier, nation, and orders; profit measure derived per row; grouped
    by (nation, order year). p_retailprice * qty * 1% stands in for
    ps_supplycost * qty (no partsupp table). The part filter (name LIKE)
    cuts the fact rows before the orders join; nation keeps its hint
    (bounded), part/supplier scale with SF → AQE-delegated
    (unbounded-key policy; AQE still broadcasts at eval sizes), so the
    only guaranteed shuffles are the fact-to-orders join and the final
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.01)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount, 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q11 shape — important stock: HAVING against a scalar subquery over the
# same aggregate, done exactly in integer cents.
# --------------------------------------------------------------------------

_Q11_CENTS = "SUM(CAST(FLOOR((l_extendedprice * l_quantity) * 100.0) AS DECIMAL(38,0)))"


@register(
    "q11_important_stock",
    oracle=f"""
WITH v AS (
  SELECT l_partkey AS ps_partkey, {_Q11_CENTS} AS cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT ps_partkey, CAST(cents AS DOUBLE) / 100.0 AS value
FROM v
WHERE CAST(cents AS DOUBLE) > CAST((SELECT SUM(cents) FROM v) AS DOUBLE) * 0.001
ORDER BY value DESC, ps_partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value held by one
    nation's suppliers, keeping parts whose value exceeds a fraction of
    the TOTAL — a scalar subquery over the same aggregation, decorrelated
    to a broadcast cross join of the single-row total. Value is summed in
    exact integer cents (DECIMAL) so the threshold comparison is
    order-independent across engines — a plain double SUM could flip a
    boundary row between Spark's parallel and DuckDB's sequential order.
    At 100 TB the total is a second pass over the small per-part
    aggregate, not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cents = F.sum(
        F.floor((F.col("l_extendedprice") * F.col("l_quantity")) * F.lit(100.0)).cast(
            "decimal(38,0)"
        )
    )
    v = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(cents.alias("cents"))
    )
    total = v.agg(F.sum("cents").alias("total_cents"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(
            F.col("cents").cast("double")
            > F.col("total_cents").cast("double") * F.lit(0.001)
        )
        .select(
            "ps_partkey",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


# --------------------------------------------------------------------------
# Q16 shape — supplier relationship count: NOT IN anti join + multi-key
# COUNT DISTINCT.
# --------------------------------------------------------------------------


@register(
    "q16_part_supplier_relation",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_part_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) bucket, excluding blacklisted
    suppliers via NOT IN. The subquery's key is non-null, so NOT IN is a
    plain LEFT ANTI join; the blacklist and the filtered part dim both
    scale with SF, so their strategies are AQE-delegated (unbounded-key
    policy — AQE broadcasts both at eval sizes). COUNT(DISTINCT)
    expands to a two-phase aggregate; Spark plans the partial dedup
    map-side before the shuffle on the grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20 shape — potential part promotion: nested IN subqueries with an
# aggregate HAVING gate.
# --------------------------------------------------------------------------


@register(
    "q20_potential_promotion",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(FLOOR(l_quantity * 100.0) AS DECIMAL(38,0))) > 5000
  )
ORDER BY s_name
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one nation
    who shipped more than a threshold quantity of some red part — an IN
    subquery whose inner query is itself gated by an IN subquery and an
    aggregate HAVING. Both INs decorrelate to LEFT SEMI joins: part names
    filter lineitem via a semi join (red-part set scales with SF →
    AQE-delegated), the qualified supplier set semi-joins into the
    supplier dim. Quantity is summed in exact integer
    cents so the HAVING threshold can't flip on float addition order."""
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    qualified = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"), "semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * F.lit(100.0)).cast("decimal(38,0)")
            ).alias("qty_cents")
        )
        .where(F.col("qty_cents") > 5000)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name") == "NATION_5"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qualified, F.col("s_suppkey") == F.col("l_suppkey"), "semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
