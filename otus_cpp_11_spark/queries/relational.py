"""Relational operator surface (SURVEY.md §2.2): scans, projection/filter,
joins (inner/semi/anti + broadcast), aggregation (group/rollup/cube/distinct),
windows, sort/limit/top-k, set ops, scalar functions — all stock DataFrame
primitives; Catalyst supplies pushdown/pruning/join-strategy (SURVEY.md §4).

The reference has no joins/windows/SQL at all (SURVEY.md §2.2) — this module
is the Spark-built-in surface the driver's TPC-H-ish corpus exercises, each
query hash-checked against DuckDB.

Scale notes (100 TB): fact-to-fact joins (lineitem⋈orders) shuffle on the
join key — at scale you bucket both sides on orderkey; dims (region, nation,
supplier, customer at low SF) are broadcast so the big side never shuffles.
Filters are plain column predicates on the scan, so they push into parquet
(PushedFilters) and prune columns (ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from otus_cpp_11_spark.catalog import load_table
from otus_cpp_11_spark.queries import davg, davg_sql, dsum, dsum_sql
from otus_cpp_11_spark.registry import register

_REVENUE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

# --------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): wide aggregate over one fact table.
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql("l_quantity", 2)}        AS sum_qty,
       {dsum_sql("l_extendedprice", 2)}   AS sum_base_price,
       {dsum_sql(_REVENUE, 6)}            AS sum_disc_price,
       {dsum_sql(_CHARGE, 6)}             AS sum_charge,
       {davg_sql("l_quantity", 2)}        AS avg_qty,
       {davg_sql("l_extendedprice", 2)}   AS avg_price,
       {davg_sql("l_discount", 6)}        AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: 8 aggregates over 2 group keys; partial aggregation
    (map-side combine) means the shuffle carries only |groups| rows per
    partition regardless of fact size."""
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
    )
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    revenue = price * (1 - disc)
    charge = price * (1 - disc) * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, 2).alias("sum_qty"),
            dsum(price, 2).alias("sum_base_price"),
            dsum(revenue, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg(qty, 2).alias("avg_qty"),
            davg(price, 2).alias("avg_price"),
            davg(disc, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority: dim-filter + two joins + grouped revenue + top-k.
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT o_orderkey,
       {dsum_sql(_REVENUE, 6)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer SCALES with SF (unlike nation/region), so
    no forced broadcast — the repo's unbounded-key policy (queries/cdc.py):
    a hint that is right at sf0.1 is an executor OOM at the 100 TB design
    point, while AQE sees the filtered scan's exact runtime size and still
    converts to broadcast whenever it actually fits
    (tests/test_plans.py::test_q3_customer_join_aqe_policy). orders⋈lineitem
    is the one real shuffle, on orderkey. Top-k has a total tie-break
    (o_orderkey) so the LIMIT set is deterministic."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, 6).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join through the full star schema.
# --------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {dsum_sql(_REVENUE, 6)} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. Only nation (25 rows) and region (5 rows) keep
    forced broadcast hints — they are bounded BY CONSTRUCTION at any SF.
    customer and supplier scale linearly, so their join strategy is
    AQE-delegated (unbounded-key policy, queries/cdc.py): at eval SFs AQE
    still broadcasts them from exact runtime sizes, at 100 TB it degrades
    to shuffle join instead of OOMing every executor. The
    s_nationkey = c_nationkey local-supplier predicate rides on the
    supplier join whatever strategy AQE picks."""
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Joins: semi / anti.
# --------------------------------------------------------------------------


@register(
    "customers_without_orders",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (reference has no joins at all — SURVEY.md §2.2). At
    scale the orders side reduces to distinct o_custkey before the join;
    customer stays unshuffled when the distinct key set broadcasts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "suppliers_with_returns",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_returnflag = 'R'
)
ORDER BY s_suppkey
""",
)
def suppliers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: supplier rows with at least one returned lineitem."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        s.join(l, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Windows: top-k per group, running totals, lag.
# --------------------------------------------------------------------------


@register(
    "top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    bench=True,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window — the canonical Spark top-k
    (single shuffle on the partition key, no global sort). Tie-break on
    o_orderkey makes rank assignment total."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "customer_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(38,0))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
         AS running_spend,
       LAG(o_orderkey) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running fixed-point cumulative sum + lag per customer ordered by time
    (the reference's sorted-adjacency reducer O11 generalized to a window —
    SURVEY.md §2.2 'window functions')."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            (
                F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("decimal(38,0)"))
                .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                .cast("double")
                / 100.0
            ).alias("running_spend"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# Aggregation variants: rollup, cube, distinct aggregates.
# --------------------------------------------------------------------------


@register(
    "orders_rollup",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       {dsum_sql("o_totalprice", 2)} AS sum_totalprice
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotal hierarchy (status → status+priority → grand total).
    The reference has no grouping sets (SURVEY.md §2.2); Catalyst expands
    rollup into a single Expand+aggregate — one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("sum_totalprice"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "orders_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both dimensions (adds the priority-only slice to rollup)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "order_distinct_aggs",
    oracle="""
SELECT COUNT(DISTINCT o_custkey)  AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
""",
)
def order_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates (lecture-spec unique-count generalized,
    SURVEY.md §2.1). Spark plans multi-distinct via Expand; at 100 TB prefer
    approx_count_distinct (non-oracle-able, covered in tests)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.count_distinct(F.col("o_orderpriority")).alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------------


@register(
    "nation_set_ops",
    oracle="""
SELECT 'union' AS op, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier) u
UNION ALL
SELECT 'intersect' AS op, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) i
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) e
ORDER BY op
""",
)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (distinct semantics) over nation keys —
    the set-op surface the reference lacks entirely (SURVEY.md §2.2)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    parts = [
        c.union(s).distinct().agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("union").alias("op"), "n"
        ),
        c.intersect(s).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("intersect").alias("op"), "n"
        ),
        c.subtract(s).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("except").alias("op"), "n"
        ),
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out.orderBy("op")


# --------------------------------------------------------------------------
# Scalar functions: strings, math, dates.
# --------------------------------------------------------------------------


@register(
    "scalar_string_math",
    oracle="""
SELECT c_custkey,
       UPPER(c_name)            AS uname,
       SUBSTRING(c_name, 1, 9)  AS pfx,
       LENGTH(c_name)           AS name_len,
       ABS(c_acctbal)           AS abs_bal,
       FLOOR(c_acctbal)         AS floor_bal,
       CONCAT(c_mktsegment, ':', c_name) AS tagged
FROM customer
ORDER BY c_custkey
""",
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface: the reference's substr/compare/atoi plus the
    lecture spec's abs/tolower family (SURVEY.md §2.2 'scalar functions') —
    all JVM-side Column exprs inside whole-stage codegen."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 9).alias("pfx"),
        F.length("c_name").alias("name_len"),
        F.abs("c_acctbal").alias("abs_bal"),
        F.floor("c_acctbal").cast("double").alias("floor_bal"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
    ).orderBy("c_custkey")


@register(
    "orders_by_month",
    oracle=f"""
SELECT CAST(YEAR(o_orderdate) AS INT)  AS yr,
       CAST(MONTH(o_orderdate) AS INT) AS mo,
       COUNT(*) AS n_orders,
       {dsum_sql("o_totalprice", 2)} AS revenue
FROM orders
GROUP BY yr, mo
ORDER BY yr, mo
""",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + time-grouped aggregate. At 100 TB the lake is
    date-partitioned and this grouping prunes to partition metadata."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("yr", "mo")
    )


# --------------------------------------------------------------------------
# Outer joins + null handling (testdata has no nulls; outer joins make them).
# --------------------------------------------------------------------------


@register(
    "nation_supplier_left_join",
    oracle="""
SELECT n_nationkey, n_name,
       COUNT(s_suppkey) AS n_suppliers,
       COALESCE(CAST(SUM(CAST(FLOOR(s_acctbal * 100.0) AS DECIMAL(38,0))) AS DOUBLE) / 100.0, 0.0) AS total_bal
FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
ORDER BY n_nationkey
""",
)
def nation_supplier_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null-aware aggregates (COUNT skips nulls, COALESCE
    fills the no-supplier nations) — the null-handling surface the
    reference's two-type system cannot express (SURVEY.md §1.2)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.coalesce(dsum(F.col("s_acctbal"), 2), F.lit(0.0)).alias("total_bal"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "region_nation_full_outer",
    oracle="""
SELECT COALESCE(r_name, '<no region>') AS region_name,
       COUNT(n_nationkey) AS n_nations
FROM region FULL OUTER JOIN nation ON n_regionkey = r_regionkey
GROUP BY region_name
ORDER BY region_name
""",
)
def region_nation_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (degenerates to inner on this data — the point is the
    operator surface and the COALESCE-on-unmatched semantics)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, F.col("n_regionkey") == F.col("r_regionkey"), "full_outer")
        .groupBy(F.coalesce(F.col("r_name"), F.lit("<no region>")).alias("region_name"))
        .agg(F.count("n_nationkey").alias("n_nations"))
        .orderBy("region_name")
    )


# --------------------------------------------------------------------------
# Subquery shapes: scalar, correlated (decorrelated as joins).
# --------------------------------------------------------------------------


@register(
    "customers_above_avg_balance",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
ORDER BY c_custkey
""",
)
def customers_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (uncorrelated): filter against a global aggregate.
    Spark plans the subquery as a broadcast scalar; the fact scan streams.

    AVG determinism note: both engines sum the same ~1.5k doubles here; the
    filter compares against a threshold strictly between representable
    values, so the float-sum order difference cannot flip row membership
    unless a balance lands within 1 ulp of the average — the column is
    2-decimal money, the average is not, so this is safe without the
    fixed-point detour."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "parts_larger_than_brand_avg",
    oracle="""
SELECT p.p_partkey, p.p_brand, p.p_size
FROM part p
JOIN (SELECT p_brand, AVG(p_size) AS avg_size FROM part GROUP BY p_brand) b
  ON p.p_brand = b.p_brand
WHERE p.p_size > b.avg_size
ORDER BY p.p_partkey
""",
)
def parts_larger_than_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (size above per-brand average),
    decorrelated into an aggregate + equi-join — the form Catalyst rewrites
    correlated scalar subqueries into anyway. AVG over int sizes is an
    int-sum / count: exact in both engines."""
    p = load_table(spark, sf_dir, "part")
    b = p.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.avg("p_size").alias("avg_size")
    )
    return (
        p.join(F.broadcast(b), F.col("p_brand") == F.col("b_brand"))
        .where(F.col("p_size") > F.col("avg_size"))
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Pivot / grouping sets / listagg.
# --------------------------------------------------------------------------


@register(
    "orderstatus_pivot",
    oracle="""
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orderstatus_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit values keep the schema
    static — at scale you never want the extra pass that infers pivot
    columns from data)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.col("F").alias("status_F"),
            F.col("O").alias("status_O"),
            F.col("P").alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "orders_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (the DataFrame API only has
    cube/rollup; the engine exposes both surfaces — SURVEY.md §3.4)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "region_nation_list",
    oracle="""
SELECT r_name,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT n_name)), ',') AS nations
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
)
def region_nation_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg/string_agg shape: collect_set + array_sort + array_join —
    sorted so the aggregation order (nondeterministic in both engines) can't
    leak into the result."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Q10 shape — returned-item revenue ranking.
# --------------------------------------------------------------------------


@register(
    "q10_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_name,
       {dsum_sql(_REVENUE, 6)} AS revenue,
       ANY_VALUE(n_name) AS nation
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    bench=True,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking over returned items. The
    returnflag filter pushes to the lineitem scan; nation (bounded)
    broadcasts by hint, customer (scaling) is AQE-delegated per the
    unbounded-key policy; ANY_VALUE is safe because nation is
    functionally dependent on the grouping key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.any_value("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + scalar aggregate.
# --------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {dsum_sql("l_extendedprice * l_discount", 6)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: all three predicates are plain column comparisons, so
    every one reaches the parquet scan (PushedFilters) and only 4 columns
    are read (ReadSchema) — the canonical pushdown/pruning showcase; the
    aggregate itself is a map-side partial + single-row merge, no shuffle
    of data rows at all."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))


# --------------------------------------------------------------------------
# Q14 — promotion effect: conditional aggregate ratio over a dim join.
# --------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT 100.0 * ({dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", 6)})
             / ({dsum_sql("l_extendedprice * (1 - l_discount)", 6)}) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. part scales with SF,
    so its join strategy is AQE-delegated (unbounded-key policy): AQE
    broadcasts it at eval sizes — the one-month lineitem filter side is
    the smaller relation at big SF anyway — and the conditional numerator
    and the total are one pass of the same aggregate."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-06-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    p = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * dsum(promo, 6) / dsum(revenue, 6)).alias(
                "promo_revenue_pct"
            )
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers: agg-filtered semi join into a 3-way join.
# --------------------------------------------------------------------------


@register(
    "q18_large_orders",
    bench=True,
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dsum_sql("l_quantity", 2)} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 300. The HAVING
    subquery becomes an aggregate + semi join on orderkey; only
    qualifying orders flow into the 3-way join. Both the qualifying-order
    set and customer GROW with SF, so neither carries a forced broadcast
    (unbounded-key policy) — AQE sees the aggregate's actual output size
    (tiny at every realistic selectivity) and converts the semi join at
    runtime. Top-k is tie-broken on o_orderkey."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big, F.col("o_orderkey") == big["l_orderkey"], "semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue (adapted to available columns): disjunctive
# multi-attribute predicate across a join.
# --------------------------------------------------------------------------


@register(
    "q19_discounted_revenue",
    oracle=f"""
SELECT {dsum_sql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: the synthetic part table has no container/
    shipmode columns, reference driver corpus — brand/size/quantity carry
    the disjunction). The OR-of-ANDs splits per-side: p_brand/p_size
    conjuncts push into the part scan, l_quantity bounds (1..40 overall)
    push into the lineitem scan, and the residual disjunction filters the
    join output. part scales with SF → strategy AQE-delegated
    (unbounded-key policy)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, F.col("p_partkey") == F.col("l_partkey"))
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    pred = (
        ((b == "Brand#11") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#22") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#33") & s.between(1, 35) & q.between(20, 40))
    )
    return j.where(pred).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue")
    )


# --------------------------------------------------------------------------
# Exact percentiles + sketches.
# --------------------------------------------------------------------------


@register(
    "orders_price_percentiles",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5)  AS p50,
       quantile_cont(o_totalprice, 0.9)  AS p90
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group: Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the formula
    (a + (b-a)*frac over the sorted run) and agree bit-for-bit on doubles
    (verified empirically). Exact percentile means a full sort per group —
    at 100 TB switch to approx_percentile (t-digest, mergeable, one pass),
    registered separately below with a rows-only gate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.9))").alias("p"))
        .select(
            "o_orderpriority",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_user_sketches",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_bound,
       TRUE AS median_within_band
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per event_type: HyperLogLog++ distinct users and
    t-digest approximate median value — the one-pass, mergeable,
    fixed-memory summaries that replace exact distinct/percentile at
    100 TB. Sketch ESTIMATES are engine-specific, so the oracle-checked
    columns are the exact distinct count plus two error-bound booleans:
    HLL estimate within 3x its configured rsd of the exact count, and the
    t-digest median inside the exact p45–p55 band (both computed in the
    same scan; DuckDB asserts them literally TRUE). A sketch drifting out
    of spec flips a boolean and fails the value hash. Hard error bounds
    are additionally asserted in tests/test_sketches.py."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_median"),
        F.expr("percentile(value, array(0.45, 0.55))").alias("band"),
    )
    hll_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.col("exact_users") * F.lit(3 * 0.02)
    )
    med_ok = (F.col("approx_median") >= F.col("band")[0]) & (
        F.col("approx_median") <= F.col("band")[1]
    )
    return agg.select(
        "event_type",
        "exact_users",
        hll_ok.alias("hll_within_bound"),
        med_ok.alias("median_within_band"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations: 5-way join, two dim roles for
# the same table, year extraction.
# --------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {dsum_sql("volume", 6)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same nation dim plays two roles (supplier side
    and customer side) — both hinted broadcast (nation is 25 rows at any
    SF); supplier and customer scale, so their strategy is AQE-delegated
    (unbounded-key policy). The only guaranteed shuffle is
    lineitem⋈orders on orderkey; the disjunctive nation pair filter
    prunes before the aggregate."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — market share: nested aggregation ratio per year over a 7-way join.
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       ({dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END", 6)}) /
       ({dsum_sql("volume", 6)}) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue sold into
    ASIA per order year. Bounded dims (both nation roles, region) keep
    broadcast hints; part/supplier/customer scale with SF, so their
    strategy is AQE-delegated (unbounded-key policy — at eval SFs AQE
    still broadcasts them). lineitem⋈orders is the single guaranteed
    repartition — the fact table is touched once and never re-shuffled
    for the nested share computation (numerator and denominator come out
    of one aggregate pass)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    j = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        j.select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"),
                 national.alias("national"))
        .groupBy("o_year")
        .agg((dsum(F.col("national"), 6) / dsum(F.col("volume"), 6)).alias("mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Window-function family: rank/dense_rank/ntile/percent_rank/cume_dist/
# nth_value/lead in one pass.
# --------------------------------------------------------------------------


@register(
    "customer_order_window_family",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume,
       NTH_VALUE(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS second_order,
       LEAD(o_orderkey, 1) OVER w AS next_order
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey, o_totalprice DESC, o_orderkey
""",
)
def customer_order_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family in one partitioned pass (one shuffle
    on o_custkey serves all seven functions — Catalyst collapses same-spec
    windows into a single Window exec). Total tie-break (o_orderkey) keeps
    every function deterministic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
    ).orderBy("o_custkey", F.desc("o_totalprice"), "o_orderkey")


# --------------------------------------------------------------------------
# Lateral/positional explode: UDTF-shaped 1→N expansion with ordinality.
# --------------------------------------------------------------------------


@register(
    "doc_leading_tokens",
    oracle="""
SELECT doc_id, t.pos, t.tok
FROM (
  SELECT doc_id,
         [{'pos': i - 1, 'tok': w[i]} FOR i IN RANGE(1, LEAST(LEN(w), 3) + 1)] AS pt
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents) s
), UNNEST(pt) AS u(t)
ORDER BY doc_id, t.pos
""",
)
def doc_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (posexplode = UNNEST WITH ORDINALITY): first three
    whitespace tokens of each document with their positions — the UDTF
    1→N shape (reference mapper contract, src/mapreduce.hpp:26) with
    ordinality preserved."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.slice(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit("")), 1, 3
        ).alias("w"),
    )
    return toks.select(
        "doc_id", F.posexplode("w").alias("pos", "tok")
    ).orderBy("doc_id", "pos")


# --------------------------------------------------------------------------
# Argmax via struct-max: top-1-per-group as ONE hash aggregate.
# --------------------------------------------------------------------------


@register(
    "nation_richest_customer",
    oracle="""
SELECT n_name, c_custkey AS richest_custkey, c_acctbal AS richest_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
  FROM customer
) t
JOIN nation ON c_nationkey = n_nationkey
WHERE rn = 1
ORDER BY n_name
""",
)
def nation_richest_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group via struct-max (argmax): max(struct(acctbal,
    custkey)) picks the lexicographic max pair in ONE partial-aggregated
    hash aggregate — at scale this beats the window formulation (the
    oracle's ROW_NUMBER), which must shuffle AND sort every row; the
    struct-max shuffle carries one pair per group per partition. The
    custkey in the struct doubles as the deterministic tie-break."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    top = (
        c.groupBy("c_nationkey")
        .agg(F.max(F.struct("c_acctbal", "c_custkey")).alias("m"))
        .select(
            "c_nationkey",
            F.col("m.c_custkey").alias("richest_custkey"),
            F.col("m.c_acctbal").alias("richest_acctbal"),
        )
    )
    return (
        top.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "richest_custkey", "richest_acctbal")
        .orderBy("n_name")
    )


@register(
    "customer_monthly_retention",
    oracle="""
WITH cm AS (
  SELECT DISTINCT o_custkey, DATE_TRUNC('month', o_orderdate) AS month
  FROM orders
),
flagged AS (
  SELECT month,
         CASE WHEN LAG(month) OVER (PARTITION BY o_custkey ORDER BY month)
                   = month - INTERVAL 1 MONTH
              THEN 1 ELSE 0 END AS retained
  FROM cm
)
SELECT month,
       COUNT(*) AS n_active,
       CAST(SUM(retained) AS BIGINT) AS n_retained,
       CAST(SUM(retained) AS DOUBLE) / COUNT(*) AS retention_rate
FROM flagged
GROUP BY month
ORDER BY month
""",
)
def customer_monthly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month cohort retention: of the customers active in month
    M, how many also ordered in M-1. One scan of orders, one shuffle on
    custkey: the customer-month relation is a distinct aggregate, and
    "ordered last month too" is a lag() over each customer's month
    sequence — no self-join, so orders is never scanned twice (the naive
    self-join formulation doubles the fact scan). Ratio is int/int in
    double."""
    o = load_table(spark, sf_dir, "orders")
    cm = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("month")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("month")
    flagged = cm.select(
        "month",
        F.when(
            F.lag("month").over(w)
            == F.col("month") - F.expr("INTERVAL 1 MONTH"),
            1,
        )
        .otherwise(0)
        .alias("retained"),
    )
    return (
        flagged.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum("retained").alias("n_retained"),
        )
        .select(
            "month",
            "n_active",
            "n_retained",
            (F.col("n_retained").cast("double") / F.col("n_active")).alias(
                "retention_rate"
            ),
        )
        .orderBy("month")
    )


@register(
    "lineitem_price_qty_corr",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {dsum_sql("l_extendedprice", 2)} AS sx,
         {dsum_sql("l_quantity", 2)} AS sy,
         {dsum_sql("l_extendedprice * l_quantity", 2)} AS sxy,
         {dsum_sql("l_extendedprice * l_extendedprice", 2)} AS sxx,
         {dsum_sql("l_quantity * l_quantity", 2)} AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)
         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS price_qty_corr
FROM m
ORDER BY l_returnflag
""",
)
def lineitem_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of price vs quantity per return flag, computed
    from exact fixed-point moment sums (n, Sx, Sy, Sxy, Sxx, Syy) in ONE
    map-side-combined aggregate — the df.stat.corr shape, but
    deterministic across engines and partitionings (float moment sums are
    order-dependent; integer-domain sums are not). sqrt is IEEE-correctly
    rounded everywhere, so the derived ratio matches bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x, 2).alias("sx"),
        dsum(y, 2).alias("sy"),
        dsum(x * y, 2).alias("sxy"),
        dsum(x * x, 2).alias("sxx"),
        dsum(y * y, 2).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select("l_returnflag", "n", corr.alias("price_qty_corr")).orderBy(
        "l_returnflag"
    )


@register(
    "daily_open_shipments",
    oracle="""
WITH deltas AS (
  SELECT DATE_TRUNC('day', o.o_orderdate) AS day, 1 AS delta
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  UNION ALL
  SELECT DATE_TRUNC('day', l_shipdate) AS day, -1 AS delta FROM lineitem
),
daily AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY day)
SELECT day, net,
       CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_lines
FROM daily
ORDER BY day
""",
)
def daily_open_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-concurrency counting (order-line backlog): how many order
    lines are ordered but not yet shipped each day. The classic scalable
    formulation: each interval becomes a +1 at its start (order date, via
    the co-keyed orders join) and a -1 at its end (ship date), aggregated
    to a per-day net with map-side combine; the running sum then runs over
    the DAYS relation — thousands of rows, so a single-partition window is
    fine there (at finer granularity the two-phase sharded prefix sum from
    doc_pack_bins applies). Never a point-in-interval join, which is a
    |facts| x |days| blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    starts = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == o["o_orderkey"])
        .select(F.date_trunc("day", "o_orderdate").alias("day"), F.lit(1).alias("delta"))
    )
    ends = li.select(
        F.date_trunc("day", "l_shipdate").alias("day"), F.lit(-1).alias("delta")
    )
    daily = starts.unionAll(ends).groupBy("day").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "net", F.sum("net").over(w).alias("open_lines")
    ).orderBy("day")


# --------------------------------------------------------------------------
# Data profiling: ANALYZE-style per-column statistics in one scan.
# --------------------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "lineitem_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c}) AS min_val, MAX({c}) AS max_val,
       {dsum_sql(c, 6)} AS sum_fp
FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY column_name",
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the fact table — row count, null
    count, exact distinct count, min/max, fixed-point sum for each measure
    column — the stats a cost-based optimizer or data-quality monitor
    feeds on. ONE scan: all per-column aggregates run in a single
    aggregate (the oracle's UNION ALL rescans per column; Spark doesn't),
    then the 1-row result unpivots to (column_name, stats) rows
    driver-side-free via explode. The multi-column exact COUNT(DISTINCT)
    expands the input 4x before the agg (Spark's Expand); at 100 TB swap
    approx_count_distinct (HLL, one pass, no expand) — exact here so the
    oracle can check values."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"_cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            dsum(F.col(c), 6).alias(f"_sum_{c}"),
        ]
    row = li.agg(*aggs)
    out = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"_cnt_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_val"),
                F.col(f"_max_{c}").alias("max_val"),
                F.col(f"_sum_{c}").alias("sum_fp"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        row.select(F.explode(out).alias("p")).select("p.*").orderBy("column_name")
    )
