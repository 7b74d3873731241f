"""Classic OLAP queries (TPC-H-shaped) over the driver star schema.

Beyond-reference breadth: the reference has no numeric aggregation, no
multi-key grouping, no semi joins, and no multi-way join pipelines
(SURVEY.md §2.4/§2.6 gaps); these queries add that coverage with DuckDB
oracle twins, exercising Catalyst's join ordering, broadcast selection,
partial aggregation, and scan pruning on the fact tables.

Cross-engine determinism: all money arithmetic runs in DECIMAL
*internally* — float64 summation depends on reduction order
(non-deterministic across partitionings and engines); decimal summation is
exact, so Spark and DuckDB agree bit-for-bit. But the *projected* columns
are final-cast to DOUBLE in both engines: result-fetch layers canonicalize
DECIMAL inconsistently (round 1: five byte-identical decimal results failed
the driver hash because one fetch path strips trailing zeros), while an
exact decimal → double conversion is correctly rounded and bit-identical in
both engines whenever the unscaled value fits in 2^53 (true through sf100
at scale 4). Pattern: SUM(decimal) ... CAST(... AS DOUBLE) at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _t, query

_Q1_CUTOFF = "1998-09-02"


@query(
    "olap_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big-fact scan + date filter + multi-key grouped
    decimal aggregation. The filter pushes into the parquet scan; partial
    aggregation shrinks the shuffle to |groups| rows per partition."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = price * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(f"{_Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(18,4)").cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "olap_revenue_by_nation",
    oracle="""
    SELECT n_name AS nation,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE)
             AS revenue
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY n_name
    """,
)
def olap_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 4-way join pipeline ending in a grouped decimal sum.
    Join order: fact-to-fact (lineitem-orders) shuffles on the orderkey;
    customer and nation ride broadcasts. Revenue is aggregated on the
    compact nationkey and the name dimension joins AFTER aggregation —
    25 rows instead of millions through the last join."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    per_nation = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum(revenue).cast("decimal(18,4)").cast("double").alias("revenue"))
    )
    return per_nation.join(
        F.broadcast(nation), per_nation["c_nationkey"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), "revenue")


@query(
    "olap_priority_with_shipped_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def olap_priority_with_shipped_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS == left_semi join (the set-membership dual of
    Task F's left_anti), then grouped count. The semi join emits each order
    at most once regardless of matching lineitem multiplicity."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > orders["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "olap_sales_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def olap_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family (absent from the reference, SURVEY §2.4): CUBE
    over (returnflag, linestatus) — all four rollup combinations in one
    pass. Spark expands the cube BEFORE the shuffle, so partial aggregation
    still applies per grouping set."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "olap_quantity_median",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def olap_quantity_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (order-statistic family — selection, not
    summation, so cross-engine deterministic: both engines interpolate
    between the same two order statistics). Exact percentile gathers each
    group's values; at extreme cardinality prefer approx_percentile and
    drop the oracle to rows-only."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
    )


@query(
    "olap_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def olap_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (absent from the reference, SURVEY §2.4): order counts per
    priority pivoted on status. The pivot values are listed explicitly —
    at scale an unlisted pivot forces an extra distinct-scan to discover
    the column set; listing them keeps it a single-pass aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside pivot
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@query(
    "olap_segment_set_ops",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_mktsegment = 'BUILDING'
    AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def olap_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation family (reference has none, SURVEY §2.6): BUILDING
    customers with an open order and no finished order — INTERSECT and
    EXCEPT expressed as semi/anti joins (the distributed forms; literal
    INTERSECT/EXCEPT would shuffle whole rows for dedup)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    base = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name"
    )
    return (
        base.join(open_cust, base["c_custkey"] == open_cust["o_custkey"], "left_semi")
        .join(done_cust, base["c_custkey"] == done_cust["o_custkey"], "left_anti")
    )


@query(
    "olap_top_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY spend DESC, c_custkey ASC
    LIMIT 20
    """,
)
def olap_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-adjacent: per-customer decimal spend, top-20 with a
    deterministic key tie-break; plans as TakeOrdered, never a global sort."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend"),
        F.count("*").alias("n_orders"),
    )
    return (
        spend.join(F.broadcast(customer), spend["o_custkey"] == customer["c_custkey"])
        .select("c_custkey", "c_name", "spend", "n_orders")
        .orderBy(F.desc("spend"), F.asc("c_custkey"))
        .limit(20)
    )
