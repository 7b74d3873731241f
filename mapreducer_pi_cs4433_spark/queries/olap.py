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
    # r12 (optimization): cast to decimal ONCE, before the cube. The
    # cube's Expand multiplies every row by the number of grouping sets
    # (4 here) BEFORE the aggregate, so a cast inside agg() re-runs the
    # checked double->decimal conversion on every expanded copy — the
    # measured majority of this one-exchange plan (1.89 -> 1.04 s at
    # sf0.1 with the cast hoisted; per-task work, guide §1.2 step 2).
    # Same exact decimal sum, bit-identical output.
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("_price"),
        )
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("_price").cast("double").alias("total_price"),
        )
    )


@query(
    "olap_quantity_median",
    oracle="""
    WITH r AS (
        SELECT l_returnflag, l_quantity AS v,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity) AS rk,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ), pick AS (
        SELECT l_returnflag, k,
               MIN(CASE WHEN rk = ((n - 1) * k) // 4 + 1 THEN v END) AS v_lo,
               MIN(CASE WHEN rk = ((n - 1) * k + 3) // 4 + 1 THEN v END)
                   AS v_hi,
               MIN(((n - 1) * k) % 4) AS rem
        FROM r CROSS JOIN (VALUES (1), (2), (3)) q(k)
        GROUP BY l_returnflag, k
    )
    SELECT l_returnflag,
           MIN(CASE WHEN k = 1 THEN val END) AS q25,
           MIN(CASE WHEN k = 2 THEN val END) AS median_qty,
           MIN(CASE WHEN k = 3 THEN val END) AS q75
    FROM (
        SELECT l_returnflag, k,
               v_lo * (1 - rem / 4.0) + v_hi * (rem / 4.0) AS val
        FROM pick
    ) GROUP BY l_returnflag
    """,
)
def olap_quantity_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (order-statistic family — selection, not
    summation, so cross-engine deterministic: both engines interpolate
    between the same two order statistics). Exact percentile gathers each
    group's values; at extreme cardinality prefer approx_percentile and
    drop the oracle to rows-only.

    Oracle version-proofing (VERDICT r4 ask #6, closing the r3 sweep): no
    quantile_cont/percentile function remains — the oracle selects the two
    neighbor order statistics EXPLICITLY (1-based ranks
    floor/ceil((n-1)*q)+1 via exact integer arithmetic, q = k/4) and
    combines them as v_lo*(1-frac) + v_hi*frac, the same two-term form
    Spark's percentile() evaluates, with frac an exact binary fraction
    (k/4), so the doubles match bit-for-bit."""
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


@query(
    "olap_best_order_per_customer",
    oracle="""
    WITH b AS (
        SELECT o_custkey,
               max(struct_pack(
                   p := CAST(o_totalprice AS DECIMAL(18,2)),
                   k := o_orderkey)) AS best
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           (best).k AS best_orderkey,
           CAST((best).p AS DOUBLE) AS best_price
    FROM b
    """,
)
def olap_best_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 per group as an AGGREGATE (the max_by family), not a window:
    max over a (price, orderkey) struct compares lexicographically in both
    engines, so the orderkey tie-break is baked into the aggregate value
    itself and the result is deterministic without any sort. One shuffle,
    partial-aggregated map-side — at 100 TB this is strictly cheaper than
    the ROW_NUMBER()=1 window (no per-group sort buffer, no
    WindowGroupLimit), which is why per-group argmax should compile to
    max(struct) whenever k=1. (Raw max_by/arg_max is NOT used: both
    engines leave its tie behavior unspecified.)"""
    orders = _t(spark, sf_dir, "orders")
    best = orders.groupBy("o_custkey").agg(
        F.max(
            F.struct(
                F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
                F.col("o_orderkey").alias("k"),
            )
        ).alias("best")
    )
    return best.select(
        "o_custkey",
        F.col("best.k").alias("best_orderkey"),
        F.col("best.p").cast("double").alias("best_price"),
    )


_DORMANT_SINCE = "1998-06-01"


@query(
    "olap_rich_dormant_customers",
    oracle=f"""
    WITH avg_bal AS (
        SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,6)) AS a
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey, c_name, c_acctbal
    FROM customer CROSS JOIN avg_bal
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_DORMANT_SINCE} 00:00:00')
    """,
)
def olap_rich_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery predicate (balance above the
    positive-balance average) + NOT EXISTS anti-join against a filtered
    order window (no orders since mid-1998 — 'rich but dormant'; the date
    is calibrated so the result is non-empty at every driver scale, the
    round-1 lesson that an always-empty query proves nothing).
    The average is computed in DECIMAL so both engines derive the exact
    same cutoff (a float average's last ulp depends on reduction order and
    could flip a boundary row); it rides the 1-row broadcast crossJoin —
    no driver readback. The anti-join's order side is pre-filtered and
    pre-projected to its key column, so the date predicate pushes into the
    parquet scan and the shuffle carries keys only."""
    customer = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit(f"{_DORMANT_SINCE} 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            F.avg(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(18,6)")
            .alias("a")
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("decimal(18,2)") > F.col("a"))
        .join(recent, F.col("c_custkey") == recent["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "olap_small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey AS pk,
               CAST(0.5 * CAST(AVG(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    AS DECIMAL(18,6)) AS cutoff
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS small_lot_revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN pa ON l_partkey = pk
    WHERE CAST(l_quantity AS DECIMAL(18,2)) < cutoff
    """,
)
def olap_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group scalar (half the part's average
    quantity) applied back to the fact rows, global single-row rollup.
    Decomposed as aggregate-then-self-join — the distributed rewrite of a
    correlated subquery: the per-part cutoff table is orders of magnitude
    smaller than the fact stream. The 0.5*avg cutoff is DECIMAL-quantized
    identically in both engines before comparing (avg itself is exact
    decimal; one double multiply then re-quantize), so no boundary row can
    flip on float noise. Exercises: self-join on the grouping key +
    aggregate-derived predicate + 1-row output."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.5)
            * F.avg(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
        )
        .cast("decimal(18,6)")
        .alias("cutoff")
    )
    return (
        li.join(pa, li["l_partkey"] == pa["pk"])
        .filter(F.col("l_quantity").cast("decimal(18,2)") < F.col("cutoff"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_lot_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "olap_revenue_share_parts",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem GROUP BY l_partkey
    ), tot AS (
        SELECT SUM(rev) AS t, COUNT(*) AS np FROM pr
    )
    SELECT l_partkey, CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE) AS part_revenue
    FROM pr CROSS JOIN tot
    WHERE rev * 4 * np > 5 * t
    """,
)
def olap_revenue_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped decimal revenue filtered against the GLOBAL
    total — keep parts whose revenue exceeds 1.25x the mean part revenue,
    written as rev*4*np > 5*t. Mean-relative (not a fixed corpus fraction)
    so the selectivity is scale-invariant (~1-5% of parts at every sf —
    a fixed 1/500-of-total threshold returns zero rows at any sf where
    parts number more than ~500); and expressed as exact integer-scaled
    decimal products — no division, no floats — so the boundary is
    bit-deterministic in both engines. The total and part count
    re-aggregate the per-part stream (no second fact scan) and ride the
    1-row broadcast crossJoin."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    pr = li.groupBy("l_partkey").agg(F.sum(rev).alias("rev"))
    tot = pr.agg(F.sum("rev").alias("t"), F.count("*").alias("np"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("rev") * 4 * F.col("np") > F.col("t") * 5)
        .select(
            "l_partkey",
            F.col("rev").cast("decimal(18,4)").cast("double").alias("part_revenue"),
        )
    )


@query(
    "olap_calendar_breakdown",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) AS INT) AS dow_iso,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def olap_calendar_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension rollup (year x quarter x ISO weekday) — the
    date-function family over the order stream. Cross-engine trap: the
    engines disagree on week-day numbering (Spark dayofweek is 1=Sunday,
    DuckDB dayofweek is 0=Sunday) — ISO numbering is the portable contract,
    spelled weekday()+1 in Spark and isodow() in DuckDB (both 1=Monday).
    Narrow scan (one date + one money column), grouped decimal sum."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            (F.weekday("o_orderdate") + 1).alias("dow_iso"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "olap_status_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, status, n
    FROM wide UNPIVOT (n FOR status IN (n_open, n_done, n_pending))
    """,
)
def olap_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping (UNPIVOT/melt) — the inverse of
    olap_status_pivot: conditional-aggregate the status counts wide, then
    melt the measure columns back into (priority, status, n) rows. Spark's
    unpivot and DuckDB's UNPIVOT both emit the source column NAME as the
    variable value, so the engines agree on the label column without any
    mapping table. Reshaping is metadata-only on top of the aggregate —
    no extra shuffle beyond the group-by."""
    orders = _t(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n_done"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .cast("long")
        .alias("n_pending"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_open", "n_done", "n_pending"],
        "status",
        "n",
    )


@query(
    "olap_customer_order_years",
    oracle="""
    SELECT o_custkey,
           array_to_string(
               list_sort(list(DISTINCT CAST(year(o_orderdate) AS INT))), ','
           ) AS years,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def olap_customer_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation emitted in its CANONICAL SCALAR form:
    collect_set gathers in arrival order (non-deterministic under
    parallelism), so the contract is sort_array(collect_set(...)) joined
    to a comma string — the same canonical form DuckDB reaches via
    array_to_string(list_sort(list(DISTINCT ...))). The serialization is
    not cosmetic: array-typed output columns are banned from catalog
    entries (enforced at query-call time by catalog._check_output_schema)
    because the driver's pandas canonicalizer factorizes cells and
    `list` is unhashable — the r3 driver failure mode this query caused."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set(F.year("o_orderdate")))
        ).alias("years"),
        F.count("*").alias("n_orders"),
    )


@query(
    "olap_calendar_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(GROUPING(quarter(o_orderdate)) AS INT) AS is_year_subtotal,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
    """,
)
def olap_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (year -> quarter -> grand total) with the
    GROUPING() indicator — the subtotal-marking family CUBE queries don't
    exercise: GROUPING(qtr)=1 distinguishes a genuine NULL group key from
    a rolled-up subtotal row, which is the only reliable way to consume
    rollup output (checking qtr IS NULL conflates the two). Same
    pre-shuffle grouping-set expansion as CUBE, one pass."""
    # decimal cast hoisted above the rollup's Expand (the sales-cube r12
    # hoist: the expansion multiplies rows 3x, and a cast inside agg()
    # would re-run per expanded copy)
    orders = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("_price"),
    )
    return orders.rollup("yr", "qtr").agg(
        F.grouping("qtr").cast("int").alias("is_year_subtotal"),
        F.count("*").alias("n_orders"),
        F.sum("_price").cast("double").alias("total_price"),
    )


@query(
    "olap_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)
def olap_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the driver schema has no partsupp, so
    profit = discounted revenue of PROMO-type parts): the widest join tree
    in the suite — lineitem x part x supplier x nation x orders.

    Plan discipline at 100 TB: the selective dimension (part, p_type filter
    keeps ~1/6) broadcasts and prunes lineitem BEFORE the only big-big
    shuffle (lineitem-orders on the orderkey); supplier broadcasts too, and
    aggregation runs on the compact (s_nationkey, year) key with the
    25-row nation name joined AFTER the agg, so the wide strings never
    travel through a shuffle. Catalyst is free to reorder the broadcasts;
    the shape test pins one shuffle join + three broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    per_key = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("s_nationkey", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(revenue).cast("decimal(18,4)").cast("double").alias("profit"))
    )
    return per_key.join(
        F.broadcast(nation), per_key["s_nationkey"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), "o_year", "profit")


@query(
    "olap_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def olap_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by (filtered) order
    count, INCLUDING zero-order customers. The semantic trap is the
    predicate's position: `o_orderpriority <> '1-URGENT'` lives in the
    LEFT JOIN's ON clause, not a WHERE — a WHERE would silently turn the
    outer join inner and drop the zero bucket (the same null-pass family
    as Task G's trap #4, here in join form).

    Scale shape: two cascaded aggregations — per-customer count on the
    customer-key shuffle (COUNT(o_orderkey) so unmatched rows count 0),
    then the tiny distribution aggregate over |customers| rows. The
    customer side carries only c_custkey; at 100 TB Catalyst's partial
    aggregation collapses the distribution shuffle to |distinct counts|
    rows per partition."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    per_cust = (
        customer.join(
            orders,
            (customer["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q21_LATE_DAYS = 2200


@query(
    "olap_sole_late_suppliers",
    oracle=f"""
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               MAX(CASE WHEN epoch(date_trunc('second', l_shipdate))
                           - epoch(date_trunc('second', o_orderdate))
                           > {_Q21_LATE_DAYS} * 86400
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1, 2
    ), per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_suppliers, SUM(is_late) AS n_late
        FROM li GROUP BY 1
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_blamed_orders
    FROM li JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = li.l_suppkey
    WHERE li.is_late = 1 AND per_order.n_suppliers > 1 AND per_order.n_late = 1
    GROUP BY 1, 2
    """,
)
def olap_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders with MULTIPLE suppliers, blame the supplier who was the ONLY
    late one ("late" = shipped > {_Q21_LATE_DAYS} days after the order
    date — the schema has no commitdate, so lateness is defined against
    o_orderdate; the threshold sits at this corpus's p99 gap).

    Q21's correlated EXISTS (another supplier on the order) + NOT EXISTS
    (no OTHER late supplier) is decorrelated into ONE per-order aggregate
    — n_suppliers and n_late — joined back to the per-(order, supplier)
    lateness table: is_late=1 AND n_suppliers>1 AND n_late=1 is exactly
    EXISTS AND NOT EXISTS. Two shuffles total (orderkey-suppkey agg, then
    orderkey agg + self-join on the same key — co-partitioned, so AQE
    reuses the exchange) instead of two correlated subquery executions.
    Timestamp arithmetic is second-truncated epoch math (nanosecond
    parquet would otherwise diverge cross-engine)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        F.col("l_shipdate").cast("timestamp_ltz").cast("long")
        - F.col("o_orderdate").cast("timestamp_ltz").cast("long")
        > _Q21_LATE_DAYS * 86400
    ).cast("int")
    per_pair = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = per_pair.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count("*").alias("n_suppliers"), F.sum("is_late").alias("n_late")
    )
    blamed = per_pair.join(
        per_order, per_pair["l_orderkey"] == per_order["g_orderkey"]
    ).filter(
        (F.col("is_late") == 1)
        & (F.col("n_suppliers") > 1)
        & (F.col("n_late") == 1)
    )
    return (
        blamed.join(
            F.broadcast(supplier), blamed["l_suppkey"] == supplier["s_suppkey"]
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_blamed_orders"))
    )


# ---------------------------------------------------------------------------
# Round-3 session-2 additions: the remaining classic TPC-H plan shapes.
# Same determinism contract as above (decimal-internal money math, final
# DOUBLE casts, second-truncated epoch arithmetic for timestamps).
# ---------------------------------------------------------------------------


@query(
    "olap_promo_revenue_share",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
                 AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
                 AS DECIMAL(18,4)) AS DOUBLE)
             / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(18,4)) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def olap_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional aggregation — the
    SUM(CASE WHEN dim-attr ...) idiom that turns a filter into a ratio in
    ONE pass over the fact. part (2k rows/sf vs 600k lineitem) broadcasts;
    the promo/total split never re-scans. The share is a DOUBLE division
    of the two exactly-summed decimals (identical operands both engines =>
    identical quotient)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    # r13 (optimization, guide §1.2 per-task work): the decimal multiply
    # is PROJECTED once per row and both sums reference the attribute —
    # the inlined form evaluated the (beyond-compact-long) BigDecimal
    # product twice per row, once inside each aggregate. The grouping
    # key is the month-truncated timestamp (integer arithmetic on
    # micros), not a per-row formatted string: date_format runs once per
    # OUTPUT month after the aggregate, producing the identical string
    # (truncation preserves year-month). Measured 1.21 -> ~0.8 s at
    # sf0.1 and removes the per-row formatter+string-key hashing that
    # made this query ANTI-scale 8 -> 32 cores (allocation pressure).
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            F.date_trunc("month", F.col("l_shipdate")).alias("ship_m"),
            rev.alias("rev"),
            (F.col("p_type") == "PROMO").alias("is_promo"),
        )
        .groupBy("ship_m")
        .agg(
            F.sum(
                F.when(F.col("is_promo"), F.col("rev")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("decimal(18,4)").cast("double").alias("promo_revenue"),
            F.sum("rev").cast("decimal(18,4)").cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        F.date_format("ship_m", "yyyy-MM").alias("ship_month"),
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


_Q15_START, _Q15_END = "1998-01-01", "1998-04-01"


@query(
    "olap_top_suppliers_by_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(18,4)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{_Q15_START} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{_Q15_END} 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def olap_top_suppliers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): max-of-an-aggregate with ties kept.
    The correlated `= (SELECT MAX(..))` decorrelates into the C2 idiom —
    the per-supplier revenue table aggregates to a 1-row max that
    broadcast-crossJoins back onto itself (no second scan of lineitem, no
    window sort). The equality compares DECIMALs (exact); the DOUBLE cast
    happens only in the projection."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{_Q15_START} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{_Q15_END} 00:00:00").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev).cast("decimal(18,4)").alias("total_revenue")
    )
    top = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


_Q18_MIN_QTY = 300


@query(
    "olap_large_volume_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS order_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2, 3, 4
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_MIN_QTY}
    """,
)
def olap_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): grouped HAVING over the fact,
    decorrelating Q18's `o_orderkey IN (SELECT .. GROUP BY .. HAVING ..)`.
    Spark aggregates lineitem FIRST on the bare orderkey (the shuffle
    carries (orderkey, qty) pairs, partially pre-aggregated map-side), then
    joins the ~p99-filtered survivors to orders and broadcast customer —
    instead of dragging customer names through the big aggregation the way
    the literal SQL grouping does. o_totalprice is a stored scalar (no
    float summation), so emitting it raw is hash-safe."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > _Q18_MIN_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        per_order.join(orders, per_order["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("qty").cast("double").alias("order_qty"),
        )
    )


@query(
    "olap_brand_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY 1, 2
    """,
)
def olap_brand_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): DISTINCT-count of
    suppliers per (brand, type) after excluding a blocklisted supplier set
    (the 'customer complaints' NOT IN — here: suppliers in arrears,
    s_acctbal < 0). The NOT IN runs as a broadcast left_anti join BEFORE
    the aggregation, so excluded suppliers never enter the distinct
    machinery; part broadcasts onto the fact; the countDistinct expands to
    the standard two-phase (partial-distinct, merge) plan."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    blocked = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(blocked),
            li["l_suppkey"] == blocked["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "olap_bracketed_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def olap_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue brackets): a disjunction of
    conjunctive brackets mixing fact-side (l_quantity) and dimension-side
    (p_brand, p_size) predicates. The optimizer splits the OR: the
    fact-only envelope (l_quantity <= 50) and the dim-only envelope
    (brand IN ...) each push to their scan, and the residual disjunction
    evaluates post-join — the point of the shape is that a naive engine
    evaluates the whole OR as a join filter with no pushdown at all.
    Single-row output: global decimal sum + count."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    bracket = (
        ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#12") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#21") & sz.between(20, 50) & q.between(20, 50))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(bracket)
        .agg(
            F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "olap_trade_volume_nation_pairs",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(18,4)) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def olap_trade_volume_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the two-role dimension — nation
    joins TWICE under different aliases (supplier side and customer side),
    with a cross-role inequality filter. Join order: the one real shuffle
    is lineitem-orders on the orderkey; customer, supplier, and both
    nation roles are broadcasts; aggregation groups on the two nation
    names + derived ship year. The inequality (supp != cust) evaluates
    after both broadcasts, pre-aggregation, so intra-nation trade rows
    never reach the shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("volume"))
    )


# ---------------------------------------------------------------------------
# The final six classic TPC-H plan shapes (Q2/Q6/Q8/Q10/Q12/Q20), completing
# all 22. The driver schema has no partsupp table and no
# l_shipmode/l_commitdate/l_receiptdate columns, so Q2/Q12/Q20 are adapted:
# the part-supplier supply relation is DERIVED from lineitem (min observed
# line price per part+supplier pair plays partsupp.ps_supplycost), and Q12's
# "late" predicate is l_shipdate > o_orderdate + 60 days with l_linestatus
# standing in for l_shipmode. The PLAN shapes — correlated-min join, simple
# pushdown aggregate, two-role dimension share, top-k over a 4-way join,
# conditional priority counts, nested aggregated semi-join — are faithful.
# ---------------------------------------------------------------------------

_Q6_START, _Q6_END = "1996-01-01", "1997-01-01"


@query(
    "olap_revenue_forecast_delta",
    oracle=f"""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2)))
                 AS DECIMAL(18,4)) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_START} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q6_END} 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def olap_revenue_forecast_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure
    scan-filter-aggregate — no join, no groupBy, ONE row out. All three
    predicates (date range, discount band, quantity cap) push into the
    parquet scan as PushedFilters; at 100 TB this is the query where
    min/max footer pruning + predicate pushdown decide everything, so the
    plan must stay a single WholeStageCodegen scan->partial-agg with a
    1-row final agg. Discount bounds compare the raw DOUBLE column (both
    engines compare the same float64 bits); money math is decimal-exact."""
    li = _t(spark, sf_dir, "lineitem")
    delta = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{_Q6_START} 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{_Q6_END} 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(delta).cast("decimal(18,4)").cast("double").alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_5"
_Q8_PTYPE = "STANDARD"


@query(
    "olap_national_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               sn.n_name AS supp_nation,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_PTYPE}'
    )
    SELECT order_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                         THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                 AS DECIMAL(18,4)) AS DOUBLE)
             / CAST(CAST(SUM(volume) AS DECIMAL(18,4)) AS DOUBLE)
             AS market_share,
           CAST(CAST(SUM(volume) AS DECIMAL(18,4)) AS DOUBLE) AS total_volume
    FROM vol
    GROUP BY order_year
    """,
)
def olap_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the deepest classic join
    tree — 8 relations, nation in TWO roles (customer-region gate vs
    supplier-nation share), with the share computed by conditional
    aggregation rather than a self-join. Every dimension (part filtered to
    one type, supplier, both nation roles, region) broadcasts; the only
    shuffles are lineitem-orders on orderkey and the final one-column
    groupBy on year. The share divides two exactly-summed decimals as a
    single DOUBLE op — bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_PTYPE)
        .select("p_partkey")
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q8_REGION)
        .select("r_regionkey")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    nation_vol = F.when(F.col("supp_nation") == _Q8_NATION, volume).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.sum(nation_vol).cast("decimal(18,4)").cast("double").alias("nat_vol"),
            F.sum(volume).cast("decimal(18,4)").cast("double").alias("total_volume"),
        )
    )
    return agg.select(
        "order_year",
        (F.col("nat_vol") / F.col("total_volume")).alias("market_share"),
        "total_volume",
    )


_Q10_START, _Q10_END = "1996-01-01", "1996-04-01"


@query(
    "olap_returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           c_acctbal, n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '{_Q10_START} 00:00:00'
      AND o_orderdate <  TIMESTAMP '{_Q10_END} 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def olap_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter-windowed fact
    join + customer rollup + top-20. Both filters (order date on orders,
    returnflag on lineitem) push to their OWN scans before the orderkey
    shuffle; customer+nation broadcast onto the aggregated result.
    The LIMIT compiles to TakeOrderedAndProject (no global sort) with a
    c_custkey tie-break for cross-engine determinism — revenue is an
    exactly-summed decimal, so the ordering itself is deterministic."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(f"{_Q10_START} 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{_Q10_END} 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_Q12_LATE_DAYS = 60


@query(
    "olap_late_shipment_priority",
    oracle=f"""
    SELECT l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL {_Q12_LATE_DAYS} DAY
    GROUP BY l_linestatus
    ORDER BY ship_class
    """,
)
def olap_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): fact-fact join
    with a CROSS-TABLE date predicate, then the two-bucket conditional
    count. Adapted to the driver schema (no l_shipmode/l_receiptdate):
    "late" is l_shipdate > o_orderdate + 60 days, and l_linestatus stands
    in for the shipmode grouping. The join predicate can't push to either
    scan (it spans both tables), so it evaluates right after the orderkey
    join — the shape Q12 exists to test. Counts are integers: hash-exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAYS")
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
        .orderBy("ship_class")
    )


_Q2_SIZE = 15
_Q2_REGION = "EUROPE"


@query(
    "olap_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
        FROM lineitem
        GROUP BY 1, 2
    ),
    eligible AS (
        SELECT ps_partkey, ps_suppkey, ps_supplycost
        FROM supply
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = '{_Q2_REGION}'
    )
    SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name,
           CAST(e.ps_supplycost AS DOUBLE) AS supply_cost
    FROM eligible e
    JOIN part ON e.ps_partkey = p_partkey
    JOIN supplier ON e.ps_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = {_Q2_SIZE}
      AND e.ps_supplycost = (
        SELECT MIN(e2.ps_supplycost) FROM eligible e2
        WHERE e2.ps_partkey = e.ps_partkey
      )
    ORDER BY s_acctbal DESC, nation, s_name, p_partkey
    LIMIT 100
    """,
)
def olap_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN
    subquery — for each part, keep only suppliers matching the per-part
    minimum supply cost within a region. Adapted to the driver schema
    (no partsupp): the supply relation is derived as MIN(l_extendedprice)
    per (part, supplier) pair from lineitem. Spark plan: ONE aggregation
    builds the supply relation, a window-free groupBy computes the
    per-part min, and a broadcast join re-attaches it (decorrelation by
    hand — the same rewrite Catalyst applies to the SQL form). Ties on
    the min keep ALL matching suppliers, per the official Q2. Cost is an
    exact decimal MIN cast to DOUBLE only at projection."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q2_REGION)
        .select("r_regionkey")
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == _Q2_SIZE)
        .select("p_partkey", "p_name")
    )
    # The per-part MIN is computed per part, so restricting the supply
    # relation to the filtered parts BEFORE aggregating changes nothing
    # semantically and shrinks the groupBy ~|part|/|filtered| fold — the
    # broadcast semi-join is the pushdown Catalyst can't infer through
    # the aggregate on its own.
    li = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("f_partkey"))),
        li["l_partkey"] == F.col("f_partkey"),
        "left_semi",
    )
    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("ps_supplycost"))
    eligible = (
        supply.join(
            F.broadcast(
                supplier.join(nation, supplier["s_nationkey"] == nation["n_nationkey"])
                .join(region, nation["n_regionkey"] == region["r_regionkey"])
                .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
            ),
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
    )
    part_min = eligible.groupBy(F.col("ps_partkey").alias("pm_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            F.broadcast(part), F.col("ps_partkey") == part["p_partkey"]
        )
        .join(
            F.broadcast(part_min),
            (F.col("ps_partkey") == F.col("pm_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


_Q20_PREFIX = "red"
_Q20_SHARE_NUM, _Q20_SHARE_DEN = 1, 10


@query(
    "olap_dominant_part_suppliers",
    oracle=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS supp_qty
        FROM lineitem
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_qty
        FROM lineitem
        GROUP BY 1
    )
    SELECT DISTINCT s_name, n_name AS nation
    FROM shipped
    JOIN totals  USING (l_partkey)
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '{_Q20_PREFIX}%'
      AND supp_qty * {_Q20_SHARE_DEN} > total_qty * {_Q20_SHARE_NUM}
    ORDER BY s_name
    """,
)
def olap_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): the nested aggregated
    semi-join — suppliers qualify through an aggregate comparison inside
    the subquery (their shipped quantity of 'red%' parts exceeds 10% of
    that part's total), then dedup to supplier identity. Adapted: the
    availqty/lineitem-sum comparison becomes a per-supplier vs per-part
    quantity share, scale-free at any SF. Both aggregations reuse the SAME
    shuffle key prefix (partkey), and the share test is integer-scaled
    decimal arithmetic (×10 both sides) — no division, hash-exact. The
    DISTINCT collapses multi-part qualifiers before the broadcast joins."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(_Q20_PREFIX))
        .select("p_partkey")
    )
    # Both aggregations are per part, so the 'red%' restriction commutes
    # with them: semi-joining lineitem to the filtered parts FIRST shrinks
    # both shuffles ~|part|/|red parts| fold (the through-the-aggregate
    # pushdown Catalyst can't infer).
    li = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("f_partkey"))),
        li["l_partkey"] == F.col("f_partkey"),
        "left_semi",
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).cast("decimal(18,2)").alias("supp_qty")
    )
    totals = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(qty).cast("decimal(18,2)").alias("total_qty")
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        shipped.join(totals, F.col("l_partkey") == F.col("t_partkey"))
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .filter(
            F.col("supp_qty") * F.lit(_Q20_SHARE_DEN)
            > F.col("total_qty") * F.lit(_Q20_SHARE_NUM)
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .select("s_name", "nation")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "olap_grouping_sets_margins",
    oracle="""
    WITH base AS (
        SELECT n_name, year(o_orderdate)::BIGINT AS yr,
               CAST(round(o_totalprice * 100) AS BIGINT) AS centi
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT coalesce(n_name, 'ALL') AS nation,
           coalesce(CAST(yr AS VARCHAR), 'ALL') AS o_year,
           count(*) AS n_orders,
           CAST(sum(centi) AS BIGINT) AS revenue_centi
    FROM base
    GROUP BY GROUPING SETS ((n_name, yr), (n_name), (yr))
    """,
)
def olap_grouping_sets_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC grouping sets — the general form CUBE (olap_sales_cube)
    and ROLLUP (olap_calendar_rollup) are sugar for: the (nation, year)
    detail plus BOTH one-dimensional margins, no grand total, in one
    statement. This is the report shape dashboards actually ask for
    ("each cell, each row total, each column total") and the one that
    forces the planner's Expand operator to carry a set list that is
    neither a prefix chain nor a power set.

    Scale shape: Spark expands each input row to the 3 requested sets
    BEFORE the shuffle, so partial aggregation still applies per set and
    the exchange carries |sets| x |group cardinality|, not 3 full scans
    (one Expand + one agg — same plan family as the cube, pinned in
    tests/test_plan_shapes.py). Sentinel 'ALL' labels make margin rows
    unambiguous in both engines (neither column is nullable in the data).
    Revenue is exact int64 centi; the year is cast to string on both
    sides so the margin sentinel shares the column's type."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        orders.join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .select(
            "n_name",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("centi"),
        )
    )
    return (
        base.groupingSets(
            [["n_name", "yr"], ["n_name"], ["yr"]], "n_name", "yr"
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("centi").cast("long").alias("revenue_centi"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("o_year"),
            "n_orders",
            "revenue_centi",
        )
    )
