"""Window-function analytics queries.

The reference has zero window/analytic functions (SURVEY.md §2.8); these
extend the engine with the ranking / offset / running-aggregate family,
oracle-checked against DuckDB. Window partitioning keys are the natural
data keys, so at scale each window is one shuffle on a well-distributed
key — never a single-partition global window (the one window shape this
engine deliberately avoids; global scalars ride 1-row broadcast aggregates
instead, see task_g/task_h).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _t, query


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk
    FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER — the partitioned dual of the global
    top-k (task_b_top10). Decimal ordering key + orderkey tie-break makes
    rank assignment deterministic cross-engine. Spark 3.5+ plans a
    WindowGroupLimit that short-circuits rows below rank 3 before the sort
    buffers them."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").cast("decimal(18,2)").desc(),
            F.col("o_orderkey").asc(),
        )
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(epoch(date_trunc('second', o_orderdate))
                - epoch(date_trunc('second', prev_date)) AS BIGINT) AS gap_seconds
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               LAG(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
               ) AS prev_date
        FROM orders
    )
    WHERE prev_date IS NOT NULL
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap per customer via LAG — the offset-function family.
    Gap emitted as integer seconds (second-truncated epoch arithmetic, the
    cross-engine-safe timestamp idiom)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev = F.lag("o_orderdate").over(w)

    def epoch_s(c):
        # o_orderdate arrives as TIMESTAMP_NTZ (Spark 4 parquet inference),
        # which cannot cast to long directly; route via LTZ (session tz is
        # pinned UTC, so wall time == epoch in both engines)
        return c.cast("timestamp_ltz").cast("long")

    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            (epoch_s(F.col("o_orderdate")) - epoch_s(prev)).alias("gap_seconds"),
            prev.alias("_prev"),
        )
        .filter(F.col("_prev").isNotNull())
        .drop("_prev")
    )


@query(
    "window_trailing_7d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(date_trunc('second', o_orderdate))
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS DOUBLE) AS spend_7d
    FROM orders
    """,
)
def window_trailing_7d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day spend per customer — the RANGE-interval frame family
    (value-based frames, distinct from ROWS frames: all orders within
    604800 epoch-seconds of the current one, ties included as peers, so no
    tie-break column is needed for determinism). The frame bound is on
    integer epoch seconds, the cross-engine-safe idiom; sums aggregate in
    decimal and project as double (driver-canonicalization rule)."""
    orders = _t(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("timestamp_ltz").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-604800, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("decimal(18,2)")
        .cast("double")
        .alias("spend_7d"),
    )


@query(
    "window_order_quartiles",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTILE(4) OVER w AS price_quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC
    )
    """,
)
def window_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank window family (NTILE / PERCENT_RANK /
    CUME_DIST) over each customer's orders by price. Partitioned on the
    natural high-cardinality key (never a global single-partition window);
    the decimal order key + orderkey tie-break makes every rank value
    deterministic, and percent_rank/cume_dist are int/int divisions —
    bit-identical cross-engine."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").desc(),
        F.col("o_orderkey").asc(),
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_SESSION_GAP_US = 7_200_000_000  # 2 h — calibrated: events are sparse
# (median per-user inter-event gap ~7 h at sf0.01), so 2 h yields ~8.3k
# sessions from 10k events with ~1.7k genuinely multi-event — the smallest
# standard-looking gap that doesn't degenerate to one session per event.


@query(
    "sessionize_events",
    oracle=f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), l AS (
        SELECT user_id, tus,
               LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) AS ptus
        FROM e
    ), f AS (
        SELECT user_id, tus,
               CASE WHEN ptus IS NULL OR tus - ptus > {_SESSION_GAP_US}::BIGINT
                    THEN 1 ELSE 0 END AS is_new
        FROM l
    ), s AS (
        SELECT user_id, tus,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY tus
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM f
    )
    SELECT user_id, session_idx,
           MIN(tus) AS session_start_us,
           MAX(tus) AS session_end_us,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization — the batch twin of the streaming
    applyInPandasWithState sessionizer (streaming/sessions.py), expressed
    purely relationally: LAG marks boundaries (gap > 2 h), a running SUM
    numbers sessions, a final group-by emits per-session bounds + counts.

    One shuffle total: both window specs share (PARTITION BY user_id ORDER
    BY tus) so they ride one exchange+sort, and the trailing groupBy
    (user_id, session_idx) is satisfied by the existing user_id hash
    partitioning (grouping on a superset of the partitioning key needs no
    re-exchange; pinned in tests/test_plan_shapes.py). Timestamps compare
    as integer epoch-microseconds (unix_micros / epoch_us — both truncate
    parquet ns identically; memory rule #8). Tied timestamps are safe: a
    zero gap is never a boundary, so tie order cannot change any session's
    stats."""
    events = _t(spark, sf_dir, "events")
    e = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", F.unix_micros(F.col("ts")).alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus")
    prev = F.lag("tus").over(w)
    flagged = e.select(
        "user_id",
        "tus",
        F.when(
            prev.isNull() | ((F.col("tus") - prev) > F.lit(_SESSION_GAP_US)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.select(
        "user_id", "tus", F.sum("is_new").over(run).alias("session_idx")
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("tus").alias("session_start_us"),
        F.max("tus").alias("session_end_us"),
        F.count("*").alias("n_events"),
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal total per customer — the frame-based aggregate
    family (ROWS UNBOUNDED PRECEDING..CURRENT ROW). Decimal keeps the
    running sums exact; the final DOUBLE cast makes the projected value
    canonicalization-safe at the driver boundary (see olap.py header)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("decimal(18,2)")
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "window_monthly_growth",
    oracle="""
    WITH m AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT month, revenue,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           revenue / lag(revenue) OVER (ORDER BY month) - 1 AS growth
    FROM m
    """,
)
def window_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: grouped rollup feeding a LAG window
    over the aggregated series — the aggregate-then-window composition
    (time-series trend family). The window is global but runs over
    |months| rows (dozens), never the fact table, so the single-partition
    window is safe at any scale; the growth ratio divides two exactly
    decimal-determined doubles — one IEEE division, bit-identical
    cross-engine."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month", "revenue", prev.alias("prev_revenue"), (F.col("revenue") / prev - 1).alias("growth")
    )
