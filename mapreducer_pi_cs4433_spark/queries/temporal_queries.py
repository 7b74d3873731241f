"""Catalog queries for the temporal join operators (as-of / range).

Both oracle-checked: DuckDB has a native ASOF JOIN and an IEJoin-backed
inequality join, which makes it the perfect referee for the hand-composed
Spark implementations in operators/temporal.py. All comparisons run at
microsecond precision on both engines (Spark truncates the parquet's
nanoseconds to micros; the oracles compare epoch_us, which truncates
identically — raw ns comparison would diverge at sub-microsecond
boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_bucketed
from .catalog import _t, query


@query(
    "asof_last_purchase_per_click",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, c.user_id,
           strftime(date_trunc('second', c.ts), '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(date_trunc('second', p.pts), '%Y-%m-%d %H:%M:%S')
             AS last_purchase_ts
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND epoch_us(c.ts) >= epoch_us(p.pts)
    """,
)
def asof_last_purchase_per_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the same user's most recent purchase at or before it
    (null if none) — the as-of join, vs DuckDB's native ASOF JOIN. The
    Spark side is one shuffle keyed by user + a window; see
    operators/temporal.py."""
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value="purchase_ts",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "last_purchase_ts"
        ),
    )


@query(
    "range_join_click_error_pairs",
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         e AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT c.user_id, COUNT(*) AS pair_count
    FROM c JOIN e
      ON c.user_id = e.user_id
     AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 3600000000::BIGINT
    GROUP BY c.user_id
    """,
)
def range_join_click_error_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(click, error) pairs of the same user within one hour, counted per
    user — the bucketized range join (equi-join on (user, time-bucket) with
    2-neighbor probing) vs DuckDB's inequality join."""
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    errors = events.filter(F.col("event_type") == "error").select("user_id", "ts")
    pairs = range_join_bucketed(
        clicks, errors, key="user_id", left_ts="ts", right_ts="ts",
        span_seconds=3600,
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("pair_count"))
