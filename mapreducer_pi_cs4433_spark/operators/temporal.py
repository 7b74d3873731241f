"""Temporal join operators Spark lacks as built-ins: as-of and range joins.

Both are compositions of existing DataFrame ops (SURVEY.md §7 guidance:
prefer composition over Pandas UDFs when semantics allow), shaped so the
expensive part stays a single well-keyed shuffle.

- asof_join: each left row matched to the most recent right row at or
  before it. Implemented as union + window last(ignorenulls) — one shuffle
  on (key), one sort within partitions; never a per-row lookup join.
- range_join_bucketed: inequality joins (|l.ts - r.ts| <= span) explode
  into cartesian products under naive planning (BroadcastNestedLoopJoin);
  bucketing time into span-width buckets turns them into an equi-join on
  (key, bucket) with each left row probing at most 2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
) -> DataFrame:
    """For every left row: the `right_value` of the latest right row with
    right_ts <= left_ts and matching key (null if none) — a left as-of join.

    Plan: tag both inputs, union, one window over (key) ordered by
    (epoch-micros, side) with last(value, ignorenulls=True); right rows sort
    before left rows at equal timestamps so "at or before" includes ties.
    Cost: one shuffle of |left|+|right| rows keyed by `key` + an in-
    partition sort — the same cost profile as a sort-merge join, with no
    per-row probing. Ties among right rows at the same (key, ts) are
    resolved by max(right_value) pre-aggregation, making output
    deterministic.

    NULL keys follow SQL join semantics: a NULL never matches a NULL, so
    NULL-key right rows are dropped (they can match nothing) and NULL-key
    left rows pass through unmatched (asof value NULL). Without the filter
    the window would group all NULL keys into one partition and invent
    matches DuckDB's native ASOF JOIN (the oracle) never produces.

    Returns left's columns + `right_value` (original name).
    """
    # collapse right-side ties first: one row per (key, ts), deterministic;
    # NULL-key/NULL-ts right rows can never be "the latest at-or-before
    # match" for any left row — drop them before the union
    r = (
        right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
        .groupBy(
            F.col(key).alias("__k"), F.col(right_ts).alias("__ts")
        )
        .agg(F.max(right_value).alias("__val"))
        .select(
            "__k",
            F.unix_micros(F.col("__ts").cast("timestamp_ltz")).alias("__epoch"),
            F.lit(0).alias("__side"),
            "__val",
        )
    )
    l_cols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(left_ts).cast("timestamp_ltz")).alias("__epoch"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__val"].dataType).alias("__val"),
        *l_cols,
    )
    unioned = r.select("__k", "__epoch", "__side", "__val", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols]).unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy("__epoch", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__asof", F.last("__val", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("__side") == 1).select(
        *l_cols, F.col("__asof").alias(right_value)
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    span_seconds: int,
) -> DataFrame:
    """Inner join of rows with equal `key` and |left_ts - right_ts| <=
    span_seconds, planned as an equi-join.

    Each side is bucketed into span-width time buckets; a qualifying pair's
    buckets differ by at most 1, so the left side explodes into its bucket
    and both neighbors (3 rows) and joins on (key, bucket) equality. The
    exact range predicate filters the (small) per-bucket candidates. Join
    cost: equi-shuffle on a composite key instead of a nested-loop scan.

    NULL keys/timestamps need no special handling here: the inner join's
    `=` predicate is null-rejecting, exactly like the SQL oracle.

    Returns left columns + right columns (right's renamed with `r_` prefix
    where they collide).
    """
    lx = left.withColumn(
        "__l_epoch", F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
    )
    span_us = span_seconds * 1_000_000
    lbucket = F.floor(F.col("__l_epoch") / span_us)
    lx = lx.withColumn(
        "__lb", F.explode(F.array(lbucket - 1, lbucket, lbucket + 1))
    )
    # epoch + bucket computed BEFORE renaming so ts column names stay simple
    rx = right.withColumn(
        "__r_epoch", F.unix_micros(F.col(right_ts).cast("timestamp_ltz"))
    ).withColumn("__rb", F.floor(F.col("__r_epoch") / (span_seconds * 1_000_000)))
    renames = {c: f"r_{c}" for c in right.columns if c in left.columns}
    for old, new in renames.items():
        rx = rx.withColumnRenamed(old, new)
    right_key = renames.get(key, key)
    out = lx.join(
        rx,
        (lx["__lb"] == rx["__rb"])
        & (F.col(key) == F.col(right_key))
        & (F.abs(F.col("__l_epoch") - F.col("__r_epoch")) <= span_seconds * 1_000_000),
        "inner",
    )
    return out.drop("__lb", "__rb", "__l_epoch", "__r_epoch")
