"""Stream-stream joins — the continuous twin of operators/temporal.py.

Structured Streaming's stream-stream join buffers both sides in state;
unbounded conditions would buffer forever. The interval join here is the
bounded form every event-correlation pipeline needs (clicks ↔ errors,
impressions ↔ conversions): an equi-key plus a two-sided event-time range,
with watermarks on BOTH inputs so the engine can evict state older than
watermark + span — state size tracks stream rate x horizon, not lifetime.

The batch twin (range_join_bucketed) answers the same question over
at-rest data with an equi-join on time buckets; this operator answers it
continuously with join-state eviction. Both are exercised against the
same events data in tests (the streaming result must equal the batch
join on a bounded replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    span_seconds: int = 3600,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on `key` where the right event falls
    within ± span_seconds of the left event's time.

    Right-side columns are prefixed `r_` (the two sides usually share
    column names, and the prefix keeps the output schema collision-free).
    The rename happens BEFORE the watermark so event-time tracking attaches
    to the column that actually appears in the join condition.

    The time bounds are what make the state bounded: with watermarks W on
    both sides, the engine drops left state older than W + span and right
    state older than W + span. Without the range condition a stream-stream
    join is unbounded-state and Spark (correctly) refuses append mode.

    how: 'inner' | 'leftOuter' — outer rows emit only after the watermark
    passes their eviction bound (that delay is inherent to streaming outer
    joins, not an implementation choice).
    """
    lw = left.withWatermark(left_ts, watermark)
    renamed = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    rw = renamed.withWatermark(f"r_{right_ts}", watermark)
    span = F.expr(f"INTERVAL {int(span_seconds)} SECONDS")
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - span)
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + span)
    )
    return lw.join(rw, cond, how)
