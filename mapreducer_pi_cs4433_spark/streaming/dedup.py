"""Streaming deduplication — the ingest-time twin of functions.dedup.

exact_dedup_stream drops payload-identical documents as they arrive:
content digest + dropDuplicatesWithinWatermark, so state holds one digest
per document seen within the watermark horizon (bounded, evictable) instead
of growing forever. This is the shape of an ingest pipeline that must not
admit the same crawled page twice within a window.

For unbounded exact dedup across all history, pair this with a periodic
batch exact_dedup over the sink (the streaming layer bounds duplication
within the horizon; the batch layer is the source of truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Admit only the first document per content digest within the
    watermark horizon. Output keeps the original columns plus `digest`.

    State per digest is one row; the watermark lets the engine evict
    digests older than the horizon, so state size tracks the horizon's
    document rate, not stream lifetime.
    """
    return (
        stream.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
