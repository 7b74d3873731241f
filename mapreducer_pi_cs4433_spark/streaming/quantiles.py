"""Streaming quantile monitor — the ingest-time twin of the batch KLL
entry (``events_quantile_sketch_kll``): one KLL sketch per key lives in
operator state, every micro-batch folds its values in, and every trigger
emits a fresh (p50, p95, p99, n_seen) snapshot — "what does this
metric's distribution look like RIGHT NOW" over an unbounded stream with
state bounded at O(cap · log(n/cap)) floats per key, forever.

The state row is the sketch's serialized item table — (level[], value[],
parity[], n) typed arrays, the same (level, value) representation the
batch operator shuffles between its build and merge phases — so restart
recovery is just refilling compactors, and the state store (HDFS or
RocksDB provider) never sees a Python pickle.

Correctness contract (same two invariants the batch oracle hash-checks):
``n_seen`` equals the EXACT number of values folded — compaction halves
items while doubling weight, and the odd-leftover rule keeps the total
exact across arbitrarily many batch boundaries — and each snapshot
quantile sits within the deterministic rank band of the exact quantile
over everything ingested so far (functions/kll.py documents the bound).
Both are asserted after chunked replays and a mid-stream restart in
tests/test_streaming_quantiles.py, under both state-store providers.

Reference note: the reference repo (MapReducer-PI-cs4433) has no
streaming surface; this module extends the engine's streaming family
(SURVEY.md §2.8 "engine ships them anyway").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import kll

SNAPSHOT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("p50", DoubleType(), True),
        StructField("p95", DoubleType(), True),
        StructField("p99", DoubleType(), True),
    ]
)

# the sketch's item table, flattened into typed parallel arrays (never a
# Python pickle in the state store)
_STATE_SCHEMA = StructType(
    [
        StructField("item_levels", ArrayType(IntegerType()), False),
        StructField("item_values", ArrayType(DoubleType()), False),
        StructField("parity", ArrayType(IntegerType()), False),
        StructField("n", LongType(), False),
    ]
)


def _restore(levels, values, parity, cap: int) -> dict:
    """Rebuild a sketch from its serialized item table. The stored items
    respect the cap they were BUILT with, so the refill must not compact
    — the stored PARITY schedule is then overlaid so future compactions
    resume exactly where the previous process stopped.

    Restarting a query with a SMALLER cap than its state was built with
    would make the refill itself compact (self-review): the level
    layout then no longer matches the stored parity array, and because
    compaction preserves total weight exactly, the integrity guard
    downstream would pass while the parity schedule — and with it the
    determinism-across-restart claim — was silently wrong. Detected
    here: compaction strictly shrinks the item count, so a refill that
    lost items means a cap mismatch, and it raises instead of
    degrading."""
    items = list(zip(levels, values))
    sk = kll.new_sketch()
    kll.merge_items(sk, items, cap=cap)
    if len(kll.to_items(sk)) != len(items):
        raise ValueError(
            f"KLL state holds {len(items)} items but refilling at "
            f"cap={cap} compacted to {len(kll.to_items(sk))}: the state "
            "was built with a larger cap — restart with the original "
            "cap (or a fresh checkpoint for the new one)"
        )
    par = list(parity) + [0] * (len(sk["levels"]) - len(parity))
    sk["parity"] = par[: len(sk["levels"])]
    return sk


def kll_quantile_stream(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    cap: int = kll.DEFAULT_CAP,
) -> DataFrame:
    """Per-key running quantile snapshots over a value stream.

    Returns a streaming DataFrame of (event_type, n_seen, p50, p95, p99):
    after every micro-batch, each key that received data re-emits its
    current snapshot (outputMode update — a live distribution dashboard).
    NULL values are dropped before the stateful operator, mirroring the
    batch entry's filter."""
    import pandas as pd

    def update(key, pdf_iter, state: GroupState):
        (ktype,) = key
        if state.exists:
            levels, values, parity, n = state.get
            sk = _restore(levels, values, parity, cap)
            if kll.total_weight(sk) != n:
                # the stored n is a serialization-integrity cross-check,
                # not bookkeeping: a dropped/duplicated item row in the
                # state round trip is silent in every quantile (the band
                # absorbs it) but never in the exact weight
                raise ValueError(
                    f"KLL state for {ktype!r} reconstructs weight "
                    f"{kll.total_weight(sk)}, expected {n}: state item "
                    "table corrupted"
                )
        else:
            sk = kll.new_sketch()
        got = 0
        for pdf in pdf_iter:
            vals = pdf[value_col].to_numpy()
            got += len(vals)
            kll.add_many(sk, vals, cap=cap)
        if not got:
            return
        # the EMITTED count is the sketch's own total weight — the
        # batch entry's sketch_weight == n_events contract stays live in
        # the stream output instead of being shadowed by a side counter
        n_now = kll.total_weight(sk)
        items = kll.to_items(sk)
        state.update(
            (
                [l for l, _ in items],
                [v for _, v in items],
                list(sk["parity"]),
                n_now,
            )
        )
        yield pd.DataFrame(
            {
                "event_type": [ktype],
                "n_seen": [n_now],
                "p50": [kll.quantile(sk, 500)],
                "p95": [kll.quantile(sk, 950)],
                "p99": [kll.quantile(sk, 990)],
            }
        )

    # NULL keys would form their own state group and emit a snapshot row
    # violating SNAPSHOT_SCHEMA's non-nullable event_type — filter both
    # key and value, matching the batch twin (events_quantile_sketch_kll
    # filters event_type IS NOT NULL) and sibling hll_distinct_stream
    pre = stream.filter(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("event_type"),
        F.col(value_col).cast("double").alias(value_col),
    )
    return pre.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=SNAPSHOT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
