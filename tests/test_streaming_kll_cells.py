"""Streaming KLL day-cell ingest tests (streaming/kll_cells.py): the
quantile half of the snapshot lifecycle — closed (key, day) cells land
in the store the batch rollup merges.

Contracts, replayed chunked with a restart at every boundary:

1. Closure-only writes: open days have no partition; closed cells are
   emitted once, state removed.
2. Sub-cap exactness: a day-sized cell below the compaction cap has NO
   compaction, so its stored level-0 items are EXACTLY the cell's raw
   value multiset (bit-identical, order aside) — asserted per cell.
3. Above-cap contract: a cell pushed past the cap keeps EXACT total
   weight (sum 2^level == its true row count) and its p50 stays inside
   the deterministic rank band.
4. Composition: the batch rollup's TYPE MERGE (sort items, fold, read
   quantiles) over the stream-built store carries exact total weight
   and in-band quantiles vs a flat sort of everything — the KLL
   lifecycle round trip.
5. Idempotent-in-effect sink: re-delivering a closed day's rows leaves
   exactly one valid cell per (key, day), never duplicates.
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest

from mapreducer_pi_cs4433_spark.functions import kll
from mapreducer_pi_cs4433_spark.streaming.kll_cells import (
    kll_day_cell_stream,
    read_day_cells,
    write_day_cells,
)

_CAP = 64  # small cap so the above-cap contract is exercised cheaply


def _ts(d: int, h: int = 12) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, h, 0) + datetime.timedelta(
        days=d - 1
    )


def _day_date(d: int) -> datetime.date:
    return datetime.date(2024, 1, 1) + datetime.timedelta(days=d - 1)


def _run_chunks(spark, chunks, src, ckpt, store):
    for chunk in chunks:
        spark.createDataFrame(
            chunk, "event_type string, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "event_type string, ts timestamp, value double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            kll_day_cell_stream(stream, watermark="1 day", cap=_CAP)
            .writeStream.foreachBatch(
                lambda df, bid: write_day_cells(df, store)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def _store_days(store: str) -> set[datetime.date]:
    if not os.path.isdir(store):
        return set()
    return {
        datetime.date.fromisoformat(e.split("=", 1)[1])
        for e in os.listdir(store)
        if e.startswith("day=")
    }


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_kll_cells_close_with_exact_weight_and_band(spark, provider):
    from mapreducer_pi_cs4433_spark.session import enable_rocksdb_state

    # day 1 (type a): 100 values SPLIT across a restart (sub-cap after
    # merge? 100 > 64 -> compacts, exercising the weight contract
    # through recovery); day 1 (type b): 10 values, sub-cap, exact;
    # day 2 (type a): 30 values, sub-cap, arrives in one chunk;
    # day 9: the flush (closes days 1-2 under the 1-day watermark; its
    # own cell stays open).
    a1 = [float(v) for v in range(100)]
    b1 = [float(v * 3) for v in range(10)]
    a2 = [float(100 - v) for v in range(30)]
    chunks = [
        [("a", _ts(1), v) for v in a1[:60]] + [("b", _ts(1), v) for v in b1],
        [("a", _ts(1, 18), v) for v in a1[60:]],
        [("a", _ts(2), v) for v in a2],
        [("a", _ts(9), 0.0)],
    ]
    src = tempfile.mkdtemp(prefix="kcell_src_")
    ckpt = tempfile.mkdtemp(prefix="kcell_ck_")
    store = tempfile.mkdtemp(prefix="kcell_store_") + "/kll_day_cells"
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if provider == "rocksdb":
        enable_rocksdb_state(spark)
    try:
        # first two chunks: day 1 is still open (watermark inside day 2)
        _run_chunks(spark, chunks[:2], src, ckpt, store)
        assert _store_days(store) == set()

        _run_chunks(spark, chunks[2:], src, ckpt, store)
        assert _store_days(store) == {_day_date(1), _day_date(2)}

        rows = read_day_cells(spark, store).collect()
        cells: dict[tuple, list] = {}
        for r in rows:
            cells.setdefault((r.event_type, r.day), []).append(
                (r.level, r.value)
            )

        # sub-cap cells: stored items ARE the raw multiset at level 0
        assert sorted(v for l, v in cells[("b", _day_date(1))]) == sorted(
            b1
        )
        assert all(l == 0 for l, _ in cells[("b", _day_date(1))])
        assert sorted(v for l, v in cells[("a", _day_date(2))]) == sorted(
            a2
        )

        # above-cap cell (a, day 1): exact weight through compaction AND
        # a restart mid-cell; p50 inside the deterministic rank band
        a1_items = cells[("a", _day_date(1))]
        assert sum(2**l for l, _ in a1_items) == len(a1)
        sk = kll.new_sketch()
        kll.merge_items(sk, sorted(a1_items), cap=_CAP)
        p50 = kll.quantile(sk, 500)
        exact_sorted = sorted(a1)
        lo = exact_sorted[max(0, (len(a1) * 480 + 999) // 1000 - 1)]
        hi = exact_sorted[min(len(a1) - 1, (len(a1) * 520 + 999) // 1000 - 1)]
        assert lo <= p50 <= hi

        # ---- composition: the batch rollup's TYPE MERGE over the
        # stream-built store — exact weight, in-band p50 vs flat sort
        a_items = sorted(
            it
            for (t, d), its in cells.items()
            if t == "a"
            for it in its
        )
        sk_a = kll.new_sketch()
        kll.merge_items(sk_a, a_items, cap=_CAP)
        all_a = a1 + a2
        assert kll.total_weight(sk_a) == len(all_a)
        flat = sorted(all_a)
        lo = flat[max(0, (len(flat) * 480 + 999) // 1000 - 1)]
        hi = flat[min(len(flat) - 1, (len(flat) * 520 + 999) // 1000 - 1)]
        assert lo <= kll.quantile(sk_a, 500) <= hi

        # ---- idempotent-in-effect re-delivery: sink day 1's rows again
        # (as the sink would on a crash-replay); still exactly one valid
        # cell per key, exact weights preserved
        redeliver = spark.createDataFrame(
            [
                (t, d, l, v)
                for (t, d), its in cells.items()
                if d == _day_date(1)
                for l, v in its
            ],
            "event_type string, day date, level int, value double",
        )
        write_day_cells(redeliver, store)
        again = read_day_cells(spark, store).collect()
        w = {}
        for r in again:
            w[(r.event_type, r.day)] = w.get((r.event_type, r.day), 0) + (
                2**r.level
            )
        assert w[("a", _day_date(1))] == len(a1)
        assert w[("b", _day_date(1))] == len(b1)
        assert w[("a", _day_date(2))] == len(a2)
    finally:
        if provider == "rocksdb":
            if prev is None:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
        for d in (src, ckpt, os.path.dirname(store)):
            shutil.rmtree(d, ignore_errors=True)
