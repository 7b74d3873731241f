"""Streaming twin of orders_backlog_sweep (VERDICT r4 ask #7).

Two pins:
1. Crafted two-run replay: days finalize exactly when the watermark passes
   their end, emissions arrive once, in day order, with correct running
   sums — and a LATE row for an already-finalized day is dropped, never
   re-emitted and never perturbing the cumulative count.
2. Twin parity on real testdata: the finalized streaming prefix equals the
   batch orders_backlog_sweep result row-for-row at sf0.001.

Both use the checkpointed availableNow replay harness from
test_streaming_late_data.py — inside a single bounded run everything can
land in one micro-batch where the watermark is still 0, so finalization
(and late-dropping) is only observable across runs, which is also the
honest production shape (the watermark lives in the checkpoint).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.streaming.backlog import backlog_sweep_stateful

from .conftest import SF_SMOKE


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema("ts timestamp, delta int").parquet(src)
    q = (
        backlog_sweep_stateful(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _write(spark, src, rows):
    df = spark.createDataFrame(rows).select(
        F.col("ts").cast("timestamp"), F.col("delta").cast("int")
    )
    df.coalesce(1).write.mode("append").parquet(src)


def test_backlog_sweep_finalizes_in_order_and_drops_late(spark):
    src = tempfile.mkdtemp(prefix="bk_src_")
    ckpt = tempfile.mkdtemp(prefix="bk_ck_")
    out = tempfile.mkdtemp(prefix="bk_out_")
    try:
        # run 1: two orders open Jan 1, one closes Jan 2 (delta -1 lands
        # Jan 3), plus a far-future zero-delta sentinel that will advance
        # the checkpointed watermark past January. Watermark is 0 during
        # this run, so nothing finalizes yet.
        _write(spark, src, [
            Row(ts="2024-01-01 00:00:00", delta=1),
            Row(ts="2024-01-01 00:00:00", delta=1),
            Row(ts="2024-01-03 00:00:00", delta=-1),
            Row(ts="2024-02-01 00:00:00", delta=0),
        ])
        _run(spark, src, ckpt, out)
        assert spark.read.schema(
            "day string, delta long, open_orders long"
        ).parquet(out).count() == 0

        # run 2: a LATE +1 for the (about-to-finalize) Jan 1, plus a
        # sentinel that keeps the key active. Watermark restored from the
        # checkpoint (~Feb 1) finalizes Jan 1 and Jan 3; the late row's
        # whole day is past the watermark, so it must NOT contribute.
        _write(spark, src, [
            Row(ts="2024-01-01 00:00:00", delta=1),
            Row(ts="2024-02-02 00:00:00", delta=0),
        ])
        _run(spark, src, ckpt, out)
        rows = sorted(
            spark.read.parquet(out).collect(), key=lambda r: r.day
        )
        assert [(r.day, r.delta, r.open_orders) for r in rows] == [
            ("2024-01-01", 2, 2),
            ("2024-01-03", -1, 1),
        ]

        # runs 3+4: the watermark only ADVANCES at the end of a batch, so
        # run 3's sentinel (Mar 1) finalizes the two February sentinel
        # days during run 4 — each emitted once, zero delta, cumulative
        # count unchanged.
        _write(spark, src, [Row(ts="2024-03-01 00:00:00", delta=0)])
        _run(spark, src, ckpt, out)
        _write(spark, src, [Row(ts="2024-03-02 00:00:00", delta=0)])
        _run(spark, src, ckpt, out)
        rows = sorted(
            spark.read.parquet(out).collect(), key=lambda r: r.day
        )
        assert [(r.day, r.delta, r.open_orders) for r in rows] == [
            ("2024-01-01", 2, 2),
            ("2024-01-03", -1, 1),
            ("2024-02-01", 0, 1),
            ("2024-02-02", 0, 1),
        ]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_backlog_two_query_pipeline_matches_batch(spark):
    """The documented scale composition (ADVICE r5): query A =
    day_grain_deltas (distributed windowed aggregation, append mode,
    finalized days only) writes an intermediate parquet sink; query B =
    the single-key sweep streams from that sink and must reproduce the
    crafted running sums exactly. Spark's analyzer forbids fusing the two
    into one query (aggregation before applyInPandasWithState AND chained
    applyInPandasWithState both raise), so the two-query shape IS the
    production deployment, pinned here end-to-end."""
    from mapreducer_pi_cs4433_spark.streaming.backlog import day_grain_deltas

    src = tempfile.mkdtemp(prefix="bk2_src_")
    ck_a = tempfile.mkdtemp(prefix="bk2_cka_")
    mid = tempfile.mkdtemp(prefix="bk2_mid_")
    ck_b = tempfile.mkdtemp(prefix="bk2_ckb_")
    out = tempfile.mkdtemp(prefix="bk2_out_")

    def _run_a():
        stream = spark.readStream.schema("ts timestamp, delta int").parquet(src)
        q = (
            day_grain_deltas(stream)
            .writeStream.format("parquet")
            .option("path", mid)
            .option("checkpointLocation", ck_a)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def _run_b():
        stream = spark.readStream.schema("ts timestamp, delta long").parquet(mid)
        q = (
            backlog_sweep_stateful(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck_b)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    try:
        _write(spark, src, [
            Row(ts="2024-01-01 06:00:00", delta=1),
            Row(ts="2024-01-01 18:00:00", delta=1),
            Row(ts="2024-01-03 12:00:00", delta=-1),
        ])
        _run_a()
        # sentinel cascade: each stage finalizes a day only when ITS
        # watermark passes the day's end, and stage B's event times are
        # stage A's day STARTS — so sentinels must clear both stages'
        # thresholds, and each stage needs a second run for the
        # checkpointed watermark to become visible to emissions
        # four sentinels: stage A finalizes day d only once it sees day
        # d+2's start (1s delay + window-end strictness), and stage B
        # lags one more A-emission behind that
        for s in ["2024-02-01 00:00:00", "2024-02-02 00:00:00",
                  "2024-02-03 00:00:00", "2024-02-04 00:00:00"]:
            _write(spark, src, [Row(ts=s, delta=0)])
            _run_a()
            _run_b()
        got = sorted(
            (r.day, r.delta, r.open_orders)
            for r in spark.read.schema(
                "day string, delta long, open_orders long"
            ).parquet(out).collect()
            if r.day < "2024-02"
        )
        assert got == [("2024-01-01", 2, 2), ("2024-01-03", -1, 1)]
        # the intermediate sink carries DAY-GRAIN rows only: the sweep's
        # single task saw 2 finalized January change-days, not 3 raw rows
        mid_rows = sorted(
            (str(r.ts), r.delta)
            for r in spark.read.schema("ts timestamp, delta long")
            .parquet(mid).collect()
            if str(r.ts) < "2024-02"
        )
        assert mid_rows == [
            ("2024-01-01 00:00:00", 2),
            ("2024-01-03 00:00:00", -1),
        ]
    finally:
        for d in (src, ck_a, mid, ck_b, out):
            shutil.rmtree(d, ignore_errors=True)


def test_backlog_sweep_stream_matches_batch_query(spark):
    """Feed the batch query's own endpoint-delta stream (rebuilt from
    lineitem/orders at sf0.001) through the state machine; once the
    watermark passes the data range, the emitted prefix must equal the
    batch orders_backlog_sweep output row-for-row."""
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
    from mapreducer_pi_cs4433_spark.sources.loaders import load_table

    src = tempfile.mkdtemp(prefix="bkp_src_")
    ckpt = tempfile.mkdtemp(prefix="bkp_ck_")
    out = tempfile.mkdtemp(prefix="bkp_out_")
    try:
        li = (
            load_table(spark, SF_SMOKE, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.max(F.to_date("l_shipdate")).alias("last_ship"))
        )
        orders = load_table(spark, SF_SMOKE, "orders").select(
            "o_orderkey", F.to_date("o_orderdate").alias("start_d")
        )
        iv = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
            "start_d", F.greatest("last_ship", "start_d").alias("close_d")
        )
        ev = iv.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("start_d").alias("day"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.date_add("close_d", 1).alias("day"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("e")
        ).select(
            F.col("e.day").cast("timestamp").alias("ts"),
            F.col("e.delta").cast("int").alias("delta"),
        )
        ev.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out)  # watermark still 0: nothing final
        # sentinel runs: the first jumps the checkpointed watermark past
        # every data day, the second triggers the batch in which that
        # advanced watermark is visible and the whole prefix finalizes
        _write(spark, src, [Row(ts="2200-01-01 00:00:00", delta=0)])
        _run(spark, src, ckpt, out)
        _write(spark, src, [Row(ts="2200-01-02 00:00:00", delta=0)])
        _run(spark, src, ckpt, out)

        got = sorted(
            (r.day, r.delta, r.open_orders)
            for r in spark.read.parquet(out).collect()
        )
        want = sorted(
            (r.day, r.delta, r.open_orders)
            for r in QUERIES["orders_backlog_sweep"](spark, SF_SMOKE).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_backlog_sweep_arbitrary_batch_splits_match_reference(spark):
    """Seeded randomized replay: a random balanced delta stream, arriving
    in event-time order but split at ARBITRARY points across four
    checkpointed runs, must finalize to exactly the running sums a
    pure-Python sweep computes — state and watermark survive every split
    point, emissions never duplicate or reorder. (In-order arrival is the
    precondition for a drop-free reference: cross-run event-time disorder
    beyond the 1s watermark delay is LATE by contract and covered by the
    crafted late-drop test above. Seeded RNG, not hypothesis: each
    streaming run costs seconds, so one adversarial deterministic example
    beats twenty shrunk ones.)"""
    import random

    rng = random.Random(0x5EED)
    days = [f"2024-02-{d:02d}" for d in range(1, 11)]
    events = [
        (rng.choice(days) + " 12:00:00", rng.choice([1, 1, 1, -1]))
        for _ in range(40)
    ]
    # balance: every +1 eventually closes so the final count is exact
    net = sum(d for _, d in events)
    if net > 0:
        events += [("2024-02-10 13:00:00", -1)] * net
    elif net < 0:
        events += [("2024-02-01 11:00:00", 1)] * (-net)
    events.sort()  # in-order arrival; the RANDOM part is the split points
    splits = sorted(rng.sample(range(1, len(events)), 3))
    chunks = [
        events[i:j]
        for i, j in zip([0] + splits, splits + [len(events)])
    ]

    src = tempfile.mkdtemp(prefix="bkr_src_")
    ckpt = tempfile.mkdtemp(prefix="bkr_ck_")
    out = tempfile.mkdtemp(prefix="bkr_out_")
    try:
        for chunk in chunks:
            _write(spark, src, [
                Row(ts=ts, delta=dv) for ts, dv in chunk
            ])
            _run(spark, src, ckpt, out)
        # two sentinel runs push the watermark past every data day and
        # trigger the final emissions
        _write(spark, src, [Row(ts="2024-03-01 00:00:00", delta=0)])
        _run(spark, src, ckpt, out)
        _write(spark, src, [Row(ts="2024-03-02 00:00:00", delta=0)])
        _run(spark, src, ckpt, out)

        got = sorted(
            (r.day, r.delta, r.open_orders)
            for r in spark.read.parquet(out).collect()
            if r.day < "2024-03"  # exclude the sentinel day
        )
        # pure-Python reference sweep
        per_day: dict[str, int] = {}
        for ts, dv in events:
            per_day[ts[:10]] = per_day.get(ts[:10], 0) + dv
        cum, want = 0, []
        for day in sorted(per_day):
            cum += per_day[day]
            want.append((day, per_day[day], cum))
        assert got == want
        assert got[-1][2] == 0  # balanced stream: everything closed
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
