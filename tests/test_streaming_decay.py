"""Streaming twin of events_decayed_type_scores.

Pins, via the checkpointed availableNow replay harness
(test_streaming_late_data.py precedent — watermark state lives in the
checkpoint, so advancement is observable across runs):

1. Crafted math: snapshots anchor on the newest COMPLETED day and carry
   the exact bit-shift decay; a type with NO new rows still re-emits on
   its event-time timer when the anchor advances (its score decays to
   zero past the horizon); each (type, anchor) emits exactly once.
2. Batch parity on real testdata: once the watermark passes the end of
   the corpus's newest day, the snapshot anchored on that day equals the
   batch events_decayed_type_scores row set.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.streaming.decay import decayed_scores_stateful

from .conftest import SF_SMOKE


def _run(spark, src, ckpt, out, horizon_days):
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(
        src
    )
    q = (
        decayed_scores_stateful(stream, horizon_days=horizon_days)
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
        F.col("ts").cast("timestamp"), "event_type"
    )
    df.coalesce(1).write.mode("append").parquet(src)


def test_decay_snapshots_and_timer_driven_reemission(spark):
    src = tempfile.mkdtemp(prefix="dc_src_")
    ckpt = tempfile.mkdtemp(prefix="dc_ck_")
    out = tempfile.mkdtemp(prefix="dc_out_")
    H = 4
    try:
        # run 1: 3 clicks on Jan 1, 1 view on Jan 2. The data batch sees
        # watermark 0 (nothing emits there), but availableNow runs a
        # TRAILING batch after the watermark update (Jan 2 08:00 - 1s),
        # whose expired timers snapshot both types at anchor Jan 1 — the
        # newest COMPLETED day: click 3 events at age 0 -> 3 * 2^4 = 48;
        # view has nothing on Jan 1 -> (0, 0). The still-open Jan 2 day
        # is NOT counted.
        _write(spark, src, [
            Row(ts="2024-01-01 08:00:00", event_type="click"),
            Row(ts="2024-01-01 09:00:00", event_type="click"),
            Row(ts="2024-01-01 10:00:00", event_type="click"),
            Row(ts="2024-01-02 08:00:00", event_type="view"),
        ])
        _run(spark, src, ckpt, out, H)
        emitted = [
            (r.event_type, r.as_of_day, r.n_events, r.decayed_score)
            for r in spark.read.parquet(out).collect()
        ]
        assert emitted.count(("click", "2024-01-01", 3, 48)) == 1
        assert emitted.count(("view", "2024-01-01", 0, 0)) == 1
        assert len(emitted) == 2

        # run 2: one more view row on Jan 2 — merges into state, but the
        # anchor is still Jan 1 (Jan 2 remains open), so NOTHING new
        # emits: each (type, anchor) snapshot is append-once.
        _write(spark, src, [Row(ts="2024-01-02 09:00:00", event_type="view")])
        _run(spark, src, ckpt, out, H)
        assert spark.read.parquet(out).count() == 2

        # run 3: sentinel on Jan 4 -> trailing batch anchors Jan 3. click
        # was idle since run 1 and emits via its EVENT-TIME timer: 3
        # events at age 2 -> 3 * 2^2 = 12; view holds BOTH Jan 2 rows
        # (the run-2 merge) at age 1 -> 2 * 2^3 = 16.
        _write(spark, src, [Row(ts="2024-01-04 12:00:00", event_type="ping")])
        _run(spark, src, ckpt, out, H)
        rows = {
            (r.event_type, r.as_of_day): (r.n_events, r.decayed_score)
            for r in spark.read.parquet(out).collect()
        }
        assert rows[("click", "2024-01-03")] == (3, 12)
        assert rows[("view", "2024-01-03")] == (2, 16)

        # run 4: sentinel on Jan 9 -> anchor Jan 8. click's Jan 1 (age 7)
        # and view's Jan 2 (age 6) buckets are beyond the H=4 horizon —
        # timer-driven snapshots decay to zero; ping's Jan 4 sentinel sits
        # exactly at age 4 -> 1 * 2^0 = 1.
        _write(spark, src, [Row(ts="2024-01-09 12:00:00", event_type="ping")])
        _run(spark, src, ckpt, out, H)
        rows = {
            (r.event_type, r.as_of_day): (r.n_events, r.decayed_score)
            for r in spark.read.parquet(out).collect()
        }
        assert rows[("click", "2024-01-08")] == (0, 0)
        assert rows[("view", "2024-01-08")] == (0, 0)
        assert rows[("ping", "2024-01-08")] == (1, 1)

        # run 5 (ADVICE r5 dead-key removal): click re-appears AFTER its
        # zero snapshot removed its state, while the watermark still sits
        # inside the already-emitted Jan 8 anchor. The fresh-key emission
        # floor must prevent a duplicate (click, 2024-01-08) row — naive
        # re-creation with last_emit=-1 would re-emit it as (0, 0).
        _write(spark, src, [Row(ts="2024-01-09 13:00:00", event_type="click")])
        _run(spark, src, ckpt, out, H)
        emitted = [
            (r.event_type, r.as_of_day)
            for r in spark.read.parquet(out).collect()
        ]
        assert emitted.count(("click", "2024-01-08")) == 1
        # view went dead at run 4: state and timer removed, so no
        # timer-driven zero rows accrue past its final snapshot
        assert max(d for t, d in emitted if t == "view") == "2024-01-08"

        # run 6: the anchor advances to Jan 9 — the re-created click key
        # emits its first post-rebirth snapshot counting the run-5 row
        # (1 event at age 0 -> 2^4 = 16); view stays dead.
        _write(spark, src, [Row(ts="2024-01-10 12:00:00", event_type="click")])
        _run(spark, src, ckpt, out, H)
        rows = {
            (r.event_type, r.as_of_day): (r.n_events, r.decayed_score)
            for r in spark.read.parquet(out).collect()
        }
        assert rows[("click", "2024-01-09")] == (1, 16)
        assert ("view", "2024-01-09") not in rows
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_decay_stream_matches_batch_query(spark):
    """Feed the real events table (sf0.001) through the stream; once the
    watermark passes the end of the corpus's newest day, the snapshot
    anchored on that day must equal the batch events_decayed_type_scores
    rows (same horizon, same anchor)."""
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
    from mapreducer_pi_cs4433_spark.sources.loaders import load_table

    src = tempfile.mkdtemp(prefix="dcp_src_")
    ckpt = tempfile.mkdtemp(prefix="dcp_ck_")
    out = tempfile.mkdtemp(prefix="dcp_out_")
    try:
        ev = load_table(spark, SF_SMOKE, "events").select(
            F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )
        ev.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out, 30)
        # sentinels on the day AFTER the newest event: run 2 pushes the
        # checkpointed watermark past the newest day's end, run 3 fires
        # every type's timer at anchor == the batch corpus's newest day
        mx = ev.agg(F.max("ts").alias("m")).first().m
        nxt = datetime.datetime.combine(
            mx.date() + datetime.timedelta(days=1), datetime.time(12, 0)
        )
        _write(spark, src, [Row(ts=str(nxt), event_type="__sentinel")])
        _run(spark, src, ckpt, out, 30)
        _write(spark, src, [
            Row(ts=str(nxt + datetime.timedelta(seconds=5)),
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, 30)

        anchor = mx.strftime("%Y-%m-%d")
        got = {
            r.event_type: (r.n_events, r.decayed_score)
            for r in spark.read.parquet(out).collect()
            if r.as_of_day == anchor and r.event_type != "__sentinel"
        }
        want = {
            r.event_type: (r.n_events, r.decayed_score)
            for r in QUERIES["events_decayed_type_scores"](
                spark, SF_SMOKE
            ).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
