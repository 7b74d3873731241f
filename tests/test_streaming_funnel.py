"""Streaming twin of events_funnel_windowed.

Pins, via the checkpointed availableNow replay harness:

1. Ordered replay: a user's later-stage event ARRIVING before an
   earlier-stage event still folds in event-time order once final — the
   click is anchored on the view even though the click arrived first
   (an arrival-order fold would discard it).
2. Strict windows: a click outside the 24h window after the first view
   does not convert.
3. Batch parity on real testdata: distinct users per emitted stage equal
   the batch query's n_view / n_click_within / n_purchase_within.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.streaming.funnel import funnel_stateful

from .conftest import SF_SMOKE


def _run(spark, src, ckpt, out, watermark="1 second"):
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(src)
    q = (
        funnel_stateful(stream, watermark=watermark)
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
        F.col("user_id").cast("long"),
        F.col("ts").cast("timestamp"),
        "event_type",
    )
    df.coalesce(1).write.mode("append").parquet(src)


def test_funnel_folds_in_event_time_order_with_strict_windows(spark):
    src = tempfile.mkdtemp(prefix="fn_src_")
    ckpt = tempfile.mkdtemp(prefix="fn_ck_")
    out = tempfile.mkdtemp(prefix="fn_out_")
    try:
        # Watermark delay of 2 days: cross-batch event-time disorder
        # SMALLER than the delay must be repaired by ordered replay (a
        # 1-second delay would instead drop the late view as the
        # watermark passes it — the engine's contract, covered by the
        # late-drop tests elsewhere).
        # run 1: user 2's CLICK arrives before its view; user 1 has a
        # complete in-window funnel; user 3's click is 25h after its view
        # (outside the window). Watermark 0: everything buffers.
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-01 01:00:00", event_type="view"),
            Row(user_id=1, ts="2024-01-01 05:00:00", event_type="click"),
            Row(user_id=1, ts="2024-01-01 06:00:00", event_type="purchase"),
            Row(user_id=2, ts="2024-01-01 05:00:00", event_type="click"),
            Row(user_id=3, ts="2024-01-01 00:00:00", event_type="view"),
            Row(user_id=3, ts="2024-01-02 01:30:00", event_type="click"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")
        # run 2: user 2's earlier VIEW arrives (still before the watermark
        # passes it — nothing for user 2 is final yet), plus a far row
        # that will push the watermark past everything.
        _write(spark, src, [
            Row(user_id=2, ts="2024-01-01 01:00:00", event_type="view"),
            Row(user_id=99, ts="2024-01-05 00:00:00", event_type="view"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")
        # runs 3+4: push the watermark past every data event (2-day delay
        # means the sentinels sit 2+ days out) and trigger the timers.
        _write(spark, src, [
            Row(user_id=99, ts="2024-01-06 00:00:10", event_type="view"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")
        _write(spark, src, [
            Row(user_id=99, ts="2024-01-07 00:00:10", event_type="view"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")

        stages = {
            (r.user_id, r.stage): r.at_s
            for r in spark.read.parquet(out).collect()
        }
        # user 1: full funnel in order
        assert (1, "view") in stages and (1, "click") in stages
        assert (1, "purchase") in stages
        # user 2: the click arrived FIRST but folds after the view —
        # event-time order, so it converts
        assert (2, "view") in stages and (2, "click") in stages
        # user 3: click outside the 24h window — view only
        assert (3, "view") in stages
        assert (3, "click") not in stages
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_funnel_stream_matches_batch_counts(spark):
    """Distinct users per emitted stage must equal the batch
    events_funnel_windowed summary once the watermark passes the corpus."""
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
    from mapreducer_pi_cs4433_spark.sources.loaders import load_table

    src = tempfile.mkdtemp(prefix="fnp_src_")
    ckpt = tempfile.mkdtemp(prefix="fnp_ck_")
    out = tempfile.mkdtemp(prefix="fnp_out_")
    try:
        ev = load_table(spark, SF_SMOKE, "events").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
        )
        ev.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out)
        mx = ev.agg(F.max("ts").alias("m")).first().m
        for off in (1, 2):
            _write(spark, src, [
                Row(user_id=-1,
                    ts=str(mx + datetime.timedelta(seconds=off)),
                    event_type="__sentinel"),
            ])
            _run(spark, src, ckpt, out)

        rows = spark.read.parquet(out).collect()
        got = {"view": set(), "click": set(), "purchase": set()}
        for r in rows:
            got[r.stage].add(r.user_id)
        want = QUERIES["events_funnel_windowed"](spark, SF_SMOKE).first()
        assert len(got["view"]) == want.n_view
        assert len(got["click"]) == want.n_click_within
        assert len(got["purchase"]) == want.n_purchase_within
        # stage sets nest: every converter clicked, every clicker viewed
        assert got["purchase"] <= got["click"] <= got["view"]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_funnel_arbitrary_batch_splits_match_reference(spark):
    """Seeded randomized replay: a random multi-user event stream,
    arriving in event-time order but split at random points across four
    checkpointed runs, must resolve every user's funnel exactly as a
    pure-Python fold of their sorted history — stage anchors and pending
    buffers survive every split boundary. (Seeded RNG over hypothesis:
    each streaming run costs seconds.)"""
    import random

    rng = random.Random(0xF01D)
    base = datetime.datetime(2024, 3, 1)
    events = []
    for _ in range(60):
        events.append((
            base + datetime.timedelta(seconds=rng.randrange(0, 5 * 86400)),
            rng.randrange(1, 9),
            rng.choice(["view", "click", "purchase", "error"]),
        ))
    events.sort()
    splits = sorted(rng.sample(range(1, len(events)), 3))
    chunks = [
        events[i:j] for i, j in zip([0] + splits, splits + [len(events)])
    ]

    src = tempfile.mkdtemp(prefix="fnr_src_")
    ckpt = tempfile.mkdtemp(prefix="fnr_ck_")
    out = tempfile.mkdtemp(prefix="fnr_out_")
    try:
        for chunk in chunks:
            _write(spark, src, [
                Row(user_id=u, ts=str(ts), event_type=k)
                for ts, u, k in chunk
            ])
            _run(spark, src, ckpt, out)
        last = events[-1][0]
        for off in (1, 2):
            _write(spark, src, [
                Row(user_id=-1,
                    ts=str(last + datetime.timedelta(seconds=off)),
                    event_type="view"),
            ])
            _run(spark, src, ckpt, out)

        got = {}
        for r in spark.read.parquet(out).collect():
            if r.user_id != -1:
                got[(r.user_id, r.stage)] = r.at_s

        # pure-Python reference fold per user over sorted history
        W = 86400
        want = {}
        per_user = {}
        for ts, u, k in events:
            per_user.setdefault(u, []).append((int(ts.timestamp()), k))
        for u, evs in per_user.items():
            view = click = None
            purchased = False
            for t, k in sorted(evs):
                if k == "view" and view is None:
                    view = t
                    want[(u, "view")] = t
                elif (k == "click" and click is None and view is not None
                      and view < t <= view + W):
                    click = t
                    want[(u, "click")] = t
                elif (k == "purchase" and not purchased and click is not None
                      and click < t <= click + W):
                    purchased = True
                    want[(u, "purchase")] = t
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
