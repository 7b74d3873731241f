"""Streaming attribution tests: watermark-gated last-touch resolution
must reproduce the batch events_attribution_last_touch census on the
real corpus, wait for late-arriving touches before crediting, apply the
lookback and the equal-second tie exactly as the batch kernel, and keep
state pruned to the as-of minimum."""

from __future__ import annotations

import datetime
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.attribution import (
    attribution_stateful,
)

from .conftest import SF_SMOKE

_SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"


def _run(spark, src, ckpt, out, watermark="1 second"):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        attribution_stateful(stream, watermark=watermark)
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
        F.col("event_id").cast("long"),
        "event_type",
    )
    df.coalesce(1).write.mode("append").parquet(src)


def test_attribution_stream_matches_batch_census(spark):
    """The tagged purchase stream, aggregated per channel, must equal the
    batch census row for row once the watermark passes the corpus, and
    every purchase must be tagged exactly once."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "event_type",
    )
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    src = tempfile.mkdtemp(prefix="at_src_")
    ckpt = tempfile.mkdtemp(prefix="at_ck_")
    out = tempfile.mkdtemp(prefix="at_out_")
    try:
        ev.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out)
        mx = ev.agg(F.max("ts").alias("m")).first().m
        # two sentinel runs: the first advances the watermark past the
        # corpus, the second fires the event-time timers it armed
        for off in (1, 2):
            _write(spark, src, [
                Row(user_id=-1,
                    ts=str(mx + datetime.timedelta(seconds=off)),
                    event_id=-off, event_type="__sentinel"),
            ])
            _run(spark, src, ckpt, out)

        tagged = spark.read.parquet(out)
        assert tagged.count() == n_purchases  # exactly-once tagging
        got = {
            r.channel: (r.n_purchases, r.n_users)
            for r in tagged.groupBy("channel")
            .agg(
                F.count("*").alias("n_purchases"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
            .collect()
        }
        want = {
            r.channel: (r.n_purchases, r.n_users)
            for r in QUERIES["events_attribution_last_touch"](
                spark, SF_SMOKE
            ).collect()
        }
        assert got == want
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_attribution_waits_for_late_touch(spark):
    """A purchase must not resolve before the watermark passes it: the
    touch it ultimately credits arrives in a LATER run (event-time
    disorder within the watermark delay). Also pinned here: the lookback
    sends a 19-day-old latest touch to 'none', and the equal-second tie
    credits the lexicographic-max channel at the purchase's own second
    (at-or-before is inclusive)."""
    src = tempfile.mkdtemp(prefix="at2_src_")
    ckpt = tempfile.mkdtemp(prefix="at2_ck_")
    out = tempfile.mkdtemp(prefix="at2_out_")
    try:
        # run 1: user 1's purchase + an old view; user 2's ancient touch;
        # user 3's same-second pair. Max event time stays at Jan 2, so
        # run 2's late click (Jan 2 09:00) is inside the 2-day delay.
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-01 00:00:00", event_id=1,
                event_type="view"),
            Row(user_id=1, ts="2024-01-02 10:00:00", event_id=100,
                event_type="purchase"),
            Row(user_id=2, ts="2024-01-01 00:00:00", event_id=2,
                event_type="view"),
            Row(user_id=3, ts="2024-01-02 08:00:00", event_id=3,
                event_type="click"),
            Row(user_id=3, ts="2024-01-02 08:00:00", event_id=4,
                event_type="view"),
            Row(user_id=3, ts="2024-01-02 08:00:00", event_id=300,
                event_type="purchase"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")
        # nothing final yet (watermark trails the max event by 2 days)
        assert spark.read.schema(
            "user_id long, event_id long, purchase_s long, channel string"
        ).parquet(out).count() == 0
        # run 2: user 1's TRUE last touch arrives late (event time
        # between the view and the purchase), user 2's out-of-lookback
        # purchase, plus a far sentinel
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-02 09:00:00", event_id=5,
                event_type="click"),
            Row(user_id=2, ts="2024-01-20 00:00:00", event_id=200,
                event_type="purchase"),
            Row(user_id=-1, ts="2024-01-25 00:00:00", event_id=-1,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")
        # run 3: fire the timers the sentinel's watermark armed
        _write(spark, src, [
            Row(user_id=-1, ts="2024-01-26 00:00:00", event_id=-2,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="2 days")

        got = {
            r.event_id: r.channel for r in spark.read.parquet(out).collect()
        }
        assert got == {
            100: "click",  # the late-arriving touch wins, not the view
            200: "none",   # latest touch 19 days back -> out of lookback
            300: "view",   # same-second tie: max("click","view"), inclusive
        }
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_attribution_under_rocksdb_matches_batch(spark):
    """The attribution machine on the RocksDB state provider: identical
    per-channel census, and the progress metrics must prove RocksDB
    actually backed the state (the CDC/SCD2 matrix, extended)."""
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
    from mapreducer_pi_cs4433_spark.session import (
        ROCKSDB_PROVIDER,
        enable_rocksdb_state,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "event_type",
    )
    src = tempfile.mkdtemp(prefix="rat_src_")
    ckpt = tempfile.mkdtemp(prefix="rat_ck_")
    out = tempfile.mkdtemp(prefix="rat_out_")
    try:
        enable_rocksdb_state(spark)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        ev.coalesce(1).write.mode("append").parquet(src)
        saw_rocksdb = []

        def _run_q():
            stream = spark.readStream.schema(_SCHEMA).parquet(src)
            q = (
                attribution_stateful(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            ops = (q.recentProgress or [{}])[-1].get("stateOperators") or []
            saw_rocksdb.append(any(
                "rocksdb" in k.lower()
                for op in ops
                for k in (op.get("customMetrics") or {})
            ))

        _run_q()
        mx = ev.agg(F.max("ts").alias("m")).first().m
        for off in (1, 2):
            _write(spark, src, [
                Row(user_id=-1,
                    ts=str(mx + datetime.timedelta(seconds=off)),
                    event_id=-off, event_type="__sentinel"),
            ])
            _run_q()
        assert any(saw_rocksdb), "state operator did not run on RocksDB"
        got = {
            r.channel: (r.n_purchases, r.n_users)
            for r in spark.read.parquet(out)
            .groupBy("channel")
            .agg(
                F.count("*").alias("n_purchases"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
            )
            .collect()
        }
        want = {
            r.channel: (r.n_purchases, r.n_users)
            for r in QUERIES["events_attribution_last_touch"](
                spark, SF_SMOKE
            ).collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_attribution_arbitrary_arrival_matches_reference(spark):
    """Seeded randomized replay: a multi-user event stream arriving in
    FULLY RANDOM order (disorder bounded only by the generous watermark),
    split at random points across four checkpointed runs, must resolve
    every purchase exactly as the event-time Python fold — per-second
    max-channel collapse, inclusive at-or-before, lookback to 'none'.
    (Seeded RNG over hypothesis: each streaming run costs seconds.)"""
    import random

    rng = random.Random(0xA77B)
    base = datetime.datetime(2024, 3, 1)
    events = []
    for eid in range(60):
        events.append((
            eid,
            rng.randrange(1, 6),
            rng.randrange(0, 9 * 86400),  # spans past the 7d lookback
            rng.choice(["view", "click", "purchase", "error"]),
        ))
    rng.shuffle(events)  # arrival order independent of event time
    splits = sorted(rng.sample(range(1, len(events)), 3))
    chunks = [
        events[i:j] for i, j in zip([0] + splits, splits + [len(events)])
    ]

    src = tempfile.mkdtemp(prefix="atr_src_")
    ckpt = tempfile.mkdtemp(prefix="atr_ck_")
    out = tempfile.mkdtemp(prefix="atr_out_")
    try:
        for chunk in chunks:
            _write(spark, src, [
                Row(user_id=u,
                    ts=str(base + datetime.timedelta(seconds=off)),
                    event_id=eid, event_type=et)
                for eid, u, off, et in chunk
            ])
            _run(spark, src, ckpt, out, watermark="30 days")
        for day in (45, 46):  # push the watermark past all data + timers
            _write(spark, src, [
                Row(user_id=-1,
                    ts=str(base + datetime.timedelta(days=day)),
                    event_id=-day, event_type="__sentinel"),
            ])
            _run(spark, src, ckpt, out, watermark="30 days")

        got = {
            r.event_id: (r.purchase_s, r.channel)
            for r in spark.read.parquet(out).collect()
        }
        # event-time Python fold (the batch kernel's semantics)
        touches: dict = {}
        for _eid, u, off, et in events:
            if et != "purchase":
                k = (u, off)
                touches[k] = et if k not in touches else max(touches[k], et)
        want = {}
        offs = {}
        for eid, u, off, et in events:
            if et != "purchase":
                continue
            cand = [
                (toff, ch) for (tu, toff), ch in touches.items()
                if tu == u and toff <= off
            ]
            ch = "none"
            if cand:
                toff, c = max(cand)
                if off - toff <= 7 * 86400:
                    ch = c
            want[eid] = ch
            offs[eid] = off
        assert {e: c for e, (_, c) in got.items()} == want
        # purchase timestamps: compare relative to one anchor purchase
        # (absolute epoch depends on the session timezone)
        a0 = min(want)
        assert {e: s - got[a0][0] for e, (s, _) in got.items()} == {
            e: o - offs[a0] for e, o in offs.items()
        }
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_attribution_state_prunes_to_asof_minimum(spark):
    """After the watermark passes a run of touches, state must keep only
    the LATEST final touch (plus pending purchases): a later purchase
    still credits it, proving older touches were safely dropped — and the
    state store never grows with history."""
    src = tempfile.mkdtemp(prefix="at3_src_")
    ckpt = tempfile.mkdtemp(prefix="at3_ck_")
    out = tempfile.mkdtemp(prefix="at3_out_")
    try:
        # run 1: three touches, newest is the click at 03:00
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-01 01:00:00", event_id=1,
                event_type="view"),
            Row(user_id=1, ts="2024-01-01 02:00:00", event_id=2,
                event_type="error"),
            Row(user_id=1, ts="2024-01-01 03:00:00", event_id=3,
                event_type="click"),
        ])
        _run(spark, src, ckpt, out, watermark="1 second")
        # run 2: a sentinel makes every touch final -> prune to the click
        _write(spark, src, [
            Row(user_id=-1, ts="2024-01-02 00:00:00", event_id=-1,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="1 second")
        # run 3: a purchase AFTER the pruned history must still credit
        # the surviving latest touch
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-02 12:00:00", event_id=100,
                event_type="purchase"),
            Row(user_id=-1, ts="2024-01-03 00:00:00", event_id=-2,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="1 second")
        _write(spark, src, [
            Row(user_id=-1, ts="2024-01-04 00:00:00", event_id=-3,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="1 second")

        got = {
            r.event_id: r.channel for r in spark.read.parquet(out).collect()
        }
        assert got == {100: "click"}
        # the pruned state is observable via the checkpoint's state store:
        # exactly one touch row survives for user 1
        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select("key.user_id", "value.groupState.touch_s")
            .where("key.user_id = 1")
            .collect()
        )
        assert [len(r.touch_s) for r in state] == [1]
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)
