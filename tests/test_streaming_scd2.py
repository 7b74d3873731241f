"""Streaming SCD2 tests: closed-interval parity with the batch history
builder on the real events table, and convergence under shuffled arrival
with arbitrary micro-batch splits."""

from __future__ import annotations

import datetime
import random
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.scd2 import scd2_history_stream

from .conftest import SF_SMOKE

_SENTINEL_USER = -1


def _run(spark, src, ckpt, out, schema, watermark):
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        scd2_history_stream(stream, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_scd2_stream_matches_batch_closed_intervals(spark):
    """Time-ordered replay of the real events table (4 chunk files + a
    watermark-flushing sentinel) must emit exactly the batch history's
    CLOSED intervals (is_current = 0), column for column."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = events.orderBy("ts", "event_id").collect()
    quarters = [rows[j * len(rows) // 4:(j + 1) * len(rows) // 4]
                for j in range(4)]
    max_ts = rows[-1].ts
    src = tempfile.mkdtemp(prefix="scd2_src_")
    ckpt = tempfile.mkdtemp(prefix="scd2_ck_")
    out = tempfile.mkdtemp(prefix="scd2_out_")
    try:
        schema = events.schema
        for chunk in quarters:
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            _run(spark, src, ckpt, out, schema, "1 second")
        # sentinel pushes the watermark past every real event
        for off in (3600, 7200):
            spark.createDataFrame(
                [Row(user_id=_SENTINEL_USER,
                     ts=max_ts + datetime.timedelta(seconds=off),
                     event_id=10**9 + off, event_type="view")],
                schema,
            ).coalesce(1).write.mode("append").parquet(src)
            _run(spark, src, ckpt, out, schema, "1 second")

        got = {
            (r.user_id, r.version): (r.state, r.valid_from_s, r.valid_to_s,
                                     r.n_events)
            for r in spark.read.parquet(out).collect()
            if r.user_id != _SENTINEL_USER
        }
        batch = QUERIES["scd2_user_type_history"](spark, SF_SMOKE)
        closed = batch.filter(F.col("is_current") == 0).select(
            "user_id",
            "version",
            "state",
            F.unix_timestamp("valid_from").alias("vf_s"),
            F.unix_timestamp("valid_to").alias("vt_s"),
            "n_events",
        )
        want = {
            (r.user_id, r.version): (r.state, r.vf_s, r.vt_s, r.n_events)
            for r in closed.collect()
        }
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_scd2_stream_shuffled_arrival_within_watermark(spark):
    """Seeded randomized replay: a change log arriving shuffled WITHIN
    time-ordered chunks (disorder bounded by the watermark) and split at
    random points must converge to the same closed intervals as a
    pure-Python fold over the (ts, event_id) order."""
    rng = random.Random(0x5CD2)
    base = datetime.datetime(2024, 5, 1)
    changes = []
    for eid in range(120):
        changes.append(Row(
            user_id=rng.randrange(1, 7),
            ts=base + datetime.timedelta(seconds=rng.randrange(0, 4 * 86400)),
            event_id=eid,
            event_type=rng.choice(["a", "b", "c"]),
        ))
    changes.sort(key=lambda c: (c.ts, c.event_id))
    day = [c for c in changes]
    chunks = [
        [c for c in day if i * 86400 <= (c.ts - base).total_seconds() < (i + 1) * 86400]
        for i in range(4)
    ]
    for ch in chunks:
        rng.shuffle(ch)  # arrival disorder inside each day-chunk

    src = tempfile.mkdtemp(prefix="scd2r_src_")
    ckpt = tempfile.mkdtemp(prefix="scd2r_ck_")
    out = tempfile.mkdtemp(prefix="scd2r_out_")
    try:
        schema = "user_id long, ts timestamp, event_id long, event_type string"
        for ch in [c for c in chunks if c]:
            spark.createDataFrame(ch, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            _run(spark, src, ckpt, out, schema, "2 days")
        last = max(c.ts for c in changes)
        for off in (3, 6):
            spark.createDataFrame(
                [Row(user_id=_SENTINEL_USER,
                     ts=last + datetime.timedelta(days=off),
                     event_id=10**9 + off, event_type="a")],
                schema,
            ).coalesce(1).write.mode("append").parquet(src)
            _run(spark, src, ckpt, out, schema, "2 days")

        got = {
            (r.user_id, r.version): (r.state, r.valid_from_s, r.valid_to_s,
                                     r.n_events)
            for r in spark.read.parquet(out).collect()
            if r.user_id != _SENTINEL_USER
        }

        want = {}
        per_key = {}
        for c in changes:
            per_key.setdefault(c.user_id, []).append(c)
        for uid, evs in per_key.items():
            evs.sort(key=lambda c: (c.ts, c.event_id))
            ver, cur, vf, n = 0, None, None, 0
            for c in evs:
                if cur is None:
                    ver, cur, vf, n = 1, c.event_type, c.ts, 1
                elif c.event_type == cur:
                    n += 1
                else:
                    want[(uid, ver)] = (
                        cur, int(vf.timestamp()), int(c.ts.timestamp()), n
                    )
                    ver, cur, vf, n = ver + 1, c.event_type, c.ts, 1
            # the final open run is never emitted by the stream
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_scd2_stream_under_rocksdb(spark):
    """The SCD2 interval closer on the RocksDB state provider: identical
    closed intervals, with progress metrics proving RocksDB backed the
    stateful operator."""
    from mapreducer_pi_cs4433_spark.session import (
        ROCKSDB_PROVIDER,
        enable_rocksdb_state,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = events.orderBy("ts", "event_id").collect()
    max_ts = rows[-1].ts
    src = tempfile.mkdtemp(prefix="rscd2_src_")
    ckpt = tempfile.mkdtemp(prefix="rscd2_ck_")
    out = tempfile.mkdtemp(prefix="rscd2_out_")
    try:
        enable_rocksdb_state(spark)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        schema = events.schema
        half = len(rows) // 2
        for chunk in (rows[:half], rows[half:]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            _run(spark, src, ckpt, out, schema, "1 second")
        for off in (3600, 7200):
            spark.createDataFrame(
                [Row(user_id=_SENTINEL_USER,
                     ts=max_ts + datetime.timedelta(seconds=off),
                     event_id=10**9 + off, event_type="view")],
                schema,
            ).coalesce(1).write.mode("append").parquet(src)
            _run(spark, src, ckpt, out, schema, "1 second")

        got = {
            (r.user_id, r.version): (r.state, r.valid_from_s, r.valid_to_s,
                                     r.n_events)
            for r in spark.read.parquet(out).collect()
            if r.user_id != _SENTINEL_USER
        }
        batch = QUERIES["scd2_user_type_history"](spark, SF_SMOKE)
        closed = batch.filter(F.col("is_current") == 0).select(
            "user_id", "version", "state",
            F.unix_timestamp("valid_from").alias("vf_s"),
            F.unix_timestamp("valid_to").alias("vt_s"),
            "n_events",
        )
        want = {
            (r.user_id, r.version): (r.state, r.vf_s, r.vt_s, r.n_events)
            for r in closed.collect()
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
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
