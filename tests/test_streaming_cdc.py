"""Streaming CDC (change-log -> latest state) tests: batch parity on the
real events table, and split-invariant convergence — the snapshot after a
checkpointed replay must be identical no matter where micro-batch
boundaries fall or how arrival order is shuffled (within the watermark)."""

from __future__ import annotations

import datetime
import random
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.cdc import cdc_latest_state_stream

from .conftest import SF_SMOKE


def _collect_final_state(spark, src, ckpt, out, schema, runs):
    """Replay `runs` (lists of Rows) through checkpointed availableNow
    passes; foreachBatch tags every update with its monotonic batch_id so
    the final snapshot is, per key, the row from the highest batch."""

    def _sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    for rows in runs:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            cdc_latest_state_stream(stream, watermark="365 days")
            .writeStream.outputMode("update")
            .foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    state = {}
    rows = spark.read.parquet(out).collect()
    for r in sorted(rows, key=lambda r: r.batch_id):
        state[r.user_id] = (
            r.last_ts, r.last_type, r.last_value_centi, r.n_changes, r.first_ts
        )
    return state


def test_cdc_stream_matches_batch_snapshot(spark):
    """One availableNow pass over the real events table must emit exactly
    the batch cdc_latest_state result (same keys, same payload)."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = tempfile.mkdtemp(prefix="cdc_src_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ck_")
    try:
        events.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            cdc_latest_state_stream(stream, watermark="365 days")
            .writeStream.format("memory")
            .queryName("cdc_parity")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r.user_id: (r.last_ts, r.last_type, r.last_value_centi,
                        r.n_changes, r.first_ts)
            for r in spark.sql("select * from cdc_parity").collect()
        }
        want = {
            r.user_id: (r.last_ts, r.last_type, r.last_value_centi,
                        r.n_changes, r.first_ts)
            for r in QUERIES["cdc_latest_state"](spark, SF_SMOKE).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_cdc_stream_split_and_order_invariant(spark):
    """Seeded randomized replay: a shuffled-arrival change log split at
    random points across four checkpointed runs must converge to the same
    snapshot as a pure-Python fold over the version order (ts, event_id)
    — compaction state survives every split boundary, and arrival order
    never influences the winner."""
    rng = random.Random(0xCDC6)
    base = datetime.datetime(2024, 3, 1)
    changes = []
    for eid in range(80):
        changes.append(Row(
            user_id=rng.randrange(1, 11),
            ts=base + datetime.timedelta(seconds=rng.randrange(0, 4 * 86400)),
            event_id=eid,
            event_type=rng.choice(["view", "click", "purchase"]),
            value=round(rng.uniform(0, 50), 2),
        ))
    arrival = changes[:]
    rng.shuffle(arrival)  # arrival order != event-time order
    splits = sorted(rng.sample(range(1, len(arrival)), 3))
    runs = [
        arrival[i:j] for i, j in zip([0] + splits, splits + [len(arrival)])
    ]

    src = tempfile.mkdtemp(prefix="cdcr_src_")
    ckpt = tempfile.mkdtemp(prefix="cdcr_ck_")
    out = tempfile.mkdtemp(prefix="cdcr_out_")
    try:
        schema = "user_id long, ts timestamp, event_id long, event_type string, value double"
        got = _collect_final_state(spark, src, ckpt, out, schema, runs)

        want = {}
        per_key = {}
        for c in changes:
            per_key.setdefault(c.user_id, []).append(c)
        for uid, evs in per_key.items():
            evs.sort(key=lambda c: (c.ts, c.event_id))
            last, first = evs[-1], evs[0]
            want[uid] = (
                last.ts.strftime("%Y-%m-%d %H:%M:%S"),
                last.event_type,
                int(round(last.value * 100)),
                len(evs),
                first.ts.strftime("%Y-%m-%d %H:%M:%S"),
            )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def test_cdc_stream_under_rocksdb(spark):
    """The CDC compaction on the RocksDB state provider: identical
    snapshot, and the progress metrics must prove RocksDB actually backed
    the aggregation state."""
    from mapreducer_pi_cs4433_spark.session import (
        ROCKSDB_PROVIDER,
        enable_rocksdb_state,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = tempfile.mkdtemp(prefix="rcdc_src_")
    ckpt = tempfile.mkdtemp(prefix="rcdc_ck_")
    try:
        enable_rocksdb_state(spark)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        events.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            cdc_latest_state_stream(stream, watermark="365 days")
            .writeStream.format("memory")
            .queryName("rcdc")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        ops = (q.recentProgress or [{}])[-1].get("stateOperators") or []
        assert any(
            "rocksdb" in k.lower()
            for op in ops
            for k in (op.get("customMetrics") or {})
        ), "state operator did not run on RocksDB"
        got = {
            r.user_id: (r.last_ts, r.last_type, r.last_value_centi,
                        r.n_changes, r.first_ts)
            for r in spark.sql("select * from rcdc").collect()
        }
        want = {
            r.user_id: (r.last_ts, r.last_type, r.last_value_centi,
                        r.n_changes, r.first_ts)
            for r in QUERIES["cdc_latest_state"](spark, SF_SMOKE).collect()
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
