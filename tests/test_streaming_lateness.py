"""Streaming lateness tagger tests: an id-ordered chunked replay of the
real events table must reproduce the batch late-arrival census exactly,
no matter where micro-batch boundaries fall; state survives checkpointed
restarts (running max carries across runs)."""

from __future__ import annotations

import shutil
import tempfile

from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.lateness import late_arrival_tagger

from .conftest import SF_SMOKE


def _replay(spark, chunks, schema, src, ckpt, out):
    for rows in chunks:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            late_arrival_tagger(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    return spark.read.parquet(out)


def test_lateness_stream_matches_batch_census(spark):
    """Three id-ordered chunks (arrival order == event_id order, split at
    arbitrary points) -> aggregating the tagged stream must equal the
    batch events_late_arrival_census row for row, and every event must be
    tagged exactly once."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = sorted(events.collect(), key=lambda r: r.event_id)
    n = len(rows)
    chunks = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
    src = tempfile.mkdtemp(prefix="lt_src_")
    ckpt = tempfile.mkdtemp(prefix="lt_ck_")
    out = tempfile.mkdtemp(prefix="lt_out_")
    try:
        tagged = _replay(spark, chunks, events.schema, src, ckpt, out)
        assert tagged.count() == n  # exactly-once tagging
        got = {
            (r.event_type, r.lateness): (r.n_events, r.max_late_s)
            for r in tagged.groupBy("event_type", "lateness")
            .agg(
                {"late_s": "max", "*": "count"}
            )
            .withColumnRenamed("count(1)", "n_events")
            .withColumnRenamed("max(late_s)", "max_late_s")
            .collect()
        }
        want = {
            (r.event_type, r.lateness): (r.n_events, r.max_late_s)
            for r in QUERIES["events_late_arrival_census"](
                spark, SF_SMOKE
            ).collect()
        }
        assert got == want
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_lateness_state_survives_restart(spark):
    """A user's running max must carry across checkpointed runs: an event
    in run 2 older than run 1's max is tagged late even though run 2's
    batch saw nothing newer."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    run1 = [(1, base + datetime.timedelta(hours=2), 10, "view")]
    run2 = [(1, base, 11, "click")]  # 7200s (2h) behind the carried max
    src = tempfile.mkdtemp(prefix="lt2_src_")
    ckpt = tempfile.mkdtemp(prefix="lt2_ck_")
    out = tempfile.mkdtemp(prefix="lt2_out_")
    try:
        tagged = _replay(spark, [run1, run2], schema, src, ckpt, out)
        got = {r.event_id: (r.late_s, r.lateness) for r in tagged.collect()}
        assert got == {10: (0, "a_in_order"), 11: (7200, "d_under_1d")}
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)
