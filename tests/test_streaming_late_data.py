"""Watermark semantics: a late row arriving after its window finalized
must be DROPPED, not re-aggregated — pinned with a two-run checkpointed
replay (the watermark survives in the checkpoint between runs, which is
what makes the late-drop deterministic; inside a single availableNow run
all files can land in one micro-batch and nothing is late yet)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.streaming.staleness import windowed_rollup


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        windowed_rollup(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_late_row_for_finalized_window_is_dropped(spark):
    src = tempfile.mkdtemp(prefix="late_src_")
    ckpt = tempfile.mkdtemp(prefix="late_ck_")
    out = tempfile.mkdtemp(prefix="late_out_")
    try:
        # run 1: two rows in the 00:00 window, one at 02:30 that advances
        # the watermark to 01:30 > 01:00, finalizing the 00:00 window
        batch1 = spark.createDataFrame(
            [
                Row(ts="2024-01-01 00:10:00", event_type="click", value=1.0),
                Row(ts="2024-01-01 00:20:00", event_type="click", value=1.0),
                Row(ts="2024-01-01 02:30:00", event_type="click", value=1.0),
            ]
        ).select(F.col("ts").cast("timestamp"), "event_type", "value")
        batch1.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out)
        first = {
            (r.hour_bucket, r.n_events)
            for r in spark.read.parquet(out).collect()
        }
        assert ("2024-01-01 00:00:00", 2) in first  # window finalized

        # run 2: a LATE row for the closed 00:00 window plus a row far
        # ahead that finalizes everything still open
        batch2 = spark.createDataFrame(
            [
                Row(ts="2024-01-01 00:30:00", event_type="click", value=1.0),
                Row(ts="2024-01-01 06:00:00", event_type="click", value=1.0),
            ]
        ).select(F.col("ts").cast("timestamp"), "event_type", "value")
        batch2.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out)

        rows = spark.read.parquet(out).collect()
        per_bucket = {}
        for r in rows:
            per_bucket.setdefault(r.hour_bucket, []).append(r.n_events)
        # the 00:00 window was emitted exactly once, with the on-time count
        # only — the late 00:30 row was dropped, never re-emitted
        assert per_bucket["2024-01-01 00:00:00"] == [2]
        # the 02:00 window finalized in run 2 with its single row
        assert per_bucket["2024-01-01 02:00:00"] == [1]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
