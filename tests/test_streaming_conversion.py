"""Streaming conversion tests: watermark-gated forward-as-of resolution
must reproduce the batch events_time_to_conversion census on the real
corpus, wait for a NEARER late-arriving purchase before crediting a
lag, censor expired windows, and tag every touch exactly once."""

from __future__ import annotations

import datetime
import shutil
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.conversion import (
    conversion_stateful,
)

from .conftest import SF_SMOKE

_SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"


def _run(spark, src, ckpt, out, watermark="1 second", window_seconds=7 * 86_400):
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        conversion_stateful(
            stream, watermark=watermark, window_seconds=window_seconds
        )
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


def test_conversion_stream_matches_batch_census(spark):
    """The tagged touch stream, aggregated per type, must equal the
    batch census row for row once the watermark passes the corpus PLUS
    a conversion window (censored touches need their whole window
    final), and every touch must be tagged exactly once."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_id", "event_type",
    )
    n_touches = ev.filter(F.col("event_type") != "purchase").count()
    src = tempfile.mkdtemp(prefix="cv_src_")
    ckpt = tempfile.mkdtemp(prefix="cv_ck_")
    out = tempfile.mkdtemp(prefix="cv_out_")
    try:
        ev.coalesce(1).write.mode("append").parquet(src)
        _run(spark, src, ckpt, out)
        mx = ev.agg(F.max("ts").alias("m")).first().m
        # sentinels a window-plus past the corpus: the first finalizes
        # every touch window, the second fires the armed timers
        for days in (8, 9):
            _write(spark, src, [
                Row(user_id=-1,
                    ts=str(mx + datetime.timedelta(days=days)),
                    event_id=-days, event_type="__sentinel"),
            ])
            _run(spark, src, ckpt, out)

        tagged = spark.read.parquet(out)
        # the sentinel user's two __sentinel touches censor too
        assert tagged.filter("user_id >= 0").count() == n_touches
        got = {
            r.event_type: (
                r.n_touches, r.n_converted, r.n_within_1m, r.n_within_1h,
                r.n_within_1d, r.sum_lag_s, r.avg_lag_s,
            )
            for r in tagged.filter("user_id >= 0")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_touches"),
                F.sum("conv").cast("long").alias("n_converted"),
                F.sum(F.when((F.col("conv") == 1) & (F.col("lag_s") < 60), 1)
                      .otherwise(0)).cast("long").alias("n_within_1m"),
                F.sum(F.when((F.col("conv") == 1) & (F.col("lag_s") < 3600), 1)
                      .otherwise(0)).cast("long").alias("n_within_1h"),
                F.sum(F.when((F.col("conv") == 1) & (F.col("lag_s") < 86400), 1)
                      .otherwise(0)).cast("long").alias("n_within_1d"),
                F.sum(F.when(F.col("conv") == 1, F.col("lag_s")).otherwise(0))
                .cast("long").alias("sum_lag_s"),
            )
            .select(
                "event_type", "n_touches", "n_converted", "n_within_1m",
                "n_within_1h", "n_within_1d", "sum_lag_s",
                F.when(F.col("n_converted") == 0,
                       F.lit(None).cast("long"))
                .otherwise(F.expr("sum_lag_s div n_converted"))
                .alias("avg_lag_s"),
            )
            .collect()
        }
        want = {
            r.event_type: (
                r.n_touches, r.n_converted, r.n_within_1m, r.n_within_1h,
                r.n_within_1d, r.sum_lag_s, r.avg_lag_s,
            )
            for r in QUERIES["events_time_to_conversion"](
                spark, SF_SMOKE
            ).collect()
        }
        assert got == want
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_conversion_waits_for_nearer_late_purchase(spark):
    """A touch with a KNOWN purchase in its window must not resolve
    before the watermark passes that purchase: a nearer purchase
    arriving late (event time between touch and the known purchase)
    must win. Also pinned: same-second purchase converts with lag 0,
    and a touch whose window expires with only an out-of-window
    purchase is censored (conv 0, NULL lag)."""
    src = tempfile.mkdtemp(prefix="cv2_src_")
    ckpt = tempfile.mkdtemp(prefix="cv2_ck_")
    out = tempfile.mkdtemp(prefix="cv2_out_")
    try:
        # run 1: user 1's view + a purchase 10h later; user 2's
        # same-second pair; user 3's touch (its 8-days-out purchase
        # arrives in run 2 so the max event time stays at Jan 1 and the
        # 30-day delay keeps run 2's earlier-event-time rows in play)
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-01 00:00:00", event_id=1,
                event_type="view"),
            Row(user_id=1, ts="2024-01-01 10:00:00", event_id=100,
                event_type="purchase"),
            Row(user_id=2, ts="2024-01-01 05:00:00", event_id=2,
                event_type="click"),
            Row(user_id=2, ts="2024-01-01 05:00:00", event_id=200,
                event_type="purchase"),
            Row(user_id=3, ts="2024-01-01 00:00:00", event_id=3,
                event_type="error"),
        ])
        _run(spark, src, ckpt, out, watermark="30 days")
        assert spark.read.schema(
            "user_id long, event_id long, event_type string,"
            " touch_s long, lag_s long, conv int"
        ).parquet(out).count() == 0  # nothing final yet
        # run 2: the NEARER purchase for user 1 arrives late (2h after
        # the view, though the 10h one arrived first), user 3's
        # out-of-window purchase, plus a far sentinel
        _write(spark, src, [
            Row(user_id=1, ts="2024-01-01 02:00:00", event_id=101,
                event_type="purchase"),
            Row(user_id=3, ts="2024-01-09 00:00:00", event_id=300,
                event_type="purchase"),
            Row(user_id=-1, ts="2024-03-01 00:00:00", event_id=-1,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="30 days")
        _write(spark, src, [
            Row(user_id=-1, ts="2024-03-02 00:00:00", event_id=-2,
                event_type="__sentinel"),
        ])
        _run(spark, src, ckpt, out, watermark="30 days")

        got = {
            r.event_id: (r.lag_s, r.conv)
            for r in spark.read.parquet(out).filter("user_id >= 0").collect()
        }
        assert got == {
            1: (7200, 1),   # the late 02:00 purchase wins over 10:00
            2: (0, 1),      # same-second purchase, inclusive, lag 0
            3: (None, 0),   # only purchase is 8d out -> censored
        }
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_purchase_at_watermark_second_survives_prune(spark):
    """The r8 boundary fix: a purchase at second S must SURVIVE the
    state prune once the watermark enters second S (wm_s == floor(wm)
    == S). Spark admits late rows strictly ABOVE the (sub-second)
    watermark (measured: event time == watermark is dropped in 4.1.2),
    so with wm = S + 0.5 a touch at S + 0.6 is still admissible and its
    FLOORED touch second is S — its same-second lag-0 conversion (which
    the batch twin counts, purchases-first tie) needs the purchase at
    second S. The pre-r8 strict `p > wm_s` prune dropped that purchase,
    mis-crediting the touch to a later purchase (lag 5 here) instead
    of lag 0."""
    src = tempfile.mkdtemp(prefix="cv3_src_")
    ckpt = tempfile.mkdtemp(prefix="cv3_ck_")
    out = tempfile.mkdtemp(prefix="cv3_out_")
    try:
        # run 1: the boundary purchase at second 10; the :20.5 row pins
        # max event time so the post-run watermark lands INSIDE second
        # 10 (20.5 - 10s delay = 10.5 -> floored watermark second 10)
        _write(spark, src, [
            Row(user_id=5, ts="2024-01-01 00:00:10", event_id=500,
                event_type="purchase"),
            Row(user_id=9, ts="2024-01-01 00:00:20.500", event_id=900,
                event_type="purchase"),
        ])
        _run(spark, src, ckpt, out, watermark="10 seconds")
        # run 2: another user-5 purchase at :15 — this invokes user 5's
        # update with wm_s == 10 and triggers the prune under test
        # (max event time stays :20.5, so the watermark stays at 10.5)
        _write(spark, src, [
            Row(user_id=5, ts="2024-01-01 00:00:15", event_id=501,
                event_type="purchase"),
        ])
        _run(spark, src, ckpt, out, watermark="10 seconds")
        # run 3: the late touch at 10.6 — above the 10.5 watermark, so
        # admissible, and its floored second (10) must resolve lag-0
        # against the retained second-10 purchase
        _write(spark, src, [
            Row(user_id=5, ts="2024-01-01 00:00:10.600", event_id=51,
                event_type="click"),
        ])
        _run(spark, src, ckpt, out, watermark="10 seconds")
        # sentinels: finalize anything pending + fire armed timers
        for i, ts in enumerate(("2024-03-01 00:00:00",
                                "2024-03-02 00:00:00")):
            _write(spark, src, [
                Row(user_id=-1, ts=ts, event_id=-1 - i,
                    event_type="__sentinel"),
            ])
            _run(spark, src, ckpt, out, watermark="10 seconds")

        got = {
            r.event_id: (r.lag_s, r.conv)
            for r in spark.read.parquet(out).filter("user_id = 5").collect()
        }
        assert got == {51: (0, 1)}
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_censor_waits_past_window_end_second(spark):
    """The r8 self-review boundary fix, mirror image of the purchase
    prune: a touch must NOT censor while the watermark merely ENTERS the
    window-end second (wm_s == s + w) — a late purchase flooring to
    exactly s + w is still admissible and the batch twin counts it
    (lag <= window, inclusive). The pre-fix `wm_s >= s + w` censored at
    the boundary and lost the lag-20 conversion constructed here."""
    src = tempfile.mkdtemp(prefix="cv4_src_")
    ckpt = tempfile.mkdtemp(prefix="cv4_ck_")
    out = tempfile.mkdtemp(prefix="cv4_out_")
    kw = {"watermark": "10 seconds", "window_seconds": 20}
    try:
        # touch at second 100, window 20 -> window end second 120; the
        # :130.5 pin row puts the watermark at 120.5 (wm_s == 120)
        _write(spark, src, [
            Row(user_id=7, ts="2024-01-01 00:01:40", event_id=70,
                event_type="view"),
            Row(user_id=9, ts="2024-01-01 00:02:10.500", event_id=900,
                event_type="purchase"),
        ])
        _run(spark, src, ckpt, out, **kw)
        # run 2: an OUT-of-window user-7 purchase (second 125) invokes
        # the update at wm_s == 120: the pre-fix code censored here
        _write(spark, src, [
            Row(user_id=7, ts="2024-01-01 00:02:05", event_id=701,
                event_type="purchase"),
        ])
        _run(spark, src, ckpt, out, **kw)
        # run 3: the late purchase at 120.7 — above the 120.5 watermark,
        # floors to second 120 == s + w -> in-window, converts lag 20
        _write(spark, src, [
            Row(user_id=7, ts="2024-01-01 00:02:00.700", event_id=702,
                event_type="purchase"),
        ])
        _run(spark, src, ckpt, out, **kw)
        for i, ts in enumerate(("2024-03-01 00:00:00",
                                "2024-03-02 00:00:00")):
            _write(spark, src, [
                Row(user_id=-1, ts=ts, event_id=-1 - i,
                    event_type="__sentinel"),
            ])
            _run(spark, src, ckpt, out, **kw)
        got = {
            r.event_id: (r.lag_s, r.conv)
            for r in spark.read.parquet(out).filter("user_id = 7").collect()
        }
        assert got == {70: (20, 1)}
    finally:
        for d in (src, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)
