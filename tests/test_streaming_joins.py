"""Stream-stream interval join: bounded replay must equal the batch join."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.joins import interval_join_streams

from .conftest import SF_SMOKE

_SPAN_S = 3600


def _sides(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return clicks, errors


def test_interval_join_stream_equals_batch_join(spark):
    clicks, errors = _sides(spark)
    # batch truth: same key + |Δt| <= span condition, directly
    e = errors.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    batch = (
        clicks.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (
                F.abs(F.unix_micros("ts") - F.unix_micros("e_ts"))
                <= _SPAN_S * 1_000_000
            ),
        )
        .select("event_id", "e_id")
        .collect()
    )
    expected = {(r.event_id, r.e_id) for r in batch}
    assert expected, "calibration: the replay must produce at least one pair"

    src_c = tempfile.mkdtemp(prefix="sij_c_")
    src_e = tempfile.mkdtemp(prefix="sij_e_")
    ckpt = tempfile.mkdtemp(prefix="sij_ck_")
    try:
        clicks.write.mode("overwrite").parquet(src_c)
        errors.write.mode("overwrite").parquet(src_e)
        sc = spark.readStream.schema(clicks.schema).parquet(src_c)
        se = spark.readStream.schema(errors.schema).parquet(src_e)
        # generous watermark: nothing in the replay is late, so the
        # streaming result must be EXACTLY the batch join
        joined = interval_join_streams(
            sc,
            se,
            key="user_id",
            span_seconds=_SPAN_S,
            watermark="36500 days",
        )
        q = (
            joined.select("event_id", F.col("r_event_id").alias("e_id"))
            .writeStream.format("memory")
            .queryName("sij")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.event_id, r.e_id)
            for r in spark.sql("select * from sij").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(src_c, ignore_errors=True)
        shutil.rmtree(src_e, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_static_enrichment_join(spark):
    """Stream-static join — dimension enrichment on a moving fact stream:
    the static side needs NO watermark and holds no state (it is re-read /
    broadcast per micro-batch), so this is the zero-state way to decorate
    events with dimension attributes. Result must equal the batch join."""
    from mapreducer_pi_cs4433_spark.sources.loaders import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    customers = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        ev.join(customers, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    expected = {(r.c_mktsegment, r.n) for r in batch}
    assert expected

    src = tempfile.mkdtemp(prefix="ss_src_")
    ckpt = tempfile.mkdtemp(prefix="ss_ck_")
    try:
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        joined = stream.join(F.broadcast(customers), "user_id")
        q = (
            joined.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName("ss_join")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.c_mktsegment, r.n)
            for r in spark.sql("select * from ss_join").collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_interval_join_plan_has_bounded_state_condition(spark):
    """The streaming plan must carry the event-time range in the join
    condition (that is what lets the engine evict join state); a bare
    equi-join would be unbounded-state."""
    clicks, errors = _sides(spark)
    src_c = tempfile.mkdtemp(prefix="sijp_c_")
    src_e = tempfile.mkdtemp(prefix="sijp_e_")
    try:
        clicks.limit(1).write.mode("overwrite").parquet(src_c)
        errors.limit(1).write.mode("overwrite").parquet(src_e)
        sc = spark.readStream.schema(clicks.schema).parquet(src_c)
        se = spark.readStream.schema(errors.schema).parquet(src_e)
        joined = interval_join_streams(
            sc, se, key="user_id", span_seconds=60, watermark="10 minutes"
        )
        assert joined.isStreaming
        plan = joined._jdf.queryExecution().analyzed().toString()
        assert "watermark" in plan.lower()
    finally:
        shutil.rmtree(src_c, ignore_errors=True)
        shutil.rmtree(src_e, ignore_errors=True)
