"""Multimodal plumbing + Structured Streaming tests.

Streaming operators are driven with a file source + availableNow trigger
and asserted to converge to their batch twins — the strongest correctness
statement available without an unbounded source.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.functions import multimodal
from mapreducer_pi_cs4433_spark.queries.extensions import events_hourly_rollup
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming import staleness

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return multimodal.attach_payload(docs).cache()


def test_attach_payload_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "media_type",
        "n_bytes",
    ]
    r = media.filter(F.col("media_id") == 1).head()
    assert isinstance(r.payload, (bytes, bytearray))
    assert r.n_bytes == len(r.payload)


def test_extract_features_plumbing(media):
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        if r.n_bytes > 0:
            assert 64 <= r.width < 256 and 64 <= r.height < 256
            assert 0 <= r.byte_entropy_q <= 100
    # determinism: same payload -> same fake dims
    again = {r.media_id: (r.width, r.height) for r in feats.collect()}
    first = {r.media_id: (r.width, r.height) for r in rows}
    assert again == first


def test_real_decoder_is_import_gated():
    """Without a codec library decode_image must raise NotImplementedError;
    with PIL installed it must decode real header dimensions. Both sides of
    the gate are covered — whichever this environment has."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    assert multimodal.decode_image(buf.getvalue()) == (17, 9)


def test_sample_frames_bounded(media):
    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=8)
    per_doc = frames.groupBy("media_id").count().agg(F.max("count")).head()[0]
    assert per_doc <= 8
    r = frames.filter(F.col("frame_no") == 0).head()
    assert len(r.frame_bytes) <= 64


def test_streaming_rollup_matches_batch(spark):
    """availableNow file-stream through windowed_rollup must equal the batch
    events_hourly_rollup at the same scale factor."""
    events = load_table(spark, SF_SMOKE, "events")
    tmp = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        events.write.mode("overwrite").parquet(tmp)
        stream = spark.readStream.schema(events.schema).parquet(tmp)
        rolled = staleness.windowed_rollup(stream, watermark="0 seconds")
        q = (
            rolled.writeStream.format("memory")
            .queryName("rollup_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.hour_bucket, r.event_type): (r.n_events, str(r.total_value))
            for r in spark.sql("select * from rollup_test").collect()
        }
        want = {
            (r.hour_bucket, r.event_type): (r.n_events, str(r.total_value))
            for r in events_hourly_rollup(spark, SF_SMOKE).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_last_access_and_staleness(spark):
    """Streaming last_access_state + batch staleness join must reproduce the
    task_g_stale_users batch query."""
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES

    events = load_table(spark, SF_SMOKE, "events")
    customer = load_table(spark, SF_SMOKE, "customer")
    tmp = tempfile.mkdtemp(prefix="stream_src2_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt2_")
    try:
        events.write.mode("overwrite").parquet(tmp)
        stream = spark.readStream.schema(events.schema).parquet(tmp)
        state = staleness.last_access_state(stream, watermark="0 seconds")
        q = (
            state.writeStream.format("memory")
            .queryName("last_state_test")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        state_tbl = spark.sql("select * from last_state_test")
        ref = events.agg(F.max("ts")).head()[0]
        snap = staleness.stale_users_snapshot(
            customer.select("c_custkey", "c_name"), state_tbl, ref, days=14
        )
        got = {r.c_custkey for r in snap.collect()}
        want = {r.c_custkey for r in QUERIES["task_g_stale_users"](spark, SF_SMOKE).collect()}
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
