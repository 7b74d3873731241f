"""Streaming image near-dup ingest tests: a chunked replay of the image
corpus must emit EXACTLY the batch operator's pair set
(image_ahash_neardup — same decode, same integer aHash, same equality
semantics); crash-replay is idempotent; the payload digest layer
suppresses byte-identical re-arrivals before any pixel math; the shared
part-store protocol (compaction, lineage) holds on this second store
layout."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.functions import multimodal
from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming import imagedup, partstore

from .conftest import SF_SMOKE

_BASE_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _media_rows(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    media = multimodal.synthesize_ppm_corpus(docs)
    return sorted(media.collect(), key=lambda r: r.media_id)


def _chunks(rows):
    """media_id % 3 interleave: every planted group of 4 consecutive ids
    spans chunk boundaries, so cross-batch matching is exercised."""
    return [[r for r in rows if r.media_id % 3 == i] for i in range(3)]


def _write_chunk(spark, src, chunk, hour):
    ts = _BASE_TS + datetime.timedelta(hours=hour)
    spark.createDataFrame(
        [Row(media_id=r.media_id, payload=bytes(r.payload)) for r in chunk]
    ).withColumn("ts", F.lit(ts).cast("timestamp")).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _batch_pairs(spark):
    return {
        (r.id_a, r.id_b, r.ahash_hi, r.ahash_lo)
        for r in QUERIES["image_ahash_neardup"](spark, SF_SMOKE).collect()
    }


def test_image_ingest_replay_matches_batch(spark):
    """Three-chunk replay with auto-compaction ON -> the emitted pair
    union equals the batch operator bit-for-bit (ids AND both hash
    halves), pairs span chunk boundaries, and the store compacted."""
    rows = _media_rows(spark)
    src = tempfile.mkdtemp(prefix="img_src_")
    ckpt = tempfile.mkdtemp(prefix="img_ck_")
    state = tempfile.mkdtemp(prefix="img_state_")
    try:
        for i, chunk in enumerate(_chunks(rows)):
            _write_chunk(spark, src, chunk, hour=i)
            stream = spark.readStream.schema(
                "media_id long, payload binary, ts timestamp"
            ).option("maxFilesPerTrigger", 1).parquet(src)
            q = imagedup.image_ingest_stream(
                stream, state, ckpt, compact_every=1
            )
            q.awaitTermination(300)
        got = {
            (r.id_a, r.id_b, r.ahash_hi, r.ahash_lo)
            for r in imagedup.read_emitted_pairs(spark, state).collect()
        }
        want = _batch_pairs(spark)
        assert got == want
        assert got  # planted groups guarantee pairs; empty == broken
        assert any(a % 3 != b % 3 for a, b, _, _ in got)
        # auto-compaction engaged on this two-kind layout
        assert partstore.compacted_hi(state, "hashes") >= 0
        assert partstore.compacted_hi(state, "pairs") >= 0
    finally:
        for d in (src, ckpt, state):
            shutil.rmtree(d, ignore_errors=True)


def test_image_batch_replay_idempotent_and_lineage_guarded(spark):
    """Crash-replay of the LAST batch rewrites identical state; an id
    below the newest committed batch raises (foreign checkpoint
    lineage) — the shared protocol on the image store."""
    rows = _media_rows(spark)
    chunks = _chunks(rows)
    state = tempfile.mkdtemp(prefix="imgi_state_")
    try:
        dfs = [
            spark.createDataFrame(
                [Row(media_id=r.media_id, payload=bytes(r.payload)) for r in c]
            )
            for c in chunks[:2]
        ]
        imagedup.match_and_register_batch(spark, dfs[0], state, batch_id=0)
        imagedup.match_and_register_batch(spark, dfs[1], state, batch_id=1)
        first = {
            tuple(r)
            for r in imagedup.read_emitted_pairs(spark, state).collect()
        }
        imagedup.match_and_register_batch(spark, dfs[1], state, batch_id=1)
        second = {
            tuple(r)
            for r in imagedup.read_emitted_pairs(spark, state).collect()
        }
        assert first == second
        with pytest.raises(ValueError, match="checkpoint lineage"):
            imagedup.match_and_register_batch(spark, dfs[0], state, batch_id=0)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_image_digest_layer_and_id_guards(spark):
    """A byte-identical re-arrival under a NEW id inside the watermark
    horizon is dropped by the digest layer (it would otherwise pair at
    hash distance 0 with its twin); a committed id re-sent with CHANGED
    bytes is dropped by the first-writer-wins guard (one hash row per
    id, forever); within one batch a duplicated id registers exactly
    one deterministically-chosen payload."""
    rows = _media_rows(spark)
    chunks = _chunks(rows)
    twin = rows[0]
    src = tempfile.mkdtemp(prefix="imgd_src_")
    ckpt = tempfile.mkdtemp(prefix="imgd_ck_")
    state = tempfile.mkdtemp(prefix="imgd_state_")
    try:
        # chunk 1 carries: a byte-identical twin under a new id, the
        # committed id 0 re-sent with changed bytes, and a within-batch
        # duplicate id pair
        other = bytes(chunks[1][0].payload)
        extra = [
            Row(media_id=999_999, payload=bytes(twin.payload)),
            Row(media_id=int(twin.media_id), payload=other),
        ]
        for i, chunk in enumerate(_chunks(rows)):
            payload_rows = [
                Row(media_id=r.media_id, payload=bytes(r.payload))
                for r in chunk
            ]
            if i == 1:
                payload_rows += extra
            ts = _BASE_TS + datetime.timedelta(hours=i)
            spark.createDataFrame(payload_rows).withColumn(
                "ts", F.lit(ts).cast("timestamp")
            ).coalesce(1).write.mode("append").parquet(src)
            stream = spark.readStream.schema(
                "media_id long, payload binary, ts timestamp"
            ).option("maxFilesPerTrigger", 1).parquet(src)
            q = imagedup.image_ingest_stream(
                stream, state, ckpt, watermark="1 day"
            )
            q.awaitTermination(300)
        got = {
            (r.id_a, r.id_b, r.ahash_hi, r.ahash_lo)
            for r in imagedup.read_emitted_pairs(spark, state).collect()
        }
        assert not any(a == 999_999 or b == 999_999 for a, b, _, _ in got)
        assert got == _batch_pairs(spark)
        hashes = partstore.read_parts(spark, state, "hashes", exclude_batch=-1)
        dup = hashes.groupBy("media_id").count().filter(F.col("count") > 1)
        assert dup.collect() == []
    finally:
        for d in (src, ckpt, state):
            shutil.rmtree(d, ignore_errors=True)
