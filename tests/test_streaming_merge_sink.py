"""Streaming MERGE sink tests: the on-disk state table after a chunked
replay must equal the batch compaction; replays are idempotent; the
version pointer survives crashes (old version intact until the pointer
moves); pruning keeps time travel over the retained window."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.merge_sink import (
    apply_cdc_stream,
    last_applied_batch,
    latest_version,
    merge_cdc_batch,
    prune_versions,
    read_state,
)

from .conftest import SF_SMOKE


def _snapshot(spark, path, version=None):
    df = read_state(spark, path, version)
    return {
        r.k: (r.cur.ts, r.cur.vid, r.cur.event_type, r.cur.v_centi,
              r.n_changes)
        for r in df.collect()
    }


def test_merge_sink_replay_matches_batch_compaction(spark):
    """Three-chunk streamed replay of the real events table -> the state
    table equals cdc_latest_state, and version history is queryable."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = tempfile.mkdtemp(prefix="ms_src_")
    ckpt = tempfile.mkdtemp(prefix="ms_ck_")
    state = tempfile.mkdtemp(prefix="ms_state_")
    try:
        rows = events.collect()
        thirds = [rows[i::3] for i in range(3)]  # interleaved, NOT time-ordered
        for chunk in thirds:
            spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(events.schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(src)
            q = apply_cdc_stream(stream, state, ckpt)
            q.awaitTermination(180)

        got = _snapshot(spark, state)
        want = {}
        for r in QUERIES["cdc_latest_state"](spark, SF_SMOKE).collect():
            want[r.user_id] = (r.last_ts, r.last_type, r.last_value_centi,
                               r.n_changes)
        assert len(got) == len(want)
        for k, (ts, _vid, et, vc, n) in got.items():
            w_ts, w_et, w_vc, w_n = want[k]
            assert (ts.strftime("%Y-%m-%d %H:%M:%S"), et, vc, n) == (
                w_ts, w_et, w_vc, w_n
            ), k
        # version history: the final version is the latest pointer and at
        # least two earlier versions exist (one per non-empty batch)
        assert latest_version(state) >= 2
        earlier = _snapshot(spark, state, version=0)
        assert earlier  # first chunk's compaction is still readable
    finally:
        for d in (src, ckpt, state):
            shutil.rmtree(d, ignore_errors=True)


def test_merge_batch_replay_with_batch_id_is_exactly_once(spark):
    """The foreachBatch path (batch_id provided): a crash-replay of an
    already-folded batch is skipped whole — version pointer, payload AND
    the n_changes audit counts are all bit-identical, closing the
    at-least-once gap the ad-hoc path (below) deliberately leaves open."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).limit(200)
    state = tempfile.mkdtemp(prefix="msb_state_")
    try:
        v0 = merge_cdc_batch(spark, events, state, batch_id=0)
        first = _snapshot(spark, state)
        v_replay = merge_cdc_batch(spark, events, state, batch_id=0)
        assert v_replay == v0  # skipped: no new version written
        assert _snapshot(spark, state) == first  # n_changes included
        v1 = merge_cdc_batch(spark, events.limit(50), state, batch_id=1)
        assert v1 == v0 + 1
        # a stale replay (id below the recorded one) is also a no-op
        assert merge_cdc_batch(spark, events, state, batch_id=0) == v1
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_merge_batch_is_idempotent_and_prunable(spark):
    """The ad-hoc path (no batch_id): re-merging an already-folded batch
    changes no PAYLOAD values (n_changes counts re-applications — the
    documented at-least-once contract of batch_id-less calls; the
    streaming sink always passes batch_id and is exactly-once, see
    test_merge_batch_replay_with_batch_id_is_exactly_once); pruning keeps
    the pointer version readable."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).limit(200)
    state = tempfile.mkdtemp(prefix="msi_state_")
    try:
        merge_cdc_batch(spark, events, state)
        first = _snapshot(spark, state)
        merge_cdc_batch(spark, events, state)  # replay the same batch
        second = _snapshot(spark, state)
        assert set(first) == set(second)
        for k in first:
            assert first[k][:4] == second[k][:4], k  # payload unchanged
        merge_cdc_batch(spark, events.limit(50), state)
        merge_cdc_batch(spark, events.limit(10), state)
        assert latest_version(state) == 3
        pruned = prune_versions(state, keep=2)
        assert pruned == [0, 1]
        assert _snapshot(spark, state)  # latest still readable
        assert _snapshot(spark, state, version=2)  # retained window too
    finally:
        shutil.rmtree(state, ignore_errors=True)


def test_adhoc_merge_preserves_recorded_batch_id(spark):
    """An ad-hoc merge (no batch_id) on a state dir maintained by the
    streaming sink must CARRY the recorded batch id forward in the
    pointer: dropping it would silently erase the exactly-once guard,
    and a crash-replay of the last streaming batch would then
    double-apply its n_changes."""
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).limit(200)
    state = tempfile.mkdtemp(prefix="msg_state_")
    try:
        v0 = merge_cdc_batch(spark, events, state, batch_id=7)
        assert last_applied_batch(state) == 7
        v1 = merge_cdc_batch(spark, events.limit(50), state)  # ad-hoc
        assert v1 == v0 + 1
        assert last_applied_batch(state) == 7  # guard carried forward
        snap = _snapshot(spark, state)
        # crash-replay of the last STREAMING batch is still a no-op
        assert merge_cdc_batch(spark, events, state, batch_id=7) == v1
        assert _snapshot(spark, state) == snap
    finally:
        shutil.rmtree(state, ignore_errors=True)
