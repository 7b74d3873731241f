"""Streaming Misra-Gries heavy hitters: bounded state, guaranteed
survival of true heavy keys, and the classic undercount bound."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.streaming.heavy import (
    merge_heavy_hitters,
    misra_gries_stream,
)

_N_BUCKETS = 4
_M = 8


def _planted_stream_df(spark):
    """1000 background events over 200 uniform users + two planted heavy
    users (9001: 400 events, 9002: 250)."""
    bg = spark.range(1000).select((F.col("id") % 200).alias("user_id"))
    h1 = spark.range(400).select(F.lit(9001).alias("user_id"))
    h2 = spark.range(250).select(F.lit(9002).alias("user_id"))
    return bg.unionByName(h1).unionByName(h2)


def test_heavy_hitters_survive_with_bounded_state(spark):
    src_df = _planted_stream_df(spark)
    src = tempfile.mkdtemp(prefix="hh_src_")
    ckpt = tempfile.mkdtemp(prefix="hh_ck_")
    try:
        src_df.coalesce(2).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(src_df.schema).parquet(src)
        summaries = misra_gries_stream(
            stream, key_col="user_id", n_buckets=_N_BUCKETS, m=_M
        )
        q = (
            summaries.writeStream.format("memory")
            .queryName("hh")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("select * from hh")
        rows = out.collect()
        assert rows, "no summaries emitted"
        # bounded state: every bucket's summary holds at most m counters
        per_bucket = {}
        for r in rows:
            per_bucket.setdefault(r["bucket"], set()).add(r["key"])
        assert all(len(keys) <= _M for keys in per_bucket.values())
        # both planted heavies (freq >> n_bucket/(m+1)) must survive
        top = merge_heavy_hitters(out, top=5).collect()
        top_keys = {r["key"] for r in top}
        assert 9001 in top_keys and 9002 in top_keys
        # undercount bound: count_lb <= true count <= count_lb + n_bucket/m
        truth = {
            r["user_id"]: r["cnt"]
            for r in src_df.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
        }
        latest = (
            out.groupBy("bucket", "key")
            .agg(F.max("count_lb").alias("lb"), F.max("n_bucket").alias("nb"))
            .collect()
        )
        for r in latest:
            true_c = truth[r["key"]]
            assert r["lb"] <= true_c
            assert true_c - r["lb"] <= r["nb"] / _M
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_each_key_lives_in_one_bucket(spark):
    src_df = _planted_stream_df(spark)
    src = tempfile.mkdtemp(prefix="hh2_src_")
    ckpt = tempfile.mkdtemp(prefix="hh2_ck_")
    try:
        src_df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(src_df.schema).parquet(src)
        summaries = misra_gries_stream(
            stream, key_col="user_id", n_buckets=_N_BUCKETS, m=_M
        )
        q = (
            summaries.writeStream.format("memory")
            .queryName("hh2")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("select distinct bucket, key from hh2").collect()
        buckets_per_key: dict[int, set[int]] = {}
        for r in rows:
            buckets_per_key.setdefault(r["key"], set()).add(r["bucket"])
        assert all(len(b) == 1 for b in buckets_per_key.values())
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_mg_update_bound_property():
    """Property: for ANY stream and ANY batching, the Misra-Gries summary
    holds <= m counters, never overcounts, and undercounts any key by at
    most floor(n/(m+1)) — the guarantee merge_heavy_hitters' survival
    claim rests on."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreducer_pi_cs4433_spark.streaming.heavy import mg_update

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        st.integers(min_value=2, max_value=12),
        st.randoms(use_true_random=False),
    )
    def check(stream, m, rnd):
        truth = Counter(stream)
        n = len(stream)
        # arbitrary batching: chop the stream into random-sized batches,
        # compact each batch (as the stateful fn does), feed sequentially
        summary: dict[int, int] = {}
        i = 0
        while i < n:
            j = min(n, i + rnd.randint(1, 50))
            for k, c in Counter(stream[i:j]).items():
                summary = mg_update(summary, k, c, m)
            i = j
        assert len(summary) <= m
        for k, lb in summary.items():
            assert lb <= truth[k]
        for k, true_c in truth.items():
            assert true_c - summary.get(k, 0) <= n // (m + 1)

    check()
