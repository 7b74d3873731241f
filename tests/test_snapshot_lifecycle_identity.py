"""Entry-level lifecycle identity (r11 verdict ask #2): the REGISTERED
snapshot consumers run UNCHANGED against a STREAM-built snapshot store
and still hash-match their DuckDB oracles.

The r11 suite proved the halves COMPATIBLE (the merge program over a
stream-built store equals the flat build); these tests prove them
INTERCHANGEABLE: the stream writers (streaming/snapshots.py) populate
the exact `ensure_table` location the batch artifact builders
(_hll_year_regs / _kmv_year_samples) own, and the registered entries
(orders_hll_union_from_snapshots / orders_hll_cumulative_from_snapshots
/ orders_kmv_diff_from_snapshots) — whose oracles rebuild every sketch
FLAT from raw orders in SQL — are run against that store with zero code
changes. Oracle-hash equality then certifies the full lifecycle:
stream-ingested snapshots answer production queries value-for-value as
if batch-built.

Mechanics: `SPARK_GRAFT_INDEX_DIR` is pointed at a temp root, the
writer streams the real sf0.001 orders (plus one far-future flush row
that closes every data year and is itself never emitted — its own year
stays open), and a `_SUCCESS` marker is added (dynamic partition
overwrite skips the marker; `ensure_table` treats it as build-complete,
so the marker is the explicit promotion step from "stream store" to
"served artifact"). The store is hive-partitioned by y where the batch
build is flat — reading through partition discovery with identical
column names/types is part of what is being proven.
"""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest

from mapreducer_pi_cs4433_spark.queries.catalog import ORACLE, QUERIES

from .conftest import SF_SMOKE
from .oracle import compare, duck_connection

_FLUSH = [(999_999, datetime.datetime(2005, 6, 1))]


def _stream_build_store(spark, make_stream, sink, dest: str) -> None:
    """Stream the sf0.001 orders (file 1) then a flush row (file 2)
    through a snapshot writer into ``dest``, maxFilesPerTrigger=1 so
    closure timers fire on a later batch's watermark advance — the
    production shape, not a single-batch shortcut."""
    src = tempfile.mkdtemp(prefix="lify_src_")
    ckpt = tempfile.mkdtemp(prefix="lify_ck_")
    try:
        (
            spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
            .select("o_custkey", "o_orderdate")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        spark.createDataFrame(
            _FLUSH, "o_custkey long, o_orderdate timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("o_custkey long, o_orderdate timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            make_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        # promotion: dynamic partition overwrite writes no _SUCCESS;
        # adding it is the explicit "serve this store" step ensure_table
        # keys on (a half-built store is never promoted by accident)
        open(os.path.join(dest, "_SUCCESS"), "w").close()
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def index_root(monkeypatch):
    root = tempfile.mkdtemp(prefix="lify_idx_")
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", root)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _data_years(store: str) -> set[int]:
    return {
        int(e.split("=", 1)[1])
        for e in os.listdir(store)
        if e.startswith("y=")
    }


def test_hll_consumers_run_unchanged_on_stream_built_store(
    spark, index_root
):
    from mapreducer_pi_cs4433_spark.functions.artifacts import artifact_dir
    from mapreducer_pi_cs4433_spark.streaming.snapshots import (
        hll_year_snapshot_stream,
        write_year_snapshots,
    )

    dest = artifact_dir(SF_SMOKE, "hll_year_regs")
    _stream_build_store(
        spark,
        lambda s: hll_year_snapshot_stream(s, watermark="30 days", shards=4),
        lambda df, bid: write_year_snapshots(df, dest),
        dest,
    )
    # every DATA year closed (the oracle derives years from raw orders,
    # so a missing year would hash-mismatch, not silently pass); the
    # flush year was never emitted
    assert _data_years(dest) == set(range(1995, 2002))

    con = duck_connection(SF_SMOKE)
    try:
        for name in (
            "orders_hll_union_from_snapshots",
            "orders_hll_cumulative_from_snapshots",
        ):
            compare(QUERIES[name](spark, SF_SMOKE), con, ORACLE[name])
    finally:
        con.close()


def test_kmv_consumer_runs_unchanged_on_stream_built_store(
    spark, index_root
):
    from mapreducer_pi_cs4433_spark.functions.artifacts import artifact_dir
    from mapreducer_pi_cs4433_spark.streaming.snapshots import (
        kmv_year_snapshot_stream,
        write_kmv_year_samples,
    )

    dest = artifact_dir(SF_SMOKE, "kmv_year_samples")
    _stream_build_store(
        spark,
        lambda s: kmv_year_snapshot_stream(s, watermark="30 days", shards=4),
        lambda df, bid: write_kmv_year_samples(df, dest),
        dest,
    )
    assert _data_years(dest) == set(range(1995, 2002))

    con = duck_connection(SF_SMOKE)
    try:
        for name in (
            "orders_kmv_diff_from_snapshots",
            "orders_kmv_cumulative_from_snapshots",
        ):
            compare(QUERIES[name](spark, SF_SMOKE), con, ORACLE[name])
    finally:
        con.close()
