"""Streaming HLL day-cell ingest tests (streaming/hll_cells.py): the
fourth writer in the snapshot family — closed (event_type, day) register
cells land in the day-grain store the batch HLL family reads and
operators/sketch_compaction.py maintains.

Contracts, replayed chunked with a full restart at every boundary:

1. Closure-exactness: a closed cell's registers are BIT-IDENTICAL to an
   independent hashlib flat build over every chunk's rows for that cell
   (register max at cell grain — order/chunking/restart/shard
   invariant; the shard axis is the register lane, so the union of
   shard emissions IS the cell with no fold).
2. Closure-only writes: open days hold no partition; cross-day and
   cross-type keys do not leak between cells.
3. Full-lifecycle composition: MONTH COMPACTION over the stream-built
   store (compact_hll_day_cells, run unchanged via the reader twin's
   layout) keeps the per-type register rollup bit-identical — the
   stream -> maintain -> consume round trip in one assertion.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import shutil
import tempfile

import pytest

from mapreducer_pi_cs4433_spark.functions import hll
from mapreducer_pi_cs4433_spark.streaming.hll_cells import (
    hll_day_cell_stream,
    read_hll_day_cells,
    write_hll_day_cells,
)


def _ref_registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in set(keys):
        dig = hashlib.md5(str(k).encode()).digest()
        w = int.from_bytes(dig[1:6], "big")
        rho = hll.RHO_MAX - w.bit_length() if w else hll.RHO_MAX
        if rho > regs.get(dig[0], 0):
            regs[dig[0]] = rho
    return regs


def _ts(y, m, d, h=12):
    return datetime.datetime(y, m, d, h, 0)


def _run_chunks(spark, chunks, src, ckpt, store):
    for chunk in chunks:
        spark.createDataFrame(
            chunk, "event_type string, user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "event_type string, user_id long, ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            hll_day_cell_stream(stream, watermark="2 days", shards=3)
            .writeStream.foreachBatch(
                lambda df, bid: write_hll_day_cells(df, store)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def _store_days(store: str) -> set[str]:
    if not os.path.isdir(store):
        return set()
    return {
        e.split("=", 1)[1]
        for e in os.listdir(store)
        if e.startswith("day=")
    }


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_hll_day_cells_close_bit_exactly(spark, provider):
    from mapreducer_pi_cs4433_spark.session import enable_rocksdb_state

    # (type, day) -> user keys; day-1 type-a keys SPLIT across a restart
    # (registers must fold through recovery); user 7 appears in several
    # cells (cross-cell keys must not leak); the flush row closes
    # everything >= 2 days older than it.
    cells = {
        ("a", datetime.date(2024, 1, 5)): [1, 2, 3, 7],
        ("b", datetime.date(2024, 1, 5)): [7, 10],
        ("a", datetime.date(2024, 1, 20)): [4, 5, 7],
        ("a", datetime.date(2024, 2, 3)): [6],
    }
    chunks = [
        [("a", k, _ts(2024, 1, 5)) for k in [1, 2]]
        + [("b", k, _ts(2024, 1, 5, 9)) for k in [7, 10]],
        [("a", k, _ts(2024, 1, 5, 18)) for k in [3, 7]]
        + [("a", k, _ts(2024, 1, 20)) for k in [4, 5, 7]],
        [("a", 6, _ts(2024, 2, 3))],
        [("z", 999, _ts(2024, 3, 5))],  # flush; its own cell stays open
    ]
    src = tempfile.mkdtemp(prefix="hcell_src_")
    ckpt = tempfile.mkdtemp(prefix="hcell_ck_")
    store = tempfile.mkdtemp(prefix="hcell_store_") + "/hll_day_cells"
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if provider == "rocksdb":
        enable_rocksdb_state(spark)
    try:
        # first chunk alone: nothing closed (watermark inside day 1)
        _run_chunks(spark, chunks[:1], src, ckpt, store)
        assert _store_days(store) == set()

        _run_chunks(spark, chunks[1:], src, ckpt, store)
        assert _store_days(store) == {"2024-01-05", "2024-01-20", "2024-02-03"}

        got = {}
        for r in read_hll_day_cells(spark, store).collect():
            got.setdefault((r.event_type, r.day), {})[r.idx] = r.reg_val
        want = {
            (t, d): _ref_registers(ks) for (t, d), ks in cells.items()
        }
        assert got == want  # bit-identical to the independent flat build
    finally:
        if provider == "rocksdb":
            if prev is None:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
        for d in (src, ckpt, os.path.dirname(store)):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_built_store_compacts_and_rolls_up_identically(spark):
    """stream -> maintain -> consume: month-compact the STREAM-built
    day store and assert the per-type register rollup is bit-identical
    to the independent flat build over all keys — the full lifecycle in
    one pass (single provider; the provider axis is covered above)."""
    from pyspark.sql import functions as F

    from mapreducer_pi_cs4433_spark.operators.sketch_compaction import (
        compact_hll_day_cells,
    )

    type_keys = {
        "a": [1, 2, 3, 7, 4, 5, 6],
        "b": [7, 10],
    }
    chunks = [
        [("a", k, _ts(2024, 1, 5)) for k in [1, 2, 3, 7]]
        + [("b", k, _ts(2024, 1, 5, 9)) for k in [7, 10]],
        [("a", k, _ts(2024, 1, 20)) for k in [4, 5]]
        + [("a", 6, _ts(2024, 2, 3))],
        [("z", 999, _ts(2024, 3, 5))],
    ]
    src = tempfile.mkdtemp(prefix="hcomp_src_")
    ckpt = tempfile.mkdtemp(prefix="hcomp_ck_")
    store = tempfile.mkdtemp(prefix="hcomp_store_") + "/hll_day_cells"
    try:
        _run_chunks(spark, chunks, src, ckpt, store)
        assert len(_store_days(store)) == 3

        absorbed = compact_hll_day_cells(
            spark, store, datetime.date(2024, 3, 1)
        )
        assert absorbed == 3
        assert _store_days(store) == {"2024-01-01", "2024-02-01"}

        got = {
            (r.event_type, r.idx): r.reg_val
            for r in read_hll_day_cells(spark, store)
            .groupBy("event_type", "idx")
            .agg(F.max("reg_val").alias("reg_val"))
            .collect()
        }
        want = {
            (t, idx): reg
            for t, ks in type_keys.items()
            for idx, reg in _ref_registers(ks).items()
        }
        assert got == want
    finally:
        for d in (src, ckpt, os.path.dirname(store)):
            shutil.rmtree(d, ignore_errors=True)
