"""Late-data repair for closed snapshot partitions (r11 verdict ask #3).

The writers' watermark trade discards rows later than the watermark past
their period's end. These tests prove the batch repair path makes that
loss recoverable EXACTLY: stream-build a store with some rows withheld
(the late arrivals), repair with exactly those rows, and the store must
equal the independent hashlib flat build over ALL rows — while years the
late rows don't touch keep their partition files byte-identical (repair
rewrites only affected partitions).
"""

from __future__ import annotations

import datetime
import hashlib
import os
import shutil
import tempfile

from mapreducer_pi_cs4433_spark.functions import hll


def _d(y: int, m: int, d: int) -> datetime.date:
    return datetime.date(y, m, d)


def _reference_registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in set(keys):
        dig = hashlib.md5(str(k).encode()).digest()
        w = int.from_bytes(dig[1:6], "big")
        rho = hll.RHO_MAX - w.bit_length() if w else hll.RHO_MAX
        if rho > regs.get(dig[0], 0):
            regs[dig[0]] = rho
    return regs


def _kmv_reference_sample(keys, k: int) -> list[int]:
    hs = sorted(
        {
            int(hashlib.md5(f"kmv|{key}".encode()).hexdigest()[:8], 16)
            for key in keys
        }
    )
    return hs[:k]


def _partition_fingerprint(store: str, year: int):
    """(name, size, mtime_ns) of every file in a year partition — a
    rewrite changes names (new task UUIDs), so equality means the
    directory was not touched."""
    d = os.path.join(store, f"y={year}")
    return sorted(
        (e.name, e.stat().st_size, e.stat().st_mtime_ns)
        for e in os.scandir(d)
        if e.is_file()
    )


def _stream_store(spark, rows, make_stream, sink):
    src = tempfile.mkdtemp(prefix="repair_src_")
    ckpt = tempfile.mkdtemp(prefix="repair_ck_")
    try:
        spark.createDataFrame(
            rows, "o_custkey long, o_orderdate date"
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(999_999, _d(2005, 6, 1))], "o_custkey long, o_orderdate date"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("o_custkey long, o_orderdate date")
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
        q.awaitTermination(300)
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_hll_repair_restores_flat_build_and_touches_only_affected_years(
    spark,
):
    from mapreducer_pi_cs4433_spark.streaming.snapshots import (
        hll_year_snapshot_stream,
        read_year_snapshots,
        repair_hll_year_snapshots,
        write_year_snapshots,
    )

    year_keys = {1995: [1, 2, 3, 777], 1996: [2, 4, 5, 6], 1997: [7, 8]}
    late_1995 = [(50, _d(1995, 12, 30)), (51, _d(1995, 1, 2))]
    late_1997 = [(52, _d(1997, 7, 7))]
    on_time = [
        (k, _d(y, 6, 15)) for y, ks in year_keys.items() for k in ks
    ]
    store = tempfile.mkdtemp(prefix="repair_store_") + "/hll_year_regs"
    try:
        _stream_store(
            spark,
            on_time,
            lambda s: hll_year_snapshot_stream(
                s, watermark="30 days", shards=4
            ),
            lambda df, bid: write_year_snapshots(df, store),
        )
        # pre-repair: the store reflects only on-time rows
        assert {
            (r.y, r.idx): r.reg
            for r in read_year_snapshots(spark, store).collect()
        } == {
            (y, i): rg
            for y, ks in year_keys.items()
            for i, rg in _reference_registers(ks).items()
        }
        untouched_before = _partition_fingerprint(store, 1996)

        repair_hll_year_snapshots(
            spark.createDataFrame(
                late_1995 + late_1997, "o_custkey long, o_orderdate date"
            ),
            store,
        )

        want = {
            (y, i): rg
            for y, ks in {
                1995: year_keys[1995] + [50, 51],
                1996: year_keys[1996],
                1997: year_keys[1997] + [52],
            }.items()
            for i, rg in _reference_registers(ks).items()
        }
        got = {
            (r.y, r.idx): r.reg
            for r in read_year_snapshots(spark, store).collect()
        }
        assert got == want  # == flat build over on-time + late rows
        # 1996 had no late rows: its partition files were not rewritten
        assert _partition_fingerprint(store, 1996) == untouched_before

        # idempotence: repairing the same late batch again is a no-op
        # in value (max/k-min idempotence at the lifecycle level)
        repair_hll_year_snapshots(
            spark.createDataFrame(
                late_1995, "o_custkey long, o_orderdate date"
            ),
            store,
        )
        got2 = {
            (r.y, r.idx): r.reg
            for r in read_year_snapshots(spark, store).collect()
        }
        assert got2 == want
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)


def test_kmv_repair_restores_flat_build(spark):
    from mapreducer_pi_cs4433_spark.streaming.snapshots import (
        kmv_year_snapshot_stream,
        read_kmv_year_samples,
        repair_kmv_year_samples,
        write_kmv_year_samples,
    )

    k = 8
    on_time_1995 = list(range(100, 110))  # 10 keys: full sketch at k=8
    late_1995 = [110, 111, 112]  # may displace high hashes from the k-min
    on_time = [(key, _d(1995, 4, 1)) for key in on_time_1995] + [
        (key, _d(1996, 2, 3)) for key in (200, 201)
    ]
    store = tempfile.mkdtemp(prefix="repair_kmv_") + "/kmv_year_samples"
    try:
        _stream_store(
            spark,
            on_time,
            lambda s: kmv_year_snapshot_stream(
                s, watermark="30 days", k=k, shards=3
            ),
            lambda df, bid: write_kmv_year_samples(df, store, k=k),
        )
        assert sorted(
            r.h
            for r in read_kmv_year_samples(spark, store)
            .filter("y = 1995")
            .collect()
        ) == _kmv_reference_sample(on_time_1995, k)

        repair_kmv_year_samples(
            spark.createDataFrame(
                [(key, _d(1995, 11, 20)) for key in late_1995],
                "o_custkey long, o_orderdate date",
            ),
            store,
            k=k,
        )
        got = {
            y: sorted(
                r.h
                for r in read_kmv_year_samples(spark, store)
                .filter(f"y = {y}")
                .collect()
            )
            for y in (1995, 1996)
        }
        # 1995 == flat build over on-time + late keys; 1996 untouched
        assert got[1995] == _kmv_reference_sample(
            on_time_1995 + late_1995, k
        )
        assert got[1996] == _kmv_reference_sample([200, 201], k)
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)
