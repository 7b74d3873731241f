"""Sketch-store compaction (operators/sketch_compaction.py; r11 verdict
ask #5): coarsen closed day cells into month cells by mergeability.

Proofs:
- HLL: the per-type register rollup over the store is BIT-IDENTICAL
  before and after compaction (register max is associative — coarsening
  is exact), month cells equal an independent hashlib flat build over
  each month's keys, the store's partition count drops, open days are
  untouched, and re-running converges (idempotence).
- KLL: total weight is exact through the month merge, and with
  sub-cap cells (day cells in practice) the merged per-type sketch is
  IDENTICAL pre/post — compaction introduced no information loss.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import shutil
import tempfile

from mapreducer_pi_cs4433_spark.functions import hll


def _d(y, m, d):
    return datetime.date(y, m, d)


def _ref_registers(keys) -> dict[int, int]:
    regs: dict[int, int] = {}
    for k in set(keys):
        dig = hashlib.md5(str(k).encode()).digest()
        w = int.from_bytes(dig[1:6], "big")
        rho = hll.RHO_MAX - w.bit_length() if w else hll.RHO_MAX
        if rho > regs.get(dig[0], 0):
            regs[dig[0]] = rho
    return regs


def _day_partitions(store: str) -> set[str]:
    return {
        e.split("=", 1)[1]
        for e in os.listdir(store)
        if e.startswith("day=")
    }


def test_hll_compaction_exact_and_idempotent(spark):
    from mapreducer_pi_cs4433_spark.operators.sketch_compaction import (
        compact_hll_day_cells,
    )
    from mapreducer_pi_cs4433_spark.streaming.snapshots import (
        overwrite_partitions,
    )
    from pyspark.sql import functions as F

    cells_keys = {
        ("A", _d(2024, 1, 5)): [1, 2, 3],
        ("A", _d(2024, 1, 20)): [2, 4],
        ("B", _d(2024, 1, 20)): [10, 11],
        ("A", _d(2024, 2, 3)): [5, 6],
        ("B", _d(2024, 2, 14)): [10, 12, 13],
        ("A", _d(2024, 3, 2)): [7],  # open day: must not be touched
    }
    rows = [
        (t, d, idx, reg)
        for (t, d), ks in cells_keys.items()
        for idx, reg in _ref_registers(ks).items()
    ]
    store = tempfile.mkdtemp(prefix="hllcomp_") + "/hll_day_cells"
    try:
        overwrite_partitions(
            spark.createDataFrame(
                rows, "event_type string, day date, idx int, reg_val int"
            ),
            store,
            "day",
        )
        pre_days = _day_partitions(store)
        assert len(pre_days) == 5

        def rollup():
            return {
                (r.event_type, r.idx): r.reg_val
                for r in spark.read.parquet(store)
                .groupBy("event_type", "idx")
                .agg(F.max("reg_val").alias("reg_val"))
                .collect()
            }

        pre = rollup()
        absorbed = compact_hll_day_cells(spark, store, _d(2024, 3, 1))
        assert absorbed == 4  # the four closed day partitions
        post_days = _day_partitions(store)
        assert post_days == {"2024-01-01", "2024-02-01", "2024-03-02"}
        assert len(post_days) < len(pre_days)  # the store shrank
        assert rollup() == pre  # month-grain consumers: bit-identical

        # month cells equal the independent flat build per (type, month)
        month_want = {}
        for (t, d), ks in cells_keys.items():
            if d >= _d(2024, 3, 1):
                continue
            key_acc = month_want.setdefault((t, d.replace(day=1)), [])
            key_acc.extend(ks)
        want_rows = {
            (t, m.isoformat(), idx, reg)
            for (t, m), ks in month_want.items()
            for idx, reg in _ref_registers(ks).items()
        } | {
            ("A", "2024-03-02", idx, reg)
            for idx, reg in _ref_registers([7]).items()
        }
        got_rows = {
            (r.event_type, r.day.isoformat(), r.idx, r.reg_val)
            for r in spark.read.parquet(store).collect()
        }
        assert got_rows == want_rows

        # idempotence: re-compacting folds month anchors into themselves
        absorbed2 = compact_hll_day_cells(spark, store, _d(2024, 3, 1))
        assert absorbed2 == 2  # just the two month anchors
        assert {
            (r.event_type, r.day.isoformat(), r.idx, r.reg_val)
            for r in spark.read.parquet(store).collect()
        } == want_rows
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)


def test_kll_compaction_weight_exact_and_lossless_subcap(spark):
    from mapreducer_pi_cs4433_spark.functions import kll
    from mapreducer_pi_cs4433_spark.operators.sketch_compaction import (
        compact_kll_day_cells,
    )
    from mapreducer_pi_cs4433_spark.streaming.snapshots import (
        overwrite_partitions,
    )

    day_values = {
        ("A", _d(2024, 1, 5)): [1.0, 5.0, 9.0],
        ("A", _d(2024, 1, 20)): [2.0, 7.0],
        ("B", _d(2024, 1, 20)): [100.0, 50.0],
        ("A", _d(2024, 2, 3)): [3.0, 4.0, 8.0],
        ("A", _d(2024, 3, 2)): [6.0],  # open
    }
    rows = []
    for (t, d), vals in day_values.items():
        sk = kll.new_sketch()
        kll.add_many(sk, vals)
        rows += [(t, d, l, v) for l, v in kll.to_items(sk)]
    store = tempfile.mkdtemp(prefix="kllcomp_") + "/kll_day_cells"
    try:
        overwrite_partitions(
            spark.createDataFrame(
                rows, "event_type string, day date, level int, value double"
            ),
            store,
            "day",
        )

        def type_sketches():
            out = {}
            pdf = spark.read.parquet(store).toPandas()
            for t, grp in pdf.groupby("event_type"):
                ordered = grp.sort_values(["level", "value"])
                sk = kll.new_sketch()
                kll.merge_items(sk, zip(ordered["level"], ordered["value"]))
                out[t] = (
                    kll.total_weight(sk),
                    [kll.quantile(sk, q) for q in (500, 950, 990)],
                )
            return out

        pre = type_sketches()
        absorbed = compact_kll_day_cells(spark, store, _d(2024, 3, 1))
        assert absorbed == 3  # three closed day partitions
        assert _day_partitions(store) == {
            "2024-01-01",
            "2024-02-01",
            "2024-03-02",
        }
        post = type_sketches()
        # weight exactness composes through the extra merge level; with
        # sub-cap day cells the merge is lossless, so the per-type
        # sketches are fully identical
        assert post == pre
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)
