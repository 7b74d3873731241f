"""Sketch-store compaction — the MAINTAIN leg of the artifact lifecycle
(r11 verdict ask #5; build -> consume -> repair -> MAINTAIN).

Day-grain sketch stores (HLL register cells, KLL item-table cells)
accrue one hive partition per day forever — after a year a store that
answers month-grain questions drags 365 directories of cell rows
through every listing and scan. Mergeability makes coarsening EXACT for
the HLL family (register max is associative: month cells answer every
month-or-coarser rollup bit-identically to the day cells they replace)
and weight-exact for KLL (the month cell is a valid sketch of the
month's multiset — rank error adds one compaction layer, the same trade
the per-type rollup already pays when it merges cells).

Shape: read ONLY the closed day partitions (``day < before``), fold
them to month cells keyed by the month's first day — the store schema
does not change, a month cell is just a cell whose day is a month
anchor — land the month rows through the idempotent dynamic
partition-overwrite sink (streaming/snapshots.py), then drop the
absorbed day directories. Re-running is idempotent: a month-anchor cell
re-folds into itself (max/merge idempotence), and a killed run leaves
either the old day partitions or the new month partition plus a subset
of them — every surviving row is still a valid cell and the next run
converges. The fold ranks sketch-sized rows (cells, never raw data) and
``localCheckpoint`` materializes the result so the write does not read
the path it overwrites.

Partition-directory removal uses the local filesystem (the engine's
artifact stores are local-path parquet, functions/artifacts.py); a
cluster deployment would swap in the Hadoop FileSystem API — the plan
and fold are engine-side either way.

The PLANNING twin — which months, how many day cells, how many rows
saved — is the oracle-backed registry entry
``hll_cells_compaction_plan`` (queries/sketches.py), the sketch-store
mirror of ``shards_compaction_plan``.

Reference note: the reference repo (MapReducer-PI-cs4433) has no sketch
or maintenance surface; this module belongs to the engine's
beyond-reference band (SURVEY.md §2.8).
"""

from __future__ import annotations

import datetime
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.snapshots import overwrite_partitions


def _closed_days(
    spark: SparkSession, path: str, before: datetime.date
) -> list[datetime.date]:
    """Closed day partitions from the DIRECTORY LISTING (partition
    pruning territory — no data files are read to plan the compaction)."""
    out = []
    for e in os.scandir(path):
        if not (e.is_dir() and e.name.startswith("day=")):
            continue
        try:
            d = datetime.date.fromisoformat(e.name.split("=", 1)[1])
        except ValueError:
            continue
        if d < before:
            out.append(d)
    return sorted(out)


def _drop_absorbed(path: str, days: list[datetime.date]) -> None:
    """Remove day directories the month fold absorbed — every day except
    the month anchors, which the overwrite just rewrote in place."""
    for d in days:
        if d != d.replace(day=1):
            shutil.rmtree(
                os.path.join(path, f"day={d.isoformat()}"),
                ignore_errors=True,
            )


def compact_hll_day_cells(
    spark: SparkSession, path: str, before: datetime.date
) -> int:
    """Coarsen the store's closed day partitions (< ``before``) into
    month cells by register-wise max. EXACT: any consumer that merges
    cells at month-or-coarser grain reads bit-identical registers
    before and after. Returns the number of day partitions absorbed."""
    days = _closed_days(spark, path, before)
    if not days:
        return 0
    closed = spark.read.parquet(path).filter(
        F.col("day").isin(days)
    )
    month_rows = (
        closed.groupBy(
            "event_type",
            F.trunc("day", "month").alias("day"),
            "idx",
        )
        .agg(F.max("reg_val").cast("int").alias("reg_val"))
        .select("event_type", "day", "idx", "reg_val")
        .localCheckpoint(eager=True)
    )
    overwrite_partitions(month_rows, path, "day")
    _drop_absorbed(path, days)
    return len(days)


def compact_kll_day_cells(
    spark: SparkSession, path: str, before: datetime.date
) -> int:
    """KLL twin: merge each month's closed day cells into one month
    cell per event_type via the family's deterministic item-table merge
    (sort by (level, value), fold — the same routine the per-type
    rollup and the batch artifact build use, so compaction introduces
    nothing the consumers don't already handle). Total weight is exact
    through the merge (weight exactness composes across levels); rank
    estimates gain at most one compaction layer. Returns the number of
    day partitions absorbed."""
    from ..functions import kll

    days = _closed_days(spark, path, before)
    if not days:
        return 0

    def month_merge(pdf):
        import pandas as pd

        t = pdf["event_type"].iloc[0]
        d = pdf["month"].iloc[0]
        ordered = pdf.sort_values(["level", "value"])
        sk = kll.new_sketch()
        kll.merge_items(sk, zip(ordered["level"], ordered["value"]))
        items = kll.to_items(sk)
        return pd.DataFrame(
            {
                "event_type": [t] * len(items),
                "day": [d] * len(items),
                "level": [l for l, _ in items],
                "value": [v for _, v in items],
            }
        )

    closed = spark.read.parquet(path).filter(F.col("day").isin(days))
    month_rows = (
        closed.withColumn("month", F.trunc("day", "month"))
        .groupBy("event_type", "month")
        .applyInPandas(
            month_merge,
            schema="event_type string, day date, level int, value double",
        )
        .localCheckpoint(eager=True)
    )
    overwrite_partitions(month_rows, path, "day")
    _drop_absorbed(path, days)
    return len(days)
