"""Regression tests for the r9 advice items: NULL-handling asymmetries in
the KLL sketch entries. Both bugs were inert on the generated corpora
(no NULL ts / the driver feed never carries NULL keys) but would diverge
the engines — or violate a declared non-nullable schema — on a corpus
that does, so each gets a corpus that plants exactly the poison row.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import duckdb

from mapreducer_pi_cs4433_spark.queries.catalog import ORACLE, QUERIES

from .oracle import compare

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, rows: list[tuple], d: str) -> None:
    spark.createDataFrame(rows, _EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")


def test_rollup_kll_drops_null_ts_symmetrically(spark):
    """events_quantile_rollup_kll on a corpus WITH NULL-ts rows: before
    the fix, the Spark build stage's pandas groupby silently dropped the
    NULL-day rows (dropna default) while the oracle's base CTE kept them
    in n_events and the rank window — sketch_weight != n_events, driver
    red. Both engines must now filter ts IS NOT NULL, so the planted
    NULL-ts values vanish from BOTH sides and the result hashes equal."""
    ts = datetime.datetime(2024, 3, 1, 12, 0)
    rows = []
    eid = 0
    for t in ("click", "view"):
        for day in range(3):
            for v in range(1, 8):
                rows.append(
                    (
                        eid,
                        ts + datetime.timedelta(days=day),
                        eid % 5,
                        t,
                        float(v * 10 + day),
                        "{}",
                    )
                )
                eid += 1
    # the poison rows: valid type + value, NULL ts. Values chosen far
    # outside the live range so an asymmetric drop would move quantiles
    # AND break the weight contract, never cancel out.
    rows += [
        (eid, None, 1, "click", 99999.0, "{}"),
        (eid + 1, None, 2, "view", -99999.0, "{}"),
        # pre-existing symmetric guards still hold alongside the new one
        (eid + 2, ts, 3, None, 5.0, "{}"),
        (eid + 3, ts, 4, "click", None, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="kllnull_sf_")
    try:
        _write_events(spark, rows, d)
        sdf = QUERIES["events_quantile_rollup_kll"](spark, d)
        got = {r.event_type: r for r in sdf.collect()}
        # weight contract: NULL-ts rows excluded on the Spark side
        assert got["click"].sketch_weight == 21
        assert got["view"].sketch_weight == 21
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet/*.parquet')"
        )
        compare(sdf, con, ORACLE["events_quantile_rollup_kll"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_kll_drops_null_keys(spark):
    """kll_quantile_stream on a feed with NULL keys: before the fix a
    NULL event_type formed its own state group and emitted a snapshot
    row violating SNAPSHOT_SCHEMA's non-nullable event_type field — and
    diverged from the batch twin, which filters event_type IS NOT NULL.
    The pre-projection must drop NULL keys (and still NULL values), so
    only the real groups emit and their counts exclude nothing else."""
    from mapreducer_pi_cs4433_spark.streaming.quantiles import (
        kll_quantile_stream,
    )

    src = tempfile.mkdtemp(prefix="kllnk_src_")
    ckpt = tempfile.mkdtemp(prefix="kllnk_ck_")
    acc: list = []
    try:
        spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0), (None, 4.0), ("a", None)],
            "event_type string, value double",
        ).coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "event_type string, value double"
        ).parquet(src)
        q = (
            kll_quantile_stream(stream, cap=64)
            .writeStream.foreachBatch(lambda df, bid: acc.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert acc, "no snapshots emitted"
        assert all(r.event_type is not None for r in acc)
        final = {r.event_type: r.n_seen for r in acc}
        # NULL-key row and NULL-value row both excluded; nothing else is
        assert final == {"a": 2, "b": 1}
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_set_algebra_empty_year_side_yields_exact_empty_sketch(spark):
    """r10 self-review: with no 1995 orders at all, the per-side
    register table is EMPTY and a bare F.sum would return NULL,
    NULL-ing the estimates and both in-band bits while the oracle
    emits literal 1 — hash red on a legitimate corpus. The shared
    hll.summ_cols coalesces the touched-register sum, so an empty side
    is the exact empty sketch (v_zero = M, est = 0 via the linear
    branch) and the whole result still hash-matches the oracle."""
    import datetime

    rows = [
        (i, "F", datetime.datetime(1996, 2, 1 + (i % 25)), 1.0, "3-M", c)
        for i, c in enumerate(range(1, 120))
    ]
    d = tempfile.mkdtemp(prefix="hllsa_sf_")
    try:
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_orderstatus string, o_orderdate timestamp,"
            " o_totalprice double, o_orderpriority string, o_custkey long",
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        sdf = QUERIES["orders_hll_set_algebra"](spark, d)
        row = sdf.limit(1).collect()[0]
        assert row.n_side_a == 0
        assert row.n_side_b == 119
        assert row.n_intersect == 0
        # NULL-free: every contract column materialized
        assert None not in tuple(row)
        assert row.union_in_band == 1 and row.intersect_in_band == 1
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet/*.parquet')"
        )
        compare(sdf, con, ORACLE["orders_hll_set_algebra"])
    finally:
        shutil.rmtree(d, ignore_errors=True)
