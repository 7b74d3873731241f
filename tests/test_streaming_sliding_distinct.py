"""Streaming sliding-window HLL distinct tests — the state-EVICTION
monitor (streaming/sliding_distinct.py). Two contracts, both replayed
chunked with restarts under both state-store providers:

1. Batch equivalence: the LAST emission per (key, win_end) carries the
   register fingerprints (v_zero, sum_inv_scaled, reg_checksum) of an
   independent pure-Python hashlib flat build over the union of every
   chunk's rows for that window — the same third implementation the
   batch sliding entry is checked against — plus the exact
   n_days_in_win.
2. Bounded state: every emitted row reports (n_cells_in_state,
   oldest_cell_day) AFTER that trigger's eviction; once the watermark
   passes day D + win_days, cell D is provably absent — asserted on the
   flush trigger, where the early-corpus cells must be gone, and on a
   key that went idle past its whole window, whose state row must have
   been removed (fresh single-cell state on re-arrival).
"""

from __future__ import annotations

import datetime
import hashlib
import shutil
import tempfile

import pytest

from mapreducer_pi_cs4433_spark.functions import hll
from mapreducer_pi_cs4433_spark.streaming.sliding_distinct import (
    _restore,
    hll_sliding_distinct_stream,
)

_W = 3  # window days — small so eviction happens inside a short corpus
_EPOCH = datetime.date(1970, 1, 1)


def _day(d: int) -> int:
    """Epoch-day index of 2024-01-01 + (d-1) days (day d of the test
    calendar; timedelta-based so d > 31 is valid for the wide-window
    test)."""
    return (datetime.date(2024, 1, 1) - _EPOCH).days + d - 1


def _ts(d: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, 0) + datetime.timedelta(
        days=d - 1
    )


def _reference_registers(user_ids) -> list[int]:
    """Independent flat build (raw digest bytes + int.bit_length) —
    shares no code with functions/hll.py."""
    regs = [0] * hll.M
    for u in set(user_ids):
        dig = hashlib.md5(str(u).encode()).digest()
        w = int.from_bytes(dig[1:6], "big")
        rho = hll.RHO_MAX - w.bit_length() if w else hll.RHO_MAX
        regs[dig[0]] = max(regs[dig[0]], rho)
    return regs


def _expected(
    day_users: dict[int, list[int]], anchors, w: int = _W
) -> dict[int, tuple]:
    """Per-anchor flat-build fingerprints over the trailing w days."""
    out = {}
    for a in anchors:
        days_in = [d for d in day_users if a - w + 1 <= d <= a]
        users = [u for d in days_in for u in day_users[d]]
        regs = _reference_registers(users)
        out[_day(a)] = (
            len(days_in),
            sum(1 for r in regs if r == 0),
            hll.sum_inv_scaled(regs),
            sum((i + 1) * r for i, r in enumerate(regs)),
        )
    return out


def _run_chunks(spark, chunks, src, ckpt, acc, win_days=_W, watermark="1 day"):
    """Each chunk is its own query run against the SAME checkpoint —
    i.e., every boundary is a full restart with state recovery."""
    for chunk in chunks:
        spark.createDataFrame(
            [(t, u, _ts(d)) for (t, u, d) in chunk],
            "event_type string, user_id long, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "event_type string, user_id long, ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            hll_sliding_distinct_stream(
                stream, win_days=win_days, watermark=watermark
            )
            .writeStream.foreachBatch(lambda df, bid: acc.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_sliding_stream_matches_flat_build_and_evicts(spark, provider):
    from mapreducer_pi_cs4433_spark.session import enable_rocksdb_state

    # key "a": active days 1-12 with a LATE (but in-watermark) day-3 row
    # in the second chunk; key "z": day 1 only, then idle past its whole
    # window — its state row must be REMOVED, not just shrunk.
    a_days = {
        1: [1, 2, 3],
        2: [2, 4],
        3: [5, 6, 99],  # 99 arrives late, in chunk 2
        4: [1, 7],
        5: [8],
        6: [2, 9, 10],
        9: [11],  # gap: days 7-8 unobserved -> ramp-down coverage
        10: [1, 12],
        12: [13, 2],
        20: [14],  # the flush day: watermark sails past the early corpus
    }
    chunks = [
        [("a", u, d) for d in (1, 2, 3) for u in a_days[d] if u != 99]
        + [("z", 77, 1)],
        [("a", u, d) for d in (4, 5) for u in a_days[d]]
        + [("a", 99, 3)],  # late day-3 row, above the 1-day watermark
        [("a", u, d) for d in (6, 9) for u in a_days[d]],
        [("a", u, d) for d in (10, 12) for u in a_days[d]],
        [("a", u, d) for d in (20,) for u in a_days[d]] + [("z", 78, 20)],
    ]
    src = tempfile.mkdtemp(prefix="hslid_src_")
    ckpt = tempfile.mkdtemp(prefix="hslid_ck_")
    acc: list = []
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if provider == "rocksdb":
        enable_rocksdb_state(spark)
    try:
        _run_chunks(spark, chunks, src, ckpt, acc)
        assert acc, "no snapshots emitted"

        # ---- contract 1: final emission per (key, win_end) == flat build
        final: dict[tuple, object] = {}
        for i, row in enumerate(acc):
            final[(row.event_type, row.win_end_day)] = (i, row)
        want_a = _expected(
            {d: u for d, u in a_days.items()}, sorted(a_days)
        )
        got_a = {
            we: row for (k, we), (_, row) in final.items() if k == "a"
        }
        assert set(got_a) == set(want_a)  # anchors = observed days only
        for we, row in got_a.items():
            n_days, v_zero, sis, checksum = want_a[we]
            assert row.n_days_in_win == n_days, we
            assert row.v_zero == v_zero, we
            assert row.sum_inv_scaled == sis, we
            assert row.reg_checksum == checksum, we
        # the late day-3 row revised anchors 3,4,5: each was emitted
        # more than once and the LAST emission (asserted above) includes
        # user 99 while the FIRST did not
        first3 = next(
            r for r in acc if r.event_type == "a" and r.win_end_day == _day(3)
        )
        assert first3.reg_checksum != got_a[_day(3)].reg_checksum

        # ---- contract 2a: flush trigger proves cells absent. At the
        # day-20 trigger the recovered watermark sits at day 12 - 1 day
        # => every cell with d + _W <= wm_day is gone: oldest surviving
        # "a" cell must be > day 8 (days 1-6 provably evicted).
        flush_a = got_a[_day(20)]
        assert flush_a.oldest_cell_day + _W > _day(11)
        assert flush_a.n_cells_in_state <= _W + 2  # bounded, not history

        # ---- contract 2b: idle key "z" aged out entirely (state row
        # removed by the event-time timer), so its re-arrival builds
        # FRESH single-cell state — not a resurrected day-1 cell.
        z_rows = [r for r in acc if r.event_type == "z"]
        assert [r.win_end_day for r in z_rows] == [_day(1), _day(20)]
        assert z_rows[-1].n_cells_in_state == 1
        assert z_rows[-1].oldest_cell_day == _day(20)
        assert z_rows[-1].n_days_in_win == 1
    finally:
        if provider == "rocksdb":
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_restore_rejects_corrupted_state():
    """The typed-array state round trip must be validated: a truncated
    register table, unsorted days, or out-of-range values raise instead
    of silently degrading every future window."""
    import numpy as np

    days = [100, 101]
    regs = list(np.zeros(2 * hll.M, dtype=np.int64))
    regs[0] = 5
    cells = _restore(days, regs)
    assert set(cells) == {100, 101} and cells[100][0] == 5

    with pytest.raises(ValueError, match="corrupted"):
        _restore(days, regs[1:])  # truncated
    with pytest.raises(ValueError, match="corrupted"):
        _restore([101, 100], regs)  # unsorted
    bad = list(regs)
    bad[3] = hll.RHO_MAX + 1
    with pytest.raises(ValueError, match="corrupted"):
        _restore(days, bad)  # out of range


def test_future_skew_clamp_blocks_watermark_poisoning(spark):
    """One producer with a broken clock (a year-3000 timestamp) advances
    the EVENT-time watermark past the whole live corpus: real cells
    evict, subsequent real rows late-filter, and the query keeps running
    over nothing. With max_future_skew set, the poisoned row is dropped
    BEFORE the watermark node, so the replay's emissions equal the
    clean flat build; without it, the post-poison chunk is swallowed
    (no emission for its anchor) — both directions asserted."""
    day_users = {1: [1, 2], 2: [3], 3: [4, 5]}
    # year 2100: ~76 years of skew (kept inside pandas' datetime64[ns]
    # range — the operator's Arrow input conversion overflows beyond
    # 2262, a crash rather than the silent poisoning under test here)
    poison = [("a", 99, datetime.datetime(2100, 1, 1, 0, 0))]

    def run(guarded: bool):
        src = tempfile.mkdtemp(prefix="hsp_src_")
        ckpt = tempfile.mkdtemp(prefix="hsp_ck_")
        acc: list = []
        try:
            chunks = [
                [("a", u, _ts(d)) for d in (1, 2) for u in day_users[d]],
                [("a", u, _ts(2)) for u in ()]  # placeholder, replaced below
                + poison,
                [("a", u, _ts(3)) for u in day_users[3]],
            ]
            for chunk in chunks:
                spark.createDataFrame(
                    chunk,
                    "event_type string, user_id long, ts timestamp",
                ).coalesce(1).write.mode("append").parquet(src)
                stream = spark.readStream.schema(
                    "event_type string, user_id long, ts timestamp"
                ).option("maxFilesPerTrigger", 1).parquet(src)
                q = (
                    hll_sliding_distinct_stream(
                        stream,
                        win_days=_W,
                        watermark="1 day",
                        max_future_skew="2 days" if guarded else None,
                    )
                    .writeStream.foreachBatch(
                        lambda df, bid: acc.extend(df.collect())
                    )
                    .outputMode("update")
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(300)
            return acc
        finally:
            for d in (src, ckpt):
                shutil.rmtree(d, ignore_errors=True)

    guarded = run(True)
    # poisoned row dropped: emissions equal the clean flat build and the
    # day-3 anchor still arrives with its full window
    want = _expected(day_users, sorted(day_users))
    final = {}
    for r in guarded:
        final[r.win_end_day] = r
    assert set(final) == set(want)
    for we, row in final.items():
        n_days, v_zero, sis, checksum = want[we]
        assert (row.n_days_in_win, row.v_zero, row.sum_inv_scaled,
                row.reg_checksum) == (n_days, v_zero, sis, checksum), we

    unguarded = run(False)
    # the poison advanced the watermark ~976 years: the real day-3 chunk
    # is late-filtered, so its anchor never emits
    assert _day(3) not in {r.win_end_day for r in unguarded}


def test_sliding_stream_correct_in_non_utc_session(spark):
    """r10 self-review: the cell day must share the WATERMARK's clock
    (UTC epoch) — a to_date()-derived day is session-timezone-local and
    drifts one day off in non-UTC sessions, breaking the eviction
    invariant exactly at the window edge. Replay the basic corpus under
    America/New_York and assert the final emissions still equal the
    flat build (days computed as UTC epoch days on both sides)."""
    day_users = {1: [1, 2], 2: [3, 4], 3: [5]}
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    src = tempfile.mkdtemp(prefix="hstz_src_")
    ckpt = tempfile.mkdtemp(prefix="hstz_ck_")
    acc: list = []
    try:
        chunks = [
            [("a", u, d) for d in (1, 2) for u in day_users[d]],
            [("a", u, 3) for u in day_users[3]],
        ]
        _run_chunks(spark, chunks, src, ckpt, acc)
        # the corpus timestamps are 2024-01-d 12:00 SESSION time (NY);
        # their UTC epoch day is still 2024-01-d (17:00 UTC), so the
        # expected fingerprints are unchanged — what matters is that
        # the stream's day and the watermark agreed on a single clock
        want = _expected(day_users, sorted(day_users))
        final = {r.win_end_day: r for r in acc if r.event_type == "a"}
        assert set(final) == set(want)
        for we, row in final.items():
            n_days, v_zero, sis, checksum = want[we]
            assert (row.n_days_in_win, row.v_zero, row.sum_inv_scaled,
                    row.reg_checksum) == (n_days, v_zero, sis, checksum), we
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_sliding_stream_wide_window_w30(spark, provider):
    """Wide-window variant (r10 verdict ask #6): win_days=30. The
    emission loop is O(cells x touched_days) per key per trigger
    (sliding_distinct.py documents it as fine at w=7); this proves the
    same contracts hold when both factors grow 4x — batch equivalence
    of the final emission per anchor against the hashlib flat build,
    AND the state bound (n_cells_in_state <= win_days + watermark days
    on every emitted row; early cells provably evicted by the flush
    trigger). Per-trigger wall cost is measured and recorded in
    CORRECTNESS_NOTES ('w=30 sliding cost'): at w=30 the loop body is
    ~cells x touched <= 32 x chunk_days numpy reductions per key —
    still microseconds against the ~seconds-scale micro-batch
    machinery, so the touched-day index the module docstring reserves
    for w >> 7 remains unnecessary at w=30."""
    import time as _time

    from mapreducer_pi_cs4433_spark.session import enable_rocksdb_state

    w = 30
    # key "a": every 3rd day across days 1-40 (14 observed days, so up
    # to 10 live cells inside any 30-day window), then a far flush day
    # whose trigger must find the early cells evicted.
    a_days = {d: [d, 100 + d] for d in range(1, 41, 3)}
    a_days[80] = [999]
    obs = sorted(a_days)
    chunks = [
        [("a", u, d) for d in obs[0:4] for u in a_days[d]],
        [("a", u, d) for d in obs[4:8] for u in a_days[d]],
        [("a", u, d) for d in obs[8:11] for u in a_days[d]],
        [("a", u, d) for d in obs[11:14] for u in a_days[d]],
        [("a", u, d) for d in (80,) for u in a_days[d]],
    ]
    src = tempfile.mkdtemp(prefix="hwide_src_")
    ckpt = tempfile.mkdtemp(prefix="hwide_ck_")
    acc: list = []
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if provider == "rocksdb":
        enable_rocksdb_state(spark)
    try:
        t0 = _time.perf_counter()
        _run_chunks(
            spark, chunks, src, ckpt, acc, win_days=w, watermark="2 days"
        )
        wall = _time.perf_counter() - t0
        assert acc, "no snapshots emitted"

        # contract 1: final emission per anchor == flat build at w=30
        final: dict[int, object] = {}
        for row in acc:
            assert row.event_type == "a"
            final[row.win_end_day] = row
        want = _expected(a_days, obs, w=w)
        assert set(final) == set(want)
        for we, row in final.items():
            n_days, v_zero, sis, checksum = want[we]
            assert row.n_days_in_win == n_days, we
            assert row.v_zero == v_zero, we
            assert row.sum_inv_scaled == sis, we
            assert row.reg_checksum == checksum, we

        # contract 2: bounded state on EVERY emission — the provable
        # cell-lifetime bound is win_days + watermark days
        assert all(r.n_cells_in_state <= w + 2 for r in acc)
        # flush trigger: recovered watermark = day 40 - 2 days => every
        # cell with d + w <= day 38 is gone
        flush = final[_day(80)]
        assert flush.oldest_cell_day + w > _day(38)
        # the flush emission's own window holds only day 80
        assert flush.n_days_in_win == 1
        # measured per-trigger cost, recorded for the notes (5 triggers)
        print(f"w30-sliding[{provider}]: {len(chunks)} triggers, "
              f"{wall:.1f}s wall")
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
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)
