"""Edge-case tests for the as-of and range join compositions."""

from __future__ import annotations

from datetime import datetime

from mapreducer_pi_cs4433_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basics_ties_and_misses(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),  # exact tie with right -> match
            (1, _ts("2024-01-01T09:00:00"), "b"),  # before any right -> null
            (2, _ts("2024-01-01T12:00:00"), "c"),  # between rights -> earlier one
            (3, _ts("2024-01-01T12:00:00"), "d"),  # key with no right rows -> null
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (2, _ts("2024-01-01T11:00:00"), 200),
            (2, _ts("2024-01-01T13:00:00"), 300),
            (2, _ts("2024-01-01T11:00:00"), 150),  # duplicate ts -> max wins
        ],
        "k int, ts timestamp, v int",
    )
    out = {
        r.tag: r.v
        for r in asof_join(left, right, "k", "ts", "ts", "v").collect()
    }
    assert out == {"a": 100, "b": None, "c": 200, "d": None}


def test_asof_equals_per_row_maximum(spark):
    """Cross-check the window composition against the brute-force
    definition on a random-ish grid."""
    import itertools

    lrows = [
        (k, _ts(f"2024-01-01T{h:02d}:30:00"), f"{k}-{h}")
        for k, h in itertools.product(range(3), range(0, 10, 2))
    ]
    rrows = [
        (k, _ts(f"2024-01-01T{h:02d}:00:00"), k * 100 + h)
        for k, h in itertools.product(range(3), range(1, 10, 3))
    ]
    left = spark.createDataFrame(lrows, "k int, ts timestamp, tag string")
    right = spark.createDataFrame(rrows, "k int, ts timestamp, v int")
    got = {
        r.tag: r.v for r in asof_join(left, right, "k", "ts", "ts", "v").collect()
    }
    for k, ts, tag in lrows:
        cands = [v for (rk, rts, v) in rrows if rk == k and rts <= ts]
        want = max(cands, key=lambda v: v % 100) if cands else None
        assert got[tag] == want, (tag, got[tag], want)


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: NULL keys match nothing. NULL-key left rows pass
    through unmatched; NULL-key right rows are invisible (round-2 fix —
    the window grouping used to pair NULL with NULL, which DuckDB's native
    ASOF JOIN never does)."""
    left = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T10:00:00"), "null-key"),
            (1, _ts("2024-01-01T10:00:00"), "real-key"),
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01T09:00:00"), 666),  # must never be matched
            (1, _ts("2024-01-01T09:00:00"), 100),
            (1, None, 777),  # null ts can never be "at or before" anything
        ],
        "k int, ts timestamp, v int",
    )
    out = {r.tag: r.v for r in asof_join(left, right, "k", "ts", "ts", "v").collect()}
    assert out == {"null-key": None, "real-key": 100}


def test_range_join_bucket_boundaries(spark):
    """Pairs straddling bucket boundaries must still match (the neighbor
    probe), and pairs beyond the span must not."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "L1")],
        "k int, ts timestamp, ltag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:59:59"), "in-above"),   # 3599s -> in
            (1, _ts("2024-01-01T09:00:01"), "in-below"),   # 3599s -> in, lower bucket
            (1, _ts("2024-01-01T11:00:01"), "out-above"),  # 3601s -> out
            (1, _ts("2024-01-01T08:59:59"), "out-below"),  # 3601s -> out
            (2, _ts("2024-01-01T10:00:00"), "other-key"),  # key mismatch -> out
        ],
        "k int, ts timestamp, rtag string",
    )
    out = range_join_bucketed(left, right, "k", "ts", "ts", span_seconds=3600)
    tags = {r.rtag for r in out.collect()}
    assert tags == {"in-above", "in-below"}
