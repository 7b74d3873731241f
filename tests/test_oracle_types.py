"""Type-level guard over every registered DuckDB oracle (r6 red-row class).

The r6 driver recorded rows-match/schema-match/HASH-FAIL on
scd2_user_type_history because its oracle's windowed ``sum(chg)`` bound as
HUGEINT (INT128) and DuckDB 1.0.0's pandas conversion — the driver's fetch
path — renders HUGEINT as float64 (``1.0`` vs Spark's int64 ``1``). Bare
BOOLEAN outputs are the sibling surface (NULL-bearing bool columns become
object/float mixes in pandas). Both classes are now rejected at the TYPE
level: binding is lazy (no oracle executes), so this sweep covers all
oracles in well under a second and fails before any value is compared.
tools/full_oracle_check.py runs the same guard before its row loop.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreducer_pi_cs4433_spark.queries.catalog import (
    ORACLE,
    validate_oracle_types,
)
from mapreducer_pi_cs4433_spark.schemas import DRIVER_TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in DRIVER_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_forbidden_oracle_output_types(con):
    assert validate_oracle_types(con) == []


def test_guard_catches_hugeint_and_boolean(con):
    """The guard must actually flag the r6 failure shapes, not just pass
    on a clean registry: an uncast windowed integer sum (HUGEINT) and a
    bare boolean comparison."""
    saved = dict(ORACLE)
    try:
        ORACLE.clear()
        ORACLE["_bad_hugeint"] = (
            "SELECT user_id, sum(1) OVER (PARTITION BY user_id) AS v "
            "FROM events"
        )
        ORACLE["_bad_boolean"] = "SELECT user_id, value > 1 AS flag FROM events"
        got = validate_oracle_types(con)
        assert any("_bad_hugeint.v: HUGEINT" in g for g in got)
        assert any("_bad_boolean.flag: BOOLEAN" in g for g in got)
    finally:
        ORACLE.clear()
        ORACLE.update(saved)


def test_all_oracles_bind(con):
    """Every oracle must at least BIND against the driver schema — a
    syntax error or a missing column should fail here, not first in the
    (slow) value gate."""
    for name, sql in ORACLE.items():
        rel = con.sql(sql)  # lazy: binds, does not execute
        assert rel.columns, name
