"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, column names, and values order-insensitively (columns
sorted by name, rows sorted by their stringified tuple) — a faithful stand-in
for the driver's value-hash check so mismatches surface before round end.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
from pyspark.sql.types import (
    DateType,
    DecimalType,
    TimestampNTZType,
    TimestampType,
)

from mapreducer_pi_cs4433_spark.schemas import DRIVER_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    # Mirror the driver: DECIMAL cells canonicalize through float, so
    # Decimal('136991.00') and 136991.0 collide to the same token. Round 1
    # proved str(Decimal) preserves trailing zeros that the driver's fetch
    # path strips — queries must not emit DECIMAL at all (enforced in
    # compare()), but normalize the same way here so any slip-through
    # fails/passes exactly as the driver would.
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _canon(rows, colnames) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert the Spark result and the DuckDB result match order-insensitively."""
    dec_cols = [f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not dec_cols, (
        f"oracle-checked query projects DECIMAL columns {dec_cols}: the driver "
        "hash canonicalizes DECIMAL inconsistently across fetch paths (round-1 "
        "failure). Keep decimal aggregation internal; final-cast to DOUBLE in "
        "both engines."
    )
    tmp_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (DateType, TimestampType, TimestampNTZType))
    ]
    assert not tmp_cols, (
        f"oracle-checked query projects DATE/TIMESTAMP columns {tmp_cols}: "
        "this collect()-based compare stringifies them identically in both "
        "engines, but the driver-faithful pandas fetch does not (Spark dates "
        "arrive as datetime.date, DuckDB dates as datetime64 Timestamps) — "
        "the r9 events_distinct_hll_sliding lesson: suite green, gate red. "
        "Emit temporal outputs as formatted strings in BOTH engines."
    )
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_rows = rel.fetchall()
    d_cols = [c for c in rel.columns]

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc = _canon(s_rows, s_cols)
    dc = _canon(d_rows, d_cols)
    if sc != dc:
        diff_s = [r for r in sc if r not in set(dc)][:5]
        diff_d = [r for r in dc if r not in set(sc)][:5]
        raise AssertionError(
            f"value mismatch; spark-only(first5)={diff_s} duckdb-only(first5)={diff_d}"
        )
