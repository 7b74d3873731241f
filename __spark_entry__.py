"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mapreducer_pi_cs4433_spark`` package; this
module is only the registry façade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreducer_pi_cs4433_spark.queries.catalog import ORACLE, QUERIES
from mapreducer_pi_cs4433_spark.session import tune_session

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Task G analogue — the reference's hardest shape (two-job chain +
    driver-side scalar, SURVEY.md §3.3) collapsed into one distributed plan:
    grouped max + 1-row global aggregate broadcast + left join + staleness
    filter.
    """
    tune_session(spark)
    return QUERIES["task_g_stale_users"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def _tuned(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _tuned(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query; keys without one get rows-only checks."""
    return dict(ORACLE)
