"""Every catalog query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01); running
at the smallest scale keeps the suite fast while exercising identical
semantics. A second marker-gated pass runs sf0.01 for pre-round confidence.
"""

from __future__ import annotations

import os

import pytest

from mapreducer_pi_cs4433_spark.queries.catalog import ORACLE, QUERIES

from .conftest import SF_CORRECTNESS, SF_SMOKE
from .oracle import compare, duck_connection

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle_sf0001(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    compare(df, duck, ORACLE[name])


# Queries whose predicates were calibrated against the corpus so their
# result is NON-empty at every driver scale (an always-empty result
# exercises nothing — the round-1 embedding-neardup lesson). Empty output
# from any of these means the calibration broke, even if the oracle still
# "matches" on the empty set.
_MUST_EMIT_ROWS = [
    "olap_rich_dormant_customers",
    "olap_revenue_share_parts",
    "olap_small_quantity_revenue",
    "decontaminate_training_set",
    "dedup_clusters",
    "dedup_keeper_selection",
    "dedup_embedding_neardup",
    "dedup_chunk_exact",
    "dedup_semantic_prune",
    "text_source_overlap",
]


@pytest.mark.parametrize("name", sorted(_MUST_EMIT_ROWS))
def test_calibrated_queries_emit_rows(spark, name):
    assert QUERIES[name](spark, SF_SMOKE).count() > 0, name


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL"), reason="set SPARK_GRAFT_FULL=1 for sf0.01"
)
@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle_sf001(spark, name):
    con = duck_connection(SF_CORRECTNESS)
    try:
        compare(QUERIES[name](spark, SF_CORRECTNESS), con, ORACLE[name])
    finally:
        con.close()


def test_driver_window_composition():
    """The round driver records only the first 50 registrations; this pins
    the policy from CORRECTNESS_NOTES.md so a refactor cannot silently
    push reference parity, the OLAP/window/temporal suites, or any
    round-changed query outside the recorded window."""
    names = list(QUERIES)
    window = set(names[:50])
    assert len(names) >= 50
    parity = {n for n in names if n.startswith("task_") or n == "wordcount"}
    olap = {n for n in names if n.startswith("olap_")}
    windows_temporal = {
        n
        for n in names
        if n.startswith("window_")
        or n in ("sessionize_events", "asof_last_purchase_per_click",
                 "range_join_click_error_pairs")
    }
    # Three stable OLAP entries were deliberately demoted below the window
    # this round (driver-green in r2, re-verified every round by the FULL
    # file) to make room for the rows-only -> oracle-backed upgrades.
    demoted_stable = {
        "olap_quantity_median", "olap_status_pivot", "olap_segment_set_ops",
        "olap_pricing_summary", "olap_revenue_by_nation",
        "olap_priority_with_shipped_items", "olap_sales_cube",
        # r9 second continuation: grouping-sets margins (driver-green r8,
        # unchanged) funded the sliding-HLL seat per the zero-sum policy.
        "olap_grouping_sets_margins",
    }
    # The final six classic shapes (Q2/Q6/Q8/Q10/Q12/Q20) registered after
    # the window filled; like the rest of the below-cap band they carry
    # FULL-file + sf0.001/sf0.01 test evidence instead of a driver row.
    below_cap_new = {
        "olap_revenue_forecast_delta", "olap_national_market_share",
        "olap_returned_item_customers", "olap_late_shipment_priority",
        "olap_min_cost_supplier", "olap_dominant_part_suppliers",
        # (olap_grouping_sets_margins was seated in the r8 window for
        # first driver evidence — it is pinned via the olap group now.)
    }
    assert below_cap_new <= set(ORACLE)
    olap = olap - below_cap_new
    for group in (parity, olap - demoted_stable, windows_temporal):
        assert group <= window, f"driver window lost: {sorted(group - window)}"
    assert demoted_stable <= set(ORACLE)
    # every entry in the recorded window is oracle-backed (the upgrades
    # closed the last deliberate rows-only exceptions)
    rows_only_in_window = window - set(ORACLE)
    assert rows_only_in_window == set(), sorted(rows_only_in_window)
