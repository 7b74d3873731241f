"""Declarative data-quality constraint census (the Deequ/dbt-test shape).

One catalog entry validates a whole constraint suite in a fixed number of
passes and emits a long-format census — (constraint, n_checked,
n_violations) — instead of failing fast: at 100 TB you want the full
violation profile from one run, not the first broken row of the first
broken check.

Pass economy (the design constraint at scale):

- per-table checks fold into ONE aggregation over each table — range,
  enum, and positivity predicates are conditional sums riding the same
  scan; exact PK-uniqueness rides the same pass as a count_distinct
  (partial-aggregated, the one shuffle the check fundamentally needs);
- cross-table checks (FK orphans, temporal ordering) fold into ONE
  left join of the fact against the key side — the orphan count and the
  ship-before-order count are conditional sums over the SAME joined
  stream, never two joins.

The suite is data-driven evidence the engine can host constraint
validation; adding a constraint is adding a (name, predicate) row to the
relevant pass, not a new scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _t, query

_STATUS_ENUM = ("F", "O", "P")


@query(
    "dq_constraint_census",
    oracle=f"""
    WITH o AS (
        SELECT count(*) AS n,
               count(*) - count(DISTINCT o_orderkey) AS pk_dup,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_price,
               CAST(sum(CASE WHEN o_orderstatus NOT IN
                        ('{"','".join(_STATUS_ENUM)}') THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_status
        FROM orders
    ), l AS (
        SELECT count(*) AS n,
               count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                   AS pk_dup,
               CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                        THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
        FROM lineitem
    ), j AS (
        SELECT count(*) AS n,
               CAST(sum(CASE WHEN ord.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS orphans,
               CAST(sum(CASE WHEN ord.o_orderkey IS NOT NULL
                             AND li.l_shipdate < ord.o_orderdate
                        THEN 1 ELSE 0 END) AS BIGINT) AS time_trav
        FROM lineitem li LEFT JOIN orders ord
          ON li.l_orderkey = ord.o_orderkey
    )
    SELECT 'orders_pk_unique' AS constraint_name, n AS n_checked,
           pk_dup AS n_violations FROM o
    UNION ALL SELECT 'orders_price_positive', n, bad_price FROM o
    UNION ALL SELECT 'orders_status_enum', n, bad_status FROM o
    UNION ALL SELECT 'lineitem_pk_unique', n, pk_dup FROM l
    UNION ALL SELECT 'lineitem_quantity_range', n, bad_qty FROM l
    UNION ALL SELECT 'lineitem_discount_range', n, bad_disc FROM l
    UNION ALL SELECT 'lineitem_fk_orders', n, orphans FROM j
    UNION ALL SELECT 'lineitem_ship_after_order', n, time_trav FROM j
    """,
)
def dq_constraint_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight constraints, three passes: one aggregation per table (PK
    uniqueness + every single-column predicate share the scan) and one
    fact-side left join for the two cross-table checks (FK orphans and
    l_shipdate < o_orderdate sharing the SAME joined stream). Output is
    the long-format census; a clean corpus reports zeros in
    n_violations with non-zero n_checked — the census proves the checks
    RAN, not merely that nothing printed.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("bad_price"),
        F.sum(F.when(~F.col("o_orderstatus").isin(*_STATUS_ENUM), 1).otherwise(0))
        .cast("long")
        .alias("bad_status"),
    )
    l = li.agg(
        F.count("*").alias("n"),
        (
            F.count("*")
            - F.countDistinct("l_orderkey", "l_linenumber")
        ).alias("pk_dup"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("bad_disc"),
    )
    joined = li.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
        "left",
    )
    j = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orphans"),
        F.sum(
            F.when(
                F.col("o_orderkey").isNotNull()
                & (F.col("l_shipdate") < F.col("o_orderdate")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("time_trav"),
    )

    def census(src: DataFrame, checks: list[tuple[str, str]]) -> DataFrame:
        # ONE inline over the single aggregate row — the long-format pivot
        # never re-consumes (and so never re-scans) the aggregation subtree
        return src.select(
            F.inline(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("constraint_name"),
                            F.col("n").cast("long").alias("n_checked"),
                            F.col(viol).cast("long").alias("n_violations"),
                        )
                        for name, viol in checks
                    ]
                )
            )
        )

    return (
        census(
            o,
            [
                ("orders_pk_unique", "pk_dup"),
                ("orders_price_positive", "bad_price"),
                ("orders_status_enum", "bad_status"),
            ],
        )
        .unionByName(
            census(
                l,
                [
                    ("lineitem_pk_unique", "pk_dup"),
                    ("lineitem_quantity_range", "bad_qty"),
                    ("lineitem_discount_range", "bad_disc"),
                ],
            )
        )
        .unionByName(
            census(
                j,
                [
                    ("lineitem_fk_orders", "orphans"),
                    ("lineitem_ship_after_order", "time_trav"),
                ],
            )
        )
    )
