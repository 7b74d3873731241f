"""Incremental-processing band: CDC snapshot resolution, SCD Type-2
history, MERGE/upsert application, and keyed snapshot diffing.

At 100 TB the dominant cost model is INCREMENTAL: you never rebuild the
corpus, you apply deltas. The reference (a fixed set of batch MapReduce
jobs) has no incremental story; a production engine needs one. This module
implements the four batch primitives every CDC/lakehouse pipeline composes
(streaming/cdc.py carries the always-on twin of the first):

- ``cdc_latest_state`` — change-log -> current-snapshot resolution: one
  row per key carrying the payload of its latest change, with a total
  deterministic version order ``(ts, event_id)``. This is the "compact the
  log" half of every MERGE.
- ``scd2_user_type_history`` — slowly-changing-dimension Type-2: collapse
  the change log into validity intervals ([valid_from, valid_to) runs of
  identical state), the gaps-and-islands pattern.
- ``merge_upsert_customer_balance`` — MERGE INTO semantics (update
  matched / insert unmatched-source / keep unmatched-target) expressed as
  a full-outer join, the shuffle-minimal Spark shape for upsert-apply.
- ``snapshot_diff_orders`` — keyed diff of two table snapshots into
  added / removed / changed rows with old/new payloads — the validation
  tool for any incremental pipeline (does incremental == full rebuild?).

Cross-engine determinism: the catalog rules (catalog.py module docstring)
— integer centi-units for money (corpus verified exactly 2-decimal at
sf0.01: zero rows where value*100 deviates from round(value*100)),
second-truncated timestamp strings, total ORDER BY for any rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _t, query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_SCD2_OPEN_END = "9999-12-31 00:00:00"

# ---------------------------------------------------------------------------
# 1. Change log -> latest-state snapshot
# ---------------------------------------------------------------------------


@query(
    "cdc_latest_state",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ), r AS (
        SELECT user_id, ts, event_id, event_type, v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_changes,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM log
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_type AS last_type,
           v AS last_value_centi,
           n_changes,
           strftime(first_ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM r WHERE rn = 1
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve a change log to its current snapshot: one row per key with
    the payload of the latest change, versioned by ``(ts, event_id)``
    (event_id is unique, so the order is total — no nondeterministic
    "last write" ties).

    Scale shape: a single partial-aggregated groupBy — ``max(struct(ts,
    event_id, payload...))`` rides Spark's map-side combine, so the
    shuffle carries ONE candidate row per (key, map partition), not the
    log. The oracle states the same semantics as row_number()=1 over a
    full sort; the agg form is what survives a 100 TB log (no global
    sort, shuffle bytes ~ |keys|, and AQE handles hot keys). The struct's
    comparison prefix (ts, event_id) is never NULL; trailing payload
    fields ride along without influencing the order.
    """
    log = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    agg = log.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "v")).alias("last"),
        F.count("*").alias("n_changes"),
        F.min("ts").alias("first_ts"),
    )
    return agg.select(
        "user_id",
        F.date_format("last.ts", _TS_FMT).alias("last_ts"),
        F.col("last.event_type").alias("last_type"),
        F.col("last.v").alias("last_value_centi"),
        "n_changes",
        F.date_format("first_ts", _TS_FMT).alias("first_ts"),
    )


# ---------------------------------------------------------------------------
# 2. SCD Type-2 validity intervals (gaps-and-islands run collapse)
# ---------------------------------------------------------------------------


def _state_runs(events: DataFrame) -> DataFrame:
    """Collapse a (user_id, ts, event_id, event_type) change log into state
    runs: one row per (user_id, version) with the run's state, start
    timestamp ``vf``, and event count. Shared by the SCD2 history builder
    and the point-in-time consumer; every window and the collapse ride ONE
    user_id exchange."""
    log = events.select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    marked = log.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version"),
    )
    return marked.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("vf"),
        F.count("*").alias("n_events"),
    )


@query(
    "scd2_user_type_history",
    oracle=f"""
    WITH log AS (
        SELECT user_id, ts, event_id, event_type FROM events
    ), marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM log
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT user_id, ts, event_type,
               CAST(sum(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS version
        FROM marked
    ), hist AS (
        SELECT user_id, version, min(event_type) AS state,
               min(ts) AS vf, count(*) AS n_events
        FROM runs GROUP BY user_id, version
    )
    SELECT user_id, version, state,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(
               strftime(lead(vf) OVER w2, '%Y-%m-%d %H:%M:%S'),
               '{_SCD2_OPEN_END}') AS valid_to,
           n_events,
           CAST(lead(vf) OVER w2 IS NULL AS INT) AS is_current
    FROM hist
    WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history from a change log: consecutive events
    with the same state (event_type) collapse into one validity interval
    ``[valid_from, valid_to)``; the open interval carries the sentinel end
    date and ``is_current``. Version numbers are per-key and dense (1..R).

    Gaps-and-islands in three steps — change flags (lag), run ids
    (running sum of flags), run collapse (groupBy) — then one lead() for
    interval ends. Scale shape: every window and the aggregation are
    partitioned by user_id, so the whole history builds in ONE exchange;
    the two sorts (events within key, runs within key) reuse that
    partitioning. Ties inside ts are broken by event_id, making run
    boundaries deterministic. At 100 TB this is the shape you want:
    shuffle once by entity, never sort globally.
    """
    hist = _state_runs(_t(spark, sf_dir, "events"))
    w2 = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("vf").over(w2)
    return hist.select(
        "user_id",
        "version",
        "state",
        F.date_format("vf", _TS_FMT).alias("valid_from"),
        F.coalesce(F.date_format(nxt, _TS_FMT), F.lit(_SCD2_OPEN_END)).alias(
            "valid_to"
        ),
        "n_events",
        nxt.isNull().cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# 3. MERGE INTO (upsert apply)
# ---------------------------------------------------------------------------

# Source keys are shifted so the delta straddles the target's key space:
# users 0..49 -> entity 1450..1499 (matched -> update), users 50..149 ->
# entity 1500..1549 (unmatched source -> insert); customers without a
# delta row -> keep. All three MERGE branches are exercised at every SF.
_MERGE_KEY_SHIFT = 1450


@query(
    "merge_upsert_customer_balance",
    oracle=f"""
    WITH delta AS (
        SELECT user_id + {_MERGE_KEY_SHIFT} AS entity_key,
               CAST(sum(round(value * 100)) AS BIGINT) AS delta_centi,
               count(*) AS n_changes
        FROM events GROUP BY user_id
    ), base AS (
        SELECT c_custkey AS entity_key,
               CAST(round(c_acctbal * 100) AS BIGINT) AS old_balance_centi
        FROM customer
    )
    SELECT coalesce(b.entity_key, d.entity_key) AS entity_key,
           CASE WHEN d.entity_key IS NULL THEN 'keep'
                WHEN b.entity_key IS NULL THEN 'insert'
                ELSE 'update' END AS action,
           b.old_balance_centi,
           d.delta_centi,
           coalesce(b.old_balance_centi, 0) + coalesce(d.delta_centi, 0)
               AS new_balance_centi
    FROM base b FULL OUTER JOIN delta d ON b.entity_key = d.entity_key
    """,
)
def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO target USING delta: update matched keys, insert
    unmatched source keys, keep unmatched target keys — emitted as the
    post-merge table plus an ``action`` audit column (the row-level
    provenance a CDC apply job logs).

    The delta is the per-key aggregation of the change stream (exact
    int64 centi-unit sums — no float summation order in the output);
    apply is ONE full-outer join on the key. Scale shape: both sides
    shuffle-partition on entity_key and sort-merge — the only join type
    that preserves all three branches; at 100 TB you co-partition (bucket)
    the base table on the merge key so only the delta shuffles. The
    coalesce-arithmetic form computes all three actions without a union
    of three filtered joins (one pass, no plan duplication).
    """
    delta = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100))
            .cast("long")
            .alias("delta_centi"),
            F.count("*").alias("n_changes"),
        )
        .select(
            (F.col("user_id") + _MERGE_KEY_SHIFT).alias("entity_key"),
            "delta_centi",
        )
    )
    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.round(F.col("c_acctbal") * 100)
        .cast("long")
        .alias("old_balance_centi"),
    )
    b, d = base.alias("b"), delta.alias("d")
    joined = b.join(d, F.col("b.entity_key") == F.col("d.entity_key"), "full_outer")
    return joined.select(
        F.coalesce(F.col("b.entity_key"), F.col("d.entity_key")).alias(
            "entity_key"
        ),
        F.when(F.col("d.entity_key").isNull(), "keep")
        .when(F.col("b.entity_key").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
        F.col("b.old_balance_centi").alias("old_balance_centi"),
        F.col("d.delta_centi").alias("delta_centi"),
        (
            F.coalesce(F.col("b.old_balance_centi"), F.lit(0))
            + F.coalesce(F.col("d.delta_centi"), F.lit(0))
        ).alias("new_balance_centi"),
    )


# ---------------------------------------------------------------------------
# 4. Keyed snapshot diff
# ---------------------------------------------------------------------------

# The corpus is static, so the two "snapshots" are deterministic simulations
# carved from orders: snap1 drops keys = 0 (mod 97) (rows "inserted later"),
# snap2 drops keys = 0 (mod 101) ("deleted later") and bumps the price of
# keys = 0 (mod 89) by 100.00 ("updated later"). The operator itself is the
# generic keyed full-outer diff any snapshot pair feeds.
_DIFF_INS_MOD = 97
_DIFF_DEL_MOD = 101
_DIFF_UPD_MOD = 89
_DIFF_BUMP_CENTI = 100_00


@query(
    "snapshot_diff_orders",
    oracle=f"""
    WITH snap1 AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_centi
        FROM orders WHERE o_orderkey % {_DIFF_INS_MOD} <> 0
    ), snap2 AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT)
                   + CASE WHEN o_orderkey % {_DIFF_UPD_MOD} = 0
                          THEN {_DIFF_BUMP_CENTI} ELSE 0 END AS price_centi
        FROM orders WHERE o_orderkey % {_DIFF_DEL_MOD} <> 0
    )
    SELECT coalesce(a.k, b.k) AS o_orderkey,
           CASE WHEN a.k IS NULL THEN 'added'
                WHEN b.k IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           a.price_centi AS old_price_centi,
           b.price_centi AS new_price_centi
    FROM snap1 a FULL OUTER JOIN snap2 b ON a.k = b.k
    WHERE a.k IS NULL OR b.k IS NULL OR a.price_centi <> b.price_centi
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff of two table snapshots: rows only in the new snapshot
    ('added'), only in the old ('removed'), or in both with different
    payload ('changed'), with old/new payload columns. Unchanged rows are
    filtered OUT — the diff of two 100 TB snapshots that are 99.9% equal
    must emit the 0.1%, not echo the table.

    Scale shape: one full-outer sort-merge join on the key with the
    equality filter applied post-join — Catalyst prunes both scans to
    (key, payload). The mod-carved snapshots guarantee all three change
    classes are non-empty at every SF (see module constants). For
    snapshot pairs stored as parquet this diff is also partition-prunable:
    co-bucket both snapshots on the key and the join is exchange-free.
    """
    orders = _t(spark, sf_dir, "orders")
    price = F.round(F.col("o_totalprice") * 100).cast("long")
    snap1 = orders.filter(F.col("o_orderkey") % _DIFF_INS_MOD != 0).select(
        F.col("o_orderkey").alias("k"), price.alias("price_centi")
    )
    snap2 = orders.filter(F.col("o_orderkey") % _DIFF_DEL_MOD != 0).select(
        F.col("o_orderkey").alias("k"),
        (
            price
            + F.when(
                F.col("o_orderkey") % _DIFF_UPD_MOD == 0, _DIFF_BUMP_CENTI
            ).otherwise(0)
        ).alias("price_centi"),
    )
    a, b = snap1.alias("a"), snap2.alias("b")
    diff = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer").filter(
        F.col("a.k").isNull()
        | F.col("b.k").isNull()
        | (F.col("a.price_centi") != F.col("b.price_centi"))
    )
    return diff.select(
        F.coalesce(F.col("a.k"), F.col("b.k")).alias("o_orderkey"),
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        F.col("a.price_centi").alias("old_price_centi"),
        F.col("b.price_centi").alias("new_price_centi"),
    )


# ---------------------------------------------------------------------------
# 5-6. Incremental view maintenance: partial-state merge (+ retractions)
# ---------------------------------------------------------------------------

# Deterministic, scale-free carve of "already-aggregated history" vs "the
# new delta partition": 90% / 10% of orders by key residue.
_IVM_DELTA_MOD = 10
# Retraction demo: keys = 0 (mod 7) arrive as CDC deletes.
_IVM_RETRACT_MOD = 7


@query(
    "ivm_status_year_revenue_merge",
    oracle="""
    SELECT o_orderstatus,
           year(o_orderdate) AS order_year,
           count(*) AS n_orders,
           CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS revenue_centi,
           CAST(min(round(o_totalprice * 100)) AS BIGINT) AS min_price_centi,
           CAST(max(round(o_totalprice * 100)) AS BIGINT) AS max_price_centi,
           CAST(sum(round(o_totalprice * 100)) AS BIGINT) // count(*)
               AS avg_price_centi
    FROM orders
    GROUP BY o_orderstatus, year(o_orderdate)
    """,
)
def ivm_status_year_revenue_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for distributive/algebraic aggregates:
    the view state (sum, count, min, max per group) computed over the
    history partition MERGES with the state of the new delta partition —
    full-outer join on the group key + componentwise combination — and the
    result must equal a full recompute (the oracle recomputes from
    scratch; equality IS the IVM correctness theorem, checked by hash).

    avg is derived from the merged (sum, count) pair — never averaged
    across partials (SURVEY trap #1's average-of-averages, now in its
    incremental form). Scale shape: at 100 TB the history state is a
    persisted |groups|-row table and ONLY the delta is scanned/aggregated
    per refresh; here both sides build from deterministic key-residue
    carves of orders so every scale factor exercises the same merge. Both
    states hash-partition on exactly the merge keys, so the full-outer
    join reuses the aggregation exchanges — the whole merge adds ZERO
    shuffles beyond the two aggs (plan-pinned: 2 exchanges total).
    """
    orders = _t(spark, sf_dir, "orders")
    centi = F.round(F.col("o_totalprice") * 100).cast("long")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_orderstatus", F.year("o_orderdate").alias("order_year")
        ).agg(
            F.count("*").alias("n"),
            F.sum(centi).cast("long").alias("s"),
            F.min(centi).alias("mn"),
            F.max(centi).alias("mx"),
        )

    base = state(orders.filter(F.col("o_orderkey") % _IVM_DELTA_MOD != 0))
    delta = state(orders.filter(F.col("o_orderkey") % _IVM_DELTA_MOD == 0))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(
        d,
        (F.col("b.o_orderstatus") == F.col("d.o_orderstatus"))
        & (F.col("b.order_year") == F.col("d.order_year")),
        "full_outer",
    )
    n = F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
    s = F.coalesce(F.col("b.s"), F.lit(0)) + F.coalesce(F.col("d.s"), F.lit(0))
    return merged.select(
        F.coalesce(F.col("b.o_orderstatus"), F.col("d.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("b.order_year"), F.col("d.order_year")).alias(
            "order_year"
        ),
        n.alias("n_orders"),
        s.alias("revenue_centi"),
        F.least(F.col("b.mn"), F.col("d.mn")).alias("min_price_centi"),
        F.greatest(F.col("b.mx"), F.col("d.mx")).alias("max_price_centi"),
        F.expr(
            "(coalesce(b.s, 0L) + coalesce(d.s, 0L))"
            " div (coalesce(b.n, 0L) + coalesce(d.n, 0L))"
        ).alias("avg_price_centi"),
    )


@query(
    "ivm_retraction_merge",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS revenue_centi
    FROM orders
    WHERE o_orderkey % {_IVM_RETRACT_MOD} <> 0
    GROUP BY o_orderpriority
    """,
)
def ivm_retraction_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware view maintenance: CDC deletes arrive as NEGATED
    partial states (count -1, sum -value) and merge into the standing
    aggregate by plain addition — sum and count form an abelian group, so
    deletion needs no rescan of history. min/max are deliberately NOT
    maintained here: they are only semigroup aggregates (no inverse), so a
    delete of the current minimum forces a per-group recount — the
    engine's honest answer is to keep them out of the retractable view
    (or maintain them lazily from the CDC log, which is
    ``cdc_latest_state``'s job).

    Groups that retract to zero rows drop out of the view (the HAVING
    n > 0 gate), matching the recompute exactly. The oracle recomputes
    from scratch over the surviving rows; hash equality proves the
    retraction algebra.
    """
    orders = _t(spark, sf_dir, "orders")
    centi = F.round(F.col("o_totalprice") * 100).cast("long")
    standing = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum(centi).cast("long").alias("s")
    )
    retract = (
        orders.filter(F.col("o_orderkey") % _IVM_RETRACT_MOD == 0)
        .groupBy("o_orderpriority")
        .agg(
            (-F.count("*")).alias("n"),
            (-F.sum(centi)).cast("long").alias("s"),
        )
    )
    merged = (
        standing.unionByName(retract)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("revenue_centi"))
        .filter(F.col("n_orders") > 0)
    )
    return merged


# ---------------------------------------------------------------------------
# 7. Point-in-time (AS OF) lookup against the SCD2 history
# ---------------------------------------------------------------------------

from ..operators.temporal import asof_join  # noqa: E402  (shared kernel)


@query(
    "scd2_point_in_time_state",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id, event_type FROM events
    ), marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM log
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
        SELECT user_id, ts, event_type,
               CAST(sum(chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS version
        FROM marked
    ), hist0 AS (
        SELECT user_id, version, min(event_type) AS state, min(ts) AS vf
        FROM runs GROUP BY user_id, version
    ), hist AS (
        -- two runs can START at the same vf (equal-ts events with
        -- alternating types, tie-broken only by event_id); "state as of"
        -- must be the LATEST version's state, and collapsing here keeps
        -- both engines' as-of kernels tie-free (one right row per (key, ts))
        SELECT user_id, vf, max_by(state, version) AS state
        FROM hist0 GROUP BY user_id, vf
    ), probes AS (
        SELECT event_id, user_id, ts, event_type,
               ts - INTERVAL 1 HOUR AS pts
        FROM events
    )
    SELECT p.event_id, p.user_id,
           strftime(date_trunc('second', p.ts), '%Y-%m-%d %H:%M:%S') AS ts,
           p.event_type,
           h.state AS state_1h_ago,
           CAST(h.state IS DISTINCT FROM p.event_type AS INT)
               AS changed_last_hour
    FROM probes p ASOF LEFT JOIN hist h
      ON p.user_id = h.user_id AND epoch_us(p.pts) >= epoch_us(h.vf)
    """,
)
def scd2_point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (FOR SYSTEM_TIME AS OF) lookup against the SCD2
    dimension history: for every event, the state its user was in ONE HOUR
    BEFORE the event (NULL when the user's history starts later), plus a
    changed_last_hour flag — the consumption side of
    ``scd2_user_type_history`` (the same ``_state_runs`` kernel builds the
    intervals), and the standard lakehouse pattern for enriching facts
    with dimension history at fact time.

    Scale shape: a naive interval join (pts BETWEEN valid_from AND
    valid_to) plans as a per-key cartesian; instead the interval STARTS
    feed the as-of kernel (operators/temporal.py): union + ONE user_id
    shuffle + last(ignorenulls) window — history intervals are contiguous
    by construction, so "latest start at-or-before" IS the containing
    interval. Cost: one shuffle of |facts| + |runs| rows, same profile as
    a sort-merge join, no probing. The oracle runs DuckDB's native ASOF
    JOIN on the identical run table (epoch_us comparisons pin the
    microsecond grain on both engines).
    """
    events = _t(spark, sf_dir, "events")
    # Same-vf runs (equal-ts alternating types): keep the max-VERSION
    # run's state, so "as of" is version order, not lexicographic max of
    # state — and the as-of kernel's (key, ts) tie collapse becomes a no-op
    runs = (
        _state_runs(events)
        .groupBy("user_id", "vf")
        .agg(F.max_by("state", "version").alias("state"))
    )
    probes = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("pts"),
    )
    out = asof_join(
        probes,
        runs.select("user_id", F.col("vf").alias("ts"), "state"),
        key="user_id",
        left_ts="pts",
        right_ts="ts",
        right_value="state",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts"),
        "event_type",
        F.col("state").alias("state_1h_ago"),
        (~F.col("state").eqNullSafe(F.col("event_type")))
        .cast("int")
        .alias("changed_last_hour"),
    )


# ---------------------------------------------------------------------------
# 8. State-transition matrix (first-order Markov over the change log)
# ---------------------------------------------------------------------------


@query(
    "events_type_transitions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ), trans AS (
        SELECT prev_type, event_type, count(*) AS n_transitions
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ), tot AS (
        SELECT CAST(sum(n_transitions) AS BIGINT) AS total FROM trans
    )
    SELECT t.prev_type, t.event_type, t.n_transitions,
           (t.n_transitions * 1000000) // o.total AS ppm
    FROM trans t CROSS JOIN tot o
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition census over the per-user change log:
    counts and global ppm share for every (prev_type -> event_type) pair
    under the total order ``(ts, event_id)`` — the user-behavior
    transition matrix (and the statistics a sequence-model data curator
    inspects before training on event streams).

    Scale shape: ONE user_id exchange for the lag window (the same
    partitioning every operator in this module rides), then the matrix
    aggregate is |types|^2-sized and the global total a 1-row broadcast.
    Shares are int64 floor-divides (engine-exact).
    """
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    # trans feeds both the output and the global total — checkpoint the
    # |types|^2-row matrix so the full-data window pass runs ONCE
    trans = (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n_transitions"))
        .localCheckpoint()
    )
    tot = trans.agg(F.sum("n_transitions").cast("long").alias("total"))
    return trans.crossJoin(F.broadcast(tot)).select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.expr("(n_transitions * 1000000) div total").alias("ppm"),
    )


# ---------------------------------------------------------------------------
# 9. Sequence-pattern matching (MATCH_RECOGNIZE-style CEP, batch form)
# ---------------------------------------------------------------------------

# Event-type alphabet: first letters are distinct (click/error/purchase/
# signup/view -> c e p s v), so the per-user history is a string and
# patterns are plain regexes over it.
_CEP_CONVERSION = "vc+p"   # view, 1+ clicks, purchase — the funnel shape
_CEP_ERROR_BURST = "ee+"   # 2+ consecutive errors


@query(
    "events_pattern_cep",
    oracle=f"""
    WITH seqs AS (
        SELECT user_id,
               count(*) AS n_events,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(seq, '{_CEP_CONVERSION}'))
                AS BIGINT) AS n_conv_paths,
           CAST(len(regexp_extract_all(seq, '{_CEP_ERROR_BURST}'))
                AS BIGINT) AS n_error_bursts
    FROM seqs
    """,
)
def events_pattern_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern census — the batch form of SQL's
    MATCH_RECOGNIZE: each user's history becomes an ordered type-string
    (alphabet = first letter of event_type, distinct by construction) and
    patterns are regexes counted non-overlapping per user. Shipped
    patterns: the conversion path ``vc+p`` (view, clicks, purchase) and
    the error burst ``ee+`` — adding a pattern is adding a regex column,
    not a new operator.

    Scale shape: ONE user_id exchange; the ordered sequence builds with
    collect_list over the full ordered window frame (frame row order IS
    the sort order, so concat_ws yields the event-time string — the same
    guarantee DuckDB's string_agg ORDER BY gives the oracle) and the
    regex counting is whole-stage codegen. Per-user cost is linear in
    history length — the same per-entity bound as every window operator
    here; for unbounded histories the streaming funnel
    (streaming/funnel.py) is the incremental form of the conversion
    pattern. Both engines count non-overlapping leftmost matches, and the
    patterns avoid engine-divergent regex features (no backrefs, no
    lookaround).
    """
    events = _t(spark, sf_dir, "events")
    ch = F.substring("event_type", 1, 1)
    wfull = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seqs = (
        events.select(
            "user_id",
            F.concat_ws("", F.collect_list(ch).over(wfull)).alias("seq"),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("seq").alias("seq"))
    )
    return seqs.select(
        "user_id",
        "n_events",
        F.regexp_count("seq", F.lit(_CEP_CONVERSION))
        .cast("long")
        .alias("n_conv_paths"),
        F.regexp_count("seq", F.lit(_CEP_ERROR_BURST))
        .cast("long")
        .alias("n_error_bursts"),
    )
