"""Sketches: count-min, Bloom pruning, KMV, KLL quantiles, and HLL.

The engine's sketch family (alongside the HLL++ wrapper and GK quantiles
registered in extensions.py): CMS answers "how often did key X occur"
from sublinear state, Bloom answers "might key X be in set S" (the two
sketches a 100 TB pipeline uses to avoid full shuffles — CMS for
heavy-key detection feeding the salted-join mitigation in
operators/skew.py; Bloom for semi-join pruning before an expensive
join), KMV estimates join cardinalities, the KLL pair demonstrates
mergeable quantiles structurally (build + merge + cube-cell rollup),
and events_distinct_hll_rollup is the in-engine HyperLogLog whose
REGISTERS are the verified output.

CMS, Bloom, KMV, and the HLL registers are EXACT cross-engine twins,
not error-banded contracts: the hash family is md5-derived
(standardized bits in any engine), so DuckDB reproduces the sketch
bit-for-bit and the driver hash-compares values. The accuracy claims
(CMS never undercounts; Bloom never yields false negatives; KLL/HLL
estimates in band) are asserted as output columns the oracle recomputes
or as one-sided claim bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _fmt_doc, _t, query

# Count-min geometry: w=64 deliberately small so the 150-user key space
# collides measurably (the overcount column is non-zero evidence); d=4
# rows give min-of-4 estimates. At corpus scale you size w ~ e/eps.
_CMS_D = 4
_CMS_W = 64

# Bloom geometry: m=1024 bits, k=3 hashes over the pruned key set.
# Membership is SCALE-FREE: users whose total event value is strictly
# above the global mean — compared as total*n_users > grand_total (exact
# integer cross-multiply, no division), so the set is a strict non-empty
# subset at every SF.
_BLOOM_M = 1024
_BLOOM_K = 3


def _slot(seed: int, key: Column, mod: int) -> Column:
    """Uniform slot in [0, mod) from md5(seed|key) — first 8 hex chars
    parsed as an integer (< 2^32, so BIGINT-safe in both engines)."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def _slot_sql(seed: str, key_expr: str, mod: int) -> str:
    """DuckDB twin of _slot; `seed` is an SQL expression (e.g. 's')."""
    return (
        f"CAST(CAST(concat('0x', substr(md5(concat({seed}, '|', "
        f"CAST({key_expr} AS VARCHAR))), 1, 8)) AS UBIGINT) AS BIGINT) % {mod}"
    )


@query(
    "events_cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), coords AS (
        SELECT k.user_id, k.n, s.s,
               {_slot_sql("CAST(s.s AS VARCHAR)", "k.user_id", _CMS_W)} AS col
        FROM keyed k
        CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS s) s
    ), sketch AS (
        SELECT s, col, CAST(sum(n) AS BIGINT) AS cnt
        FROM coords GROUP BY s, col
    ), est AS (
        SELECT c.user_id, min(sk.cnt) AS cms_est
        FROM coords c JOIN sketch sk ON c.s = sk.s AND c.col = sk.col
        GROUP BY c.user_id
    )
    SELECT k.user_id, k.n AS true_cnt, e.cms_est,
           e.cms_est - k.n AS overcount
    FROM keyed k JOIN est e ON k.user_id = e.user_id
    """,
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the event key stream: build a d x w counter
    grid from d md5-derived hash rows, then estimate each key's frequency
    as the MIN of its d counters. Emits (true_cnt, cms_est, overcount)
    per key — overcount >= 0 always (CMS never undercounts), and > 0
    exactly where slots collide (w=64 guarantees visible collisions).

    Scale shape: the stream is aggregated to (key, n) grain FIRST (one
    map-side-combined shuffle — the only full-data pass), then the d-way
    coordinate explode, the d*w-row sketch, and the estimate join all run
    on key-cardinality-sized data. The sketch table is d*w rows REGARDLESS
    of corpus size — that is the point of the sketch: at 100 TB you
    broadcast it wherever a "is this key heavy?" predicate is needed
    (operators/skew.py consumes exactly that signal).
    """
    # keyed is consumed three times (coords, the estimate join, the final
    # truth join) — localCheckpoint it (the dual-consumer rule) so the
    # full-data aggregation pass runs ONCE; everything after is
    # key-cardinality-sized.
    keyed = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    coords = keyed.select(
        "user_id",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        _slot(s, F.col("user_id"), _CMS_W).alias("col"),
                    )
                    for s in range(_CMS_D)
                ]
            )
        ).alias("sc"),
    ).select("user_id", "n", F.col("sc.s").alias("s"), F.col("sc.col").alias("col"))
    sketch = (
        coords.groupBy("s", "col")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )
    est = (
        coords.join(F.broadcast(sketch), ["s", "col"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        keyed.join(est, "user_id")
        .select(
            "user_id",
            F.col("n").alias("true_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("n")).alias("overcount"),
        )
    )


@query(
    "join_bloom_prune_stats",
    oracle=f"""
    WITH totals AS (
        SELECT user_id,
               CAST(sum(round(value * 100)) AS BIGINT) AS total_centi
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(sum(total_centi) AS BIGINT) AS grand,
               count(*) AS n_users
        FROM totals
    ), members AS (
        SELECT t.user_id FROM totals t CROSS JOIN tot g
        WHERE t.total_centi * g.n_users > g.grand
    ), bits AS (
        SELECT DISTINCT
               {_slot_sql("CAST(s.s AS VARCHAR)", "m.user_id", _BLOOM_M)} AS bit
        FROM members m
        CROSS JOIN (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS s) s
    ), probes AS (
        SELECT t.user_id, s.s,
               {_slot_sql("CAST(s.s AS VARCHAR)", "t.user_id", _BLOOM_M)} AS bit
        FROM totals t
        CROSS JOIN (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS s) s
    ), verdict AS (
        SELECT p.user_id,
               (count(b.bit) = {_BLOOM_K}) AS bloom_pass
        FROM probes p LEFT JOIN bits b ON p.bit = b.bit
        GROUP BY p.user_id
    )
    SELECT e.event_type,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN v.bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS bloom_pass_rows,
           CAST(sum(CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS true_match_rows,
           CAST(sum(CASE WHEN v.bloom_pass AND m.user_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS false_pos_rows
    FROM events e
    JOIN verdict v ON e.user_id = v.user_id
    LEFT JOIN members m ON e.user_id = m.user_id
    GROUP BY e.event_type
    """,
)
def join_bloom_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, measured: build an m-bit/k-hash
    Bloom filter over a membership key set (high-value users), probe every
    fact row through it, and report per-partition (event_type) how many
    rows the filter passes vs the exact semi-join — false_pos_rows is the
    wasted shuffle the filter failed to prune; false NEGATIVES are
    impossible by construction and the oracle would catch one as a
    true_match > bloom_pass hash mismatch.

    Scale shape: the filter is built from the (small) member set — k
    coordinates per member, distinct -> a <= m-row bit table broadcast to
    the probe side. Probes are evaluated at DISTINCT-key grain (one
    verdict per key, not per row) and joined back to the fact stream as a
    broadcast — the fact table is scanned once, shuffled only for the
    final stats groupBy. This is exactly how Spark's own
    `spark.sql.optimizer.runtime.bloomFilter` prunes shuffle joins; here
    the mechanism is explicit, deterministic, and oracle-verified.
    """
    # totals fans out to five consumers (glob, members twice via bits and
    # is_member, probes, the verdict key restore) — without a checkpoint
    # Catalyst re-derives it per consumer and the FACT table is scanned
    # seven times. localCheckpoint pins the key-grain table so events is
    # scanned exactly twice: once here, once as the probe stream.
    totals = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100)).cast("long").alias("total_centi"))
        .localCheckpoint()
    )
    glob = totals.agg(
        F.sum("total_centi").cast("long").alias("grand"),
        F.count("*").alias("n_users"),
    )
    members = (
        totals.crossJoin(F.broadcast(glob))
        .filter(F.col("total_centi") * F.col("n_users") > F.col("grand"))
        .select("user_id")
    )

    def coords(df: DataFrame) -> DataFrame:
        return df.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            _slot(s, F.col("user_id"), _BLOOM_M).alias("bit"),
                        )
                        for s in range(_BLOOM_K)
                    ]
                )
            ).alias("sb"),
        ).select("user_id", F.col("sb.s").alias("s"), F.col("sb.bit").alias("bit"))

    bits = coords(members).select("bit").distinct()
    probes = coords(totals.select("user_id"))
    verdict = (
        probes.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("hits"))
        # keys missing every bit drop out of the semi-join; restore them
        # with hits=0 via a left join from the full key set
    )
    verdict = (
        totals.select("user_id")
        .join(verdict, "user_id", "left")
        .select(
            "user_id",
            (F.coalesce("hits", F.lit(0)) == _BLOOM_K).alias("bloom_pass"),
        )
    )
    is_member = members.select("user_id", F.lit(True).alias("is_member"))
    events = _t(spark, sf_dir, "events").select("user_id", "event_type")
    enriched = events.join(F.broadcast(verdict), "user_id").join(
        F.broadcast(is_member), "user_id", "left"
    )
    return enriched.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("long")
        .alias("bloom_pass_rows"),
        F.sum(F.when(F.col("is_member").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("true_match_rows"),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("is_member").isNull(), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("false_pos_rows"),
    )


# ---------------------------------------------------------------------------
# KMV (theta) sketch: distinct / union / intersection cardinality estimates
# ---------------------------------------------------------------------------

# k minimum values per set. 64 keeps BOTH estimator branches live at every
# SF: the yearly custkey sets exceed 64 even at sf0.001 (sketch path), while
# degenerate subsets would fall back to the exact small-set branch.
# ONE definition per engine for the KMV hash family (r10 self-review:
# the hash is the bit-exact cross-engine contract, so every call site —
# both batch entries, both oracles, and the streaming monitor — resolves
# to functions/kmv.py)
from ..functions import kmv as _kmv  # noqa: E402

_KMV_K = _kmv.K
_KMV_SPACE = _kmv.SPACE
_kmv_h = _kmv.h_col
_kmv_h_sql = _kmv.h_sql


@query(
    "join_cardinality_kmv",
    oracle=f"""
    WITH a_keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE year(o_orderdate) = 1996
    ), b_keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE year(o_orderdate) = 1997
    ), a_h AS (
        SELECT {_kmv_h_sql("k")} AS h
        FROM a_keys
    ), b_h AS (
        SELECT {_kmv_h_sql("k")} AS h
        FROM b_keys
    ), sa AS (SELECT DISTINCT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
       sb AS (SELECT DISTINCT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
       stats AS (
        SELECT (SELECT count(*) FROM sa) AS na,
               (SELECT max(h) FROM sa) AS ta,
               (SELECT count(*) FROM sb) AS nb,
               (SELECT max(h) FROM sb) AS tb,
               (SELECT count(*) FROM a_keys) AS exact_a,
               (SELECT count(*) FROM b_keys) AS exact_b,
               (SELECT count(*) FROM (SELECT k FROM a_keys
                                      INTERSECT SELECT k FROM b_keys))
                   AS exact_i,
               (SELECT count(*) FROM (SELECT k FROM a_keys
                                      UNION SELECT k FROM b_keys))
                   AS exact_u
    ), theta AS (
        SELECT least(ta, tb) AS t FROM stats
    ), inter AS (
        SELECT count(*) AS ni FROM sa JOIN sb USING (h)
        CROSS JOIN theta WHERE h <= theta.t
    ), est AS (
        SELECT s.exact_a, s.exact_b, s.exact_u, s.exact_i,
               CASE WHEN s.na < {_KMV_K} THEN s.na
                    ELSE ({_KMV_K} - 1) * {_KMV_SPACE} // s.ta END AS est_a,
               CASE WHEN s.nb < {_KMV_K} THEN s.nb
                    ELSE ({_KMV_K} - 1) * {_KMV_SPACE} // s.tb END AS est_b,
               CASE WHEN t.t IS NULL THEN 0
                    ELSE i.ni * {_KMV_SPACE} // t.t END AS est_i
        FROM stats s CROSS JOIN inter i CROSS JOIN theta t
    )
    SELECT 'distinct_a' AS measure, exact_a AS exact_count,
           est_a AS kmv_estimate FROM est
    UNION ALL SELECT 'distinct_b', exact_b, est_b FROM est
    UNION ALL SELECT 'intersection', exact_i, est_i FROM est
    """,
)
def join_cardinality_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-sketch cardinality estimation — the join-planning
    primitive: per set keep only the k MINIMUM md5 hash values; the kth
    value theta estimates distinct count as (k-1) * space / theta, and two
    sketches intersect by counting shared samples below the common theta.
    Emits (measure, exact_count, kmv_estimate) for both sets and their
    intersection, so the sketch's error is part of the checked output.

    Bit-exact cross-engine: the hash is the md5 slot family (standardized
    bits), the estimates are int64 floor-divides, and sub-k sets take the
    exact branch (a KMV sketch holding fewer than k samples IS its set).
    Scale shape: each side reduces to distinct keys (one map-side-combined
    shuffle — at 100 TB this is the only full-data pass), then k-smallest
    rides TakeOrdered (per-partition top-k + merge, never a global sort);
    everything downstream is <= k rows per side. This is how you size a
    join's output before paying for the join.
    """
    orders = _t(spark, sf_dir, "orders")
    h = _kmv_h

    def keys(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )

    # keys() subtrees are consumed twice (sketch + exact census); the
    # distinct tables are key-cardinality-sized — checkpoint once.
    a_keys = keys(1996).localCheckpoint()
    b_keys = keys(1997).localCheckpoint()
    # distinct HASH VALUES before the top-k (the theta-sketch set
    # discipline, aligned family-wide in r11 — see _kmv_year_samples;
    # value-neutral here: zero per-year collisions at any test SF)
    sa = (
        a_keys.select(h(F.col("k")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
    )
    sb = (
        b_keys.select(h(F.col("k")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
    )
    sa, sb = sa.localCheckpoint(), sb.localCheckpoint()

    stats = (
        sa.agg(F.count("*").alias("na"), F.max("h").alias("ta"))
        .crossJoin(sb.agg(F.count("*").alias("nb"), F.max("h").alias("tb")))
        .crossJoin(a_keys.agg(F.count("*").alias("exact_a")))
        .crossJoin(b_keys.agg(F.count("*").alias("exact_b")))
        .crossJoin(
            a_keys.join(b_keys, "k").agg(F.count("*").alias("exact_i"))
        )
    )
    inter = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(stats.select(F.least("ta", "tb").alias("t"))))
        .filter(F.col("h") <= F.col("t"))
        .agg(F.count("*").alias("ni"))
    )
    est = stats.crossJoin(F.broadcast(inter)).select(
        "exact_a",
        "exact_b",
        "exact_i",
        F.expr(
            f"CASE WHEN na < {_KMV_K} THEN na "
            f"ELSE ({_KMV_K} - 1) * {_KMV_SPACE}L div ta END"
        ).alias("est_a"),
        F.expr(
            f"CASE WHEN nb < {_KMV_K} THEN nb "
            f"ELSE ({_KMV_K} - 1) * {_KMV_SPACE}L div tb END"
        ).alias("est_b"),
        # empty sketch => empty set => empty intersection: 0, not NULL
        # (hypothesis-found edge: a year with no orders leaves theta NULL)
        F.expr(
            f"CASE WHEN least(ta, tb) IS NULL THEN 0L "
            f"ELSE ni * {_KMV_SPACE}L div least(ta, tb) END"
        ).alias("est_i"),
    )
    est = est.localCheckpoint()  # three 1-row consumers below
    row = lambda m, e, s: est.select(  # noqa: E731
        F.lit(m).alias("measure"),
        F.col(e).cast("long").alias("exact_count"),
        F.col(s).cast("long").alias("kmv_estimate"),
    )
    return (
        row("distinct_a", "exact_a", "est_a")
        .unionByName(row("distinct_b", "exact_b", "est_b"))
        .unionByName(row("intersection", "exact_i", "est_i"))
    )


_KMV_YEARS_KIND = "kmv_year_samples"


def _kmv_year_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-(order year) KMV samples over distinct order
    customers — the k-min snapshot artifact that makes 'how many
    customers did we lose between ANY two periods' a <= 2k-row read
    (r10 verdict ask #1; the KMV twin of _hll_year_regs). Schema
    (y, h): each year's k smallest DISTINCT 'kmv|' md5 hash VALUES over
    its distinct customer keys — the standard theta-sketch SET
    discipline (two keys colliding to one hash count once; the bias is
    the hash's, and set semantics are what make k-min merge idempotent,
    which in turn is what lets the streaming writer
    (streaming/snapshots.py::kmv_year_snapshot_stream) produce a
    BIT-IDENTICAL store; review finding r11 aligned the batch side and
    both oracles on it — value-neutral on the test corpora: a probe
    found zero hash collisions per year at any SF). The sample is
    self-describing — a year holding fewer than k rows IS its complete
    set (exact-mode theta), so consumers derive fullness from count(h)
    alone.

    Build shape (the scale-polite per-group top-k): one distinct
    shuffle to (y, custkey) grain — the only full-data pass — then a
    TWO-PHASE k-min so no single reducer ever sorts a whole year's
    distinct stream: phase 1 takes the k smallest per (y, h mod 64)
    salt cell (64 bounded sorts per year, each over ~1/64th of the
    keys), phase 2 takes the k smallest of the <= 64k survivors per
    year. Correct because k-min is mergeable: every global top-k hash
    is within its salt cell's top-k, so the union of cell samples
    contains the year sample (the same partial-merge property the
    streaming monitor relies on). A closed year's sample is read-only
    forever; cold-build cost lands in BUILD_TIMES ->
    bench extra.artifact_builds."""
    from pyspark.sql import Window

    from ..functions.artifacts import ensure_table

    def build():
        dk = (
            _t(spark, sf_dir, "orders")
            .filter(
                F.col("o_custkey").isNotNull()
                & F.col("o_orderdate").isNotNull()
            )
            .select(
                F.year("o_orderdate").alias("y"),
                F.col("o_custkey").alias("k"),
            )
            .distinct()
            .select("y", _kmv_h(F.col("k")).alias("h"))
            # set semantics: distinct HASH VALUES (colliding keys fold)
            .distinct()
        )
        w1 = Window.partitionBy("y", F.pmod("h", F.lit(64))).orderBy("h")
        phase1 = (
            dk.withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= _KMV_K)
            .drop("rn")
        )
        w2 = Window.partitionBy("y").orderBy("h")
        return (
            phase1.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= _KMV_K)
            .drop("rn")
        )

    return ensure_table(spark, sf_dir, _KMV_YEARS_KIND, build)


# Rank band for the KLL contract: +/-20 permille around each target
# quantile. Worst-case deterministic KLL error at cap=512 on the test
# corpora (n per type <= ~30k, H = log2(n/cap) <= 6) is ~12 permille;
# the alternating-parity schedule cancels most of that in practice, so
# the band carries >3x measured margin. Production sizes cap with the
# target n like any sketch parameter (error ~ H/cap).
_KLL_BANDS = ((500, 480, 520), (950, 930, 970), (990, 970, 1000))


@query(
    "events_quantile_sketch_kll",
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value)
                   AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL
    ), w AS (
        SELECT event_type,
               MIN(CASE WHEN rk = (n * 500 + 999) // 1000 THEN value END)
                   AS d50,
               MIN(CASE WHEN rk = (n * 950 + 999) // 1000 THEN value END)
                   AS d95,
               MIN(CASE WHEN rk = (n * 990 + 999) // 1000 THEN value END)
                   AS d99,
               COUNT(*) AS n_events
        FROM r GROUP BY event_type
    )
    SELECT event_type, 500 AS q_permille, d50 AS exact_value,
           1 AS kll_in_band, n_events AS sketch_weight, n_events FROM w
    UNION ALL
    SELECT event_type, 950, d95, 1, n_events, n_events FROM w
    UNION ALL
    SELECT event_type, 990, d99, 1, n_events, n_events FROM w
    """,
)
def events_quantile_sketch_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch built IN the engine (ROADMAP r10
    candidate #3): per-partition KLL compactor builds emit bounded
    (level, value) item tables via mapInPandas, ONE applyInPandas reduce
    per event_type merges them and reads off p50/p95/p99 — the two-phase
    build+merge shape that replaces a 100 TB sort with a shuffle of
    fixed-size sketches, demonstrated structurally instead of delegated
    to percentile_approx (events_value_quantiles keeps that entry).

    Hash-checked through TWO contracts the oracle can state exactly:
    (1) the GK entry's rank-band — each estimate must lie between the
    exact q-/+20-permille discrete quantiles (functions/kll.py docs the
    deterministic error bound; the band carries >3x margin at the test
    SFs), so `kll_in_band` is the literal 1; and (2) EXACT total weight —
    compaction halves items while doubling weight, so `sketch_weight`
    must equal n_events bit-for-bit, which pins the mergeability
    bookkeeping (a dropped or double-counted partial sketch breaks it).
    The sketch's internal items legitimately depend on partitioning
    (like Spark's own GK summaries); every emitted column is
    partition-invariant, which the 7/61-partition sweeps require.

    The merge sorts incoming item rows by (level, value) before folding,
    so one type's result is deterministic regardless of which executor
    finished first. Exact quantiles and band edges ride the
    (type, value, count) GRAIN — map-side-combinable, windows bounded by
    value cardinality, no sort of the raw stream anywhere (the
    events_value_quantiles discipline)."""
    from ..functions import kll

    # event_type IS NOT NULL on BOTH engines (self-review): the pandas
    # groupby in the build stage drops NULL keys (dropna default) and a
    # NULL key could never survive the final equi-join anyway, while the
    # oracle's GROUP BY would keep the NULL group — filter symmetrically
    # so nullable inputs can't diverge the engines. Latent on current
    # corpora (zero NULL event_type rows), fixed on principle.
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "value")
    )

    def build(batches):
        import pandas as pd

        sketches: dict = {}
        for pdf in batches:
            for t, vals in pdf.groupby("event_type")["value"]:
                sk = sketches.setdefault(t, kll.new_sketch())
                kll.add_many(sk, vals.to_numpy())
        rows = [
            (t, l, v)
            for t, sk in sketches.items()
            for l, v in kll.to_items(sk)
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["event_type", "level", "value"])

    partials = ev.mapInPandas(
        build, schema="event_type string, level int, value double"
    )

    bands = _KLL_BANDS

    def merge(pdf):
        import pandas as pd

        t = pdf["event_type"].iloc[0]
        ordered = pdf.sort_values(["level", "value"])
        sk = kll.new_sketch()
        kll.merge_items(sk, zip(ordered["level"], ordered["value"]))
        w = kll.total_weight(sk)
        return pd.DataFrame(
            {
                "event_type": [t] * len(bands),
                "q_permille": [q for q, _, _ in bands],
                "est": [kll.quantile(sk, q) for q, _, _ in bands],
                "sketch_weight": [w] * len(bands),
            }
        )

    ests = partials.groupBy("event_type").applyInPandas(
        merge,
        schema="event_type string, q_permille int, est double, sketch_weight long",
    )

    return _kll_band_verdict(ests, _kll_exact_rank_table(ev, bands), bands)


def _kll_exact_rank_table(ev: DataFrame, bands) -> DataFrame:
    """Per-type exact discrete quantiles and band edges over the
    (type, value, count) GRAIN — the rank-selection kernel both KLL
    entries verify against (map-side-combinable aggregate, windows
    bounded by value cardinality, no sort of the raw stream)."""
    from pyspark.sql import Window

    w_cum = Window.partitionBy("event_type").orderBy("value")
    w_type = Window.partitionBy("event_type")
    g = (
        ev.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("n", F.sum("c").over(w_type))
    )

    def disc(num: int):
        return F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {num} + 999) div 1000"),
                F.col("value"),
            )
        )

    aggs = []
    for q, lo, hi in bands:
        aggs += [
            disc(lo).alias(f"lo{q}"),
            disc(q).alias(f"d{q}"),
            disc(hi).alias(f"hi{q}"),
        ]
    return g.groupBy("event_type").agg(F.max("n").alias("n_events"), *aggs)


def _kll_band_verdict(
    ests: DataFrame, ranks: DataFrame, bands, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Join estimates onto the broadcast rank table and emit the shared
    output contract: exact_value + the kll_in_band bit per
    (type, q_permille), plus the entry's own audit columns."""
    exact = F.lit(None).cast("double")
    lo_e = F.lit(None).cast("double")
    hi_e = F.lit(None).cast("double")
    for q, _, _ in bands:
        is_q = F.col("q_permille") == q
        exact = F.when(is_q, F.col(f"d{q}")).otherwise(exact)
        lo_e = F.when(is_q, F.col(f"lo{q}")).otherwise(lo_e)
        hi_e = F.when(is_q, F.col(f"hi{q}")).otherwise(hi_e)
    return ests.join(F.broadcast(ranks), "event_type").select(
        "event_type",
        "q_permille",
        exact.alias("exact_value"),
        ((F.col("est") >= lo_e) & (F.col("est") <= hi_e))
        .cast("int")
        .alias("kll_in_band"),
        "sketch_weight",
        *extra_cols,
        "n_events",
    )


_KLL_CELLS_KIND = "kll_day_cells"


def _kll_day_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-(event_type, day) KLL CELL sketches, stored as their
    serialized (level, value) item tables — the KLL mirror of
    _hll_day_cells (r10's HLL migration, extended to the quantile family
    per the r10 verdict ask #2): the one raw pass the rollup family
    shares moves behind ensure_table, so yesterday's cell sketches never
    rebuild. Day cells are again the natural artifact grain — a new day
    appends <= types x cap item rows while historical cells are
    read-only forever, and KLL's mergeability means ANY coarser rollup
    (per type here; per week/month at a real deployment) is a merge of
    cell items, never a rescan of raw values. Build shape: one
    mapInPandas partial build keyed by (type, day) -> one applyInPandas
    cell merge per (type, day); the merge sorts its input items, so the
    artifact's CONTENT is deterministic even though the partials depend
    on partitioning (consumers sort again, and every emitted query
    column stays partition-invariant — the 7/61-partition sweep
    contract). NULL filters match the rollup's oracle exactly (value,
    event_type, ts all NOT NULL). Cold-build cost lands in
    BUILD_TIMES -> bench extra.artifact_builds."""
    from ..functions import kll
    from ..functions.artifacts import ensure_table

    def build_table():
        ev = (
            _t(spark, sf_dir, "events")
            .filter(
                F.col("value").isNotNull()
                & F.col("event_type").isNotNull()
                & F.col("ts").isNotNull()
            )
            .select("event_type", F.to_date("ts").alias("day"), "value")
        )

        def build(batches):
            import pandas as pd

            sketches: dict = {}
            for pdf in batches:
                for (t, d), vals in pdf.groupby(["event_type", "day"])[
                    "value"
                ]:
                    sk = sketches.setdefault((t, d), kll.new_sketch())
                    kll.add_many(sk, vals.to_numpy())
            rows = [
                (t, d, l, v)
                for (t, d), sk in sketches.items()
                for l, v in kll.to_items(sk)
            ]
            if rows:
                yield pd.DataFrame(
                    rows, columns=["event_type", "day", "level", "value"]
                )

        partials = ev.mapInPandas(
            build,
            schema="event_type string, day date, level int, value double",
        )

        def cell_merge(pdf):
            import pandas as pd

            t = pdf["event_type"].iloc[0]
            d = pdf["day"].iloc[0]
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

        return partials.groupBy("event_type", "day").applyInPandas(
            cell_merge,
            schema="event_type string, day date, level int, value double",
        )

    return ensure_table(spark, sf_dir, _KLL_CELLS_KIND, build_table)


@query(
    "events_quantile_rollup_kll",
    oracle="""
    WITH base AS (
        SELECT event_type, value, CAST(ts AS DATE) AS day
        FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL
          AND ts IS NOT NULL
    ), r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value)
                   AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ), w AS (
        SELECT event_type,
               MIN(CASE WHEN rk = (n * 500 + 999) // 1000 THEN value END)
                   AS d50,
               MIN(CASE WHEN rk = (n * 950 + 999) // 1000 THEN value END)
                   AS d95,
               MIN(CASE WHEN rk = (n * 990 + 999) // 1000 THEN value END)
                   AS d99,
               COUNT(*) AS n_events
        FROM r GROUP BY event_type
    ), cells AS (
        SELECT event_type, COUNT(DISTINCT day) AS n_cells
        FROM base GROUP BY event_type
    )
    SELECT w.event_type, 500 AS q_permille, d50 AS exact_value,
           1 AS kll_in_band, n_events AS sketch_weight, c.n_cells, n_events
    FROM w JOIN cells c ON w.event_type = c.event_type
    UNION ALL
    SELECT w.event_type, 950, d95, 1, n_events, c.n_cells, n_events
    FROM w JOIN cells c ON w.event_type = c.event_type
    UNION ALL
    SELECT w.event_type, 990, d99, 1, n_events, c.n_cells, n_events
    FROM w JOIN cells c ON w.event_type = c.event_type
    """,
)
def events_quantile_rollup_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical sketch rollup — the property that makes MERGEABLE
    sketches matter at 100 TB, demonstrated structurally: per-(type, day)
    CELL sketches are built from ONE pass over the raw values, and the
    per-type result is a merge of the CELLS' serialized items — raw data
    is never rescanned at the coarser grain. This is the cube-cell
    pattern (store a sketch per partition/day cell; answer any coarser
    rollup by merging cells), which a non-mergeable quantile algorithm
    simply cannot do.

    The cell build is a PERSISTED ARTIFACT since r11 (_kll_day_cells —
    the KLL mirror of the HLL family's r10 day-cell migration): the
    live plan reads item-sized parquet and runs ONE applyInPandas TYPE
    merge consuming cell items only; the only live scan of events is
    the exact-rank truth pass the contract itself requires. Contracts,
    all exact in the oracle: the rank band (two stacked compaction
    layers still sit far inside the +/-20-permille band — cells are
    day-sized, so most cell sketches are exact and the type merge pays
    the only compaction), sketch_weight == n_events bit-for-bit THROUGH
    the hierarchy (weight exactness composes across merge levels), and
    n_cells == the exact distinct-day count per type (a dropped or
    double-merged cell moves it). Merges sort their input items, so
    executor arrival order — and the artifact's parquet row order —
    can't perturb anything."""
    from ..functions import kll

    # truth-pass input (exact ranks + n_events): same symmetric NULL
    # filters as the artifact build and the oracle's rank CTE
    ev = (
        _t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select("event_type", F.to_date("ts").alias("day"), "value")
    )

    cells = _kll_day_cells(spark, sf_dir)

    bands = _KLL_BANDS

    def type_merge(pdf):
        import pandas as pd

        t = pdf["event_type"].iloc[0]
        n_cells = int(pdf["day"].nunique())
        ordered = pdf.sort_values(["level", "value"])
        sk = kll.new_sketch()
        kll.merge_items(sk, zip(ordered["level"], ordered["value"]))
        w = kll.total_weight(sk)
        return pd.DataFrame(
            {
                "event_type": [t] * len(bands),
                "q_permille": [q for q, _, _ in bands],
                "est": [kll.quantile(sk, q) for q, _, _ in bands],
                "sketch_weight": [w] * len(bands),
                "n_cells": [n_cells] * len(bands),
            }
        )

    ests = cells.groupBy("event_type").applyInPandas(
        type_merge,
        schema="event_type string, q_permille int, est double, "
        "sketch_weight long, n_cells long",
    )

    ranks = _kll_exact_rank_table(ev.select("event_type", "value"), bands)
    return _kll_band_verdict(ests, ranks, bands, extra_cols=("n_cells",))


# HLL geometry and register math live in functions/hll.py (ONE
# definition shared with the streaming monitor, streaming/distinct.py);
# re-exported here for the oracle f-string and the tests.
from ..functions import hll as _hll  # noqa: E402

_HLL_M = _hll.M
_HLL_RHO_MAX = _hll.RHO_MAX


def _hll_idx_sql(key_expr: str) -> str:
    """DuckDB twin of functions/hll.idx_col — ONE definition for every
    HLL oracle (the _slot/_slot_sql pattern): first 2 md5 hex chars as
    the register index."""
    return (
        f"CAST(CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)), "
        f"1, 2)) AS UBIGINT) AS INTEGER)"
    )


def _hll_rho_sql(key_expr: str) -> str:
    """DuckDB twin of functions/hll.rho_col: leading-zero rank of the
    40-bit field (hex chars 3-12), all-zero capped at RHO_MAX."""
    w = (
        f"CAST(CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)), "
        f"3, 10)) AS UBIGINT) AS BIGINT)"
    )
    return (
        f"CAST(CASE WHEN {w} = 0 THEN {_HLL_RHO_MAX} "
        f"ELSE {_HLL_RHO_MAX} - length(bin({w})) END AS INTEGER)"
    )
# 20% relative band (>3 sigma at rsd 6.5%) with an absolute floor of 10
# for tiny groups; measured rel err at the test SFs is 3.0-4.2%.
_HLL_REL, _HLL_ABS = 0.20, 10.0

_HLL_CELLS_KIND = "hll_day_cells"


def _hll_day_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-(event_type, day, idx) HLL register cells — the ONE
    raw pass the batch HLL family shares, moved behind ensure_table so
    the rollup and sliding entries stop rebuilding yesterday's cells on
    every run (the amortization the LSH family's signature tables
    already have; r9 verdict ask #3 / ROADMAP #4). Day cells are the
    natural artifact grain: at 100 TB a new day appends <= types x 256
    register rows while every historical cell is read-only forever —
    exactly what a build-once table wants. NULL-ts rows are KEPT as
    day-NULL cell rows: the rollup's registers must include them (a
    user is distinct regardless of a broken timestamp) while every
    calendar-anchored consumer — the rollup's n_cells via countDistinct,
    the sliding windows via an explicit filter — must not see them.
    Cold-build cost lands in BUILD_TIMES -> bench extra.artifact_builds;
    staleness is handled by the artifact key hashing the corpus
    directory listing (functions/artifacts.py)."""
    from ..functions.artifacts import ensure_table

    def build():
        ev = (
            _t(spark, sf_dir, "events")
            .filter(
                F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
            )
            .select("event_type", F.to_date("ts").alias("day"), "user_id")
        )
        return (
            ev.select(
                "event_type",
                "day",
                _hll.idx_col(F.col("user_id")).alias("idx"),
                _hll.rho_col(F.col("user_id")).alias("rho"),
            )
            .groupBy("event_type", "day", "idx")
            .agg(F.max("rho").alias("reg_val"))
        )

    return ensure_table(spark, sf_dir, _HLL_CELLS_KIND, build)


_HLL_YEAR_REGS_KIND = "hll_year_regs"


def _hll_year_regs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-(order year, idx) HLL register table over distinct
    order customers — the snapshot artifact that turns the set-algebra
    docstring's 100 TB claim ('per-period register tables are persisted
    once and ANY pair's answer is an m-row merge, never a re-scan') into
    a plan fact (r10 verdict ask #1). One raw pass over orders,
    partial-aggregated map-side to <= years x 256 rows; a closed period's
    registers are read-only forever, and ANY pair/range question
    (union, retention, inclusion-exclusion intersection) is a
    register-wise max over the relevant year rows — see
    orders_hll_union_from_snapshots for the pinned zero-fact-scan
    consumer. Cold-build cost lands in BUILD_TIMES ->
    bench extra.artifact_builds."""
    from ..functions.artifacts import ensure_table

    def build():
        o = (
            _t(spark, sf_dir, "orders")
            .filter(
                F.col("o_custkey").isNotNull()
                & F.col("o_orderdate").isNotNull()
            )
            .select(
                F.year("o_orderdate").alias("y"),
                F.col("o_custkey").alias("c"),
            )
        )
        return (
            o.select(
                "y",
                _hll.idx_col(F.col("c")).alias("idx"),
                _hll.rho_col(F.col("c")).alias("rho"),
            )
            .groupBy("y", "idx")
            .agg(F.max("rho").alias("reg"))
        )

    return ensure_table(spark, sf_dir, _HLL_YEAR_REGS_KIND, build)


@query(
    "events_distinct_hll_rollup",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ), rh AS (
        SELECT event_type,
               {_hll_idx_sql("user_id")} AS idx,
               {_hll_rho_sql("user_id")} AS rho
        FROM du
    ), regs AS (
        SELECT event_type, idx, MAX(rho) AS reg_val FROM rh GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, CAST(g.i AS INTEGER) AS reg_idx
        FROM (SELECT DISTINCT event_type FROM du) t
        CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS i) g
    ), filled AS (
        SELECT g.event_type, g.reg_idx,
               CAST(COALESCE(r.reg_val, 0) AS INTEGER) AS reg_val
        FROM grid g
        LEFT JOIN regs r ON g.event_type = r.event_type AND g.reg_idx = r.idx
    ), summ AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN reg_val = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS v_zero,
               CAST(SUM(CAST(2 AS BIGINT) ** ({_HLL_RHO_MAX} - reg_val))
                   AS BIGINT) AS sum_inv_scaled
        FROM filled GROUP BY 1
    ), nc AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_cells
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1
    ), ex AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1
    )
    SELECT f.event_type, f.reg_idx, f.reg_val, s.v_zero, s.sum_inv_scaled,
           nc.n_cells, ex.exact_distinct, 1 AS hll_in_band
    FROM filled f
    JOIN summ s USING (event_type)
    JOIN nc USING (event_type)
    JOIN ex USING (event_type)
    """,
)
def events_distinct_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built IN the engine with register-level cross-engine
    exactness — the distinct-count counterpart of the KLL pair: where
    dedup_approx_distinct wraps Spark's HLL++ (estimate engine-private,
    checkable only through a relative-error bit), this entry derives
    every register from md5 bits both engines standardize, so the FULL
    register table hash-matches the oracle and the sketch itself — not
    just a claim about it — is the verified output.

    Cube-cell mergeability, same hierarchy as events_quantile_rollup_kll:
    per-(type, day) CELL registers are built from ONE pass over the raw
    stream, and the per-type registers are a register-wise MAX of the
    cells — raw data is never rescanned at the coarser grain, and max's
    associativity makes the merged table equal the flat build the oracle
    computes, bit for bit (THE mergeable-sketch property, asserted as
    hash equality, with n_cells == exact distinct-day count pinning that
    every cell arrived exactly once). Unlike the KLL pair this whole
    plan is JVM codegen — md5/conv/bin/length column math, zero Python.

    Contract columns: (reg_idx, reg_val) the bit-exact registers;
    v_zero and sum_inv_scaled = sum(2^(41 - reg)) the harmonic-sum
    bookkeeping as EXACT BIGINTs (the float estimate never crosses the
    engine boundary); exact_distinct the true count; hll_in_band the
    one-sided claim bit — Spark computes the standard HLL estimate
    (alpha_m * m^2 / sum, linear-counting branch below 2.5m when zero
    registers remain) and asserts |est - exact| <= max(20% * exact, 10)
    — 3.0-4.2% measured at the test SFs, which also exercise BOTH
    branches (linear at sf0.001/0.01, raw HLL at sf0.1). The oracle
    emits literal 1, so an out-of-band estimate is a driver hash red.

    Scale shape: registers are FIXED-SIZE state — the cell build
    partial-aggregates to (type, day, idx) grain map-side (<= cells x
    256 rows regardless of corpus size) and since r10 is a PERSISTED
    ARTIFACT (_hll_day_cells, shared with the sliding entry), so the
    live plan reads register-sized parquet and the only raw pass left
    is the exact-truth countDistinct the contract itself requires
    (drop it and the sketch path never touches events at all). At
    100 TB 'how many distinct X per group' ships ~256 bytes per live
    cell to one coordinator-sized merge instead of shuffling the
    distinct-value stream — and the day grain means yesterday's
    registers never rebuild (the incremental property the cube-cell
    layout exists for)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "user_id")
    )
    # The cell build is a PERSISTED ARTIFACT shared with the sliding
    # entry (r10 migration): the live plan reads register-sized parquet
    # instead of rebuilding the cells from raw events every run. The
    # truth pass still lands in a localCheckpoint (dual consumer: grid
    # spine + summary join), so the only live scans are of the cell
    # table — never of events.parquet.
    cells = _hll_day_cells(spark, sf_dir)
    typeregs = cells.groupBy("event_type", "idx").agg(
        F.max("reg_val").alias("reg_val")
    )
    # countDistinct (not distinct().count()) so a NULL day — a row with
    # NULL ts still contributes registers but is no calendar cell —
    # can't count as a cell here while the oracle's COUNT(DISTINCT)
    # excludes it (the KLL NULL-key symmetry lesson; latent on current
    # corpora, which have no NULL ts).
    ncells = cells.groupBy("event_type").agg(
        F.countDistinct("day").alias("n_cells")
    )
    # The truth pass: exact distinct is part of the contract, so the raw
    # stream is read a second time at countDistinct grain; its output is
    # also the per-type grid spine (no third scan — the 256-slot spine
    # is an explode of a literal sequence, not a join).
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    ).localCheckpoint()

    grid = exact.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("reg_idx"),
    )
    filled = (
        grid.join(
            typeregs.withColumnRenamed("idx", "reg_idx"),
            ["event_type", "reg_idx"],
            "left",
        )
        .withColumn("reg_val", F.coalesce("reg_val", F.lit(0)))
    )

    summ = filled.groupBy("event_type").agg(
        F.sum((F.col("reg_val") == 0).cast("int")).cast("long").alias("v_zero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(_HLL_RHO_MAX) - F.col("reg_val")).cast(
                "long"
            )
        )
        .cast("long")
        .alias("sum_inv_scaled"),
    )

    # ONE estimator definition for the whole batch family (r10
    # self-review: this branch logic was inlined three times)
    est = _hll.estimate_col(F.col("v_zero"), F.col("sum_inv_scaled"))
    band = F.greatest(
        F.lit(_HLL_REL) * F.col("exact_distinct"), F.lit(_HLL_ABS)
    )
    s = (
        summ.join(ncells, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "v_zero",
            "sum_inv_scaled",
            "n_cells",
            "exact_distinct",
            (F.abs(est - F.col("exact_distinct")) <= band)
            .cast("int")
            .alias("hll_in_band"),
        )
    )
    return filled.join(F.broadcast(s), "event_type").select(
        "event_type",
        "reg_idx",
        "reg_val",
        "v_zero",
        "sum_inv_scaled",
        "n_cells",
        "exact_distinct",
        "hll_in_band",
    )


_HLL_WIN_DAYS = 7


@query(
    "events_distinct_hll_sliding",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL
    ), wins AS (
        SELECT DISTINCT event_type, day AS win_end FROM du
    ), wu AS (
        SELECT DISTINCT w.event_type, w.win_end, d.user_id
        FROM wins w
        JOIN du d ON d.event_type = w.event_type
                 AND d.day <= w.win_end
                 AND d.day > w.win_end - {_HLL_WIN_DAYS}
    ), regs AS (
        SELECT event_type, win_end,
               {_hll_idx_sql("user_id")} AS idx,
               MAX({_hll_rho_sql("user_id")}) AS reg_val
        FROM wu GROUP BY 1, 2, 3
    ), summ AS (
        SELECT event_type, win_end,
               CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v_zero,
               CAST(SUM(CAST(2 AS BIGINT) ** ({_HLL_RHO_MAX} - reg_val))
                    + ({_HLL_M} - COUNT(*))
                      * (CAST(2 AS BIGINT) ** {_HLL_RHO_MAX})
                   AS BIGINT) AS sum_inv_scaled,
               CAST(SUM((idx + 1) * reg_val) AS BIGINT) AS reg_checksum
        FROM regs GROUP BY 1, 2
    ), ex AS (
        SELECT event_type, win_end,
               COUNT(DISTINCT user_id) AS exact_distinct
        FROM wu GROUP BY 1, 2
    ), nd AS (
        SELECT w.event_type, w.win_end,
               CAST(COUNT(DISTINCT d.day) AS BIGINT) AS n_days_in_win
        FROM wins w
        JOIN du d ON d.event_type = w.event_type
                 AND d.day <= w.win_end
                 AND d.day > w.win_end - {_HLL_WIN_DAYS}
        GROUP BY 1, 2
    )
    SELECT s.event_type, CAST(s.win_end AS VARCHAR) AS win_end,
           nd.n_days_in_win, ex.exact_distinct,
           s.v_zero, s.sum_inv_scaled, s.reg_checksum, 1 AS hll_in_band
    FROM summ s
    JOIN ex ON s.event_type = ex.event_type AND s.win_end = ex.win_end
    JOIN nd ON s.event_type = nd.event_type AND s.win_end = nd.win_end
    """,
)
def events_distinct_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct counts from REUSED day cells — the
    cube-cell claim applied to the problem it exists for. 'Distinct
    users per type over the trailing {w} days, for every observed day'
    exactly is a {w}x rescan (every row belongs to {w} windows); with
    mergeable registers each day cell is built ONCE from the single raw
    pass and then FANS OUT register rows (not data rows) to the <= {w}
    windows it serves — a per-window register-wise MAX finishes the
    job. At 100 TB the fan-out ships <= {w} * 256 ints per live
    (type, day) cell; yesterday's cells never rebuild when today's data
    arrives, which is the incremental property no exact distinct-count
    can have (distinct does not decompose over overlapping windows;
    register max does).

    Windows are anchored at each OBSERVED (type, day) — the window set
    itself is data-derived, so both engines agree on it by
    construction. Contract columns, all integer-exact cross-engine:
    per-window v_zero ({m} - touched registers; rho >= 1 makes 'touched'
    unambiguous, so no register grid is needed), the harmonic-sum
    BIGINT, and reg_checksum = sum((idx + 1) * reg_val) — position
    sensitive where the harmonic sum is value-multiset sensitive, the
    two together fingerprinting the register table the oracle rebuilds
    FLAT per window (different program, same registers: the
    mergeability identity again). n_days_in_win pins the ramp-up edge
    (windows near the corpus start see < {w} days), exact_distinct is
    the truth pass the contract requires, and hll_in_band is the
    one-sided estimate-band bit (same formula and band as the rollup
    entry; in band at every window of all three test SFs).

    Scale shape: day cells come from the PERSISTED shared artifact
    (_hll_day_cells — built once per corpus, r10 migration), so the
    live sketch path reads register-sized parquet and the window
    fan-out, register max, and summary all run on register-table-sized
    data; the ONLY raw pass left is the exact-truth countDistinct
    (drop it in production and the sliding answer costs register-sized
    reads and shuffles, regardless of window overlap — yesterday's
    cells are bytes on disk, not recomputation)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select("event_type", F.to_date("ts").alias("day"), "user_id")
    )

    # Day cells come from the PERSISTED shared artifact (r10 migration —
    # the same table the rollup merges): the live sketch path reads
    # register-sized parquet and never touches events. The artifact
    # keeps NULL-day cells for the rollup's register semantics; the
    # calendar-anchored window set must exclude them here.
    cells = _hll_day_cells(spark, sf_dir).filter(F.col("day").isNotNull())
    # observed (type, day) = the window anchors; node-sized, consumed by
    # three semi-joins below
    days = cells.select("event_type", "day").distinct().localCheckpoint()
    anchors = days.withColumnRenamed("day", "win_end")

    off = F.explode(F.sequence(F.lit(0), F.lit(_HLL_WIN_DAYS - 1))).alias(
        "off"
    )
    fan = (
        cells.select("event_type", "day", "idx", "reg_val", off)
        .withColumn("win_end", F.date_add(F.col("day"), F.col("off")))
        .join(F.broadcast(anchors), ["event_type", "win_end"], "left_semi")
    )
    # fan (register-grain, recomputed cheaply from the checkpointed
    # cells) serves BOTH the window registers and the day census — every
    # observed (type, day) has at least one cell row, so countDistinct
    # over fan's day column IS the per-window day count (no second
    # explode pipeline; self-review r9).
    winregs = fan.groupBy("event_type", "win_end", "idx").agg(
        F.max("reg_val").alias("reg_val")
    )
    ndays = fan.groupBy("event_type", "win_end").agg(
        F.countDistinct("day").alias("n_days_in_win")
    )
    _sw_vz, _sw_sis = _hll.summ_cols("reg_val")
    summ = winregs.groupBy("event_type", "win_end").agg(
        _sw_vz.alias("v_zero"),
        _sw_sis.alias("sum_inv_scaled"),
        F.sum((F.col("idx") + 1) * F.col("reg_val"))
        .cast("long")
        .alias("reg_checksum"),
    )
    # the truth pass: the contract's exact distinct per window — the
    # second (and in production, droppable) raw scan. Deduplicate to
    # (type, day, user) grain BEFORE the window fan-out (the oracle's
    # du/wu shape) so the 7x explode multiplies distinct user-days, not
    # raw event rows (self-review r9: the un-deduped form was exactly
    # the wx rescan the entry's own docstring rules out).
    #
    # r12 (optimization): the fanned COUNT DISTINCT became a fanned
    # plain COUNT. A user belongs to window w exactly once through
    # their FIRST active day inside w — i.e. the user-day d represents
    # its user for precisely the windows w in [d, d+{w}-1] whose start
    # lies past the user's previous active day (w - {w} >= prev ⟺
    # w > prev + {w} - 1). One lag() over the (type, user) day sequence
    # marks prev, the same 7x fan then emits each user-day only into
    # the windows it is first-of, and the per-window aggregate is a
    # map-side-partial count(*). The old shape shuffled the ENTIRE
    # fanned user-grain stream into a two-phase distinct aggregate —
    # at 100 TB that exchange is w x the distinct user-day table, where
    # the new exchange is |windows|-sized partial counts (measured at
    # sf0.1: the truth pass drops ~1.0 s -> ~0.5 s, full query 1.9 ->
    # 1.4 s; values identical — same set, counted by first member).
    du = ev.distinct()
    prev_w = Window.partitionBy("event_type", "user_id").orderBy("day")
    exact = (
        du.withColumn("prev", F.lag("day").over(prev_w))
        .select("event_type", "day", "prev", off)
        .withColumn("win_end", F.date_add(F.col("day"), F.col("off")))
        .filter(
            F.col("prev").isNull()
            | (
                F.col("win_end")
                > F.date_add(F.col("prev"), _HLL_WIN_DAYS - 1)
            )
        )
        .join(F.broadcast(anchors), ["event_type", "win_end"], "left_semi")
        .groupBy("event_type", "win_end")
        .agg(F.count("*").alias("exact_distinct"))
    )

    # ONE estimator definition for the whole batch family (r10
    # self-review: this branch logic was inlined three times)
    est = _hll.estimate_col(F.col("v_zero"), F.col("sum_inv_scaled"))
    band = F.greatest(
        F.lit(_HLL_REL) * F.col("exact_distinct"), F.lit(_HLL_ABS)
    )
    return (
        summ.join(ndays, ["event_type", "win_end"])
        .join(exact, ["event_type", "win_end"])
        .select(
            "event_type",
            # dates stringify differently across the two engines' pandas
            # paths (datetime.date vs datetime64) — the repo's temporal
            # convention: formatted strings cross the compare boundary
            F.date_format("win_end", "yyyy-MM-dd").alias("win_end"),
            "n_days_in_win",
            "exact_distinct",
            "v_zero",
            "sum_inv_scaled",
            "reg_checksum",
            (F.abs(est - F.col("exact_distinct")) <= band)
            .cast("int")
            .alias("hll_in_band"),
        )
    )


_fmt_doc(
    events_distinct_hll_sliding,
    w=_HLL_WIN_DAYS,
    m=_HLL_M,
)


_HLL_COHORTS = 8


@query(
    "ivm_hll_register_merge",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type, user_id,
               {_slot_sql("'0'", "user_id", _HLL_COHORTS)} AS bucket,
               {_hll_idx_sql("user_id")} AS idx,
               {_hll_rho_sql("user_id")} AS rho
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    ), full_regs AS (
        SELECT event_type, idx, MAX(rho) AS reg_val
        FROM du GROUP BY 1, 2
    ), old_regs AS (
        SELECT event_type, idx, MAX(rho) AS reg_val
        FROM du WHERE bucket <> 0 GROUP BY 1, 2
    ), flagged AS (
        SELECT f.event_type, f.idx AS reg_idx, f.reg_val,
               CASE WHEN o.reg_val IS NULL OR o.reg_val <> f.reg_val
                    THEN 1 ELSE 0 END AS changed
        FROM full_regs f
        LEFT JOIN old_regs o
          ON f.event_type = o.event_type AND f.idx = o.idx
    ), nch AS (
        SELECT event_type, CAST(SUM(changed) AS BIGINT) AS n_changed,
               CAST(COUNT(*) AS BIGINT) AS n_touched
        FROM flagged GROUP BY 1
    ), nd AS (
        SELECT event_type,
               COUNT(DISTINCT user_id) AS delta_users
        FROM du WHERE bucket = 0 GROUP BY 1
    )
    SELECT fl.event_type, fl.reg_idx, fl.reg_val, fl.changed,
           n.n_changed, n.n_touched, nd.delta_users
    FROM flagged fl
    JOIN nch n USING (event_type)
    JOIN nd USING (event_type)
    """,
)
def ivm_hll_register_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the HLL register state — the rollup
    entry CLAIMS existing registers never rebuild when new data arrives;
    this entry tests it as bit identity. An md5-derived 1/{c} cohort of
    users plays the arriving delta (a batch of previously-unregistered
    ids — the streaming monitor's reality): prior state (registers over
    the other {cm1}/{c}) max-merges with the delta cohort's registers,
    and the result must equal a from-scratch build over everyone — the
    oracle computes the rebuild, the engine runs the MERGE, and the
    driver hash proves merge == rebuild on every register. This is the
    IVM shape (ivm_status_year_revenue_merge etc.) applied to sketch
    state: the 'view' is the register table, the maintenance operator is
    associative MAX, and unlike SUM-based IVM it needs no retraction
    path — registers only grow, which is why sketch state is the easy
    case of incremental maintenance at 100 TB.

    Why a COHORT delta and not a newest-day delta: idx and rho are
    functions of user_id alone, so a register changes only when a NOVEL
    user first appears — and on this corpus every user is active every
    day, so a temporal split has zero novelty and n_changed would be 0
    everywhere (the merge would be indistinguishable from dropping the
    delta: caught before shipping by exactly that all-zero column). The
    cohort split makes the identity sharp: n_changed is 2 / 16 / 18 per
    type at the three test SFs, and the oracle recomputes every flag
    from its own old-vs-full diff, so the engine's merge can neither
    drop delta-only registers nor rewrite untouched ones.

    The `changed` bit and the per-type n_changed / n_touched /
    delta_users counters are the efficiency story the merge exists for:
    a delta of {d01} users touches 16 of 256 registers at sf0.01 — the
    daily state write is register-sized regardless of corpus size.

    Scale shape: ONE raw pass into the checkpointed (type, cohort-flag,
    idx) cell table; the split, both merges, the change flags, and the
    counters all run on register-sized data; zero live parquet scans,
    zero Python (pinned)."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select("event_type", "user_id")
    )
    is_delta = (_slot(0, F.col("user_id"), _HLL_COHORTS) == 0).cast("int")
    idx = _hll.idx_col(F.col("user_id"))
    rho = _hll.rho_col(F.col("user_id"))
    cells = (
        ev.select(
            "event_type",
            is_delta.alias("is_delta"),
            idx.alias("idx"),
            rho.alias("rho"),
            "user_id",
        )
        .groupBy("event_type", "is_delta", "idx")
        .agg(
            F.max("rho").alias("reg_val"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .localCheckpoint()  # ONE raw pass; feeds state, delta, counters
    )
    old_regs = (
        cells.filter(F.col("is_delta") == 0)
        .groupBy("event_type", "idx")
        .agg(F.max("reg_val").alias("reg_val"))
    )
    delta_regs = (
        cells.filter(F.col("is_delta") == 1)
        .groupBy("event_type", "idx")
        .agg(F.max("reg_val").alias("reg_val"))
    )
    # THE maintenance operator: state max-merge delta (the old cohort's
    # raw rows appear nowhere in this lineage past the cell build)
    merged = (
        old_regs.unionByName(delta_regs)
        .groupBy("event_type", "idx")
        .agg(F.max("reg_val").alias("reg_val"))
    )
    old_cmp = old_regs.select(
        "event_type", "idx", F.col("reg_val").alias("old_val")
    )
    flagged = (
        merged.join(old_cmp, ["event_type", "idx"], "left")
        .select(
            "event_type",
            F.col("idx").alias("reg_idx"),
            "reg_val",
            (
                F.col("old_val").isNull()
                | (F.col("old_val") != F.col("reg_val"))
            )
            .cast("int")
            .alias("changed"),
        )
        .localCheckpoint()  # feeds output AND the per-type counters
    )
    counters = flagged.groupBy("event_type").agg(
        F.sum("changed").cast("long").alias("n_changed"),
        F.count("*").cast("long").alias("n_touched"),
    )
    # delta_users is exact per cohort: the cell build carried
    # countDistinct per (type, is_delta, idx); distinct users partition
    # across idx (idx is a function of user_id), so the per-type sum is
    # the cohort's exact distinct count.
    dusers = (
        cells.filter(F.col("is_delta") == 1)
        .groupBy("event_type")
        .agg(F.sum("n_users").cast("long").alias("delta_users"))
    )
    return (
        flagged.join(F.broadcast(counters), "event_type")
        .join(F.broadcast(dusers), "event_type")
        .select(
            "event_type",
            "reg_idx",
            "reg_val",
            "changed",
            "n_changed",
            "n_touched",
            "delta_users",
        )
    )


_fmt_doc(
    ivm_hll_register_merge,
    c=_HLL_COHORTS,
    cm1=_HLL_COHORTS - 1,
    d01=23,
)


_HLL_SA_Y1, _HLL_SA_Y2 = 1995, 1996

# KMV difference error band: |est - exact| <= max(REL x n_union, ABS).
# Theory at k=64: the difference estimator is a single binomial sample
# at rate theta/space (~k/|larger side|), so sd(est) ~= sqrt(n_sampled)
# x space/theta <= union/sqrt(k-2) ~= 12.7% of union; REL=0.25 sits ~2x
# the one-sigma worst case. Measured on the (fixed, deterministic) test
# corpora — so the bit cannot flake — worst |est - exact|/union is
# 14.6% (sf0.01 churned, ~1.7 sigma); the other five direction x SF
# cells sit at 0.4-3.4% (full table per round in CORRECTNESS_NOTES,
# 'KMV measured error'). ABS floors tiny unions the way _HLL_ABS does.
_KMV_DIFF_REL, _KMV_DIFF_ABS = 0.25, 16.0


@query(
    "orders_hll_set_algebra",
    oracle=f"""
    WITH o AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_custkey AS c
        FROM orders
        WHERE year(o_orderdate) IN ({_HLL_SA_Y1}, {_HLL_SA_Y2})
          AND o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), dd AS (
        SELECT DISTINCT y, c FROM o
    ), rh AS (
        SELECT y, {_hll_idx_sql("c")} AS idx,
               MAX({_hll_rho_sql("c")}) AS reg
        FROM dd GROUP BY 1, 2
    ), uw AS (
        SELECT DISTINCT c FROM o
    ), ur AS (
        SELECT {_hll_idx_sql("c")} AS idx,
               MAX({_hll_rho_sql("c")}) AS reg
        FROM uw GROUP BY 1
    ), grid AS (
        SELECT CAST(unnest(generate_series(0, {_HLL_M - 1})) AS INTEGER)
            AS reg_idx
    ), fa AS (
        SELECT g.reg_idx, CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_a
        FROM grid g LEFT JOIN (SELECT idx, reg FROM rh
                               WHERE y = {_HLL_SA_Y1}) r
            ON g.reg_idx = r.idx
    ), fb AS (
        SELECT g.reg_idx, CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_b
        FROM grid g LEFT JOIN (SELECT idx, reg FROM rh
                               WHERE y = {_HLL_SA_Y2}) r
            ON g.reg_idx = r.idx
    ), fu AS (
        SELECT g.reg_idx, CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_u
        FROM grid g LEFT JOIN ur r ON g.reg_idx = r.idx
    ), counts AS (
        SELECT
            CAST((SELECT COUNT(*) FROM dd WHERE y = {_HLL_SA_Y1}) AS BIGINT)
                AS n_side_a,
            CAST((SELECT COUNT(*) FROM dd WHERE y = {_HLL_SA_Y2}) AS BIGINT)
                AS n_side_b,
            CAST((SELECT COUNT(*) FROM uw) AS BIGINT) AS n_union
    ), summ AS (
        SELECT
            CAST(SUM(CASE WHEN reg_u = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS v_zero_union,
            CAST(SUM(CAST(2 AS BIGINT) ** ({_HLL_RHO_MAX} - reg_u))
                AS BIGINT) AS sum_inv_scaled_union
        FROM fu
    )
    SELECT fa.reg_idx, fa.reg_a, fb.reg_b, fu.reg_u AS reg_union,
           c.n_side_a, c.n_side_b, c.n_union,
           c.n_side_a + c.n_side_b - c.n_union AS n_intersect,
           s.v_zero_union, s.sum_inv_scaled_union,
           1 AS union_in_band, 1 AS intersect_in_band
    FROM fa JOIN fb USING (reg_idx) JOIN fu USING (reg_idx)
    CROSS JOIN counts c CROSS JOIN summ s
    """,
)
def orders_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA — union as register max, intersection by
    inclusion-exclusion — on a question a retention dashboard actually
    asks: of the customers who ordered in {y1} and those who ordered in
    {y2}, how many are there combined, and how many came back? The two
    yearly sets genuinely differ (at sf0.01: 1174 vs 1168 customers,
    union 1429, intersection 913), so the algebra is exercised on
    partial overlap, not a degenerate identity.

    The mergeability identity, a third way: the rollup entry proves
    cell-merge == flat build, the IVM entry proves delta-merge ==
    rebuild; here Spark computes the union registers by REGISTER-WISE
    MAX of the two per-year register tables (never looking at the union
    of raw keys), while the oracle builds the union registers FLAT from
    ``SELECT DISTINCT c FROM both years``. Hash equality of all 256
    (reg_a, reg_b, reg_union) rows IS the proof that max-merge computes
    set union — different programs, same registers, per register.

    Intersection has no register-level identity (HLL registers do not
    intersect), which is exactly why the inclusion-exclusion estimate
    |A∩B| ≈ est(A) + est(B) - est(A∪B) exists; its error is relative to
    the UNION (each term carries ~1.04/sqrt(256) = 6.5% rsd), so the
    contract bit asserts |ie_est - exact| <= max({rel} * n_union, {ab})
    — measured worst case across the three test SFs is 10.0% of union
    (sf0.1), inside the band with 2x margin. All bookkeeping that
    crosses the engine boundary is integer-exact: registers, harmonic
    sum as BIGINT, exact counts (n_intersect = |A| + |B| - |A∪B| from
    exact distincts); the float estimates live and die Spark-side as
    the two in-band bits the oracle states as literal 1.

    Scale shape: since r11 the sketch path READS the persisted per-year
    register table (_hll_year_regs — built once per corpus, <= years x
    {m} rows; the '100 TB = {m}-row merge, never a re-scan' claim as a
    plan fact, with orders_hll_union_from_snapshots pinning the
    zero-fact-scan consumption). The exact counts are the contract's
    truth pass (one distinct shuffle, droppable in production — and the
    only orders scan left in this entry). Zero Python in the plan —
    md5/conv/bin column math end to end (pinned in
    tests/test_plan_shapes.py)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.year("o_orderdate").isin(_HLL_SA_Y1, _HLL_SA_Y2)
        )
        .select(F.year("o_orderdate").alias("y"), F.col("o_custkey").alias("c"))
    )

    # sketch path: the persisted per-year register artifact sliced to
    # the question's pair (identical rows to the inline build it
    # replaces: same hash family, same NULL filters, grouped max);
    # checkpointed because it feeds the per-side fill, the union merge,
    # and both estimate summaries
    regs = (
        _hll_year_regs(spark, sf_dir)
        .filter(F.col("y").isin(_HLL_SA_Y1, _HLL_SA_Y2))
        .localCheckpoint()
    )
    # THE MERGE PROGRAM: union registers from per-side registers only —
    # the raw key union is never formed on this path
    uregs = regs.groupBy("idx").agg(F.max("reg").alias("reg"))

    # truth pass: exact distincts — r12 (optimization): ONE key-grain
    # membership aggregate replaces the old distinct + checkpoint + two
    # filtered counts + second distinct-of-c + count (three jobs and two
    # distinct exchanges): per customer, max(y == y1) / max(y == y2)
    # flags fall out of the single groupBy("c") pass, and the three
    # exact counts are sums over that key-grain table. Same counts —
    # |distinct c in y1|, |distinct c in y2|, |distinct c overall| —
    # one shuffle, one job.
    per_c = o.groupBy("c").agg(
        F.max((F.col("y") == _HLL_SA_Y1).cast("int")).alias("in_a"),
        F.max((F.col("y") == _HLL_SA_Y2).cast("int")).alias("in_b"),
    )
    counts = per_c.agg(
        F.sum("in_a").cast("long").alias("n_side_a"),
        F.sum("in_b").cast("long").alias("n_side_b"),
        F.count("*").cast("long").alias("n_union"),
    ).localCheckpoint()  # 1-row truth: keeps the LIVE plan zero-scan
    # (the test-pinned invariant of this entry), same eager work the old
    # dd checkpoint paid — but one shuffle and one job instead of a
    # distinct + three counting consumers

    # shared column helpers (functions/hll.py): summ_cols coalesces the
    # touched-register sum to 0, so an EMPTY year side yields the exact
    # empty-sketch bookkeeping (v_zero = M, sis = M * 2^RHO_MAX) instead
    # of NULL-ing every estimate and band bit (r10 self-review finding)
    _sc_vz, _sc_sis = _hll.summ_cols("reg")

    def _summ(regdf):
        return regdf.agg(_sc_vz.alias("vz"), _sc_sis.alias("sis"))

    _est = _hll.estimate_col

    sa = _summ(regs.filter(F.col("y") == _HLL_SA_Y1)).select(
        F.col("vz").alias("vz_a"), F.col("sis").alias("sis_a")
    )
    sb = _summ(regs.filter(F.col("y") == _HLL_SA_Y2)).select(
        F.col("vz").alias("vz_b"), F.col("sis").alias("sis_b")
    )
    su = _summ(uregs).select(
        F.col("vz").alias("v_zero_union"),
        F.col("sis").alias("sum_inv_scaled_union"),
    )

    est_a = _est(F.col("vz_a"), F.col("sis_a"))
    est_b = _est(F.col("vz_b"), F.col("sis_b"))
    est_u = _est(F.col("v_zero_union"), F.col("sum_inv_scaled_union"))
    ie_est = est_a + est_b - est_u
    n_int = F.col("n_side_a") + F.col("n_side_b") - F.col("n_union")
    band = F.greatest(F.lit(_HLL_REL) * F.col("n_union"), F.lit(_HLL_ABS))
    # all six summaries are single-row: the crossJoin chain is the
    # 1-row-aggregate broadcast pattern (task_g/h), never a data join
    summary = (
        counts.crossJoin(sa)
        .crossJoin(sb)
        .crossJoin(su)
        .select(
            "n_side_a",
            "n_side_b",
            "n_union",
            n_int.alias("n_intersect"),
            "v_zero_union",
            "sum_inv_scaled_union",
            (F.abs(est_u - F.col("n_union")) <= band)
            .cast("int")
            .alias("union_in_band"),
            (F.abs(ie_est - n_int) <= band)
            .cast("int")
            .alias("intersect_in_band"),
        )
    )

    grid = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("reg_idx")
    )
    fill = (
        grid.join(
            regs.filter(F.col("y") == _HLL_SA_Y1).select(
                F.col("idx").alias("reg_idx"), F.col("reg").alias("reg_a")
            ),
            "reg_idx",
            "left",
        )
        .join(
            regs.filter(F.col("y") == _HLL_SA_Y2).select(
                F.col("idx").alias("reg_idx"), F.col("reg").alias("reg_b")
            ),
            "reg_idx",
            "left",
        )
        .join(
            uregs.select(
                F.col("idx").alias("reg_idx"), F.col("reg").alias("reg_union")
            ),
            "reg_idx",
            "left",
        )
        .select(
            "reg_idx",
            F.coalesce("reg_a", F.lit(0)).alias("reg_a"),
            F.coalesce("reg_b", F.lit(0)).alias("reg_b"),
            F.coalesce("reg_union", F.lit(0)).alias("reg_union"),
        )
    )
    return fill.crossJoin(F.broadcast(summary)).select(
        "reg_idx",
        "reg_a",
        "reg_b",
        "reg_union",
        "n_side_a",
        "n_side_b",
        "n_union",
        "n_intersect",
        "v_zero_union",
        "sum_inv_scaled_union",
        "union_in_band",
        "intersect_in_band",
    )


_fmt_doc(
    orders_hll_set_algebra,
    y1=_HLL_SA_Y1,
    y2=_HLL_SA_Y2,
    m=_HLL_M,
    rel=_HLL_REL,
    ab=int(_HLL_ABS),
)


@query(
    "orders_kmv_set_difference",
    oracle=f"""
    WITH a_keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE year(o_orderdate) = {_HLL_SA_Y1} AND o_custkey IS NOT NULL
    ), b_keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE year(o_orderdate) = {_HLL_SA_Y2} AND o_custkey IS NOT NULL
    ), a_h AS (
        SELECT {_kmv_h_sql("k")} AS h
        FROM a_keys
    ), b_h AS (
        SELECT {_kmv_h_sql("k")} AS h
        FROM b_keys
    ), sa AS (SELECT DISTINCT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
       sb AS (SELECT DISTINCT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
       theta AS (
        SELECT least(
            CASE WHEN (SELECT count(*) FROM sa) < {_KMV_K}
                 THEN {_KMV_SPACE} ELSE (SELECT max(h) FROM sa) END,
            CASE WHEN (SELECT count(*) FROM sb) < {_KMV_K}
                 THEN {_KMV_SPACE} ELSE (SELECT max(h) FROM sb) END
        ) AS t
    ), dab AS (
        SELECT count(*) AS n FROM sa CROSS JOIN theta
        WHERE h <= theta.t AND h NOT IN (SELECT h FROM sb)
    ), dba AS (
        SELECT count(*) AS n FROM sb CROSS JOIN theta
        WHERE h <= theta.t AND h NOT IN (SELECT h FROM sa)
    ), ex AS (
        SELECT (SELECT count(*) FROM (SELECT k FROM a_keys
                                      EXCEPT SELECT k FROM b_keys))
                   AS exact_ab,
               (SELECT count(*) FROM (SELECT k FROM b_keys
                                      EXCEPT SELECT k FROM a_keys))
                   AS exact_ba,
               (SELECT count(*) FROM (SELECT k FROM a_keys
                                      UNION SELECT k FROM b_keys))
                   AS n_union
    ), est AS (
        SELECT ex.exact_ab, ex.exact_ba, ex.n_union,
               dab.n * {_KMV_SPACE} // t.t AS est_ab,
               dba.n * {_KMV_SPACE} // t.t AS est_ba
        FROM ex CROSS JOIN dab CROSS JOIN dba CROSS JOIN theta t
    )
    SELECT 'churned' AS measure, exact_ab AS exact_count,
           est_ab AS kmv_estimate, n_union, 1 AS kmv_in_band FROM est
    UNION ALL SELECT 'new', exact_ba, est_ba, n_union, 1 FROM est
    """,
)
def orders_kmv_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET DIFFERENCE — the estimate HLL structurally
    cannot produce (registers have no difference identity, and
    inclusion-exclusion composes THREE estimators' errors), answered by
    the KMV sample instead: below the common theta, a hash is in the
    A-sketch's sample iff its key is in A, so
    |A\\B| ~= |{{h in sa : h <= theta, h not in sb}}| * space / theta is
    a direct sample estimate with single-estimator error. Same
    1995/1996 customer pair as orders_hll_set_algebra, so the sketch
    band tells one story: HLL answers union/retention, KMV answers
    churn (ordered in {y1}, gone in {y2}) and acquisition (new in
    {y2}) — the two directions emitted as (measure, exact_count,
    kmv_estimate) rows with the exact truth beside the estimate.

    Bit-exact cross-engine like its KMV sibling: the md5 'kmv|' hash
    family, int64 floor-divide estimates, membership below theta
    decided by an exact anti-join of <= k rows per side (below theta,
    sample membership IS set membership — the anti-join is not an
    approximation). Theta uses EXACT-MODE semantics: a sketch holding
    fewer than k samples is a complete sketch of its set, so its theta
    is the whole hash space, not its max sample — a degenerate side
    (empty year, tiny subset) must not shrink the other side's sampling
    region, and sub-k pairs become exactly correct (property-pinned in
    tests/test_properties.py; the sibling's intersection keeps
    sample-max theta, where the degradation is graceful because shared
    samples are shared keys).

    Error contract (r10 verdict ask #3, KLL-rank-band parity): the
    estimator's theoretical rsd at k={k} is ~1/sqrt(k-2) = 12.7% of the
    sampled-region mass; the emitted `kmv_in_band` bit asserts
    |estimate - exact| <= max({rel} x n_union, {ab}) per direction —
    the oracle states the bit as literal 1, so an out-of-band estimate
    is a driver hash red, not prose. Measured worst |est - exact| /
    n_union across the test SFs is recorded per round in
    CORRECTNESS_NOTES (r11: see 'KMV measured error').

    Scale shape: since r11 the samples are READ from the persisted
    per-year artifact (_kmv_year_samples — built once per corpus; see
    orders_kmv_diff_from_snapshots for the pinned zero-fact-scan
    consumption), so the only remaining full-data passes are the two
    distinct shuffles the exact-truth contract itself requires.
    Everything downstream is <= {k} rows per side. At 100 TB 'how many
    customers did we lose between any two periods' is answered from two
    {k}-row persisted samples, never a re-scan — and unlike the HLL
    path, the SAME sketches answer union, intersection, AND both
    differences."""
    orders = _t(spark, sf_dir, "orders")

    # truth pass (the contract's cost, droppable in production) —
    # r12 (optimization): ONE key-grain membership aggregate replaces
    # the two checkpointed per-year distinct key sets and the two
    # anti-join counts (two distinct exchanges + two materialization
    # jobs + two join aggregates -> one shuffle + one 1-row aggregate):
    # per customer, max(y == y1) / max(y == y2) flags decide both
    # difference counts and |B| as plain conditional sums. Identical
    # counts — |A\B|, |B\A|, |B| over distinct customers.
    o2 = (
        orders.filter(
            F.col("o_custkey").isNotNull()
            & F.year("o_orderdate").isin(_HLL_SA_Y1, _HLL_SA_Y2)
        )
        .select(F.year("o_orderdate").alias("y"), F.col("o_custkey").alias("k"))
    )
    per_k = o2.groupBy("k").agg(
        F.max((F.col("y") == _HLL_SA_Y1).cast("int")).alias("in_a"),
        F.max((F.col("y") == _HLL_SA_Y2).cast("int")).alias("in_b"),
    )
    counts = per_k.agg(
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("exact_ab"),
        F.sum(F.col("in_b") * (1 - F.col("in_a"))).alias("exact_ba"),
        F.sum("in_b").alias("n_b"),
    )
    # sketch path: the persisted per-year k-min samples, sliced to the
    # pair (identical values to the inline TakeOrdered build they
    # replace: same hash family over the same distinct keys). No
    # checkpoints — each slice is a <= k-row parquet read, cheaper to
    # re-scan per consumer than to materialize (r12).
    samples = _kmv_year_samples(spark, sf_dir)
    sa = samples.filter(F.col("y") == _HLL_SA_Y1).select("h")
    sb = samples.filter(F.col("y") == _HLL_SA_Y2).select("h")

    # exact-mode theta: a sketch holding fewer than k samples is a
    # COMPLETE sketch of its set — its theta is the whole hash space,
    # not its max sample (otherwise a degenerate side silently shrinks
    # the other side's sampling region; sub-k pairs become EXACT under
    # this rule, the property tests/test_properties.py pins)
    theta = (
        sa.agg(F.count("*").alias("na"), F.max("h").alias("ta"))
        .crossJoin(sb.agg(F.count("*").alias("nb"), F.max("h").alias("tb")))
        .select(
            F.least(
                F.when(F.col("na") < _KMV_K, F.lit(_KMV_SPACE)).otherwise(
                    F.col("ta")
                ),
                F.when(F.col("nb") < _KMV_K, F.lit(_KMV_SPACE)).otherwise(
                    F.col("tb")
                ),
            ).alias("t")
        )
    )
    # below theta, sample membership == set membership: exact anti-joins
    # over <= k rows decide the difference samples
    dab = (
        sa.crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("t"))
        .join(sb, "h", "left_anti")
        .agg(F.count("*").alias("nab"))
    )
    dba = (
        sb.crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("t"))
        .join(sa, "h", "left_anti")
        .agg(F.count("*").alias("nba"))
    )
    # |A u B| = |A \ B| + |B| — no third distinct pass needed
    band = F.greatest(
        F.lit(_KMV_DIFF_REL) * F.col("n_union"), F.lit(_KMV_DIFF_ABS)
    )
    est = (
        counts.crossJoin(dab)
        .crossJoin(dba)
        .crossJoin(theta)
        .withColumn(
            "n_union", (F.col("exact_ab") + F.col("n_b")).cast("long")
        )
        .select(
            "exact_ab",
            "exact_ba",
            "n_union",
            F.expr(f"nab * {_KMV_SPACE}L div t").alias("est_ab"),
            F.expr(f"nba * {_KMV_SPACE}L div t").alias("est_ba"),
        )
        .withColumn(
            "band_ab",
            (F.abs(F.col("est_ab") - F.col("exact_ab")) <= band).cast("int"),
        )
        .withColumn(
            "band_ba",
            (F.abs(F.col("est_ba") - F.col("exact_ba")) <= band).cast("int"),
        )
        .localCheckpoint()  # two 1-row consumers below
    )
    row = lambda m, e, s, b: est.select(  # noqa: E731
        F.lit(m).alias("measure"),
        F.col(e).cast("long").alias("exact_count"),
        F.col(s).cast("long").alias("kmv_estimate"),
        F.col("n_union"),
        F.col(b).alias("kmv_in_band"),
    )
    return row("churned", "exact_ab", "est_ab", "band_ab").unionByName(
        row("new", "exact_ba", "est_ba", "band_ba")
    )


_fmt_doc(
    orders_kmv_set_difference,
    y1=_HLL_SA_Y1,
    y2=_HLL_SA_Y2,
    k=_KMV_K,
    rel=_KMV_DIFF_REL,
    ab=int(_KMV_DIFF_ABS),
)


@query(
    "orders_kmv_diff_from_snapshots",
    oracle=f"""
    WITH a_keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE year(o_orderdate) = {_HLL_SA_Y1} AND o_custkey IS NOT NULL
    ), b_keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE year(o_orderdate) = {_HLL_SA_Y2} AND o_custkey IS NOT NULL
    ), a_h AS (
        SELECT {_kmv_h_sql("k")} AS h
        FROM a_keys
    ), b_h AS (
        SELECT {_kmv_h_sql("k")} AS h
        FROM b_keys
    ), sa AS (SELECT DISTINCT h FROM a_h ORDER BY h LIMIT {_KMV_K}),
       sb AS (SELECT DISTINCT h FROM b_h ORDER BY h LIMIT {_KMV_K}),
       theta AS (
        SELECT CAST(least(
            CASE WHEN (SELECT count(*) FROM sa) < {_KMV_K}
                 THEN {_KMV_SPACE} ELSE (SELECT max(h) FROM sa) END,
            CASE WHEN (SELECT count(*) FROM sb) < {_KMV_K}
                 THEN {_KMV_SPACE} ELSE (SELECT max(h) FROM sb) END
        ) AS BIGINT) AS t
    ), dab AS (
        SELECT count(*) AS n FROM sa CROSS JOIN theta
        WHERE h <= theta.t AND h NOT IN (SELECT h FROM sb)
    ), dba AS (
        SELECT count(*) AS n FROM sb CROSS JOIN theta
        WHERE h <= theta.t AND h NOT IN (SELECT h FROM sa)
    )
    SELECT 'churned' AS measure, dab.n AS n_below_theta, t.t AS theta,
           dab.n * {_KMV_SPACE} // t.t AS kmv_estimate
    FROM dab CROSS JOIN theta t
    UNION ALL
    SELECT 'new', dba.n, t.t, dba.n * {_KMV_SPACE} // t.t
    FROM dba CROSS JOIN theta t
    """,
)
def orders_kmv_diff_from_snapshots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB consumption pattern AS A PLAN FACT (r10 verdict ask
    #1): answer 'how many customers churned / were acquired between
    {y1} and {y2}' from the PERSISTED per-year KMV samples alone —
    the live plan's only scans are of the <= k-rows-per-year
    kmv_year_samples artifact; orders.parquet is never touched
    (pinned in tests/test_plan_shapes.py::
    test_kmv_snapshots_zero_fact_scan). This is the sibling entry the
    truth-bearing orders_kmv_set_difference points at: that entry
    carries the exact counts and the error band (both REQUIRE raw
    scans — exactness is what a scan buys), this one demonstrates that
    production answers need none.

    Same arithmetic as the sibling, bit-exact cross-engine: exact-mode
    theta (a sub-k sample is its complete set, theta = the whole hash
    space), membership below theta by exact anti-join of <= {k} rows
    per side, int64 floor-divide estimates. The oracle rebuilds the
    samples FLAT from raw orders in SQL — so the driver hash check
    proves the persisted snapshot path and a from-scratch build agree
    value-for-value, which is precisely the property that lets closed
    periods be served from snapshots forever.

    Emits (measure, n_below_theta, theta, kmv_estimate): the sample
    evidence (how many difference samples survived below theta, and
    theta itself) beside each estimate, so the estimate is auditable
    from the output alone."""
    samples = _kmv_year_samples(spark, sf_dir)
    sa = samples.filter(F.col("y") == _HLL_SA_Y1).select("h")
    sb = samples.filter(F.col("y") == _HLL_SA_Y2).select("h")

    theta = (
        sa.agg(F.count("*").alias("na"), F.max("h").alias("ta"))
        .crossJoin(sb.agg(F.count("*").alias("nb"), F.max("h").alias("tb")))
        .select(
            F.least(
                F.when(F.col("na") < _KMV_K, F.lit(_KMV_SPACE)).otherwise(
                    F.col("ta")
                ),
                F.when(F.col("nb") < _KMV_K, F.lit(_KMV_SPACE)).otherwise(
                    F.col("tb")
                ),
            )
            .cast("long")
            .alias("t")
        )
    )
    dab = (
        sa.crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("t"))
        .join(sb, "h", "left_anti")
        .agg(F.count("*").alias("nab"))
    )
    dba = (
        sb.crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("t"))
        .join(sa, "h", "left_anti")
        .agg(F.count("*").alias("nba"))
    )
    est = (
        dab.crossJoin(dba)
        .crossJoin(theta)
        .select(
            "nab",
            "nba",
            "t",
            F.expr(f"nab * {_KMV_SPACE}L div t").alias("est_ab"),
            F.expr(f"nba * {_KMV_SPACE}L div t").alias("est_ba"),
        )
    )
    row = lambda m, n, s: est.select(  # noqa: E731
        F.lit(m).alias("measure"),
        F.col(n).cast("long").alias("n_below_theta"),
        F.col("t").cast("long").alias("theta"),
        F.col(s).cast("long").alias("kmv_estimate"),
    )
    return row("churned", "nab", "est_ab").unionByName(
        row("new", "nba", "est_ba")
    )


_fmt_doc(
    orders_kmv_diff_from_snapshots,
    y1=_HLL_SA_Y1,
    y2=_HLL_SA_Y2,
    k=_KMV_K,
)


@query(
    "orders_hll_union_from_snapshots",
    oracle=f"""
    WITH o AS (
        SELECT year(o_orderdate) AS y, o_custkey AS c FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND year(o_orderdate) IN ({_HLL_SA_Y1}, {_HLL_SA_Y2})
    ), dd AS (
        SELECT DISTINCT y, c FROM o
    ), rh AS (
        SELECT y, {_hll_idx_sql("c")} AS idx,
               MAX({_hll_rho_sql("c")}) AS reg
        FROM dd GROUP BY 1, 2
    ), grid AS (
        SELECT CAST(unnest(generate_series(0, {_HLL_M - 1})) AS INTEGER)
            AS reg_idx
    ), fa AS (
        SELECT g.reg_idx, CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_a
        FROM grid g LEFT JOIN (SELECT idx, reg FROM rh
                               WHERE y = {_HLL_SA_Y1}) r
            ON g.reg_idx = r.idx
    ), fb AS (
        SELECT g.reg_idx, CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_b
        FROM grid g LEFT JOIN (SELECT idx, reg FROM rh
                               WHERE y = {_HLL_SA_Y2}) r
            ON g.reg_idx = r.idx
    ), ur AS (
        SELECT idx, MAX(reg) AS reg FROM rh GROUP BY 1
    ), fu AS (
        SELECT g.reg_idx, CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_union
        FROM grid g LEFT JOIN ur r ON g.reg_idx = r.idx
    ), summ AS (
        SELECT
            CAST(SUM(CASE WHEN reg_union = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS v_zero_union,
            CAST(SUM(CAST(2 AS BIGINT) ** ({_HLL_RHO_MAX} - reg_union))
                AS BIGINT) AS sum_inv_scaled_union
        FROM fu
    )
    SELECT fa.reg_idx, fa.reg_a, fb.reg_b, fu.reg_union,
           s.v_zero_union, s.sum_inv_scaled_union
    FROM fa JOIN fb USING (reg_idx) JOIN fu USING (reg_idx)
    CROSS JOIN summ s
    """,
)
def orders_hll_union_from_snapshots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The HLL side of the snapshot story (r10 verdict ask #1,
    _hll_year_regs consumer): the {y1}/{y2} union registers computed
    ENTIRELY from the persisted per-year register table — the live
    plan's only scans are of the <= years x {m}-row hll_year_regs
    artifact; orders.parquet is never touched (pinned in
    tests/test_plan_shapes.py::test_hll_snapshots_zero_fact_scan).
    Where orders_hll_set_algebra proves max-merge == flat-build WITH
    the exact-truth scans its band contract requires, this entry is
    the production shape: registers in, registers out, nothing
    data-sized anywhere.

    The oracle rebuilds all three register tables FLAT from raw orders
    (per-side registers from each year's distinct customers, union
    registers from the per-side maxima) — hash equality of all {m}
    (reg_a, reg_b, reg_union) rows therefore proves the persisted
    snapshot path agrees with a from-scratch build register-for-
    register, the identity that lets ANY pair/range question over
    closed periods be answered from an {m}-row merge forever. The
    union's harmonic-sum bookkeeping crosses the engine boundary as
    exact BIGINTs (v_zero_union, sum_inv_scaled_union = sum over all
    {m} registers of 2^({rho_max} - reg)); the float estimate, as
    always, never does."""
    regs = _hll_year_regs(spark, sf_dir).filter(
        F.col("y").isin(_HLL_SA_Y1, _HLL_SA_Y2)
    )
    # THE MERGE PROGRAM, now over persisted state: union registers by
    # register-wise max of the two per-year snapshot slices
    uregs = regs.groupBy("idx").agg(F.max("reg").alias("reg"))

    grid = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("reg_idx")
    )
    fill = (
        grid.join(
            regs.filter(F.col("y") == _HLL_SA_Y1).select(
                F.col("idx").alias("reg_idx"), F.col("reg").alias("reg_a")
            ),
            "reg_idx",
            "left",
        )
        .join(
            regs.filter(F.col("y") == _HLL_SA_Y2).select(
                F.col("idx").alias("reg_idx"), F.col("reg").alias("reg_b")
            ),
            "reg_idx",
            "left",
        )
        .join(
            uregs.select(
                F.col("idx").alias("reg_idx"), F.col("reg").alias("reg_union")
            ),
            "reg_idx",
            "left",
        )
        .select(
            "reg_idx",
            F.coalesce("reg_a", F.lit(0)).alias("reg_a"),
            F.coalesce("reg_b", F.lit(0)).alias("reg_b"),
            F.coalesce("reg_union", F.lit(0)).alias("reg_union"),
        )
    )
    # sparse-table summary over the union's touched registers (the
    # summ_cols contract: empty registers contribute 2^RHO_MAX each)
    vz, sis = _hll.summ_cols("reg")
    summ = uregs.agg(
        vz.alias("v_zero_union"), sis.alias("sum_inv_scaled_union")
    )
    return fill.crossJoin(F.broadcast(summ)).select(
        "reg_idx",
        "reg_a",
        "reg_b",
        "reg_union",
        "v_zero_union",
        "sum_inv_scaled_union",
    )


_fmt_doc(
    orders_hll_union_from_snapshots,
    y1=_HLL_SA_Y1,
    y2=_HLL_SA_Y2,
    m=_HLL_M,
    rho_max=_HLL_RHO_MAX,
)


@query(
    "orders_hll_cumulative_from_snapshots",
    oracle=f"""
    WITH o AS (
        SELECT year(o_orderdate) AS y, o_custkey AS c FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), years AS (
        SELECT DISTINCT y FROM o
    ), cum AS (
        SELECT DISTINCT yr.y AS y, o.c
        FROM years yr JOIN o ON o.y <= yr.y
    ), rh AS (
        SELECT y, {_hll_idx_sql("c")} AS idx,
               MAX({_hll_rho_sql("c")}) AS reg
        FROM cum GROUP BY 1, 2
    ), grid AS (
        SELECT yr.y, CAST(g.i AS INTEGER) AS reg_idx
        FROM years yr
        CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS i) g
    ), filled AS (
        SELECT g.y, g.reg_idx,
               CAST(COALESCE(r.reg, 0) AS INTEGER) AS reg_cum
        FROM grid g
        LEFT JOIN rh r ON g.y = r.y AND g.reg_idx = r.idx
    ), summ AS (
        SELECT y,
               CAST(SUM(CASE WHEN reg_cum = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS v_zero_cum,
               CAST(SUM(CAST(2 AS BIGINT) ** ({_HLL_RHO_MAX} - reg_cum))
                   AS BIGINT) AS sum_inv_scaled_cum
        FROM filled GROUP BY 1
    )
    SELECT f.y, f.reg_idx, f.reg_cum, s.v_zero_cum, s.sum_inv_scaled_cum
    FROM filled f JOIN summ s USING (y)
    """,
)
def orders_hll_cumulative_from_snapshots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RANGE rollup from snapshots — the shape the per-period artifact
    exists for, beyond the point pair: cumulative distinct customers
    per year ('how many unique customers have we EVER had, by year' —
    the standard lifetime-reach dashboard line), computed as a RUNNING
    REGISTER MAX over the persisted per-year register table. One dense
    (year x {m}) fill of the snapshot slices, one unbounded-preceding
    window max per register lane — years x {m} rows end to end, zero
    scans of orders.parquet (pinned in tests/test_plan_shapes.py::
    test_hll_cumulative_snapshots_zero_fact_scan_window_merge).

    The mergeability identity, extended from pairs to RANGES: the
    oracle builds each cumulative register set FLAT (the raw-key union
    of every year <= y — a triangle join it re-runs from raw orders),
    while Spark never sees a raw key; hash equality of all years x {m}
    (y, reg_idx, reg_cum) rows proves running-max-over-snapshots ==
    flat-build for every prefix range at once. Per-year harmonic-sum
    bookkeeping crosses the engine boundary as exact BIGINTs, as
    always.

    Scale shape: at 100 TB the cumulative-reach line is years x {m}
    register rows read from the snapshot table and ONE window pass —
    no re-scan of any closed period, and appending a new period
    extends the line by merging one more {m}-row slice (the same
    incremental property the day-cell artifacts give the event
    family). The window partitions by register lane ({m} concurrent
    lanes), so no single reducer ever holds more than years rows."""
    from pyspark.sql import Window

    regs = _hll_year_regs(spark, sf_dir)
    # (year x M) spine by exploding a literal sequence per year row —
    # the rollup entry's grid pattern, no join in the spine
    grid = (
        regs.select("y")
        .distinct()
        .select(
            "y",
            F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias(
                "reg_idx"
            ),
        )
    )
    dense = grid.join(
        regs.select("y", F.col("idx").alias("reg_idx"), "reg"),
        ["y", "reg_idx"],
        "left",
    ).select("y", "reg_idx", F.coalesce("reg", F.lit(0)).alias("reg"))
    w = (
        Window.partitionBy("reg_idx")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.select(
        "y", "reg_idx", F.max("reg").over(w).cast("int").alias("reg_cum")
    )
    summ = cum.groupBy("y").agg(
        F.sum((F.col("reg_cum") == 0).cast("int"))
        .cast("long")
        .alias("v_zero_cum"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(_HLL_RHO_MAX) - F.col("reg_cum")).cast(
                "long"
            )
        )
        .cast("long")
        .alias("sum_inv_scaled_cum"),
    )
    return cum.join(F.broadcast(summ), "y").select(
        "y", "reg_idx", "reg_cum", "v_zero_cum", "sum_inv_scaled_cum"
    )


_fmt_doc(
    orders_hll_cumulative_from_snapshots,
    m=_HLL_M,
)


@query(
    "orders_kmv_cumulative_from_snapshots",
    oracle=f"""
    WITH o AS (
        SELECT DISTINCT year(o_orderdate) AS y, o_custkey AS c FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), years AS (
        SELECT DISTINCT y FROM o
    ), cum AS (
        SELECT DISTINCT yr.y AS y, {_kmv_h_sql("o.c")} AS h
        FROM years yr JOIN o ON o.y <= yr.y
    ), ranked AS (
        SELECT y, h,
               row_number() OVER (PARTITION BY y ORDER BY h) AS rk
        FROM cum
    ), samp AS (
        SELECT y, h FROM ranked WHERE rk <= {_KMV_K}
    ), summ AS (
        SELECT y, CAST(count(*) AS BIGINT) AS n_sample,
               CAST(CASE WHEN count(*) < {_KMV_K} THEN {_KMV_SPACE}
                    ELSE max(h) END AS BIGINT) AS theta
        FROM samp GROUP BY y
    )
    SELECT s.y, s.h, m.n_sample, m.theta,
           CAST(CASE WHEN m.n_sample < {_KMV_K} THEN m.n_sample
                ELSE ({_KMV_K} - 1) * {_KMV_SPACE} // m.theta END
               AS BIGINT) AS kmv_estimate
    FROM samp s JOIN summ m USING (y)
    """,
)
def orders_kmv_cumulative_from_snapshots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KMV RANGE union from snapshots (r11 verdict ask #4 — the
    sample-algebra twin of orders_hll_cumulative_from_snapshots):
    cumulative distinct customers per year, derived ENTIRELY from the
    persisted per-year k-min samples. The prefix-union sample for year
    y is the k smallest distinct hashes across the year samples <= y —
    correct by k-min mergeability: a hash among the k smallest of the
    prefix's TRUE union is necessarily within its own year's top-k
    (were k smaller hashes present in that year, they would also
    precede it in the union), so folding snapshot samples loses
    nothing; and a sub-k fold means EVERY contributing year sample was
    sub-k (each complete), so the prefix sample is its complete set
    (exact-mode theta). The oracle rebuilds every prefix flat from raw
    orders, so the driver hash proves sample-fold == from-scratch for
    all ranges at once.

    Plan shape (pinned in tests/test_plan_shapes.py::
    test_kmv_cumulative_snapshots_zero_fact_scan): every scan is the
    <= years x {k}-row kmv_year_samples artifact, orders.parquet is
    never read, and the prefix expansion is a literal-sequence explode
    from each hash's FIRST year to the corpus max year (a Generate +
    broadcast equi-join with the real year set — no non-equi join, no
    cartesian; the oracle pays the triangle join, Spark does not).
    Rows: (y, h) sample rows with per-year summary columns (n_sample,
    theta, kmv_estimate) — the estimate is the family's exact int64
    arithmetic ((k-1) * space div theta on full sketches, n itself on
    sub-k = complete sets). At 100x the fact table this query's cost
    does not change: it reads <= years x {k} sample rows, expands to
    <= years^2 x {k} candidates, and never touches a closed period's
    raw data."""
    samples = _kmv_year_samples(spark, sf_dir)
    # each distinct hash enters the prefix union at its FIRST year...
    first = samples.groupBy("h").agg(F.min("y").alias("fy"))
    maxy = samples.agg(F.max("y").alias("maxy"))
    years = samples.select("y").distinct()
    # ...and stays a candidate for every later year that EXISTS in the
    # corpus (explode to the integer range, equi-join the real years —
    # missing years must not fabricate prefix rows)
    cand = (
        first.crossJoin(F.broadcast(maxy))
        .select(
            F.explode(
                F.sequence(F.col("fy"), F.col("maxy"))
            ).alias("y"),
            "h",
        )
        .join(F.broadcast(years), "y")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("y").orderBy("h")
    samp = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
    )
    summ = samp.groupBy("y").agg(
        F.count("*").cast("long").alias("n_sample"),
        F.max("h").alias("mx"),
    )
    summ = summ.select(
        "y",
        "n_sample",
        F.when(F.col("n_sample") < _KMV_K, F.lit(_KMV_SPACE))
        .otherwise(F.col("mx"))
        .cast("long")
        .alias("theta"),
    ).withColumn(
        "kmv_estimate",
        F.when(F.col("n_sample") < _KMV_K, F.col("n_sample"))
        .otherwise(F.expr(f"{_KMV_K - 1}L * {_KMV_SPACE}L div theta"))
        .cast("long"),
    )
    return samp.join(F.broadcast(summ), "y").select(
        "y", "h", "n_sample", "theta", "kmv_estimate"
    )


_fmt_doc(
    orders_kmv_cumulative_from_snapshots,
    k=_KMV_K,
)


@query(
    "hll_cells_compaction_plan",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL
    ), cells AS (
        SELECT DISTINCT event_type, day,
               {_hll_idx_sql("user_id")} AS idx
        FROM ev
    )
    SELECT strftime(date_trunc('month', day), '%Y-%m') AS month,
           CAST(COUNT(DISTINCT (event_type, day)) AS BIGINT)
               AS n_day_cells,
           CAST(COUNT(*) AS BIGINT) AS rows_before,
           CAST(COUNT(DISTINCT (event_type, idx)) AS BIGINT)
               AS rows_after,
           CAST(COUNT(*) - COUNT(DISTINCT (event_type, idx)) AS BIGINT)
               AS rows_saved
    FROM cells GROUP BY 1
    """,
)
def hll_cells_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-store OPTIMIZE planner (r11 verdict ask #5 — the
    maintenance leg of the artifact lifecycle, mirroring
    shards_compaction_plan's role for export shards): per calendar
    month, how many (event_type, day) HLL cell groups the day-grain
    store holds, how many register rows they occupy, and how many rows
    a month-grain fold would keep — the exact bookkeeping
    operators/sketch_compaction.py::compact_hll_day_cells acts on.
    rows_after counts distinct (event_type, idx) pairs because register
    max folds every day's row for one (type, lane) into ONE month row;
    rows_saved is the reclaimable row count, exact by construction.

    The live plan reads ONLY the persisted hll_day_cells artifact —
    cell-sized parquet, zero scans of raw events (pinned in
    tests/test_plan_shapes.py::test_hll_compaction_plan_zero_fact_scan)
    — while the oracle rebuilds the census flat from raw events, so the
    driver hash proves the artifact's cell inventory agrees with a
    from-scratch build. Day-NULL cells (kept in the artifact for the
    rollup's register truth) have no calendar month and are excluded
    here, exactly as every calendar-anchored consumer excludes them.
    Months cross the compare boundary as 'yyyy-MM' VARCHAR (the r9
    temporal-compare rule)."""
    cells = _hll_day_cells(spark, sf_dir).filter(F.col("day").isNotNull())
    return (
        cells.groupBy(
            F.date_format(F.trunc("day", "month"), "yyyy-MM").alias("month")
        )
        .agg(
            F.countDistinct("event_type", "day")
            .cast("long")
            .alias("n_day_cells"),
            F.count("*").cast("long").alias("rows_before"),
            F.countDistinct("event_type", "idx")
            .cast("long")
            .alias("rows_after"),
        )
        .withColumn(
            "rows_saved",
            (F.col("rows_before") - F.col("rows_after")).cast("long"),
        )
    )
