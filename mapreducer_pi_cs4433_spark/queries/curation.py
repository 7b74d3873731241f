"""Round-7 band: corpus curation & maintenance operators.

Six operators a large-scale training-data pipeline runs between ingest and
export, each with a DuckDB oracle twin and an explicit 100 TB shape:

- ``orders_pareto_frontier`` — 2-D skyline (Pareto frontier) via grain
  reduction + one tiny-table window, never the quadratic NOT-EXISTS scan.
- ``shards_compaction_plan`` — the lakehouse OPTIMIZE planner: greedy
  cumulative-sum bin packing of undersized files into target-size bins.
- ``text_vocab_coverage`` — tokenizer-vocabulary coverage / OOV rate per
  source against the global top-K token vocabulary.
- ``scd2_asof_diff`` — dimension drift: each user's SCD2 state at two
  probe times (T2 = corpus watermark, T1 = T2 - 7d) and a changed flag.
- ``events_late_arrival_census`` — watermark planning: how late do events
  arrive relative to the per-user running event-time maximum, bucketed.
- ``embedding_pc1_power_iter`` — distributed PCA direction: exact-integer
  Gram matrix via per-partition numpy GEMM partials, then two power-
  iteration steps on the d x d table.

Cross-engine determinism follows the catalog rules (catalog.py module
docstring): int64 centi/milli fixed-point everywhere a float would leak
summation order, second-truncated epoch arithmetic, total ORDER BY with
key tie-breaks, `div`/`//` truncation parity (property-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.artifacts import ensure_table
from .catalog import _fmt_doc, _t, query

# ---------------------------------------------------------------------------
# 1. Pareto frontier (skyline)
# ---------------------------------------------------------------------------


@query(
    "orders_pareto_frontier",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_centi,
               epoch(date_trunc('second', o_orderdate)) AS d_s,
               strftime(date_trunc('second', o_orderdate),
                        '%Y-%m-%d %H:%M:%S') AS order_date
        FROM orders
    ), grain AS (
        SELECT price_centi, min(d_s) AS md FROM o GROUP BY price_centi
    ), fr AS (
        SELECT price_centi, md,
               min(md) OVER (
                   ORDER BY price_centi DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS pmin
        FROM grain
    )
    SELECT o.o_orderkey, o.o_custkey, o.price_centi, o.order_date
    FROM o JOIN fr ON o.price_centi = fr.price_centi AND o.d_s = fr.md
    WHERE fr.pmin IS NULL OR fr.md < fr.pmin
    """,
)
def orders_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal orders on (maximize price, minimize order date): an
    order is on the frontier iff no other order has price >= AND date <=
    with at least one strict — the skyline operator.

    The textbook NOT-EXISTS formulation is a quadratic self-join; the
    scale shape here is three-step: (1) reduce to the distinct-price
    GRAIN with min(date) per price — one partial-aggregated shuffle, the
    only full-data pass; (2) one window over the price-sorted grain table
    (|distinct prices| rows, trivially small next to the fact table)
    computing the strict-prefix min date — a price survives iff its min
    date beats every higher price's; (3) join the surviving (price,
    min-date) pairs back to the facts to emit all tied frontier orders.
    The back-join's right side is frontier-sized, so Spark broadcasts it.
    Equal (price, date) duplicates all survive (neither dominates), which
    both engines express identically. Ties inside a price collapse to the
    grain min BEFORE the window, so the prefix scan never sees them.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_centi"),
        F.col("o_orderdate").cast("timestamp_ltz").cast("long").alias("d_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_date"),
    )
    grain = o.groupBy("price_centi").agg(F.min("d_s").alias("md"))
    w = (
        Window.orderBy(F.desc("price_centi"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fr = (
        grain.withColumn("pmin", F.min("md").over(w))
        .filter(F.col("pmin").isNull() | (F.col("md") < F.col("pmin")))
        .select(F.col("price_centi").alias("fpc"), F.col("md").alias("fd"))
    )
    return o.join(
        F.broadcast(fr),
        (F.col("price_centi") == F.col("fpc")) & (F.col("d_s") == F.col("fd")),
    ).select("o_orderkey", "o_custkey", "price_centi", "order_date")


# ---------------------------------------------------------------------------
# 2. Compaction planner (lakehouse OPTIMIZE)
# ---------------------------------------------------------------------------

_FILE_BUCKETS = 64          # synthetic "file" grain: md5 bucket of doc_id
_COMPACT_TARGET = 100_000   # target bin size in chars


@query(
    "shards_compaction_plan",
    oracle=f"""
    WITH files AS (
        SELECT source,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
                 % {_FILE_BUCKETS} AS file_id,
               CAST(sum(n_chars) AS BIGINT) AS f_chars,
               count(*) AS f_docs
        FROM documents GROUP BY 1, 2
    ), planned AS (
        SELECT source, file_id, f_chars, f_docs,
               coalesce(sum(f_chars) OVER (
                   PARTITION BY source
                   ORDER BY f_chars DESC, file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // {_COMPACT_TARGET} AS bin
        FROM files
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           count(*) AS n_files,
           CAST(sum(f_chars) AS BIGINT) AS bin_chars,
           CAST(sum(f_docs) AS BIGINT) AS bin_docs,
           max(f_chars) AS largest_file_chars
    FROM planned GROUP BY source, bin
    """,
)
def shards_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (OPTIMIZE) planner: group a partition's undersized files
    into target-size rewrite bins — the maintenance job every lakehouse
    table needs once streaming ingest has sprayed small files. "Files"
    here are the synthetic md5-bucket grain over documents (the same
    two-hex-char assignment as sinks.export_shards), sized by char count.

    The plan is greedy next-fit by cumulative size: files sort largest-
    first within their partition (source) and a file's bin is its
    EXCLUSIVE running-size prefix floor-divided by the target — bins fill
    to >= target in one ordered pass, deterministic via the (size desc,
    file_id) total order and int64 `div`/`//` parity. Scale shape: the
    file inventory aggregates down from the corpus in one shuffle (at
    100 TB you read the table MANIFEST instead — same grain, zero scan);
    the planner itself is one window + one aggregate over the
    files-per-partition table, and each output row is a self-contained
    rewrite task (source, bin -> file set), embarrassingly parallel to
    execute."""
    from ..sources.sinks import shard_column

    docs = _t(spark, sf_dir, "documents")
    files = (
        docs.withColumn("file_id", shard_column("doc_id", _FILE_BUCKETS))
        .groupBy("source", "file_id")
        .agg(
            F.sum("n_chars").cast("long").alias("f_chars"),
            F.count("*").alias("f_docs"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("f_chars"), F.asc("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("f_chars").over(w), F.lit(0))
    planned = (
        files.withColumn("cum0", cum)
        .withColumn("bin", F.expr(f"cum0 div {_COMPACT_TARGET}"))
        .drop("cum0")
    )
    return planned.groupBy("source", "bin").agg(
        F.count("*").alias("n_files"),
        F.sum("f_chars").cast("long").alias("bin_chars"),
        F.sum("f_docs").cast("long").alias("bin_docs"),
        F.max("f_chars").alias("largest_file_chars"),
    )


# ---------------------------------------------------------------------------
# 3. Vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------

_VOCAB_K = 500


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT source, word, count(*) AS c
        FROM (
            SELECT source,
                   unnest(regexp_split_to_array(text, '\\s+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY source, word
    ), vocab AS (
        SELECT word FROM (
            SELECT word, row_number() OVER (
                       ORDER BY sum(c) DESC, word ASC
                   ) AS rk
            FROM tok GROUP BY word
        ) WHERE rk <= {_VOCAB_K}
    )
    SELECT t.source,
           CAST(sum(t.c) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN v.word IS NULL THEN t.c ELSE 0 END)
                AS BIGINT) AS oov_tokens,
           CAST(sum(CASE WHEN v.word IS NULL THEN t.c ELSE 0 END)
                AS BIGINT) * 1000000
               // CAST(sum(t.c) AS BIGINT) AS oov_ppm
    FROM tok t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.source
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the global top-{K}
    token vocabulary (by count, ties broken by token string) and report
    each source's out-of-vocabulary token rate — the number a tokenizer
    owner checks before freezing a vocab, and per-source because OOV
    concentrates in domains (code, non-English) that a global average
    hides.

    Scale shape: tokens aggregate to the (source, token) grain in ONE
    shuffle (partial agg absorbs the explode); the global vocab ranks the
    token-grain rollup of that table — the row_number window is a global
    sort, but over |distinct tokens| rows, not the corpus, and TakeOrdered
    semantics (rank <= K) keep it a top-K, never a full materialized sort.
    The coverage join probes the K-row vocab — broadcast — so the fact-
    sized side never reshuffles. Shares are int64 ppm floor-divides."""
    from ..operators import social

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(F.split(F.col("text"), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    tok = words.groupBy("source", "word").agg(F.count("*").alias("c"))
    # tok feeds both the vocab ranking and the coverage join — checkpoint
    # the (source, token) grain so the corpus-sized explode runs ONCE
    # (catalog invariant: multi-consumer subtrees re-execute per consumer)
    tok = tok.localCheckpoint()
    wv = Window.orderBy(F.desc("gc"), F.asc("word"))
    vocab = (
        tok.groupBy("word")
        .agg(F.sum("c").alias("gc"))
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") <= _VOCAB_K)
        .select(F.col("word").alias("vword"))
    )
    oov_c = F.when(F.col("vword").isNull(), F.col("c")).otherwise(0)
    return (
        tok.join(F.broadcast(vocab), tok["word"] == F.col("vword"), "left")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("total_tokens"),
            F.sum(oov_c).cast("long").alias("oov_tokens"),
        )
        .select(
            "source",
            "total_tokens",
            "oov_tokens",
            F.expr("oov_tokens * 1000000 div total_tokens").alias("oov_ppm"),
        )
    )


_fmt_doc(text_vocab_coverage, K=_VOCAB_K)


# ---------------------------------------------------------------------------
# 4. SCD2 drift between two probe times
# ---------------------------------------------------------------------------

_DIFF_DAYS = 7


@query(
    "scd2_asof_diff",
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
               epoch(date_trunc('second', min(ts))) AS vf_s
        FROM runs GROUP BY user_id, version
    ), ref AS (
        SELECT epoch(date_trunc('second', max(ts))) AS t2_s FROM events
    )
    SELECT h2.user_id,
           h1.state_t1,
           h2.state_t2,
           CAST(h1.state_t1 IS DISTINCT FROM h2.state_t2 AS INT) AS changed
    FROM (
        SELECT user_id, max_by(state, version) AS state_t2
        FROM hist CROSS JOIN ref WHERE vf_s <= t2_s
        GROUP BY user_id
    ) h2
    LEFT JOIN (
        SELECT user_id, max_by(state, version) AS state_t1
        FROM hist CROSS JOIN ref WHERE vf_s <= t2_s - {_DIFF_DAYS * 86400}
        GROUP BY user_id
    ) h1 ON h2.user_id = h1.user_id
    """,
)
def scd2_asof_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension drift report: each user's SCD2 state AS OF two probe
    times — T2 = the corpus event-time watermark (global max ts), T1 =
    T2 minus {D} days — plus a changed flag. This is the time-travel
    question every slowly-changing dimension exists to answer ("what
    moved in the last week?"), composed from the same ``_state_runs``
    kernel as the SCD2 history and point-in-time entries.

    Scale shape: the run table builds in ONE user_id exchange (shared
    kernel); each probe is a filtered per-user max_by over the RUN grain
    (|runs| rows, far below the event log), and the two probes join on
    user_id. The watermark is a 1-row broadcast aggregate, never a driver
    readback. State selection is by version order (max_by version), the
    deterministic total order of the run table; the changed flag is the
    null-safe comparison cast to int on both engines (a user whose
    history starts inside the window has state_t1 NULL = "new user",
    counted as changed)."""
    from .incremental import _state_runs

    events = _t(spark, sf_dir, "events")
    runs = _state_runs(events).select(
        "user_id",
        "version",
        "state",
        F.col("vf").cast("long").alias("vf_s"),
    )
    # runs feeds both probes and ref feeds both broadcasts — checkpoint
    # each so the event log is scanned exactly once per subtree (the
    # multi-consumer invariant; the two probe broadcasts would otherwise
    # re-run the watermark scan)
    runs = runs.localCheckpoint()
    ref = events.agg(
        F.max(F.col("ts").cast("long")).alias("t2_s")
    ).localCheckpoint()

    def probe(cutoff_expr, alias):
        return (
            runs.crossJoin(F.broadcast(ref))
            .filter(F.col("vf_s") <= cutoff_expr)
            .groupBy("user_id")
            .agg(F.max_by("state", "version").alias(alias))
        )

    h2 = probe(F.col("t2_s"), "state_t2")
    h1 = probe(F.col("t2_s") - _DIFF_DAYS * 86400, "state_t1").withColumnRenamed(
        "user_id", "u1"
    )
    return h2.join(h1, h2["user_id"] == F.col("u1"), "left").select(
        "user_id",
        "state_t1",
        "state_t2",
        (~F.col("state_t1").eqNullSafe(F.col("state_t2")))
        .cast("int")
        .alias("changed"),
    )


_fmt_doc(scd2_asof_diff, D=_DIFF_DAYS)


# ---------------------------------------------------------------------------
# 5. Late-arrival census (watermark planning)
# ---------------------------------------------------------------------------


@query(
    "events_late_arrival_census",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               greatest(
                   max(epoch(date_trunc('second', ts))) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - epoch(date_trunc('second', ts)), 0) AS late_s
        FROM events
    ), b AS (
        SELECT event_type,
               CASE WHEN late_s = 0 THEN 'a_in_order'
                    WHEN late_s < 60 THEN 'b_under_1m'
                    WHEN late_s < 3600 THEN 'c_under_1h'
                    WHEN late_s < 86400 THEN 'd_under_1d'
                    ELSE 'e_over_1d' END AS lateness,
               late_s
        FROM seq
    )
    SELECT event_type, lateness,
           count(*) AS n_events,
           CAST(max(late_s) AS BIGINT) AS max_late_s
    FROM b GROUP BY event_type, lateness
    """,
)
def events_late_arrival_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-planning census: per event, how far its event time lags
    the per-user RUNNING event-time maximum in arrival order (event_id —
    ingestion ids are monotone per producer), bucketed into the lateness
    bands a streaming job's watermark must choose between. The output
    answers "what fraction of events would a 1-minute / 1-hour / 1-day
    watermark drop?" BEFORE committing a streaming topology to it —
    exactly the calibration the streaming twins (streaming/sessions.py,
    streaming/funnel.py) take as their withWatermark argument.

    Scale shape: ONE user_id exchange for the running-max window (the
    module-standard entity partitioning), then a |types x 5|-row census
    aggregate. Lateness is second-truncated epoch arithmetic on both
    engines; bucket labels carry a sort prefix so every downstream
    consumer orders bands identically without a custom collation."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_s = F.col("ts").cast("long")
    late = F.greatest(F.max(ts_s).over(w) - ts_s, F.lit(0))
    bucket = (
        F.when(late == 0, "a_in_order")
        .when(late < 60, "b_under_1m")
        .when(late < 3600, "c_under_1h")
        .when(late < 86400, "d_under_1d")
        .otherwise("e_over_1d")
    )
    return (
        events.select(
            "event_type", late.alias("late_s"), bucket.alias("lateness")
        )
        .groupBy("event_type", "lateness")
        .agg(
            F.count("*").alias("n_events"),
            F.max("late_s").cast("long").alias("max_late_s"),
        )
    )


# ---------------------------------------------------------------------------
# 6. PCA direction via exact-integer Gram + power iteration
# ---------------------------------------------------------------------------

_GRAM_DIM = 64       # embedding dimensionality (TESTDATA.md)
_GRAM_SCALE = 1000   # milli fixed-point quantization of embedding values


def _gram_partials(dim: int, scale: int):
    """mapInPandas kernel: per Arrow batch, quantize the embedding block
    to int64 milli units and emit the upper-triangular entries of the
    exact integer Gram partial  Q^T Q  (a d x d int64 GEMM — numpy integer
    matmul, no float accumulation). floor() quantization (not round) so
    numpy and SQL agree on every value including exact halves."""
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(dim)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(m * scale).astype(np.int64)
            g = q.T @ q
            yield pd.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "g": g[iu]}
            )

    return fn


@query(
    "embedding_pc1_power_iter",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, g.i,
               CAST(floor(CAST(embedding[g.i] AS DOUBLE) * {_GRAM_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings CROSS JOIN generate_series(1, {_GRAM_DIM}) AS g(i)
        WHERE embedding IS NOT NULL
    ), tri AS (
        SELECT a.i, b.i AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS g
        FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    ), gram AS (
        SELECT i, j, g FROM tri
        UNION ALL
        SELECT j, i, g FROM tri WHERE i < j
    ), v1 AS (
        SELECT i AS dim, CAST(sum(g) AS BIGINT) AS v FROM gram GROUP BY i
    ), m1 AS (
        SELECT greatest(max(abs(v)), 1) AS m FROM v1
    ), v1s AS (
        SELECT dim, v * {_GRAM_SCALE} // m AS vs FROM v1 CROSS JOIN m1
    ), v2 AS (
        SELECT gram.i AS dim, CAST(sum(gram.g * v1s.vs) AS BIGINT) AS v
        FROM gram JOIN v1s ON gram.j = v1s.dim
        GROUP BY gram.i
    ), m2 AS (
        SELECT greatest(max(abs(v)), 1) AS m FROM v2
    )
    SELECT v2.dim,
           t.g AS g_diag,
           v2.v * {_GRAM_SCALE} // m2.m AS loading_milli
    FROM v2 CROSS JOIN m2
    JOIN tri t ON t.i = v2.dim AND t.j = v2.dim
    """,
)
def embedding_pc1_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal-component direction of the embedding corpus via
    two power-iteration steps on the Gram matrix — the PCA primitive
    behind whitening, spectral dedup diagnostics, and the anisotropy
    check run on embedding spaces before cosine thresholds are trusted.

    EXACT INTEGER end to end, so the oracle matches bit-for-bit where
    float PCA never could: embeddings quantize to int64 milli units
    (floor — numpy and SQL agree on every value), the Gram matrix
    accumulates integer products, and each power step renormalizes to
    +/-{S} by integer floor division (`div`/`//` truncation parity,
    property-pinned) with the max-abs as a 1-row broadcast.

    Scale shape — a distributed GEMM: each partition computes its LOCAL
    d x d Gram partial with one numpy int64 matmul (Arrow-batched
    mapInPandas), so the shuffle carries d(d+1)/2 = {T} rows per
    partition, NEVER the n x d matrix — corpus size only affects the
    embarrassingly-parallel map side. Both power steps are joins over the
    d^2-row Gram table: constant-size work. The Gram table feeds three
    consumers (v1, v2, diagonal) and is localCheckpoint()ed per the
    multi-consumer invariant — one corpus pass total."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("embedding")
    )
    tri = (
        emb.mapInPandas(
            _gram_partials(_GRAM_DIM, _GRAM_SCALE), schema="i INT, j INT, g LONG"
        )
        .groupBy("i", "j")
        .agg(F.sum("g").cast("long").alias("g"))
        .localCheckpoint()  # 3 consumers; cuts re-running the corpus GEMM
    )
    gram = tri.unionByName(
        tri.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g"
        )
    )
    v1 = gram.groupBy(F.col("i").alias("dim")).agg(
        F.sum("g").cast("long").alias("v")
    )
    m1 = v1.agg(F.greatest(F.max(F.abs(F.col("v"))), F.lit(1)).alias("m"))
    v1s = v1.crossJoin(F.broadcast(m1)).select(
        "dim", F.expr(f"v * {_GRAM_SCALE} div m").alias("vs")
    )
    v2 = (
        gram.join(F.broadcast(v1s), gram["j"] == v1s["dim"])
        .groupBy(F.col("i").alias("dim"))
        .agg(F.sum(F.col("g") * F.col("vs")).cast("long").alias("v"))
    )
    m2 = v2.agg(F.greatest(F.max(F.abs(F.col("v"))), F.lit(1)).alias("m"))
    diag = tri.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("ddim"), F.col("g").alias("g_diag")
    )
    return (
        v2.crossJoin(F.broadcast(m2))
        .join(F.broadcast(diag), v2["dim"] == F.col("ddim"))
        .select(
            "dim",
            "g_diag",
            F.expr(f"v * {_GRAM_SCALE} div m").alias("loading_milli"),
        )
    )


_fmt_doc(
    embedding_pc1_power_iter,
    S=_GRAM_SCALE,
    T=_GRAM_DIM * (_GRAM_DIM + 1) // 2,
)


# ---------------------------------------------------------------------------
# 7. Skew-remedied hot-key join + aggregation (operators/skew.py, registered)
# ---------------------------------------------------------------------------


_SKEW_SALT = 8


@query(
    "skew_salted_segment_value",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
               AS value_centi
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY mktsegment
    """,
)
def skew_salted_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value per market segment, computed through BOTH explicit skew
    remedies from ``operators/skew.py`` so each runs as a registered,
    oracle-checked query rather than a helper only tests touch:

    1. ``salted_join``: events (the fact side — at 100 TB a handful of
       power users make ``user_id`` hot) join the customer dimension on a
       SALTED key — fact rows get a deterministic row-identity salt, the
       dimension is replicated across all ``{SALT}`` buckets, so a hot user
       spreads over ``{SALT}`` shuffle partitions instead of serializing on
       one. This is the regime between "broadcastable" and "AQE is
       enough": the dimension is too big to broadcast outright at the
       target SF but cheap to replicate ``{SALT}``-fold.
    2. salted two-phase aggregation: the rollup key (``c_mktsegment``,
       5 values) has far fewer groups than shuffle partitions — the
       one-giant-group regime where a single reducer becomes the job's
       critical path for aggregates WITHOUT map-side partial pushdown.
       The explicit form aggregates per (segment, salt) first (fan-out
       ``{SALT}``), then per segment, so no reducer ever sees a whole
       group. count/sum carry partial pushdown anyway — what the oracle
       proves is salt-INVARIANCE: the result is bit-identical to the
       unsalted plain GROUP BY the DuckDB twin runs, independent of how
       rows landed in salt buckets.

    The salts come from ``xxhash64(monotonically_increasing_id())`` (row
    identity, not key), so a hot key's rows spread uniformly and counts/
    sums are reproducible under task retries. Money stays in int64
    centi-units (catalog determinism rules). Plan pins
    (tests/test_plan_shapes.py): join keys include ``_salt``, the
    dimension side carries the replicating explode, no BroadcastHashJoin
    under ``autoBroadcastJoinThreshold=-1``, and the aggregation shows
    the two-level (partial-per-salt -> final) HashAggregate chain.
    """
    from ..operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, "user_id", salt_buckets=_SKEW_SALT)
    return (
        joined.withColumn(
            "_gsalt",
            F.pmod(
                F.xxhash64(F.monotonically_increasing_id()),
                F.lit(_SKEW_SALT),
            ).cast("int"),
        )
        .groupBy("c_mktsegment", "_gsalt")
        .agg(F.count("*").alias("_pn"), F.sum("v").alias("_pv"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum("_pn").cast("long").alias("n_events"),
            F.sum("_pv").cast("long").alias("value_centi"),
        )
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            "n_events",
            "value_centi",
        )
        .orderBy("mktsegment")
    )


_fmt_doc(skew_salted_segment_value, SALT=_SKEW_SALT)


# ---------------------------------------------------------------------------
# 8. Dynamic partition pruning over a partitioned layout
# ---------------------------------------------------------------------------

_DPP_KIND = "orders_by_year"


@query(
    "layout_partition_pruned_rollup",
    oracle="""
    WITH o AS (
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders
    ), fy AS (
        SELECT o_year FROM (
            SELECT o_year, count(DISTINCT o_month) AS mp FROM o GROUP BY o_year
        ) WHERE mp = 12
    )
    SELECT o.o_year, o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(o.pc) AS BIGINT) AS rev_centi
    FROM o JOIN fy USING (o_year)
    GROUP BY o.o_year, o.o_orderpriority
    """,
)
def layout_partition_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(year, priority) revenue rollup restricted to CALENDAR-COMPLETE
    years (all 12 months present — the standard guard before any
    year-over-year comparison; TPC-H's 1998 has 8 months and must not be
    compared against full years), computed over a year-PARTITIONED layout
    so the restriction becomes DYNAMIC PARTITION PRUNING — the one
    file-skipping mechanism the layout family did not yet demonstrate
    (layout_zorder_stats covers min/max skipping within files; this
    covers whole-directory skipping decided at RUNTIME by a join).

    Scale shape: the fact artifact is written `partitionBy(o_year)`
    (ensure_table), the qualifying-years side is a year-sized aggregate
    with a LITERAL selective predicate (months == 12 — Spark's DPP
    planner requires a likely-selective filter on the dim side; an
    attribute-vs-attribute threshold does not qualify, measured), and
    Catalyst inserts a dynamicpruning subquery into the fact scan's
    PartitionFilters: incomplete years' directories are never opened,
    which at 100 TB is the difference between scanning 7 years and
    scanning the 6 being reported. Plan pinned in
    tests/test_plan_shapes.py (dynamicpruning present + broadcast dim +
    no second full scan shape). The census-defining aggregate itself
    reads only (o_year, o_month) — column pruning keeps the threshold
    pass narrow. Both engines compute the identical integer program;
    the partitioned layout changes WHERE bytes live, never values.
    """
    fact = ensure_table(
        spark,
        sf_dir,
        _DPP_KIND,
        lambda: _t(spark, sf_dir, "orders").select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
            F.month(F.col("o_orderdate")).alias("o_month"),
            F.year(F.col("o_orderdate")).alias("o_year"),
        ),
        partition_by="o_year",
    )
    full_years = (
        fact.groupBy("o_year")
        .agg(F.countDistinct("o_month").alias("mp"))
        .filter(F.col("mp") == 12)
        .select("o_year")
    )
    return (
        fact.join(F.broadcast(full_years), "o_year")
        .groupBy("o_year", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("pc").cast("long").alias("rev_centi"),
        )
    )


_EVO_KIND = "schema_evo"


@query(
    "source_schema_evolution",
    oracle="""
    SELECT 1 AS gen, lang,
           COUNT(*) AS n_rows,
           COUNT(*) AS n_quality_null,
           CAST(0 AS BIGINT) AS sum_quality
    FROM documents WHERE doc_id % 2 = 0 AND doc_id IS NOT NULL
    GROUP BY lang
    UNION ALL
    SELECT 2 AS gen, lang,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT) AS n_quality_null,
           CAST(SUM(n_chars % 97) AS BIGINT) AS sum_quality
    FROM documents WHERE doc_id % 2 = 1 AND doc_id IS NOT NULL
    GROUP BY lang
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION across artifact generations — the sources-axis
    capability every long-lived pipeline hits: generation 1 of a derived
    table was written before anyone thought of ``quality_score``;
    generation 2 added it. A reader pinned to either schema is wrong
    (v1-pinned silently drops the new signal; v2-pinned refuses the old
    files) — the correct read is ``mergeSchema``, which unions the file
    schemas and exposes the v2 column as NULL over v1 rows.

    The two generations are hive-laid (``.../schema_evo/gen=N/``,
    partition-discovered ``gen`` column) and deterministic functions of
    ``documents`` (gen 1 = even doc_ids under the v1 schema; gen 2 =
    odd doc_ids with ``quality_score = n_chars % 97``), so the oracle
    regenerates the census analytically and NEVER reads the artifacts —
    hash equality proves the evolved read path reconstructed exactly
    what was written. Contract columns, all integer-exact: per
    (gen, lang) row counts; ``n_quality_null``, which must equal the
    FULL row count on gen 1 (the merged column is NULL exactly where
    the writer's schema lacked it — the mergeSchema semantics, stated
    as data) and the count of NULL-``n_chars`` rows on gen 2 (the
    writer's ``n_chars % 97`` propagates NULL, so the oracle censuses
    it as COUNT(*) - COUNT(n_chars) rather than a hardcoded 0 — ADVICE
    r10 #1: symmetric on nullable inputs, identical on the generated
    corpora where n_chars derives from length(text)); and the gen-2
    quality sum.

    Scale shape: schema merge is a FOOTER operation (one schema per
    file, unioned at planning time — no data read, no shuffle); the
    census then runs as one pass over the artifact with partition
    pruning intact (``gen`` is a directory column, not a data column).
    The LIVE plan reads ONLY the artifact — zero scans of
    documents.parquet once the generations exist (pinned in
    tests/test_plan_shapes.py). At 100 TB this is the difference
    between "rewrite every historical file to the new schema before
    the first query" (a full-corpus write) and "new files carry new
    columns, old files serve NULLs" (zero rewrite)."""
    from ..functions.artifacts import artifact_dir, ensure_table

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    ensure_table(
        spark,
        sf_dir,
        f"{_EVO_KIND}/gen=1",
        lambda: docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "n_chars"
        ),
    )
    ensure_table(
        spark,
        sf_dir,
        f"{_EVO_KIND}/gen=2",
        lambda: docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("n_chars") % 97).cast("int").alias("quality_score"),
        ),
    )
    evo = spark.read.option("mergeSchema", "true").parquet(
        artifact_dir(sf_dir, _EVO_KIND)
    )
    return evo.groupBy("gen", "lang").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("quality_score").isNull().cast("int"))
        .cast("long")
        .alias("n_quality_null"),
        F.sum(F.coalesce(F.col("quality_score"), F.lit(0)))
        .cast("long")
        .alias("sum_quality"),
    )
