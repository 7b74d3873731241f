"""Round-3 pipeline extensions: time-series repair, corpus curation, and
join-key diagnostics.

Beyond-reference operators (SURVEY.md §7 M6 charter) that a production
training-data pipeline needs and the earlier suites did not yet cover:

- ``events_gap_fill`` / ``events_new_users_daily`` — time-series repair and
  accretion reporting over the ``events`` stream table.
- ``text_chunk_windows`` — sliding-window RAG chunking, pure codegen.
- ``mixture_token_budget_fill`` — per-domain token-budget corpus sampling.
- ``text_ngram_novelty`` — per-document novelty vs the corpus (the inverse
  of boilerplate/near-dup coverage).
- ``olap_custkey_skew_profile`` — heavy-key diagnostics for a join key
  (the pre-flight a skew-aware planner needs; operators/skew.py is the
  mitigation, this is the measurement).
- ``er_fuzzy_name_pairs`` — blocked fuzzy entity-matching on a distinct
  dimension (dedupe the dimension, never the fact table).

Every query follows the cross-engine determinism rules in catalog.py:
integer/string outputs only, identical aliases in both engines, total
deterministic order for any top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text
from .catalog import _t, query

# ---------------------------------------------------------------------------
# Time-series repair / reporting over `events`
# ---------------------------------------------------------------------------


@query(
    "events_gap_fill",
    oracle="""
    WITH c AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1
    ), hrs AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM s
    )
    SELECT hrs.event_type,
           strftime(hrs.h, '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           coalesce(c.n, 0)::BIGINT AS n_events,
           (c.n IS NULL) AS is_gap
    FROM hrs LEFT JOIN c ON hrs.event_type = c.event_type AND hrs.h = c.h
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type: every hour in each type's
    [first, last] range appears, absent hours zero-filled and flagged.

    Scale shape: the raw scan aggregates down to (type, hour) grain FIRST;
    the generated hour spine and the left join both run on that aggregate
    (types x hours rows, never event rows), so the only full-data cost is
    the one groupBy shuffle. `sequence()` is per-type and bounded by the
    corpus time range — no driver-side calendar materialization.
    """
    events = _t(spark, sf_dir, "events")
    counts = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n_events"))
    spans = counts.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    hours = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    return hours.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@query(
    "events_new_users_daily",
    oracle="""
    WITH f AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
    ), dly AS (
        SELECT d, count(*) AS new_users FROM f GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           new_users::BIGINT AS new_users,
           sum(new_users) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )::BIGINT AS cum_users
    FROM dly
    """,
)
def events_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-accretion curve: users counted on their first-seen day, plus the
    running total.

    Scale shape: first-seen is a grouped MIN over the raw scan (the only
    event-sized shuffle); the running-total window runs on the day-grain
    aggregate — a table bounded by the corpus's day count, so the
    single-partition ordered window is a few hundred rows at any data
    scale, never a scalability cliff.
    """
    events = _t(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = first.groupBy("first_day").agg(F.count("*").alias("new_users"))
    w = (
        Window.orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# RAG chunking + corpus curation over `documents`
# ---------------------------------------------------------------------------

_CHUNK_W = 16  # tokens per chunk
_CHUNK_S = 8  # stride (W - S = 8 tokens of overlap between chunks)


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    ), c AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                   CASE WHEN len(toks) <= {_CHUNK_W} THEN 0
                        ELSE (len(toks) - {_CHUNK_W} + {_CHUNK_S} - 1)
                             // {_CHUNK_S} END)) AS chunk_idx
        FROM t
    )
    SELECT doc_id,
           chunk_idx::BIGINT AS chunk_idx,
           (chunk_idx * {_CHUNK_S})::BIGINT AS start_tok,
           len(list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                          chunk_idx * {_CHUNK_S} + {_CHUNK_W}))::BIGINT
               AS n_tok,
           md5(array_to_string(
               list_slice(toks, chunk_idx * {_CHUNK_S} + 1,
                          chunk_idx * {_CHUNK_S} + {_CHUNK_W}), ' '))
               AS chunk_hash
    FROM c
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking: W={W}-token chunks at stride {S}, each
    with its token offset and a content hash (the retrieval-index key).

    Scale shape: scan -> project -> generate -> project, zero shuffles and
    zero Python — tokenization is one `split`, windows come from
    `sequence`+`explode`, and chunk text is `slice`+`array_join` (all
    codegen expressions, no interpreted HOFs). The short-document edge
    (n <= W) emits exactly one chunk; the final window is allowed to run
    short rather than re-reading the tail twice.
    """.format(W=_CHUNK_W, S=_CHUNK_S)
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    )
    chunks = base.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("n") <= _CHUNK_W, F.lit(0)).otherwise(
                    F.expr(
                        f"(n - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S}"
                    )
                ),
            )
        ).alias("chunk_idx"),
    )
    sl = F.expr(
        f"slice(toks, chunk_idx * {_CHUNK_S} + 1, {_CHUNK_W})"
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * _CHUNK_S).cast("long").alias("start_tok"),
        F.size(sl).cast("long").alias("n_tok"),
        F.md5(F.array_join(sl, " ")).alias("chunk_hash"),
    )


_MIXTURE_BUDGET = 100  # tokens admitted per source before the gate closes


@query(
    "mixture_token_budget_fill",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               len(list_filter(regexp_split_to_array(text, '\\s+'),
                               t -> t <> ''))::BIGINT AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM d
    )
    SELECT source, doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens
    FROM c WHERE cum_tokens - n_tokens < {_MIXTURE_BUDGET}
    """,
)
def mixture_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget sampling: admit documents in deterministic
    hash order until each source has contributed ~{B} tokens (the document
    that crosses the budget line is kept — budgets fill past, never short).

    This is the "mix N tokens of web, M of code" primitive of pretraining
    corpus assembly, expressed without RNG: the admission order is
    md5(doc_id), so re-runs, retries, and different cluster sizes select
    the SAME documents. Scale shape: one shuffle (partitionBy source) and a
    per-source running sum; skew is bounded by documents-per-source, and
    the window carries only (id, source, count, hash) — never text.
    """.format(B=_MIXTURE_BUDGET)
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        text.token_count("text").cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < _MIXTURE_BUDGET)
        .select(
            "source",
            "doc_id",
            "n_tokens",
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    ), pos AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
        FROM t WHERE len(toks) >= 3
    ), g AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(list_slice(toks, i, i + 2), ' ')) AS gram
        FROM pos
    ), dfc AS (
        SELECT gram, count(*) AS df FROM g GROUP BY 1
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_grams,
           sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
           (sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*))::BIGINT AS novelty_ppm
    FROM g JOIN dfc USING (gram)
    GROUP BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's distinct word
    3-grams that occur in NO other document (df == 1 across the corpus).
    High novelty = unique content; low novelty = boilerplate / near-dup
    material — the inverse signal of the dedup_span_coverage family.

    Scale shape: grams are md5-hashed BEFORE the distinct and the df
    shuffle (the round-2 posting-stream idiom — 16-byte keys on the wire,
    never gram text), df counting is a grouped count on distinct
    (doc, gram) pairs, and the novelty score is integer-exact
    (ppm by integer division — no float summation in the output).
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    ).filter(F.col("n") >= 3)
    # Explode amplification under-parallelizes small corpora (the
    # exploded_shingles lesson: one parquet split = one core); repartition
    # only when the scan yields fewer splits than cores — no-ops at real
    # corpus scale.
    target = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < target:
        base = base.repartition(target)
    grams = (
        base.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(1), F.col("n") - 2)).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(F.array_join(F.expr("slice(toks, i, 3)"), " ")).alias(
                "gram"
            ),
        )
        .distinct()
        # grams feeds BOTH the df count and the join probe side; the two
        # differently-consumed subtrees defeat ReuseExchange, so without
        # materialization the scan+explode+distinct runs twice (the
        # triangle-count lesson). At cluster scale this is the persisted
        # gram-posting table (functions/artifacts.py lifecycle).
        .localCheckpoint()
    )
    dfc = grams.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        grams.join(dfc, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("n_unique").cast("long").alias("n_unique"),
            F.expr("n_unique * 1000000 div n_grams")
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostics + fuzzy dimension matching
# ---------------------------------------------------------------------------


@query(
    "olap_custkey_skew_profile",
    oracle="""
    WITH pk AS (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1
    ), t AS (
        SELECT count(*) AS n_keys, sum(cnt) AS total_rows FROM pk
    )
    SELECT o_custkey,
           cnt::BIGINT AS cnt,
           (cnt * 1000000 // total_rows)::BIGINT AS share_ppm,
           (cnt * n_keys * 1000 // total_rows)::BIGINT AS vs_mean_x1000
    FROM pk, t
    ORDER BY cnt DESC, o_custkey
    LIMIT 10
    """,
)
def olap_custkey_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a join key (orders.o_custkey): the 10
    heaviest keys with their corpus share (ppm) and their multiple of the
    mean key load (x1000, integer-exact). This is the measurement side of
    skew mitigation — operators/skew.py's salting is what you reach for
    when vs_mean_x1000 says a key dominates its shuffle partition.

    Scale shape: grouped count (the only full-data shuffle) -> TakeOrdered
    top-10 (no global sort) -> crossJoin of the 1-row totals aggregate
    (broadcast, the SURVEY §2 C2 idiom). Ties break on the key, so the
    top-10 is total-order deterministic.
    """
    orders = _t(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    totals = per_key.agg(
        F.count("*").alias("n_keys"), F.sum("cnt").alias("total_rows")
    )
    top = per_key.orderBy(F.desc("cnt"), F.asc("o_custkey")).limit(10)
    return top.crossJoin(F.broadcast(totals)).select(
        "o_custkey",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("cnt * 1000000 div total_rows").cast("long").alias("share_ppm"),
        F.expr("cnt * n_keys * 1000 div total_rows")
        .cast("long")
        .alias("vs_mean_x1000"),
    )


_ER_MAX_EDIT = 4


@query(
    "er_fuzzy_name_pairs",
    oracle=f"""
    WITH n AS (
        SELECT p_name, count(*) AS n_listings FROM part GROUP BY 1
    ), k AS (
        SELECT p_name, n_listings,
               string_split(p_name, ' ')[-1] AS blk
        FROM n
    )
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name)::INT AS edit_dist,
           (a.n_listings + b.n_listings)::BIGINT AS pair_listings
    FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAX_EDIT}
    """,
)
def er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching on the part-name dimension: candidate
    name pairs within an edit distance of {M}, blocked on the head noun
    (the last name token) so no cartesian pairing ever forms.

    The entity-resolution shape that scales: DISTINCT the dimension first
    (64 names here vs 2k listings; at 100 TB, distinct dimension strings
    are orders of magnitude smaller than the fact table), then
    fuzzy-self-join ONLY the dimension inside equi-join blocks, then
    semi-join survivors back to facts if needed. Levenshtein runs
    (|a|x|b|) per candidate pair — affordable exactly because blocking
    keeps candidates per block tiny; the fact table never touches it.
    """.format(M=_ER_MAX_EDIT)
    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("n_listings"))
    keyed = names.select(
        "p_name",
        "n_listings",
        F.element_at(F.split("p_name", " "), -1).alias("blk"),
    )
    a = keyed.select(
        F.col("p_name").alias("name_a"),
        F.col("n_listings").alias("listings_a"),
        "blk",
    )
    b = keyed.select(
        F.col("p_name").alias("name_b"),
        F.col("n_listings").alias("listings_b"),
        "blk",
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), "blk")
        .filter((F.col("name_a") < F.col("name_b")) & (dist <= _ER_MAX_EDIT))
        .select(
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_dist"),
            (F.col("listings_a") + F.col("listings_b"))
            .cast("long")
            .alias("pair_listings"),
        )
    )
