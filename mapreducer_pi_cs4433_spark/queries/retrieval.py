"""Round-7 third band: hybrid retrieval operators.

Two operators from the retrieval half of a training-data / RAG pipeline:

- ``search_hybrid_rrf`` — hybrid search: the BM25 lexical leg and the
  embedding-cosine semantic leg, fused by reciprocal-rank fusion with
  EXACT integer arithmetic (rank-based, so no float ever crosses the
  fusion).
- ``search_mmr_rerank`` — maximal marginal relevance: diversify the
  cosine top-N candidate set by iteratively picking the document that
  maximizes relevance minus similarity-to-already-picked (lambda = 0.5),
  unrolled for a fixed k so the whole selection is ONE Catalyst plan.

Cross-engine determinism: every cosine here is the exact-integer recipe
of ``dedup_embedding_exact_pairs`` (components floor-quantized to int64
micro-units, integer dot products) divided by the product of two
correctly-rounded sqrts — i.e. double ops on EXACT integers in a fixed
order, bit-identical in both engines — then rounded to 9 decimals with
id tie-breaks. RRF scores are pure integer division of ranks. The BM25
leg reuses the identical score expression as search_bm25_topk on both
sides (``bm25_scored_docs`` / ``bm25_scored_sql_ctes``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _fmt_doc, _t, query
from .extensions import _query_vec, bm25_scored_docs, bm25_scored_sql_ctes

_Q_SCALE = 1_000_000          # micro-unit component quantization
_HYB_N = 20                   # per-leg list length fed into the fusion
_HYB_K = 10                   # fused output size
_RRF_C = 60                   # the canonical RRF constant
_RRF_SCALE = 1_000_000_000_000  # pico-unit integer RRF: SCALE div (C + rank)
_MMR_CANDS = 10               # relevance candidate pool
_MMR_K = 3                    # diversified picks (unrolled)

_QUANT_SQL = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * "
    f"{_Q_SCALE}) AS BIGINT))"
)


def _qvec_micro(spark: SparkSession, sf_dir: str) -> tuple[list[int], int]:
    """The vec_id=0 query vector floor-quantized to micro-units, plus its
    exact squared norm — Python ints, same arithmetic as the engines."""
    qq = [math.floor(x * _Q_SCALE) for x in _query_vec(spark, sf_dir)]
    return qq, sum(v * v for v in qq)


def _sem_scored(
    spark: SparkSession, sf_dir: str, with_embedding: bool = False
) -> DataFrame:
    """(doc_id, rel [, embedding]): every non-null, non-zero embedding
    scored against the vec_id=0 query vector — ONE mapInPandas corpus
    pass (Arrow-batched numpy), with the zero-norm drop applied INSIDE
    the kernel so nothing re-evaluates Python for a filter (a scalar
    struct UDF referenced by both a Filter and a Project plans as TWO
    ArrowEvalPython passes — caught in the r7 plan audit).

    The RAW cosine is the micro-quantized int64 dot over
    sqrt(n2)*sqrt(qn2): every value through the division is an exact
    integer rendered as a double (< 2^53) or a correctly-rounded sqrt of
    one, so the doubles are bit-identical to the oracle's scalar path;
    F.round(..., 9) is applied JVM-side (the brute_force_topk
    convention). No interpreted HOFs — the suite-wide lambdafunction ban
    (test_no_interpreted_hofs_or_row_udfs_anywhere). `with_embedding`
    carries the raw vectors through only for the MMR pair stage, so the
    hybrid leg never ships vectors past the scorer."""
    import numpy as np
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select("vec_id", "embedding")
    qq, qn2 = _qvec_micro(spark, sf_dir)
    qa = np.asarray(qq, dtype=np.int64)
    qn = math.sqrt(float(qn2))
    schema = "doc_id long, rel_raw double" + (
        ", embedding array<float>" if with_embedding else ""
    )

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.floor(
                np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
                * _Q_SCALE
            ).astype(np.int64)
            n2 = (mat * mat).sum(axis=1)
            keep = n2 > 0
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (mat @ qa).astype(np.float64) / (
                    np.sqrt(n2.astype(np.float64)) * qn
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["vec_id"].to_numpy()[keep],
                    "rel_raw": cos[keep],
                }
            )
            if with_embedding:
                out["embedding"] = pdf.loc[keep, "embedding"].to_numpy()
            yield out

    return (
        emb.mapInPandas(score, schema)
        .withColumn("rel", F.round("rel_raw", 9))
        .drop("rel_raw")
    )


_SEM_SCORED_SQL = f"""qraw AS (
        SELECT {_QUANT_SQL} AS qq FROM embeddings WHERE vec_id = 0
    ), qs AS (
        SELECT qq, CAST(list_inner_product(qq, qq) AS BIGINT) AS qn2
        FROM qraw
    ), vq AS (
        SELECT vec_id AS doc_id, {_QUANT_SQL} AS vq
        FROM embeddings WHERE embedding IS NOT NULL
    ), vs AS (
        SELECT doc_id, vq, CAST(list_inner_product(vq, vq) AS BIGINT) AS n2
        FROM vq
    ), sem_scored AS (
        SELECT doc_id, vq, n2,
               round(CAST(list_inner_product(vq, qq) AS DOUBLE)
                     / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))),
                     9) AS rel
        FROM vs CROSS JOIN qs
        WHERE n2 > 0
    )"""


# ---------------------------------------------------------------------------
# 1. Hybrid search: BM25 + cosine, reciprocal-rank fusion
# ---------------------------------------------------------------------------


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH {bm25_scored_sql_ctes()},
    {_SEM_SCORED_SQL},
    lexr AS (
        SELECT doc_id, lex_rank FROM (
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY bm25_score DESC, doc_id ASC
                   ) AS BIGINT) AS lex_rank
            FROM bm25_scored
        ) WHERE lex_rank <= {_HYB_N}
    ),
    semr AS (
        SELECT doc_id, sem_rank FROM (
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY rel DESC, doc_id ASC
                   ) AS BIGINT) AS sem_rank
            FROM sem_scored
        ) WHERE sem_rank <= {_HYB_N}
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.lex_rank, s.sem_rank,
           COALESCE({_RRF_SCALE} // ({_RRF_C} + l.lex_rank), 0)
         + COALESCE({_RRF_SCALE} // ({_RRF_C} + s.sem_rank), 0) AS rrf_pico
    FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
    ORDER BY rrf_pico DESC, doc_id ASC
    LIMIT {_HYB_K}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the top-{N} BM25 lexical list and the top-{N}
    embedding-cosine semantic list (query = vec_id 0, docs aligned by
    id), fused by reciprocal-rank fusion and cut to the top-{K} — the
    standard two-tower search merge (Cormack et al.'s RRF), and the
    operator that joins this repo's text-search and ANN families.

    Determinism: fusion never touches a float — each leg reduces to an
    integer RANK (per-leg scores are the oracle-checked bm25/round9-
    cosine expressions with id tie-breaks), and the RRF score is the
    EXACT integer {S} div ({C} + rank) sum, so the fused ordering is
    bit-reproducible by construction. Scale shape: each leg is one
    corpus pass ending in TakeOrdered k={N} (no global sort — the rank
    window runs AFTER the cut, on {N} rows); the fusion is a full-outer
    join of two {N}-row lists and a final {K}-row TakeOrdered. At 100 TB
    the only corpus-sized work is the two scans, both of which prune to
    the columns they score."""
    lex = (
        bm25_scored_docs(spark, sf_dir)
        .orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc())
        .limit(_HYB_N)
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("lex_rank"),
    )
    sem = (
        _sem_scored(spark, sf_dir)
        .select("doc_id", "rel")
        .orderBy(F.col("rel").desc(), F.col("doc_id").asc())
        .limit(_HYB_N)
    )
    semr = sem.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("rel").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("sem_rank"),
    )
    fused = lexr.join(semr, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.expr(f"{_RRF_SCALE} div ({_RRF_C} + lex_rank)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr(f"{_RRF_SCALE} div ({_RRF_C} + sem_rank)"), F.lit(0).cast("long")
    )
    return (
        fused.select("doc_id", "lex_rank", "sem_rank", rrf.alias("rrf_pico"))
        .orderBy(F.col("rrf_pico").desc(), F.col("doc_id").asc())
        .limit(_HYB_K)
    )


_fmt_doc(search_hybrid_rrf, N=_HYB_N, K=_HYB_K, S=_RRF_SCALE, C=_RRF_C)


# ---------------------------------------------------------------------------
# 2. MMR diversification rerank
# ---------------------------------------------------------------------------


def _pair_max_sim(pairs: DataFrame) -> DataFrame:
    """(id, rel) -> max round9 RAW cosine against the attached selected
    vectors — the MMR pair stage as PURE relational JVM work (r13,
    guide §4: the pandas-UDF form spent more on Python-worker
    round-trips than compute for these <= pool x picks row counts, and
    8 ArrowEvalPython stages re-executed inside the unrolled plan).
    posexplode pairs each candidate component with element_at of the
    selected vector; both floor-quantize to int64 micro-units; the dot
    and both squared norms are EXACT int64 sums (order-independent, so
    distribution cannot perturb them — the same math the numpy kernel
    ran batch-side); one IEEE double division of exacts per pair, round9
    JVM-side. Bit-identical to the kernel it replaces and to the
    oracle's scalar path."""
    q = lambda c: F.floor(c.cast("double") * _Q_SCALE).cast("long")  # noqa: E731
    comps = pairs.select(
        "id",
        "rel",
        F.col("sid"),
        F.posexplode("embedding").alias("pos", "ea"),
        F.col("semb"),
    ).select(
        "id",
        "rel",
        "sid",
        q(F.col("ea")).alias("qa"),
        q(F.element_at("semb", F.col("pos") + 1)).alias("qb"),
    )
    per_pair = comps.groupBy("id", "rel", "sid").agg(
        F.sum(F.col("qa") * F.col("qb")).alias("dot"),
        F.sum(F.col("qa") * F.col("qa")).alias("na2"),
        F.sum(F.col("qb") * F.col("qb")).alias("nb2"),
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))
    )
    return per_pair.groupBy("id", "rel").agg(
        F.max(F.round(cos, 9)).alias("ms")
    )


def _mmr_sel_sql(sel_ctes: list[str]) -> str:
    union = " UNION ALL ".join(f"SELECT id FROM {s}" for s in sel_ctes)
    return f"""(
        SELECT c.id, c.rel, max(
                   round(CAST(list_inner_product(c.vq, s.vq) AS DOUBLE)
                         / (sqrt(CAST(c.n2 AS DOUBLE))
                            * sqrt(CAST(s.n2 AS DOUBLE))), 9)
               ) AS ms
        FROM cand c
        JOIN (SELECT * FROM cand WHERE id IN ({union})) s ON c.id <> s.id
        WHERE c.id NOT IN ({union})
        GROUP BY c.id, c.rel
    )"""


@query(
    "search_mmr_rerank",
    oracle=f"""
    WITH {_SEM_SCORED_SQL},
    cand AS (
        SELECT doc_id AS id, vq, n2, rel FROM sem_scored
        ORDER BY rel DESC, doc_id ASC LIMIT {_MMR_CANDS}
    ),
    s1 AS (SELECT id, rel FROM cand ORDER BY rel DESC, id ASC LIMIT 1),
    p2 AS {_mmr_sel_sql(["s1"])},
    s2 AS (SELECT id, rel, ms FROM p2 ORDER BY rel - ms DESC, id ASC LIMIT 1),
    p3 AS {_mmr_sel_sql(["s1", "s2"])},
    s3 AS (SELECT id, rel, ms FROM p3 ORDER BY rel - ms DESC, id ASC LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS rank, id, rel AS relevance,
           CAST(0.0 AS DOUBLE) AS max_sim
    FROM s1
    UNION ALL SELECT CAST(2 AS BIGINT), id, rel, ms FROM s2
    UNION ALL SELECT CAST(3 AS BIGINT), id, rel, ms FROM s3
    """,
)
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein): from
    the cosine top-{N} candidate pool, pick {K} documents one at a time,
    each maximizing ``relevance - max_similarity_to_already_picked``
    (the lambda = 0.5 MMR objective, which orders identically to the
    canonical 0.5*rel - 0.5*maxsim form) — the diversification step a
    retrieval pipeline runs so the context window isn't {K} near-copies.

    The selection is inherently sequential, so it is UNROLLED for fixed
    {K}: each step is a left-anti against the picked set, a broadcast of
    the (at most {K}-row) picked set onto the {N}-row candidate pool for
    pairwise round9 cosines, a per-candidate max, and a 1-row
    TakeOrdered by (rel - ms, id) — all constant-bounded after the ONE
    corpus-sized TakeOrdered that builds the pool (which is also the
    only corpus pass; the pool is localCheckpoint'd for its {K}+2
    consumers per the repo's multi-consumer invariant). Every compared
    score is either round9-of-exact-int-arithmetic or a single IEEE
    subtraction of two such — no accumulation order anywhere."""
    cand = (
        _sem_scored(spark, sf_dir, with_embedding=True)
        .select(F.col("doc_id").alias("id"), "embedding", "rel")
        .orderBy(F.col("rel").desc(), F.col("id").asc())
        .limit(_MMR_CANDS)
        .localCheckpoint()
    )
    s1 = cand.orderBy(F.col("rel").desc(), F.col("id").asc()).limit(1)
    out = s1.select(
        F.lit(1).cast("long").alias("rank"),
        "id",
        F.col("rel").alias("relevance"),
        F.lit(0.0).alias("max_sim"),
    )
    sel = s1.select("id", "embedding")
    for rank in range(2, _MMR_K + 1):
        s_sel = sel.select(
            F.col("id").alias("sid"), F.col("embedding").alias("semb")
        )
        rem = cand.join(
            sel.select(F.col("id").alias("sid")),
            F.col("id") == F.col("sid"),
            "left_anti",
        )
        scored = _pair_max_sim(
            rem.crossJoin(F.broadcast(s_sel)).filter(
                F.col("id") != F.col("sid")
            )
        )
        pick = scored.orderBy(
            (F.col("rel") - F.col("ms")).desc(), F.col("id").asc()
        ).limit(1)
        out = out.unionByName(
            pick.select(
                F.lit(rank).cast("long").alias("rank"),
                "id",
                F.col("rel").alias("relevance"),
                F.col("ms").alias("max_sim"),
            )
        )
        sel = sel.unionByName(
            cand.join(pick.select("id"), "id").select("id", "embedding")
        )
    return out


_fmt_doc(search_mmr_rerank, N=_MMR_CANDS, K=_MMR_K)
