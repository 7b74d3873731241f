"""Extension-operator tests: dedup / similarity / text / pi properties that
the DuckDB oracle can't express (approximate operators, RDD workloads)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.functions import dedup, similarity, text
from mapreducer_pi_cs4433_spark.pi import estimate_pi
from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES
from mapreducer_pi_cs4433_spark.sources.loaders import load_table

from .conftest import SF_CORRECTNESS, SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


# --- MinHash-LSH: the oracle-sharing claim -----------------------------------
@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECTNESS])
def test_lsh_catalog_entries_equal_exact_jaccard(spark, sf_dir):
    """BOTH catalog entries (dedup_ngram_jaccard at r=2/b=32 candidates,
    dedup_minhash_lsh at r=4/b=16) share the exact-Jaccard oracle; that is
    only sound if banding recall is total against the direct full
    inverted-index operator at the driver's scale factors. Assert it."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, k=12, threshold=0.5).collect()
    }
    assert len(exact) > 0  # the corpus plants near-dup pairs; finding none is a bug
    for qname in ("dedup_ngram_jaccard", "dedup_minhash_lsh"):
        got = {(r.id_a, r.id_b) for r in QUERIES[qname](spark, sf_dir).collect()}
        assert got == exact, (
            f"{qname}: LSH recall not total: missing={exact - got} extra={got - exact}"
        )


def test_connected_components_transitive_chains(spark):
    """Min-label propagation must contract transitive chains (A-B, B-C, ...)
    into one component — the case a pair list can't express and the synthetic
    corpus (disjoint planted pairs) doesn't exercise. A 9-node path needs
    multiple supersteps (diameter 8 under per-step neighbor-min), so this
    also pins the fixpoint loop + localCheckpoint lineage truncation."""
    chain = [(i, i + 1) for i in range(1, 9)]  # path 1-2-...-9
    extra = [(20, 21), (30, 31), (31, 32), (30, 32)]  # pair + triangle
    edges = spark.createDataFrame(chain + extra, ["id_a", "id_b"])
    got = {
        (r.id, r.comp) for r in dedup.connected_components(edges).collect()
    }
    want = (
        {(i, 1) for i in range(1, 10)}
        | {(20, 20), (21, 20)}
        | {(i, 30) for i in (30, 31, 32)}
    )
    assert got == want


@pytest.mark.parametrize("sf_dir", [SF_SMOKE])
def test_dedup_clusters_covers_all_pair_members(spark, sf_dir):
    """Every doc in a near-dup pair appears in exactly one cluster, every
    cluster id is the minimum member id, and sizes add up."""
    docs = load_table(spark, sf_dir, "documents")
    pair_rows = dedup.ngram_jaccard_pairs(docs, k=12, threshold=0.5).collect()
    members = {r.id_a for r in pair_rows} | {r.id_b for r in pair_rows}
    out = QUERIES["dedup_clusters"](spark, sf_dir).collect()
    assert {r.doc_id for r in out} == members
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
        assert r.cluster_size >= 2
    for cid, mem in by_cluster.items():
        assert cid == min(mem)
    assert sum(len(m) for m in by_cluster.values()) == len(out)


def test_decontamination_catches_planted_copies_not_background(spark):
    """At sf0.01 the hash split (25% benchmark) strands some planted
    near-dup partners across the train/bench boundary: the query must flag
    those (rows > 0) while containment stays >= 0.5 only for them — i.e.
    it must not degenerate to 'everything collides' on this high-df corpus
    (measured background pairwise containment p99 ~0.08)."""
    out = QUERIES["decontaminate_training_set"](spark, SF_CORRECTNESS).collect()
    assert len(out) > 0
    assert all(r.containment >= 0.5 for r in out)
    # flagged pairs must be a small fraction of the ~35k co-occurring pairs
    assert len(out) < 100


def test_pagerank_invariants(spark):
    """Every rank respects the damping floor (0.15*SCALE after any
    iteration) and total mass stays ~conserved on the symmetric graph
    (floor divisions only ever LOSE sub-unit mass, never create it)."""
    from mapreducer_pi_cs4433_spark.queries.extensions import _PR_SCALE

    rows = QUERIES["graph_pagerank_suppliers"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r.rank_micro >= 15 * _PR_SCALE // 100 for r in rows)
    # suppliers see different part fan-in -> ranks must actually differ
    assert len({r.rank_micro for r in rows}) > 1


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example thanks"),
            (2, "see https://ex.example/path?q=1 and http://plain.example"),
            (3, "call +1 (555) 010-1234 now"),
            (4, "server at 10.0.0.7 responded"),
            (5, "clean text with no identifiers at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in text.scrub_pii(df).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].text_scrubbed
    assert "bob.smith" not in out[1].text_scrubbed
    assert out[2].n_url == 2 and out[2].text_scrubbed.count("<URL>") == 2
    assert out[3].n_phone == 1 and "<PHONE>" in out[3].text_scrubbed
    assert out[4].n_ipv4 == 1 and "<IPV4>" in out[4].text_scrubbed
    r5 = out[5]
    assert (r5.n_email, r5.n_url, r5.n_phone, r5.n_ipv4) == (0, 0, 0, 0)
    assert r5.text_scrubbed == r5.text


def test_approx_quantiles_track_exact(spark):
    """Accuracy is a RANK guarantee, not a value guarantee: the sketch
    returns an actual element within ~1e-4 of the requested rank. The
    catalog entry now carries that guarantee as data: `approx_in_band` is
    the sketch-vs-exact rank-band check (±0.005 around the quantile) that
    the DuckDB oracle pins to TRUE, and `exact_value` is the discrete
    (order-statistic) quantile. One row per (event_type, q), scalar
    columns only (driver canonicalizers cannot hash array cells)."""
    out = QUERIES["events_value_quantiles"](spark, SF_SMOKE).collect()
    assert out
    ev = load_table(spark, SF_SMOKE, "events")
    n_types = ev.select("event_type").distinct().count()
    assert len(out) == n_types * 3
    seen = set()
    for r in out:
        assert r.approx_in_band, (r.event_type, r.q, r.exact_value)
        assert r.exact_value is not None
        assert r.n_events > 0
        seen.add((r.event_type, r.q))
    assert len(seen) == n_types * 3
    assert {q for _, q in seen} == {0.5, 0.95, 0.99}


def test_pi_hash_matches_local_replay(spark):
    """The hash-stream pi estimate is a pure function of n: replay the
    md5-slice construction in pure Python (hashlib) for a prefix and the
    full n, and require bit-identical hit counts — this is the
    engine-neutrality property the DuckDB oracle relies on."""
    import hashlib

    out = QUERIES["pi_estimate_hash"](spark, SF_SMOKE).collect()[0]
    assert out.n_samples == 1_000_000
    assert abs(out.pi_estimate - 3.14159) < 0.01  # MC error at 1M ~ 1.6e-3
    two52 = float(1 << 52)
    hits = 0
    n_check = 20_000
    for i in range(n_check):
        h = hashlib.md5(str(i).encode()).hexdigest()
        x = int(h[0:13], 16) / two52
        y = int(h[13:26], 16) / two52
        hits += x * x + y * y <= 1.0
    from mapreducer_pi_cs4433_spark.pi import estimate_pi_hash_df

    small = estimate_pi_hash_df(spark, num_samples=n_check).collect()[0]
    assert small.n_hits == hits


def test_exact_dedup_properties(spark, docs):
    out = dedup.exact_dedup(docs).collect()
    n_docs = docs.count()
    assert sum(r.dup_count for r in out) == n_docs
    assert len({r.digest for r in out}) == len(out)


@pytest.mark.parametrize("weighted", [False, True])
def test_simhash_near_dups_have_close_hashes(spark, docs, weighted):
    """Planted near-dup pairs (exact jaccard >= 0.5) must be much closer in
    SimHash hamming distance than random pairs — under both the distinct
    (set) and tf-weighted (scale-path) vote semantics."""
    pairs = dedup.ngram_jaccard_pairs(docs, k=12, threshold=0.5).collect()
    assert pairs
    sims = {
        r.id: r.simhash
        for r in dedup.simhash64(docs, k=12, weighted=weighted).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    dup_d = [ham(sims[p.id_a], sims[p.id_b]) for p in pairs]
    ids = sorted(sims)[:40]
    rand_d = [ham(sims[a], sims[b]) for a in ids for b in ids if a < b]
    assert max(dup_d) < 16
    assert sum(dup_d) / len(dup_d) < sum(rand_d) / len(rand_d) / 2


def test_weighted_simhash_single_cheap_exchange(spark, docs):
    """The tf-weighted plan must contain exactly one exchange (the per-doc
    final aggregation) — no pre-shuffle distinct of the shingle stream."""
    from mapreducer_pi_cs4433_spark.plans.inspect import count_exchanges

    w = count_exchanges(dedup.simhash64(docs, k=12, weighted=True))
    # <= 2: the per-doc final aggregation, plus (small corpora only) the
    # explode-parallelize repartition that exploded_shingles inserts when
    # the scan yields fewer splits than cores — that gate no-ops at real
    # corpus scale, so the data-sized exchange count stays 1.
    assert w <= 2
    # set-semantics variant pays the pre-shuffle distinct on top
    assert count_exchanges(dedup.simhash64(docs, k=12, weighted=False)) > w


def test_embedding_neardup_finds_planted_duplicate(spark):
    """A vector and its tiny perturbation (cosine ~0.9997) must survive
    bucketing and be reported at the 0.95 production threshold — a real
    planted-pair check (the random corpus has no pairs above ~0.6, so
    asserting over its 0.95 output was vacuous in round 1)."""
    import numpy as np

    # seed chosen so both pair members sit >0.6 from every hyperplane —
    # the bucket match is a property of the operator, not of luck
    rng = np.random.default_rng(0)
    base = rng.standard_normal((30, 16))
    dup = base[3] + 0.02 * rng.standard_normal(16)  # near-copy of vec 3
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((1000, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dedup.embedding_neardup_pairs(df, threshold=0.95, planes=4).collect()
    assert (3, 1000) in {(r.id_a, r.id_b) for r in out}
    for r in out:
        assert r.cosine >= 0.95
        assert r.id_a < r.id_b


def test_embedding_neardup_multi_bucketing_recovers_missed_pair(spark):
    """Recall union: this planted pair straddles a draw-0 hyperplane at
    planes=4 (verified numerically — single-bucketing misses it), but
    draw 1 buckets it together, so bucketings=2 must report it. Also: no
    pair may be reported twice after the cross-draw distinct."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, 16))
    dup = base[3] + 0.02 * rng.standard_normal(16)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((1000, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    single = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(df, threshold=0.95, planes=4).collect()
    }
    assert (3, 1000) not in single  # the draw-0 miss this test is built on
    multi = [
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(
            df, threshold=0.95, planes=4, bucketings=2
        ).collect()
    ]
    assert (3, 1000) in set(multi)
    assert len(multi) == len(set(multi))
    assert set(multi) >= single  # union only ever adds candidates


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECTNESS])
def test_embedding_neardup_catalog_emits_rows(spark, sf_dir):
    """The catalog entry (threshold 0.3) must emit real pairs on the driver
    corpus — round 1 shipped a 0.95 threshold that returned 0 rows at every
    SF and proved nothing. Cross-check a returned pair against numpy."""
    import numpy as np

    out = QUERIES["dedup_embedding_neardup"](spark, sf_dir).collect()
    assert len(out) > 0
    emb_local = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in out[:20]:
        a, b = emb_local[r.id_a], emb_local[r.id_b]
        ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cosine - ref) < 1e-9
        assert r.cosine >= 0.3


def test_brute_force_topk_math(spark, emb):
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    top = similarity.brute_force_topk(emb, qv, k=10).collect()
    assert len(top) == 10
    # self-similarity must rank first at 1.0
    assert top[0].id == 0 and abs(top[0].cosine_sim - 1.0) < 1e-9
    sims = [r.cosine_sim for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall(spark, emb):
    """IVF probe recall: this corpus's true top-10 neighbors are weak
    (cosine ~0.3), so a planes=4/hamming=1 probe (31% scan) is calibrated
    to roughly half recall; the self-vector must always be recovered."""
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    exact = [r.id for r in similarity.brute_force_topk(emb, qv, k=10).collect()]
    index = similarity.build_ivf_index(emb, planes=4)
    approx = [r.id for r in similarity.ivf_topk(index, qv, k=10, planes=4).collect()]
    assert 0 in approx  # the query vector itself lives in the probed bucket
    assert len(set(exact) & set(approx)) >= 3


@pytest.mark.parametrize(
    "sf_dir", [SF_SMOKE, SF_CORRECTNESS, "/root/testdata/sf0.1"]
)
def test_ivf_catalog_equals_bruteforce(spark, sf_dir):
    """The similarity_topk_ivf catalog entry shares the exact brute-force
    oracle; that is only sound if the probe set covers the true top-10 at
    EVERY scale factor (sf0.1 planted a neighbor in the antipodal bucket,
    which broke h=3 — on this structureless corpus only the full ball is
    recall-complete). Assert exact output equality — ids AND rounded
    cosines (the dedup_minhash_lsh oracle-sharing precedent)."""
    bf = [
        (r.id, r.cosine_sim)
        for r in QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
    ]
    ivf = [
        (r.id, r.cosine_sim)
        for r in QUERIES["similarity_topk_ivf"](spark, sf_dir).collect()
    ]
    assert ivf == bf


def test_pq_topk_recall_and_determinism(spark, emb):
    """PQ + exact re-rank must recover most of the true top-10 (the random
    corpus has near-tied neighbors, so ADC-only recall is inherently
    partial) and always put the query's own vector first; codebook training
    is deterministic, so two runs agree exactly."""
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    exact = [r.id for r in similarity.brute_force_topk(emb, qv, k=10).collect()]
    books = similarity.train_pq_codebooks(emb, m=8, k=256, sample_rows=5000)
    enc = similarity.encode_pq(emb, books)
    rr = similarity.pq_topk(enc, books, qv, k=10, rerank=emb, rerank_factor=5)
    got = [r.id for r in rr.collect()]
    assert got[0] == 0  # self-similarity wins after exact re-rank
    assert len(set(exact) & set(got)) >= 6
    # determinism: retrain + requery -> identical result set and order
    books2 = similarity.train_pq_codebooks(emb, m=8, k=256, sample_rows=5000)
    enc2 = similarity.encode_pq(emb, books2)
    got2 = [
        r.id
        for r in similarity.pq_topk(
            enc2, books2, qv, k=10, rerank=emb, rerank_factor=5
        ).collect()
    ]
    assert got == got2


def test_build_index_prebuilds_exactly_what_queries_consume(
    spark, tmp_path, monkeypatch
):
    """Lifecycle pin for the ops build step (r5): after `cli build-index
    --kinds all`, every artifact-consuming catalog query must find its
    artifact PRE-BUILT — zero cold builds during the query pass. Pre-r5
    the cli used the ensure_* defaults (k=5, planes=8) while queries
    consume k=12 / planes=4, so build-index warmed nothing."""
    from mapreducer_pi_cs4433_spark.cli import _build_index
    from mapreducer_pi_cs4433_spark.functions.artifacts import BUILD_TIMES
    from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    BUILD_TIMES.clear()
    assert _build_index(spark, SF_SMOKE, "all") == 0
    built = set(BUILD_TIMES)
    assert built  # the build step actually built into the fresh root
    BUILD_TIMES.clear()
    for name in [
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_span_coverage",
        "similarity_topk_ivf",
        "similarity_topk_pq",
        "similarity_topk_ivfpq",
        "similarity_topk_hnsw",
        "dedup_semantic_prune",
        "graph_pagerank_suppliers",
        "graph_triangle_count",
        "basket_brand_pairs",
        "decontaminate_training_set",
        "pipeline_clean_corpus",
        # the sketch-artifact consumers (hll_cells r10; kll_cells /
        # kmv_years / hll_years r11): zero cold builds at query time
        "events_distinct_hll_rollup",
        "events_quantile_rollup_kll",
        "orders_kmv_set_difference",
        "orders_kmv_diff_from_snapshots",
        "orders_hll_set_algebra",
        "orders_hll_union_from_snapshots",
        "orders_hll_cumulative_from_snapshots",
    ]:
        QUERIES[name](spark, SF_SMOKE).write.format("noop").mode(
            "overwrite"
        ).save()
    assert BUILD_TIMES == {}, (
        f"queries cold-built {sorted(BUILD_TIMES)} despite build-index; "
        f"build step produced {sorted(built)}"
    )


def test_pq_topk_multi_matches_per_query_path(spark, emb):
    """The batched multi-query path (one code-table scan, one re-rank
    join) must return row-for-row what the per-query pq_topk returns for
    each query — same 9-dp rounding + id tie-break, so the sets and the
    order are identical, not merely recall-equivalent."""
    books = similarity.train_pq_codebooks(emb, m=8, k=256, sample_rows=5000)
    enc = similarity.encode_pq(emb, books)
    qrows = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]
    multi = similarity.pq_topk_multi(
        enc, books, queries, k=10, rerank=emb, rerank_factor=5
    ).collect()
    got = {}
    for r in multi:
        got.setdefault(r.query_id, []).append((r.id, r.cosine_sim))
    for qid, vec in queries:
        single = [
            (r.id, r.cosine_sim)
            for r in similarity.pq_topk(
                enc, books, vec, k=10, rerank=emb, rerank_factor=5
            ).collect()
        ]
        assert got[qid] == single, f"query {qid} diverges from pq_topk"


def test_ivfpq_full_ball_probe_equals_unprobed(spark, emb):
    """bucket_probes with the FULL Hamming ball must reproduce the
    unprobed PQ path row-for-row — the probe machinery only ever
    RESTRICTS the candidate set, never rescores it."""
    planes = 4
    books = similarity.train_pq_codebooks(emb, m=8, k=256, sample_rows=5000)
    enc = similarity.encode_pq(emb, books).join(
        similarity.build_ivf_index(emb, planes=planes).select("id", "bucket"),
        "id",
    )
    qrows = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]
    full = [
        similarity.hamming_ball(
            similarity.query_bucket(v, planes), planes, planes
        )
        for _, v in queries
    ]
    probed = similarity.pq_topk_multi(
        enc, books, queries, k=10, rerank=emb, rerank_factor=5,
        bucket_probes=full,
    ).collect()
    plain = similarity.pq_topk_multi(
        enc.drop("bucket"), books, queries, k=10, rerank=emb, rerank_factor=5
    ).collect()
    key = lambda rows: sorted((r.query_id, r.id, r.cosine_sim) for r in rows)
    assert key(probed) == key(plain)


def test_ivfpq_probe_restricts_candidates(spark, emb):
    """At h=1 every vector a query returns must live inside THAT query's
    Hamming ball — per-query inverted-list discipline, not just a union
    filter (a near hit from another query's ball must never leak in)."""
    planes = 4
    books = similarity.train_pq_codebooks(emb, m=8, k=256, sample_rows=5000)
    index = similarity.build_ivf_index(emb, planes=planes).select("id", "bucket")
    enc = similarity.encode_pq(emb, books).join(index, "id")
    qrows = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in qrows]
    balls = {
        qid: set(
            similarity.hamming_ball(
                similarity.query_bucket(v, planes), planes, 1
            )
        )
        for qid, v in queries
    }
    got = similarity.pq_topk_multi(
        enc, books, queries, k=10, rerank=emb, rerank_factor=5,
        bucket_probes=[sorted(balls[q]) for q, _ in queries],
    ).collect()
    bucket_of = {r.id: r.bucket for r in index.collect()}
    assert got  # self vector at minimum
    for r in got:
        assert bucket_of[r.id] in balls[r.query_id], (
            f"{r.id} (bucket {bucket_of[r.id]}) outside query "
            f"{r.query_id}'s ball"
        )


def test_semantic_prune_matches_numpy_reference(spark):
    """dedup_semantic_prune vs a pure-Python/numpy third implementation
    (hashlib md5 seeds, integer Lloyd, exact big-int cosine gate) — not
    derived from either engine's SQL, so an agreement here rules out the
    both-engines-share-a-bug failure mode for the whole chain: seeding,
    assignment ties, rank order, threshold arithmetic, keeper choice."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from mapreducer_pi_cs4433_spark.queries import extensions as ext

    tbl = pq.read_table(
        SF_SMOKE + "/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    tbl = tbl[tbl["embedding"].notna()]
    ids = tbl["vec_id"].to_numpy().astype(np.int64)
    m = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * 1_000_000).astype(
                np.int64
            )
            for v in tbl["embedding"]
        ]
    )
    id2row = {int(v): i for i, v in enumerate(ids)}
    seed_ids = [
        int(v)
        for v in sorted(
            ids, key=lambda v: (hashlib.md5(str(int(v)).encode()).hexdigest(), int(v))
        )[: ext._KMEANS_K]
    ]
    cent = {s: m[id2row[s]].copy() for s in seed_ids}

    def floordiv(s, n):  # true floor (pmod-then-truncate twin)
        return (s - ((s % n) + n) % n) // n

    for _ in range(2):
        assign = {
            int(v): min(
                (int(((m[id2row[int(v)]] - cent[c]) ** 2).sum()), c)
                for c in cent
            )[1]
            for v in ids
        }
        cent = {}
        for c in set(assign.values()):
            rows = [id2row[v] for v, cc in assign.items() if cc == c]
            s = m[rows].sum(axis=0, dtype=np.int64)
            cent[c] = np.array(
                [floordiv(int(x), len(rows)) for x in s], dtype=np.int64
            )
    fin = {
        int(v): min(
            (int(((m[id2row[int(v)]] - cent[c]) ** 2).sum()), c) for c in cent
        )
        for v in ids
    }  # vid -> (d, cluster)
    num, den = ext._SEM_TAU_NUM, ext._SEM_TAU_DEN
    nn = {int(v): int((m[id2row[int(v)]] ** 2).sum()) for v in ids}
    clusters: dict[int, list[int]] = {}
    for v, (d, c) in fin.items():
        clusters.setdefault(c, []).append(v)
    expected = {}
    for c, members in clusters.items():
        members.sort(key=lambda v: (fin[v][0], v))  # rank: (dist, id)
        for j, vj in enumerate(members):
            for vi in members[:j]:  # rank order => first hit IS the keeper
                dot = int(m[id2row[vi]] @ m[id2row[vj]])
                if (
                    dot > 0
                    and den * den * dot * dot >= num * num * nn[vi] * nn[vj]
                ):
                    expected[vj] = (vi, c, dot)
                    break
    got = {
        r.vec_id: (r.keeper_id, r.cluster_id, r.keeper_dot_q)
        for r in QUERIES["dedup_semantic_prune"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_knn_graph_matches_numpy_reference(spark):
    """similarity_knn_graph vs a dense numpy all-pairs reference: the
    blocked local-top-k + global window cascade must lose nothing."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreducer_pi_cs4433_spark.queries import extensions as ext

    tbl = pq.read_table(
        SF_SMOKE + "/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    tbl = tbl[tbl["embedding"].notna()]
    ids = tbl["vec_id"].to_numpy().astype(np.int64)
    m = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * 1_000_000).astype(
                np.int64
            )
            for v in tbl["embedding"]
        ]
    )
    nn = (m * m).sum(axis=1)
    d2 = nn[:, None] + nn[None, :] - 2 * (m @ m.T)
    expected = set()
    for i in range(len(ids)):
        mask = ids != ids[i]
        cb, cd = ids[mask], d2[i][mask]
        for rk, s in enumerate(np.lexsort((cb, cd))[: ext._KNN_K], start=1):
            expected.add((int(ids[i]), rk, int(cb[s]), int(cd[s])))
    got = {
        (r.vec_id, r.nbr_rank, r.nbr_id, r.d2_q)
        for r in QUERIES["similarity_knn_graph"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_pq_codes_compress(spark, emb):
    """Encoded rows are m small ints — the 32x hot-scan compression claim."""
    books = similarity.train_pq_codebooks(emb, m=8, k=256, sample_rows=2000)
    enc = similarity.encode_pq(emb, books).collect()
    assert all(len(r.codes) == 8 for r in enc)
    assert all(0 <= c < 256 for r in enc for c in r.codes)
    assert len(enc) == emb.count()


def test_auto_planes_scales_bucket_count():
    """Bucket count must grow with the corpus so within-bucket pair joins
    stay bounded: 2^planes ~ n/target, clamped to [min, max]."""
    assert similarity.auto_planes(0) == 4
    assert similarity.auto_planes(4096) == 4
    assert similarity.auto_planes(4096 * 1024) == 10
    assert similarity.auto_planes(10**12) == 24  # clamped
    # expected bucket population stays within 2x of target as n grows
    for n in (10**6, 10**8, 10**10):
        p = similarity.auto_planes(n)
        if p < 24:
            assert n / 2**p <= 4096 * 2


def test_sign_matrix_prefix_stable_and_deterministic(spark):
    """Bucket bits for p planes must be the low bits of p+1 planes (matrix
    rows are prefix-stable), so re-indexing with more planes refines
    buckets instead of rehashing them; and the UDF must agree with the
    driver-side query_bucket computation."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b4 = {r.vec_id: r.b for r in df.select("vec_id", similarity.sign_bucket("embedding", 4).alias("b")).collect()}
    b6 = {r.vec_id: r.b for r in df.select("vec_id", similarity.sign_bucket("embedding", 6).alias("b")).collect()}
    for i in b4:
        assert b6[i] & 0b1111 == b4[i]
    # driver-side twin: float32 storage truncates the vector, so compare
    # through the same float32 round-trip the executor sees
    for vid, vec in rows[:5]:
        v32 = [float(np.float32(x)) for x in vec]
        assert similarity.query_bucket(v32, 4) == b4[vid]


def test_pi_estimate(spark):
    est = estimate_pi(spark, num_samples=2_000_000, partitions=16, seed=42)
    assert abs(est - math.pi) < 0.01
    # determinism at fixed (seed, partitions)
    assert est == estimate_pi(spark, num_samples=2_000_000, partitions=16, seed=42)


def test_token_functions(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  world! WPI"), (2, ""), (3, "   "), (4, "one")],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: r.n
        for r in df.select("doc_id", text.token_count("text").alias("n")).collect()
    }
    assert rows == {1: 3, 2: 0, 3: 0, 4: 1}
    bpe = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", text.bpe_ish_token_count("text").alias("n")
        ).collect()
    }
    assert bpe[1] == 5  # Hello / , / world / ! / WPI
    assert bpe[2] == 0 and bpe[4] == 1


def test_quality_features_bounds(spark, docs):
    out = text.quality_features(docs).select(
        "doc_id", "punct_ratio", "stopword_ratio", "avg_token_len"
    )
    for r in out.collect():
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert r.avg_token_len >= 0.0


def test_language_id_deterministic_argmax(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of it"), (2, "der hund und die katze ist")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.lang_pred for r in text.language_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"


def test_nearest_centroid_matches_numpy_reference(spark):
    """The catalog query must compute TRUE nearest-quantized-centroid
    classification — an independent numpy implementation of the documented
    rule (micro-quantized components, floor-divided integer centroid,
    int64 squared distance, label tie-break) must agree on every vector.
    Guards the r2 bug where an un-normalized 1/n^2 denominator biased the
    argmin toward small labels."""
    import numpy as np

    emb_rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vq = {
        r.vec_id: np.floor(np.asarray(r.embedding, dtype=np.float64) * 1_000_000)
        .astype(np.int64)
        for r in emb_rows
    }
    labels = {r.vec_id: r.label for r in emb_rows}
    by_label: dict[str, list] = {}
    for vid, lab in labels.items():
        by_label.setdefault(lab, []).append(vq[vid])
    cents = {
        lab: np.floor_divide(np.sum(np.stack(vs), axis=0), len(vs))
        for lab, vs in by_label.items()
    }
    expected: dict[tuple, int] = {}
    for vid, v in vq.items():
        best = min(
            (int(np.sum((v - cd) ** 2)), lab) for lab, cd in sorted(cents.items())
        )
        key = (labels[vid], best[1])
        expected[key] = expected.get(key, 0) + 1

    out = {
        (r.label, r.pred_label): r.n_vectors
        for r in QUERIES["embedding_nearest_centroid"](spark, SF_SMOKE).collect()
    }
    assert out == expected


# --- Exact substring spans (relational ExactSubstr) --------------------------
def test_substring_spans_crafted(spark):
    """Hand-built corpus pins the island-merge semantics: a 5-token run
    shared at different offsets merges into ONE maximal span; two disjoint
    shared runs in the same pair stay TWO spans; sub-k overlaps vanish."""
    base = "a1 a2 a3 a4 a5"  # 5-token run, k=3 below
    rows = [
        # doc 1/2: run at offset 0 vs offset 2 -> one span, off = -2
        (1, f"{base} x1 x2 x3 x4 x5"),
        (2, f"y1 y2 {base} z1 z2 z3"),
        # doc 3: shares TWO disjoint runs with doc 1 (the a-run and x3 x4
        # x5 tail) separated by a non-matching gap -> two spans
        (3, f"{base} q1 q2 q3 x3 x4 x5"),
        # doc 4: only a 2-token overlap with anything (< k) -> no row
        (4, "a1 a2 w1 w2 w3 w4 w5 w6"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        (r.doc_a, r.doc_b, r.a_start, r.a_end, r.b_start, r.b_end, r.span_tokens)
        for r in dedup.substring_spans(df, k=3).collect()
    }
    assert (1, 2, 1, 5, 3, 7, 5) in spans  # merged maximal run
    assert (1, 3, 1, 5, 1, 5, 5) in spans  # a-run, aligned
    assert (1, 3, 8, 10, 9, 11, 3) in spans  # x3 x4 x5 tail, off -1
    assert not any(4 in (a, b) for (a, b, *_) in spans)  # sub-k overlap
    # doc2/doc3 share the a-run too (2,3) with b-offsets
    assert (2, 3, 3, 7, 1, 5, 5) in spans
    assert len(spans) == 4


def test_span_coverage_crafted(spark):
    """Coverage counts shingle positions, not distinct shingles; a doc with
    no cross-doc shingle reports ratio 0.0; sub-k docs emit no row."""
    rows = [
        (1, "s1 s2 s3 s4"),     # 2 shingles (k=3), both shared with doc 2
        (2, "s1 s2 s3 s4 u1"),  # 3 shingles, 2 shared
        (3, "v1 v2 v3 v4"),     # 2 shingles, none shared
        (4, "t1 t2"),           # < k tokens -> absent
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_shingles, r.n_shared, r.shared_ratio)
        for r in dedup.shared_shingle_coverage(df, k=3).collect()
    }
    assert got == {
        1: (2, 2, 1.0),
        2: (3, 2, round(2 / 3, 9)),
        3: (2, 0, 0.0),
    }


def test_substring_spans_within_doc_repeats(spark):
    """A shingle repeated WITHIN one doc must not self-pair; across docs a
    repeated shingle yields one span per alignment offset."""
    rows = [
        (1, "r1 r2 r3 m1 r1 r2 r3"),  # run appears twice in doc 1
        (2, "r1 r2 r3 n1 n2 n3 n4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = sorted(
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in dedup.substring_spans(df, k=3).collect()
    )
    # both occurrences in doc1 align to doc2's single occurrence; no (1,1)
    assert spans == [(1, 2, 1, 1, 3), (1, 2, 5, 1, 3)]


def test_span_redact_crafted(spark):
    """Redaction keeps the first occurrence: the lower-id doc is untouched
    (absent from output), the higher-id doc loses exactly the shared run;
    a 100%-duplicated doc redacts to NULL with n_tokens_after 0."""
    base = "c1 c2 c3 c4"
    rows = [
        (1, f"{base} tail1 tail2"),
        (2, f"head1 {base} tail3"),   # loses the 4-token run vs doc 1
        (3, base),                    # exact subset of doc 1 -> fully cut
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens_before, r.n_tokens_after, r.redacted_text)
        for r in dedup.redact_shared_spans(df, k=3).collect()
    }
    assert 1 not in got  # first occurrence keeps everything
    assert got[2] == (6, 2, "head1 tail3")
    assert got[3] == (4, 0, None)


# ---------------------------------------------------------------------------
# Round-3 pipeline extensions: behavioral invariants beyond oracle equality
# ---------------------------------------------------------------------------


def test_chunk_windows_cover_every_token(spark):
    """Sliding chunks must tile each document: starts are stride-multiples,
    the first chunk starts at 0, consecutive starts differ by exactly the
    stride, and the last chunk reaches the final token."""
    from mapreducer_pi_cs4433_spark.queries.pipeline_ext import (
        _CHUNK_S,
        _CHUNK_W,
    )
    from .conftest import SF_SMOKE

    chunks = QUERIES["text_chunk_windows"](spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    n_by_doc = {r.doc_id: r.n for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        assert r.start_tok == r.chunk_idx * _CHUNK_S
        assert 1 <= r.n_tok <= _CHUNK_W
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert rs[0].chunk_idx == 0
        assert [r.chunk_idx for r in rs] == list(range(len(rs)))
        last = rs[-1]
        assert last.start_tok + last.n_tok == n_by_doc[doc_id]


def test_budget_fill_admits_prefix_until_budget(spark):
    """Every source admits at least one doc; the pre-document running total
    is strictly under budget for every admitted doc (the crossing doc is
    kept, nothing after it)."""
    from mapreducer_pi_cs4433_spark.queries.pipeline_ext import (
        _MIXTURE_BUDGET,
    )
    from .conftest import SF_SMOKE

    rows = QUERIES["mixture_token_budget_fill"](spark, SF_SMOKE).collect()
    sources = {
        r.source for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    by_src: dict[str, list] = {}
    for r in rows:
        assert r.cum_tokens - r.n_tokens < _MIXTURE_BUDGET
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == sources
    for rs in by_src.values():
        # admitted docs form a contiguous prefix of the cum ordering
        rs.sort(key=lambda r: r.cum_tokens)
        total = 0
        for r in rs:
            total += r.n_tokens
            assert r.cum_tokens == total


def test_ppm_queries_null_out_on_empty_inputs(spark, tmp_path):
    """Zero-denominator policy (ADVICE r4): conversion_ppm / orphan_ppm
    must be NULL — not an error, not engine-divergent — when the
    denominator population is empty. Both engines run the guard on a
    crafted all-empty star schema; DuckDB's `//` raises on /0 and Spark's
    `div` nulls silently, so only an explicit CASE gives parity."""
    import duckdb

    from mapreducer_pi_cs4433_spark.queries.catalog import ORACLE

    sf = str(tmp_path)
    for t in ("events", "lineitem", "orders", "customer", "part",
              "supplier"):
        load_table(spark, SF_SMOKE, t).limit(0).write.parquet(
            f"{sf}/{t}.parquet"
        )
    con = duckdb.connect()
    for t in ("events", "lineitem", "orders", "customer", "part",
              "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    funnel = QUERIES["events_funnel_windowed"](spark, sf).collect()
    assert len(funnel) == 1
    assert funnel[0].n_view == 0 and funnel[0].conversion_ppm is None
    d_funnel = con.sql(ORACLE["events_funnel_windowed"]).fetchall()
    assert d_funnel[0][3] is None  # conversion_ppm NULL, no /0 error
    census = QUERIES["dq_referential_census"](spark, sf).collect()
    assert len(census) == 4
    assert all(r.n_child == 0 and r.orphan_ppm is None for r in census)
    d_census = con.sql(ORACLE["dq_referential_census"]).fetchall()
    assert all(row[3] is None for row in d_census)


def test_source_divergence_is_bounded_ppm(spark):
    from .conftest import SF_SMOKE

    rows = QUERIES["text_source_divergence"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tvd_ppm <= 1_000_000


def test_bpe_merges_are_deterministic_and_shrinking(spark):
    """Same corpus -> identical merge table across invocations; counts are
    positive and the merged symbols are concatenations of their parts."""
    from .conftest import SF_SMOKE

    a = sorted(map(tuple, QUERIES["text_bpe_merges"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, QUERIES["text_bpe_merges"](spark, SF_SMOKE).collect()))
    assert a == b
    assert len(a) == 3
    for step, left, right, cnt in a:
        assert cnt > 0 and left and right


def test_dim_stats_bounds(spark):
    """Per-dimension mean must sit inside [min, max]; every one of the 64
    dims is present with the full vector count."""
    from .conftest import SF_SMOKE

    rows = QUERIES["embedding_dim_stats"](spark, SF_SMOKE).collect()
    assert {r.dim for r in rows} == set(range(1, 65))
    counts = {r.n_vectors for r in rows}
    assert len(counts) == 1
    for r in rows:
        assert r.min_micro <= r.mean_micro <= r.max_micro


def test_er_resolution_is_consistent_with_pairs(spark):
    """Every fuzzy pair lands in one entity; canonical names are members
    and are the minimum of their entity; entity sizes agree with member
    counts."""
    from .conftest import SF_SMOKE

    pairs = QUERIES["er_fuzzy_name_pairs"](spark, SF_SMOKE).collect()
    res = QUERIES["er_fuzzy_resolution"](spark, SF_SMOKE).collect()
    canon = {r.name: r.canonical_name for r in res}
    for p in pairs:
        assert canon[p.name_a] == canon[p.name_b]
    from collections import Counter

    sizes = Counter(canon.values())
    for r in res:
        assert canon[r.canonical_name] == r.canonical_name
        assert r.canonical_name <= r.name
        assert r.entity_size == sizes[r.canonical_name]


def test_leakage_safe_split_keeps_clusters_together(spark):
    """No near-dup cluster may span the train/heldout boundary — the whole
    point of splitting on the cluster id; and both splits must be
    non-empty (the 75/25 gate binds)."""
    from .conftest import SF_SMOKE

    rows = QUERIES["split_leakage_safe"](spark, SF_SMOKE).collect()
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert {r.split for r in rows} == {"train", "heldout"}


def test_quality_weighted_sample_is_strict_and_monotone(spark):
    """Admission must be a strict subset, saturated-weight docs always
    admitted-or-not by their hash alone, and re-runs identical."""
    from .conftest import SF_SMOKE

    a = sorted(r.doc_id for r in QUERIES["sample_quality_weighted"](spark, SF_SMOKE).collect())
    b = sorted(r.doc_id for r in QUERIES["sample_quality_weighted"](spark, SF_SMOKE).collect())
    assert a == b and len(a) > 0
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert len(a) < total


def test_backlog_sweep_invariants(spark):
    """The sweep's running count can never go negative, and because every
    +1 has a matching -1, the final open-order count is exactly zero."""
    from .conftest import SF_SMOKE

    rows = QUERIES["orders_backlog_sweep"](spark, SF_SMOKE).collect()
    rows.sort(key=lambda r: r.day)
    assert rows
    assert all(r.open_orders >= 0 for r in rows)
    assert rows[-1].open_orders == 0
    assert sum(r.delta for r in rows) == 0


def test_windowed_funnel_is_monotone(spark):
    """Each funnel stage can only lose users, and the windowed funnel can
    never convert MORE users than the unconstrained one."""
    from .conftest import SF_SMOKE

    w = QUERIES["events_funnel_windowed"](spark, SF_SMOKE).first()
    assert w.n_view >= w.n_click_within >= w.n_purchase_within >= 0
    u = QUERIES["events_funnel"](spark, SF_SMOKE).first()
    assert w.n_purchase_within <= u.n_view  # same user universe


def test_referential_census_is_clean_on_testdata(spark):
    """The synthetic star schema is referentially intact — the census must
    say so (any nonzero orphan count means a loader or generator bug the
    inner-join queries would silently absorb)."""
    from .conftest import SF_SMOKE

    rows = QUERIES["dq_referential_census"](spark, SF_SMOKE).collect()
    assert len(rows) == 4
    assert all(r.n_orphans == 0 and r.orphan_ppm == 0 for r in rows)
    assert all(r.n_child > 0 for r in rows)


def test_norm_profile_order_statistics_are_ordered(spark):
    from .conftest import SF_SMOKE

    r = QUERIES["embedding_norm_profile"](spark, SF_SMOKE).first()
    assert (
        r.min_norm2 <= r.p01_norm2 <= r.med_norm2
        <= r.p99_norm2 <= r.max_norm2
    )
    assert r.n_outliers_2x == 0  # unit-normalized corpus
    assert r.n_vectors > 0


def test_bpe_marker_replace_boundary_semantics(spark):
    """The marker-prefixed symbol encoding must make plain string replace
    behave exactly like greedy leftmost non-overlapping BPE merging, in
    BOTH engines: runs merge floor(n/2) times ("aaaa" -> "aa aa",
    "aaa" -> "aa a"), and a pattern can never match mid-symbol
    ("xa a" does NOT contain the pair (a, a))."""
    import duckdb

    cases = [
        ("_a _a _a _a ", "_a _a ", "_aa ", "_aa _aa "),
        ("_a _a _a ", "_a _a ", "_aa ", "_aa _a "),
        ("_xa _a ", "_a _a ", "_aa ", "_xa _a "),  # no mid-symbol match
        ("_e _y _e _y ", "_e _y ", "_ey ", "_ey _ey "),
    ]
    df = spark.createDataFrame(
        [(s, pat, rep) for s, pat, rep, _ in cases], ["sym", "pat", "rep"]
    )
    got = [
        r[0]
        for r in df.select(
            F.replace(F.col("sym"), F.col("pat"), F.col("rep"))
        ).collect()
    ]
    assert got == [want for *_, want in cases]
    con = duckdb.connect()
    for s, pat, rep, want in cases:
        assert con.execute(
            "SELECT replace(?, ?, ?)", [s, pat, rep]
        ).fetchone()[0] == want
    con.close()


# --- r4 determinism hardening: quantile policy + canonicalizer parity --------
def test_spark_percentile_disc_is_ceil_rank(spark):
    """Pin Spark's percentile_disc rank policy: the selected element is the
    one at row_number rank ceil(n*q) (ascending). Every reformulated oracle
    (events_anomaly_mad, events_value_quartiles_disc, graph_triangle_count
    threshold, embedding_norm_profile) selects that rank EXPLICITLY with
    integer arithmetic on the DuckDB side; this test is the proof that the
    Spark side's percentile_disc aggregate picks the identical element, so
    the two formulations can share a hash. If a pyspark upgrade ever moves
    this policy, this test — not a driver hash-fail — reports it."""
    # r13 (suite wall time): the identical assertions, batched — the
    # original ran one ~0.25 s Spark job PER (n, q) pair (121 + 6 jobs,
    # ~31 s of the suite); grouping all n-prefixes into one table and
    # evaluating every quantile as one aggregate list runs TWO jobs.
    quants = [(1, 100), (25, 100), (50, 100), (75, 100),
              (90, 100), (95, 100), (99, 100),
              (495, 1000), (505, 1000), (945, 1000), (995, 1000)]
    rows = [(n, float(i)) for n in range(1, 12) for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n int, v double")
    df.createOrReplaceTempView("_pd_probe")
    aggs = ", ".join(
        f"percentile_disc({num / den!r}) WITHIN GROUP (ORDER BY v) AS p{i}"
        for i, (num, den) in enumerate(quants)
    )
    got = {
        r["n"]: r
        for r in spark.sql(
            f"SELECT n, {aggs} FROM _pd_probe GROUP BY n"
        ).collect()
    }
    for n in range(1, 12):
        for i, (num, den) in enumerate(quants):
            want = float((n * num + den - 1) // den)  # ceil(n*q), exact ints
            assert got[n][f"p{i}"] == want, (n, num / den, got[n][f"p{i}"], want)
    # Large-n cases where n*q lands EXACTLY on an integer (ADVICE r4): the
    # only theoretical divergence point between ceil-rank and a float
    # cume_dist>=q convention is whether an exactly-integer product selects
    # rank n*q or n*q+1. Production calls run q in {0.01,0.25,0.5,0.75,
    # 0.9,0.99} over groups of thousands, so pin the boundary at the sizes
    # where those literals hit integers.
    large = [(1000, 90, 100), (100, 1, 100), (100, 99, 100),
             (1000, 25, 100), (200, 50, 100), (500, 99, 100)]
    rows = [
        (case, float(i))
        for case, (n, _, _) in enumerate(large)
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "c int, v double")
    df.createOrReplaceTempView("_pd_probe_large")
    sel = ", ".join(
        f"percentile_disc({num / den!r}) WITHIN GROUP (ORDER BY v) "
        f"FILTER (WHERE c = {case}) AS p{case}"
        for case, (n, num, den) in enumerate(large)
    )
    got_l = spark.sql(f"SELECT {sel} FROM _pd_probe_large").first()
    for case, (n, num, den) in enumerate(large):
        want = float((n * num + den - 1) // den)  # == n*q exactly here
        assert (n * num) % den == 0  # the case under test: integer product
        assert got_l[f"p{case}"] == want, (n, num / den, got_l[f"p{case}"], want)


def test_catalog_rejects_complex_output_columns(spark):
    """The registration guard must make the r3 driver failure class
    (array-typed output column -> pandas factorize TypeError) unshippable:
    any catalog-registered query whose DataFrame carries an Array, Map, or
    Struct output column raises at call time, on every call path."""
    from mapreducer_pi_cs4433_spark.queries.catalog import _check_output_schema

    ok = spark.createDataFrame([(1, "a,b")], "k int, vals string")
    assert _check_output_schema("probe", ok) is ok
    for bad in [
        spark.createDataFrame([(1, ["a"])], "k int, vals array<string>"),
        spark.createDataFrame([(1, {"a": 1})], "k int, vals map<string,int>"),
        spark.sql("SELECT 1 AS k, named_struct('a', 1) AS vals"),
    ]:
        with pytest.raises(TypeError, match="complex-typed output column"):
            _check_output_schema("probe", bad)


def test_local_gate_canonicalizer_matches_driver_on_lists():
    """tools/full_oracle_check must reproduce the DRIVER's pandas
    canonicalization, including its failure mode: a list-valued cell must
    raise TypeError (factorize path), not silently stringify — the exact
    gap that let olap_customer_order_years ship green in r3 and fail in
    the driver."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "full_oracle_check",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "full_oracle_check.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # scalar rows: canonical form is order- and column-order-insensitive
    a = mod._canon([(1, "x"), (2, "y")], ["k", "s"])
    b = mod._canon([("y", 2), ("x", 1)], ["s", "k"])
    assert a == b
    # float cells must require BIT-exact equality
    assert mod._canon([(0.1 + 0.2,)], ["v"]) != mod._canon([(0.3,)], ["v"])
    # the r3 failure mode: list cells crash the multi-column sort
    with pytest.raises(TypeError):
        mod._canon([(1, [2020, 2021]), (2, [1999])], ["k", "years"])


def test_invalidate_table_cache_drops_mad_grain_memo(spark, tmp_path):
    """invalidate_table_cache must drop DERIVED memos along with the
    load_table plans: the MAD value grain is materialized from events, so
    after an in-place events rewrite a stale grain would silently survive
    the plan-cache flush (r5 fix)."""
    from mapreducer_pi_cs4433_spark.queries.extensions import _mad_grain
    from mapreducer_pi_cs4433_spark.sources.loaders import (
        invalidate_table_cache,
    )

    sf = str(tmp_path)
    src = load_table(spark, SF_SMOKE, "events")
    src.limit(50).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    g1 = _mad_grain(spark, sf).agg(F.sum("c").alias("n")).first().n
    assert g1 == 50
    # in-place rewrite with different data, then the required invalidation
    src.limit(10).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    invalidate_table_cache(spark, sf)
    g2 = _mad_grain(spark, sf).agg(F.sum("c").alias("n")).first().n
    assert g2 == 10
