"""Approximate-nearest-neighbor similarity search over embedding columns.

Two paths:
- brute_force_topk: exact cosine top-k — the baseline. One narrow pass over
  the corpus per query (dot products as JVM array expressions) + TakeOrdered;
  O(N·d) with no shuffle of the vectors themselves.
- ivf_topk: IVF-style scale path — vectors are pre-assigned to coarse
  buckets by sign-LSH (same deterministic hyperplanes as
  dedup.embedding_neardup_pairs); queries probe only the nearest buckets.
  At 100 TB the bucket column becomes a partition key so a probe touches
  1/2^planes of the data.

Cosine arithmetic is all-double with fixed evaluation order so results are
reproducible run-to-run; ordering ties are broken by id so top-k sets are
deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col if isinstance(col, Column) else F.col(col), lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    The query vector is baked into the plan as an array literal (broadcast-
    by-constant-folding); similarity ranking rounds to 9 decimals before
    ordering with an id tie-break, so near-ULP float noise cannot reorder
    the result set between runs or engines. Returns (id, cosine_sim).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(vec_col)
    sim = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.round(sim, 9).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("id"))
        .limit(k)
    )


def sign_bucket(vec_col: str, planes: int = 8) -> Column:
    """Deterministic random-hyperplane sign bucket (shared with dedup)."""
    v = _as_double(vec_col)
    bucket = None
    for p in range(planes):
        # the lambda is invoked eagerly here, so closing over the loop var is
        # safe; it must stay exactly 2-arg for zip_with
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda x, i: x
                * F.when(
                    F.xxhash64(i, F.lit(p)).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bit = F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return bucket


def build_ivf_index(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", planes: int = 8
) -> DataFrame:
    """Materializable index: (id, vec, bucket). Write partitioned/bucketed
    by `bucket` so probes prune partitions at the source."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(vec_col, planes).alias("bucket"),
    )


def ivf_topk(
    index: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 4,
    probe_hamming: int = 1,
) -> DataFrame:
    """Probe the IVF index: scan only buckets within `probe_hamming` bits of
    the query's bucket, then exact cosine + top-k inside the probed slice.

    probe_hamming=1 scans (1 + planes)/2^planes of the corpus — the
    recall/cost dial. Sign-LSH recall depends on how *near* true neighbors
    are: at cosine ~0.95 a planes=8/hamming=1 probe keeps ~90% recall at a
    ~3.5% scan; on corpora whose top-k neighbors are only ~0.3 (e.g. random
    embeddings) use fewer planes / wider probes — planes=4/hamming=1 scans
    31% for ~50% top-10 recall. Returns (id, cosine_sim).
    """
    import math

    q = [float(x) for x in query_vec]
    # compute the query's bucket driver-side with the same hash function the
    # executors use (xxhash64(i, p) parity via a 1-row DataFrame would also
    # work; this stays on one tiny literal vector)
    spark = index.sparkSession
    qdf = spark.createDataFrame([(q,)], "embedding array<double>")
    qbucket = qdf.select(sign_bucket("embedding", planes).alias("b")).head()[0]
    near = [
        b
        for b in range(1 << planes)
        if bin(b ^ qbucket).count("1") <= probe_hamming
    ]
    qlit = F.array(*[F.lit(x) for x in q])
    v = _as_double("vec")
    sim = _dot(v, qlit) / (_norm(v) * F.lit(math.sqrt(sum(x * x for x in q))))
    return (
        index.filter(F.col("bucket").isin(near))
        .select(F.col("id"), F.round(sim, 9).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc("id"))
        .limit(k)
    )
