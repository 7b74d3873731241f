"""Monte Carlo pi estimation — the repo-namesake RDD workload.

The one deliberately-RDD workload in the engine (BASELINE.json
`spark_approach`): embarrassingly parallel per-partition sampling with a
single scalar reduce — the exact shape where the RDD API is the right tool
(no schema, no shuffle, no Catalyst opportunity).

Deterministic per (seed, num_partitions): each partition seeds its own RNG
with (seed, partition_index) so results don't depend on scheduling order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def estimate_pi(
    spark: SparkSession,
    num_samples: int = 1_000_000,
    partitions: int = 32,
    seed: int = 42,
) -> float:
    """Classic dartboard estimate: 4 * P(x^2 + y^2 <= 1) on [0,1)^2.

    The partition kernel is a vectorized numpy batch — one
    Generator.random((n, 2)) draw and one boolean reduction per partition —
    not a per-sample Python loop (r2 ran 1M scalar rng.random() calls
    row-at-a-time; ~50x slower for identical statistics). Determinism
    contract unchanged: each partition seeds PCG64 with (seed, index), so
    the estimate depends only on (seed, num_samples, partitions), never on
    scheduling order. Memory stays bounded by drawing in <=1M-sample
    chunks per partition regardless of num_samples."""
    per_part = num_samples // partitions
    sc = spark.sparkContext

    def count_hits(idx: int, _it):
        import numpy as np

        rng = np.random.Generator(np.random.PCG64([seed, idx]))
        hits = 0
        remaining = per_part
        while remaining > 0:
            n = min(remaining, 1_000_000)
            xy = rng.random((n, 2))
            hits += int(((xy * xy).sum(axis=1) <= 1.0).sum())
            remaining -= n
        yield hits

    total_hits = (
        sc.parallelize(range(partitions), partitions)
        .mapPartitionsWithIndex(count_hits)
        .sum()
    )
    return 4.0 * total_hits / (per_part * partitions)


def estimate_pi_hash_df(
    spark: SparkSession,
    num_samples: int = 1_000_000,
) -> DataFrame:
    """Hash-derived Monte Carlo pi: the (x, y) stream comes from two
    disjoint 52-bit hex slices of md5(i) over i in [0, n) instead of a
    seeded RNG, so the sample set is a pure function of n that ANY engine
    with md5 can reproduce bit-for-bit — which makes the estimate
    oracle-checkable (DuckDB twin in the catalog), unlike the PCG64 RDD
    path above whose stream is numpy-private. 52-bit mantissa-sized slices
    divide by 2^52 exactly (power-of-two division of an integer below
    2^53 is lossless in IEEE doubles), so x, y, x*x+y*y and the hit test
    are deterministic IEEE arithmetic in every engine. The whole job is
    one codegen'd range scan + one scalar aggregate: no Python, no RNG
    state, no shuffle beyond the final 1-row reduce."""
    two52 = float(1 << 52)
    h = F.md5(F.col("id").cast("string"))
    x = F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint") / F.lit(two52)
    y = F.conv(F.substring(h, 14, 13), 16, 10).cast("bigint") / F.lit(two52)
    hits = (
        spark.range(num_samples)
        .select(((x * x + y * y) <= F.lit(1.0)).cast("int").alias("hit"))
        .agg(
            F.sum("hit").cast("long").alias("n_hits"),
            F.count("*").alias("n_samples"),
        )
    )
    return hits.select(
        (
            F.lit(4.0) * F.col("n_hits").cast("double") / F.col("n_samples")
        ).alias("pi_estimate"),
        "n_hits",
        "n_samples",
    )


def estimate_pi_df(
    spark: SparkSession,
    num_samples: int = 1_000_000,
    partitions: int = 32,
    seed: int = 42,
) -> DataFrame:
    """1-row DataFrame (pi_estimate, num_samples) wrapper for the query
    catalog; the estimate itself runs on the RDD path above."""
    est = estimate_pi(spark, num_samples, partitions, seed)
    return spark.createDataFrame(
        [(est, num_samples)], "pi_estimate double, num_samples bigint"
    )
