"""Monte Carlo pi estimation — the repo-namesake RDD workload.

The one deliberately-RDD workload in the engine (BASELINE.json
`spark_approach`): embarrassingly parallel per-partition sampling with a
single scalar reduce — the exact shape where the RDD API is the right tool
(no schema, no shuffle, no Catalyst opportunity).

Deterministic per (seed, num_partitions): each partition seeds its own RNG
with (seed, partition_index) so results don't depend on scheduling order.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession


def estimate_pi(
    spark: SparkSession,
    num_samples: int = 1_000_000,
    partitions: int = 32,
    seed: int = 42,
) -> float:
    """Classic dartboard estimate: 4 * P(x^2 + y^2 <= 1) on [0,1)^2."""
    per_part = num_samples // partitions
    sc = spark.sparkContext

    def count_hits(idx: int, _it):
        # Random() only accepts scalar seeds; mix partition index in with a
        # large odd multiplier so partition streams don't overlap
        rng = random.Random(seed * 1_000_003 + idx)
        hits = 0
        for _ in range(per_part):
            x, y = rng.random(), rng.random()
            if x * x + y * y <= 1.0:
                hits += 1
        yield hits

    total_hits = (
        sc.parallelize(range(partitions), partitions)
        .mapPartitionsWithIndex(count_hits)
        .sum()
    )
    return 4.0 * total_hits / (per_part * partitions)


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
