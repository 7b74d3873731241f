"""Python DataSource API connector: determinism, partitioning, row budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.sources.synthetic import SyntheticDocsDataSource


def _read(spark, **opts):
    spark.dataSource.register(SyntheticDocsDataSource)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthetic_source_deterministic_and_partitioned(spark):
    df = _read(spark, n_docs=1003, partitions=7, seed=9)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 1003  # remainder absorbed by the last partition
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, n_docs=1003, partitions=7, seed=9).collect()))
    assert a == b  # same seed => identical corpus on any run
    c = sorted(map(tuple, _read(spark, n_docs=1003, partitions=7, seed=10).collect()))
    assert a != c  # different seed => different corpus
    ids = [r[0] for r in a]
    assert ids == list(range(1003))  # contiguous, collision-free ids


def test_synthetic_source_feeds_real_operators(spark):
    """The generated corpus must flow through the actual pipeline operators
    (token stats + exact dedup) like any file-backed table."""
    from mapreducer_pi_cs4433_spark.functions import dedup, text

    df = _read(spark, n_docs=200, partitions=4, tokens_per_doc=12)
    stats = text.quality_features(df).select("doc_id", "n_tokens").collect()
    assert all(r.n_tokens == 12 for r in stats)
    out = dedup.exact_dedup(df).agg(F.sum("dup_count").alias("s")).collect()
    assert out[0].s == 200
