"""Z-order layout: key correctness + the file-skipping property it buys."""

import os

from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.functions.layout import (
    write_zordered,
    zorder_key,
)

from .conftest import SF_SMOKE


def _interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (12345, 678), (65535, 65535), (70000, 3)]
    df = spark.createDataFrame(rows, "a LONG, b LONG").withColumn(
        "z", zorder_key("a", "b")
    )
    for r in df.collect():
        assert r.z == _interleave(r.a & 0xFFFF, r.b & 0xFFFF), (r.a, r.b)


def _per_file_spans(spark, path, cols):
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs.append((F.max(c) - F.min(c)).alias(f"span_{c}"))
    return df.groupBy("f").agg(*aggs).collect()


def test_zordered_files_bound_span_in_both_dims(spark, tmp_path):
    """THE point of z-order: every output file has a bounded min/max span
    in BOTH key columns (parquet footers then prune on either predicate),
    while a linear sort bounds only its leading key. Keys are a synthetic
    uniform 2-D keyspace of comparable bit width — the regime the curve is
    for (on sf0.001's 10-value suppkey there is nothing to subdivide)."""
    n, side = 16384, 4096
    df = spark.range(n).select(
        (F.col("id") % side).alias("a"),
        ((F.col("id") * 997) % side).alias("b"),
    )

    zpath = os.path.join(str(tmp_path), "zordered")
    write_zordered(df, zpath, "a", "b", n_files=16)
    zspans = _per_file_spans(spark, zpath, ["a", "b"])
    assert len(zspans) >= 8  # range partitioner actually split the curve

    lpath = os.path.join(str(tmp_path), "linear")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lspans = _per_file_spans(spark, lpath, ["a", "b"])

    def mean(vals):
        return sum(vals) / len(vals)

    z_a = mean([r["span_a"] for r in zspans])
    z_b = mean([r["span_b"] for r in zspans])
    l_a = mean([r["span_a"] for r in lspans])
    l_b = mean([r["span_b"] for r in lspans])

    # linear layout: near-perfect on the leading key, useless on the other
    assert l_a < side * 0.2
    assert l_b > side * 0.8
    # z-order: materially bounded in BOTH (each file covers a z-range =>
    # a quadrant-ish region of the key plane)
    assert z_a < side * 0.6
    assert z_b < side * 0.6


def test_bloom_filter_write_option_takes_effect(spark, tmp_path):
    """write_with_bloom_filters must actually materialize the filters:
    pyarrow 16 does not expose bloom metadata, so the evidence is the
    footprint (split-block filters sized by ndv add ~64KB per enabled
    column per row group — absent entirely from a plain write of the same
    data) plus point-lookup correctness through the filtered read path."""
    import glob

    from mapreducer_pi_cs4433_spark.functions.layout import write_with_bloom_filters
    from mapreducer_pi_cs4433_spark.sources.loaders import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "source", "text")
        .coalesce(1)
    )
    bloom_dir, plain_dir = str(tmp_path / "b"), str(tmp_path / "p")
    write_with_bloom_filters(docs, bloom_dir, ["doc_id", "source"], ndv=100_000)
    docs.write.mode("overwrite").parquet(plain_dir)
    size = lambda d: sum(os.path.getsize(f) for f in glob.glob(d + "/*.parquet"))
    # two enabled columns => >= ~100KB of filter blocks over the plain file
    assert size(bloom_dir) - size(plain_dir) > 100_000
    got = spark.read.parquet(bloom_dir).filter(F.col("doc_id") == 42).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 42
