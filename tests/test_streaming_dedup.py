"""Streaming exact-dedup tests: bounded replay with planted duplicates."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.dedup import exact_dedup_stream

from .conftest import SF_SMOKE


def test_exact_dedup_stream_drops_planted_duplicates(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    # stream table: each doc once, plus every 5th doc duplicated 1s later
    with_ts = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    ).withColumn(
        "ts",
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,rn)"),
    )
    dupes = with_ts.filter(F.col("doc_id") % 5 == 0).withColumn(
        "ts", F.expr("ts + interval 1 second")
    )
    src_df = with_ts.unionByName(dupes).select("doc_id", "text", "ts")
    src = tempfile.mkdtemp(prefix="sdedup_src_")
    ckpt = tempfile.mkdtemp(prefix="sdedup_ck_")
    try:
        src_df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(src_df.schema).parquet(src)
        deduped = exact_dedup_stream(stream, watermark="10 minutes")
        q = (
            deduped.writeStream.format("memory")
            .queryName("sdedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("select * from sdedup").collect()
        n_docs = docs.count()
        assert len(out) == n_docs  # every duplicate dropped, every unique kept
        assert len({r.digest for r in out}) == n_docs
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
