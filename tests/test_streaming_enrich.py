"""Stream-static enrichment: streamed nearest-centroid assignment must
equal the persisted batch assignment artifact bit-for-bit.

Pins:
1. Full-corpus parity: feeding the embeddings table through the stream
   reproduces every (vec_id, cl, d) row of ensure_kmeans_assignment —
   same clusters, same exact integer distances.
2. Split-invariance: the same rows arriving across two checkpointed
   availableNow runs produce the identical result set (stateless per-row
   scoring — nothing can depend on batch boundaries), and NULL vectors
   are dropped like the batch artifact drops them.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.queries.extensions import _KMEANS_K
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.enrich import (
    centroids_for_stream,
    cluster_assign_stream,
)

from .conftest import SF_SMOKE


def _run(spark, src, ckpt, out, cents):
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(src)
    q = (
        cluster_assign_stream(stream, cents)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streamed_assignment_equals_batch_artifact(spark):
    from mapreducer_pi_cs4433_spark.functions.similarity import (
        ensure_kmeans_assignment,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = centroids_for_stream(spark, emb, SF_SMOKE, _KMEANS_K)
    want = {
        (r.vec_id, r.cl, r.d)
        for r in ensure_kmeans_assignment(
            spark, emb, SF_SMOKE, k=_KMEANS_K
        ).collect()
    }

    src = tempfile.mkdtemp(prefix="en_src_")
    ckpt = tempfile.mkdtemp(prefix="en_ck_")
    out = tempfile.mkdtemp(prefix="en_out_")
    try:
        # two arbitrary chunks across two checkpointed runs: batch
        # boundaries must be invisible to a stateless scorer (includes
        # the corpus's NULL-embedding rows, which must be dropped)
        half = emb.select("vec_id", "embedding")
        half.filter(F.col("vec_id") % 3 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _run(spark, src, ckpt, out, cents)
        half.filter(F.col("vec_id") % 3 != 0).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _run(spark, src, ckpt, out, cents)
        got = {
            (r.vec_id, r.cl, r.d)
            for r in spark.read.parquet(out).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
