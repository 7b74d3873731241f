"""Streaming twin of source_schema_evolution: a long-lived ingest whose
SOURCE files evolve mid-stream. readStream cannot mergeSchema (the
schema is fixed at query start), so the correct pattern is the one this
test pins: declare the NEWEST schema up front and let parquet
schema-on-read serve NULLs for columns older generations lack. The
batch entry proves the merged READ; this proves the same corpus
evolves correctly THROUGH a streaming query, including across a
restart that straddles the generation boundary.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

_V2 = "doc_id long, lang string, n_chars long, quality_score int"


def test_stream_reads_evolving_generations_null_filled(spark):
    """Chunk 1 writes v1 files (no quality_score), chunk 2 writes v2
    files — one streaming query per chunk against the SAME checkpoint
    (a restart at the schema boundary, the deployment reality: the
    reader is upgraded to v2 BEFORE old files are rewritten, i.e.
    never). The v2-schema reader must serve quality_score as NULL over
    every v1 row and as written over v2 rows; the per-generation census
    matches the batch entry's contract (n_quality_null == n_rows on
    gen 1, == 0 on gen 2; the quality sum exact)."""
    src = tempfile.mkdtemp(prefix="sevo_src_")
    ckpt = tempfile.mkdtemp(prefix="sevo_ck_")
    acc: list = []
    try:
        # generation 1: the v1 writer's schema
        spark.createDataFrame(
            [(1, "en", 100), (2, "fr", 200), (3, "en", 300)],
            "doc_id long, lang string, n_chars long",
        ).coalesce(1).write.mode("append").parquet(src)

        def run_chunk():
            stream = spark.readStream.schema(_V2).option(
                "maxFilesPerTrigger", 1
            ).parquet(src)
            out = stream.select(
                "doc_id",
                "lang",
                "n_chars",
                "quality_score",
                F.col("quality_score").isNull().cast("int").alias("q_null"),
            )
            q = (
                out.writeStream.foreachBatch(
                    lambda df, bid: acc.extend(df.collect())
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        run_chunk()
        # generation 2: the writer evolved; old files stay as-is
        spark.createDataFrame(
            [(4, "en", 150, 150 % 97), (5, "de", 250, 250 % 97)],
            _V2,
        ).coalesce(1).write.mode("append").parquet(src)
        run_chunk()

        assert len(acc) == 5
        by_id = {r.doc_id: r for r in acc}
        # v1 rows: evolved column NULL-filled, never dropped or defaulted
        for i in (1, 2, 3):
            assert by_id[i].quality_score is None and by_id[i].q_null == 1, i
        # v2 rows: values served as written
        assert by_id[4].quality_score == 150 % 97 and by_id[4].q_null == 0
        assert by_id[5].quality_score == 250 % 97 and by_id[5].q_null == 0
        # the batch entry's census contract, computed over the stream's
        # output: gen 1 all-null, gen 2 none-null, sum exact
        gen1 = [r for r in acc if r.doc_id <= 3]
        gen2 = [r for r in acc if r.doc_id >= 4]
        assert sum(r.q_null for r in gen1) == len(gen1) == 3
        assert sum(r.q_null for r in gen2) == 0
        assert sum(r.quality_score or 0 for r in gen2) == 150 % 97 + 250 % 97
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)
