"""Streaming deduplication — the ingest-time twin of functions.dedup.

exact_dedup_stream drops payload-identical documents as they arrive:
content digest + dropDuplicatesWithinWatermark, so state holds one digest
per document seen within the watermark horizon (bounded, evictable) instead
of growing forever. This is the shape of an ingest pipeline that must not
admit the same crawled page twice within a window.

For unbounded exact dedup across ALL history, merge_into_digest_table is
the batch layer: a persisted append-only digest table is the source of
truth, and each ingest batch (a micro-batch sink, a crawl drop, a backfill)
is admitted only if its digest is unseen — across restarts, across jobs.
The streaming layer bounds duplication within the watermark horizon; the
digest merge closes the gap beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Admit only the first document per content digest within the
    watermark horizon. Output keeps the original columns plus `digest`.

    State per digest is one row; the watermark lets the engine evict
    digests older than the horizon, so state size tracks the horizon's
    document rate, not stream lifetime.
    """
    return (
        stream.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def merge_into_digest_table(
    spark: SparkSession,
    new_docs: DataFrame,
    digest_table_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact-dedup merge: admit only documents whose content
    digest has never been seen, and persist the new digests.

    The digest table at `digest_table_path` is an append-only parquet of
    (digest, keep_id) — ~48 bytes/document regardless of document size, the
    only state that must survive restarts. Per batch:

      1. within-batch dedup: one representative (min id) per digest;
      2. cross-history dedup: left_anti join against the digest table
         (shuffles digests only, never documents);
      3. append the admitted digests; return the admitted document rows.

    Re-running the same batch admits nothing (idempotent at the digest
    level), so a crashed-and-retried ingest cannot re-admit documents —
    the round-trip guarantee the streaming layer alone (watermark-bounded
    state) cannot make.

    Consistency note: the anti-join's view of the table is the file listing
    snapshotted when this function reads it, so the returned DataFrame is
    stable even though step 3 appends to the same path before the caller
    runs its action (parquet file listings are captured per-read, not
    per-action). One merge at a time per table — concurrent writers need a
    table format with commit semantics (Iceberg/Delta) instead of raw
    parquet appends.

    At 100 TB: the shuffle key is the digest (uniform by construction — no
    skew); store the table bucketed by digest (sinks.write_bucketed_table)
    to make the anti-join's seen-side exchange disappear, and compact
    appended files periodically (sinks.compact_small_files).
    """
    candidates = (
        new_docs.withColumn("digest", F.md5(F.col(text_col)))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("digest").orderBy(F.col(id_col).asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    try:
        seen = spark.read.parquet(digest_table_path).select("digest")
        first_batch = False
    except AnalysisException:
        seen = None
        first_batch = True
    admitted = (
        candidates
        if first_batch
        else candidates.join(seen, "digest", "left_anti")
    )
    (
        admitted.select(
            "digest", F.col(id_col).cast("long").alias("keep_id")
        ).write.mode("append").parquet(digest_table_path)
    )
    return admitted
