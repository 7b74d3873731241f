"""Streaming exact-dedup tests: bounded replay with planted duplicates,
RocksDB state store, and the cross-restart digest-table merge."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreducer_pi_cs4433_spark.session import ROCKSDB_PROVIDER, enable_rocksdb_state
from mapreducer_pi_cs4433_spark.sources.loaders import load_table
from mapreducer_pi_cs4433_spark.streaming.dedup import (
    exact_dedup_stream,
    merge_into_digest_table,
)

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


def test_exact_dedup_stream_under_rocksdb(spark):
    """Same bounded replay with the RocksDB state store provider: identical
    dedup output, and the progress metrics must prove RocksDB actually
    backed the stateful operator (not the on-heap default)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    with_ts = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    ).withColumn(
        "ts",
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,rn)"),
    )
    dupes = with_ts.filter(F.col("doc_id") % 3 == 0).withColumn(
        "ts", F.expr("ts + interval 1 second")
    )
    src_df = with_ts.unionByName(dupes).select("doc_id", "text", "ts")
    src = tempfile.mkdtemp(prefix="rdedup_src_")
    ckpt = tempfile.mkdtemp(prefix="rdedup_ck_")
    try:
        enable_rocksdb_state(spark)
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        src_df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(src_df.schema).parquet(src)
        q = (
            exact_dedup_stream(stream, watermark="10 minutes")
            .writeStream.format("memory")
            .queryName("rdedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ops = (q.recentProgress or [{}])[-1].get("stateOperators") or []
        assert any(
            "rocksdb" in k.lower()
            for op in ops
            for k in (op.get("customMetrics") or {})
        ), "state operator did not run on RocksDB"
        out = spark.sql("select * from rdedup").collect()
        assert len(out) == docs.count()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_digest_merge_no_duplicates_across_restarts(spark):
    """Batch+stream round trip: documents admitted in batch 1 must not be
    re-admitted by a 'restarted' (fresh-call) batch 2 containing the same
    content, and re-running a batch admits nothing (idempotent)."""
    table = tempfile.mkdtemp(prefix="digests_")
    shutil.rmtree(table)  # merge creates it on first write
    try:
        b1 = spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "alpha")],  # in-batch dup of 1
            "doc_id long, text string",
        )
        a1 = merge_into_digest_table(spark, b1, table)
        assert {(r.doc_id) for r in a1.collect()} == {1, 2}  # min-id wins

        # "restart": fresh call, same table path; beta is a cross-batch dup
        b2 = spark.createDataFrame(
            [(10, "beta"), (11, "gamma")], "doc_id long, text string"
        )
        a2 = merge_into_digest_table(spark, b2, table)
        assert {r.doc_id for r in a2.collect()} == {11}

        # retry of batch 2: nothing admitted, table unchanged
        a3 = merge_into_digest_table(spark, b2, table)
        assert a3.count() == 0
        tbl = spark.read.parquet(table)
        assert tbl.count() == 3
        assert tbl.select("digest").distinct().count() == 3
    finally:
        shutil.rmtree(table, ignore_errors=True)


def test_foreach_batch_digest_merge_exactly_once(spark):
    """The production wiring: stream -> foreachBatch(merge_into_digest_table)
    -> corpus sink. Micro-batch boundaries must not re-admit duplicates
    (file 2 replays half of file 1's documents), and the admitted corpus
    equals the distinct-digest set of everything ingested."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") < 25)
    second = docs.filter((F.col("doc_id") >= 25) & (F.col("doc_id") < 50)).unionByName(
        first.filter(F.col("doc_id") < 12)  # replayed duplicates
    )
    src = tempfile.mkdtemp(prefix="fbm_src_")
    table = tempfile.mkdtemp(prefix="fbm_tab_") + "/digests"
    out = tempfile.mkdtemp(prefix="fbm_out_")
    ckpt = tempfile.mkdtemp(prefix="fbm_ck_")
    try:
        first.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
        second.coalesce(1).write.mode("overwrite").parquet(src + "/b2")
        stream = (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )

        def admit(batch_df, batch_id):
            admitted = merge_into_digest_table(spark, batch_df, table)
            admitted.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(admit)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        admitted = spark.read.parquet(out)
        n_unique = (
            first.unionByName(second).select(F.md5("text")).distinct().count()
        )
        assert admitted.count() == n_unique
        assert admitted.select("digest").distinct().count() == n_unique
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(table.rsplit("/", 1)[0], ignore_errors=True)


def test_admit_new_documents_full_refresh_loop(spark):
    """The incremental admission pipeline end-to-end over two batches:
    batch 2's exact re-submissions (same text, new ids) die at the digest
    layer, its near-copies of batch-1 documents die at the history screen
    SERVED FROM the persisted signature/posting artifacts (never
    re-shingling batch 1), genuinely new documents are admitted, and the
    corpus + index tables grow consistently (one sig row and the doc's
    postings per admitted doc)."""
    from mapreducer_pi_cs4433_spark.streaming.dedup import admit_new_documents

    docs = load_table(spark, SF_SMOKE, "documents")
    b1 = docs.filter(F.col("doc_id") < 250).select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="admit_store_")
    try:
        a1 = admit_new_documents(spark, b1, store)
        n1 = a1.count()
        assert 0 < n1 <= b1.count()
        corpus1 = spark.read.parquet(f"{store}/corpus")
        assert corpus1.count() == n1
        assert spark.read.parquet(f"{store}/sigs").count() == n1

        # batch 2: exact copies (new ids) + near-copies (prefix-mangled)
        # of admitted batch-1 docs + genuinely new documents
        base = a1.select("doc_id", "text").limit(20).collect()
        exact_copies = [(10_000 + i, r.text) for i, r in enumerate(base[:10])]
        near_copies = [
            (20_000 + i, "zzz " + r.text) for i, r in enumerate(base[10:20])
        ]
        fresh = docs.filter(F.col("doc_id") >= 250).select("doc_id", "text")
        b2 = spark.createDataFrame(
            exact_copies + near_copies, "doc_id long, text string"
        ).unionByName(fresh)

        a2 = admit_new_documents(spark, b2, store)
        got_ids = {r.doc_id for r in a2.select("doc_id").collect()}
        assert not any(i >= 10_000 and i < 20_000 for i in got_ids), (
            "exact re-submission admitted"
        )
        assert not any(i >= 20_000 for i in got_ids), "near-copy admitted"
        assert got_ids  # some genuinely new docs made it in
        assert got_ids <= {r.doc_id for r in fresh.collect()}

        corpus2 = spark.read.parquet(f"{store}/corpus")
        assert corpus2.count() == n1 + len(got_ids)
        assert spark.read.parquet(f"{store}/sigs").count() == n1 + len(got_ids)
        # postings rows exist exactly for corpus members
        pids = {r.id for r in spark.read.parquet(f"{store}/postings").select("id").distinct().collect()}
        assert pids == {r.doc_id for r in corpus2.select("doc_id").collect()}

        # idempotent replay: resubmitting batch 2 admits nothing
        a3 = admit_new_documents(spark, b2, store)
        assert a3.count() == 0
        assert spark.read.parquet(f"{store}/corpus").count() == n1 + len(got_ids)
    finally:
        shutil.rmtree(store, ignore_errors=True)
