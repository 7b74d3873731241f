"""Prototype: text_lm_trigram_score gram compaction as mapInArrow vs the
current explode+groupBy — VERDICT r12 item 6. Ship only if >=20% isolated."""
import sys, time
sys.path.insert(0, '/root/repo')
from mapreducer_pi_cs4433_spark.session import get_spark
from mapreducer_pi_cs4433_spark.queries.catalog import QUERIES, _t
from mapreducer_pi_cs4433_spark.functions import text
from pyspark.sql import functions as F

spark = get_spark("proto-tri"); spark.sparkContext.setLogLevel("ERROR")
sf = '/root/testdata/sf0.1'
docs = _t(spark, sf, "documents")

def kernel_form():
    import pyarrow as pa

    def _tri_counts(batches):
        import numpy as np
        import re
        ws = re.compile(rb"\s+")
        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_id, out_g, out_n = [], [], []
            for did, t in zip(ids, texts):
                b = ws.sub(b" ", t.encode("utf-8"))
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                if len(a) >= 3:
                    codes = (a[:-2] << 16) | (a[1:-1] << 8) | a[2:]
                else:
                    # shorter than k: the whole text is the one shingle
                    c = 0
                    for x in a: c = (c << 8) | int(x)
                    # left-align like substring semantics: pad low bytes
                    c <<= 8 * (3 - len(a))
                    codes = np.array([c], dtype=np.int64)
                u, n = np.unique(codes, return_counts=True)
                out_id.extend([did] * len(u)); out_g.extend(u.tolist()); out_n.extend(n.tolist())
            yield pa.record_batch(
                [pa.array(out_id, pa.int64()), pa.array(out_g, pa.int64()),
                 pa.array(out_n, pa.int64())], names=["id", "shingle", "n_occ"])

    slim = docs.select("doc_id", "text")
    target = spark.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    grouped = slim.mapInArrow(_tri_counts, "id long, shingle long, n_occ long").localCheckpoint(eager=False)
    model = grouped.groupBy("shingle").agg(F.sum("n_occ").alias("cnt"))
    return (grouped.join(F.broadcast(model), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.sum("n_occ").alias("n_tri"), F.sum(F.col("n_occ") * F.col("cnt")).alias("sum_freq"))
        .select("doc_id", "n_tri", "sum_freq",
                (F.col("sum_freq").cast("double") / F.col("n_tri").cast("double")).alias("avg_freq")))

cur = lambda: QUERIES["text_lm_trigram_score"](spark, sf)
for name, mk in [("current", cur), ("kernel", kernel_form)] * 4:
    t0 = time.perf_counter(); mk().write.format("noop").mode("overwrite").save()
    print(name, round(time.perf_counter() - t0, 3), flush=True)
a = sorted(map(tuple, cur().collect())); b = sorted(map(tuple, kernel_form().collect()))
print("identical:", a == b, len(a), len(b))
if a != b:
    da = dict((r[0], r[1:]) for r in a); db = dict((r[0], r[1:]) for r in b)
    diffs = [(k, da[k], db.get(k)) for k in da if da[k] != db.get(k)][:5]
    print("diffs:", diffs)
spark.stop()
