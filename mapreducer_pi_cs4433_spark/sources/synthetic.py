"""Python DataSource API connector (Spark 4+): a seeded synthetic corpus.

`spark.read.format("synthetic_docs")` generates documents deterministically
on the EXECUTORS — no materialized input files — which is how you scale-test
a 100 TB pipeline shape without 100 TB of storage: every partition derives
its rows from (seed, partition_index), so any executor, any retry, any
cluster size produces identical data. This is the modern PySpark-native way
to write a source connector (pyspark.sql.datasource), replacing the
JVM-DataSourceV2-or-nothing story.

Serialization caveat (the cloudpickle by-reference trap): Spark pickles the
DataSource instance to executors by module reference, so this package must
be importable on the executor Python path. That holds when the driver runs
from the repo root (tests, spark-submit with --py-files); a foreign-cwd
driver must register the package explicitly. For that reason the synthetic
source is exercised by tests, not by driver-contract catalog entries.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()


class SyntheticDocsDataSource(DataSource):
    """Options: n_docs (total rows), partitions, seed, tokens_per_doc."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, source string, text string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.tokens_per_doc = int(options.get("tokens_per_doc", 40))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        import random

        idx = partition.value
        # contiguous id range per partition; the last partition absorbs the
        # remainder so exactly n_docs rows are produced in total
        per = self.n_docs // self.n_parts
        start = idx * per
        end = self.n_docs if idx == self.n_parts - 1 else start + per
        rng = random.Random(self.seed * 1_000_003 + idx)
        for doc_id in range(start, end):
            text = " ".join(
                rng.choice(_VOCAB) for _ in range(self.tokens_per_doc)
            )
            yield (doc_id, f"src_{doc_id % 4}", text)
