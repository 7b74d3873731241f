"""mapreducer_pi_cs4433_spark — a PySpark-native analytics engine.

A brand-new Spark DataFrame/SQL implementation of every query the reference
repo ``vivekisreddy/MapReducer-PI-cs4433`` (Hadoop MapReduce, Tasks A-H +
WordCount, see /root/repo/SURVEY.md) can run, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and a Monte Carlo pi RDD workload.

Layout:
    session     SparkSession builder tuned for scale (AQE, UTC, Arrow)
    schemas     explicit StructTypes for the reference's CSV tables
    sources     loaders for reference CSVs and the driver's parquet tables
    operators   Tasks A-H + WordCount as pure DataFrame->DataFrame functions
    queries     the driver-facing query catalog + DuckDB oracle SQL twins
    functions   text analysis, dedup, similarity, multimodal column ops
    streaming   Structured Streaming variants (staleness monitoring)
    plans       physical-plan inspection helpers (pushdown/broadcast asserts)
    pi          Monte Carlo pi estimation (RDD workload)
"""

__version__ = "0.1.0"
