"""pyspark-streamhouse: a PySpark-native analytics engine with the query and
data-processing capabilities of the Kafka -> ClickHouse streaming-ETL pipeline
demonstrated by `anelook/apache-kafka-clickhouse-demo` (see /root/repo/SURVEY.md).

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, Arrow).
- ``schemas``    : fixed StructType schemas (schema-on-write after the
                   schema-on-read ingestion hop, reference README.rst:79-89).
- ``functions/`` : column-expression helpers — JSON extraction (F1-F7),
                   decomposable aggregate state (A6/A7), deterministic
                   hashing, vector math, text features.
- ``sources/``   : NDJSON / Kafka / parquet table readers and storage policy
                   (S1-S8).
- ``operators/`` : the reference pipeline (attendance cascade M2/M3) plus the
                   beyond-parity LLM-data-pipeline operators (dedup,
                   similarity search, text analysis, multimodal).
- ``streaming/`` : materialized-view cascade manager + backfill/cutover (M1-M4).
- ``plans/``     : physical-plan introspection helpers (pushdown/broadcast
                   assertions used by tests).

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
partial aggregation and join strategy; Python UDFs appear only where builtins
genuinely cannot express the semantics (and then as Arrow-batched pandas
UDFs).
"""

__version__ = "0.1.0"
