"""Columnar table scans over the driver testdata (S5 scan side).

Plain `spark.read.parquet` — Catalyst provides predicate pushdown, column
pruning and (for partitioned layouts written by storage.write_sorted)
partition pruning, which is the engine's analogue of the MergeTree sparse
primary index (/root/reference/README.rst:88-89; SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    # rejects by default.  Read nanos as long, then rebuild the timestamp at
    # microsecond precision (the fixture's actual precision, so lossless).
    # Set at read time so this works under ANY caller-provided session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
