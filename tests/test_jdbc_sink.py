"""JDBC sink — the sink half of the north star ("Structured Streaming with
Kafka source + JDBC sink", BASELINE.json).

The round-trip test drives a REAL materialized view into an in-process
Apache Derby database (the derby jars ship with Spark for the Hive
metastore, so no network or extra install): NDJSON-style source -> typed
transform -> per-block JDBC appends -> read back over JDBC and compare with
the batch transform.  Exercises exactly the per-block path the Kafka source
would feed — the `message`-contract file twin, like the other streaming
tests (sandbox has no broker).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.sources.tables import load_table
from apache_kafka_clickhouse_demo_spark.streaming import (
    create_materialized_view,
    jdbc_sink,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:  # noqa: BLE001
        return False


def test_mv_with_jdbc_sink_roundtrip(spark, sf_dir, tmp_path):
    if not _derby_available(spark):
        pytest.skip("derby jdbc driver not on the classpath")
    url = "jdbc:derby:memory:mv_jdbc_test;create=true"

    events = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "src")
    # several files -> several insert blocks through the MV
    events.select("event_id", "event_type", "value").repartition(3).write.parquet(src_dir)

    def transform(block):
        return block.select(
            "event_id",
            F.upper("event_type").alias("event_type"),
            (F.col("value") * 2).alias("value2"),
        )

    source = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    mv = create_materialized_view(
        source,
        transform,
        dest_path=url + "#mv_out",  # informational for JDBC destinations
        checkpoint=str(tmp_path / "ck"),
        available_now=True,
        sink=jdbc_sink(url, "mv_out", driver=DERBY_DRIVER),
    )
    mv.process_available()
    mv.stop()

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "mv_out")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    expected = transform(events.select("event_id", "event_type", "value"))
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want  # no loss, no duplication across blocks, values exact


def test_jdbc_sink_is_contract_configured(spark, monkeypatch):
    """Config-level contract (runs even without a JDBC driver): the sink
    callable actually wires url/table/driver/extra properties into a
    jdbc-format append — asserted by spying on the DataFrameWriter chain
    (ADVICE r3: the previous `callable(sink)` assert was vacuous)."""
    from pyspark.sql.readwriter import DataFrameWriter

    calls: dict = {"options": {}}
    monkeypatch.setattr(
        DataFrameWriter, "format",
        lambda self, f: calls.__setitem__("format", f) or self,
    )
    monkeypatch.setattr(
        DataFrameWriter, "option",
        lambda self, k, v: calls["options"].__setitem__(k, v) or self,
    )
    monkeypatch.setattr(
        DataFrameWriter, "mode",
        lambda self, m: calls.__setitem__("mode", m) or self,
    )
    monkeypatch.setattr(
        DataFrameWriter, "save",
        lambda self, *a, **kw: calls.__setitem__("saved", True),
    )

    sink = jdbc_sink(
        "jdbc:derby:memory:contract", "t", driver=DERBY_DRIVER,
        properties={"batchsize": "500"},
    )
    sink(spark.range(3))

    assert calls["format"] == "jdbc"
    assert calls["mode"] == "append"
    assert calls["saved"] is True
    assert calls["options"] == {
        "url": "jdbc:derby:memory:contract",
        "dbtable": "t",
        "driver": DERBY_DRIVER,
        "batchsize": "500",
    }


def test_jdbc_partitioned_source_roundtrip_and_pushdown(spark, sf_dir):
    """JDBC SOURCE (sources/jdbc.jdbc_table): write a table over JDBC, read
    it back as a PARTITIONED scan — parallel range queries, the only JDBC
    shape that survives a large table — and check (a) exact row equality,
    (b) the requested scan parallelism, (c) filters reach the JDBC scan
    node (PushedFilters), so the database — not Spark — does the pruning."""
    if not _derby_available(spark):
        pytest.skip("derby jdbc driver not on the classpath")
    from apache_kafka_clickhouse_demo_spark.sources.jdbc import jdbc_table

    url = "jdbc:derby:memory:jdbc_src_test;create=true"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    (
        events.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "events_jdbc")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )

    n = events.count()
    back = jdbc_table(
        spark,
        url,
        "events_jdbc",
        partition_column="event_id",
        lower_bound=0,
        upper_bound=n,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4  # parallel range queries
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in events.collect())
    assert got == want

    filtered = back.filter(F.col("event_id") < 100).select("event_id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_id" in plan

    # half-open range contract: no row lost or duplicated at the partition
    # boundaries (the classic off-by-one of hand-rolled range readers)
    assert back.count() == n

    # bounds args must travel together
    with pytest.raises(ValueError):
        jdbc_table(spark, url, "events_jdbc", partition_column="event_id")


def test_jdbc_sink_exactly_once_survives_replay_and_partial_staging(
    spark, sf_dir, tmp_path
):
    """The exactly-once JDBC sink: a real MV drain lands each block once;
    a replayed batch (foreachBatch redelivery) is a no-op via the batch
    ledger; a crashed attempt that staged data but never published is
    cleanly overwritten by the retry."""
    if not _derby_available(spark):
        pytest.skip("derby jdbc driver not on the classpath")
    from apache_kafka_clickhouse_demo_spark.streaming import jdbc_sink_exactly_once

    url = "jdbc:derby:memory:mv_jdbc_e1;create=true"
    events = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "src")
    events.select("event_id", "event_type", "value").repartition(3).write.parquet(src_dir)

    def transform(block):
        return block.select("event_id", "event_type", "value")

    sink = jdbc_sink_exactly_once(url, "mv_out", driver=DERBY_DRIVER)
    source = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    mv = create_materialized_view(
        source,
        transform,
        dest_path=url + "#mv_out",
        checkpoint=str(tmp_path / "ck"),
        available_now=True,
        sink=sink,
    )
    mv.process_available()
    mv.stop()

    def read_back():
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "mv_out")
            .option("driver", DERBY_DRIVER)
            .load()
        )

    want = {tuple(r) for r in events.select("event_id", "event_type", "value").collect()}
    assert {tuple(r) for r in read_back().collect()} == want

    one_block = events.select("event_id", "event_type", "value").limit(7)
    # replayed batch id -> no-op (ledger short-circuit)
    sink(one_block, 0)
    assert read_back().count() == len(want)

    # crash simulation: an attempt staged its block but died before the
    # publish transaction; the retry must overwrite the leftover staging
    # and publish exactly once
    (
        one_block.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "mv_out_staging")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    sink(one_block, 999)
    assert read_back().count() == len(want) + 7
    # and replaying THAT batch is again a no-op
    sink(one_block, 999)
    assert read_back().count() == len(want) + 7
