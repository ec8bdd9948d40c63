"""Kafka source/sink wrappers — S1/S2/S3 (SURVEY.md §2.1).

The reference consumes topic `entry-events` into a single opaque
`message String` column with format JSONAsString
(/root/reference/README.rst:64-73) and produces to it two ways: bulk
(`kcat -P -t entry-events < file.ndjson`, README.rst:53) and
record-at-a-time (`send_data.sh:3-8`).

Spark mapping: the Kafka source's `value` column cast to string IS
`message String`; the consumer group (`group1`, README.rst:71) maps to
Spark's checkpointed offsets (+ `groupIdPrefix`).

Requires the `spark-sql-kafka-0-10` package on the session classpath
(`spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`);
this sandbox has no broker, so these builders are exercised by tests only up
to plan construction, and the streaming tests drive the same MV cascade
through file sources (identical `message`-column contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TOPIC = "entry-events"


def kafka_message_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    group_id_prefix: str = "group1",
) -> DataFrame:
    """S1 — `ENGINE = Kafka ... kafka_format = 'JSONAsString'`
    (README.rst:64-73): one opaque `message` string column per record."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("groupIdPrefix", group_id_prefix)
        .load()
        .select(F.col("value").cast("string").alias("message"))
    )


def kafka_bulk_produce(df: DataFrame, brokers: str, topic: str = DEFAULT_TOPIC) -> None:
    """S2 — bulk backfill producer (`kcat -P ... < file.ndjson`,
    README.rst:53): batch-write a `message` column as Kafka values."""
    (
        df.select(F.col("message").cast("string").alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )


def kafka_record_producer(
    df: DataFrame,
    brokers: str,
    checkpoint: str,
    topic: str = DEFAULT_TOPIC,
    trigger_interval: str | None = None,
):
    """S3 — record-at-a-time producer (`send_data.sh:3-8`): a streaming
    write of `message` values, optionally paced to simulate live flow.
    `df` must be a streaming DataFrame with a `message` column.

    Pacing contract (honest version): a sink cannot throttle per-record —
    rate control in Structured Streaming lives at the SOURCE (set
    `maxOffsetsPerTrigger` / `maxFilesPerTrigger` when building `df`) plus
    the trigger cadence.  `trigger_interval` (e.g. "1 second") sets the
    micro-batch cadence here, so source-limit / interval bounds the send
    rate; for true send_data.sh-style one-record batches, configure the
    source with maxFilesPerTrigger=1 and a 1-second interval.
    """
    writer = (
        df.select(F.col("message").cast("string").alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
