"""Structured-Streaming layer: materialized-view cascade (M1-M3) and the
backfill/stream cutover pattern (M4).  See streaming.pipeline."""

from apache_kafka_clickhouse_demo_spark.streaming.pipeline import (  # noqa: F401
    MaterializedView,
    backfill_cutover,
    create_materialized_view,
)
