"""Physical-plan introspection helpers."""

from apache_kafka_clickhouse_demo_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    assert_broadcast_join,
    assert_pushed_filters,
    scan_read_schema,
)
