"""Sources & sinks (SURVEY.md §2.1 S1-S8)."""

from apache_kafka_clickhouse_demo_spark.sources.jdbc import jdbc_table  # noqa: F401
from apache_kafka_clickhouse_demo_spark.sources.tables import (  # noqa: F401
    load_table,
    load_tables,
    register_views,
)
