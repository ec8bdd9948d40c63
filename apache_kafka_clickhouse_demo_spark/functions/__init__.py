"""Column-expression helper library (pure builtins — JVM-side, codegen'd)."""

from apache_kafka_clickhouse_demo_spark.functions.json_extract import (  # noqa: F401
    extract_entry_event,
    json_get_int,
    json_get_string,
    json_get_struct,
    to_start_of_day,
    ts_from_epoch_millis,
)
from apache_kafka_clickhouse_demo_spark.functions.agg_state import (  # noqa: F401
    avg_merge,
    avg_state,
    max_merge,
    max_state,
    min_merge,
    min_state,
)
