"""Structured-Streaming layer: materialized-view cascade (M1-M3), the
backfill/stream cutover pattern (M4), and watermarked/custom-state
operators.  See streaming.pipeline and streaming.stateful."""

from apache_kafka_clickhouse_demo_spark.streaming.cascade import (  # noqa: F401
    CascadeStage,
    run_cascade,
    run_cascade_live,
)
from apache_kafka_clickhouse_demo_spark.streaming.pipeline import (  # noqa: F401
    MaterializedView,
    backfill_cutover,
    create_materialized_view,
    jdbc_sink,
    jdbc_sink_exactly_once,
)
from apache_kafka_clickhouse_demo_spark.streaming.stateful import (  # noqa: F401
    embedding_dedup_stream,
    embedding_stream_writer,
    heavy_hitters_stream,
    minhash_dedup_stream,
    minhash_stream_writer,
    running_funnel,
    running_totals,
    stream_interval_join,
    streaming_dedup,
    streaming_sessions,
    topk_stream_writer,
    windowed_counts,
)
