"""The reference's cascaded incremental-aggregation pipeline, batch form.

Reference semantics (/root/reference/README.rst):
  raw events --(MV #1, :95-103)--> typed table
             --(MV #2, :154-162)--> per-(timestamp, subject) counts
             --(MV #3, :222-236)--> per-(day, subject) partial agg states
             --(read,  :264-272)--> merged max/min/avg roll-up

The driver fixtures' `events` table (FIXTURES.md §B) stands in for the
reference's entry events: `ts` = timestamp, `event_type` = subject,
`props` = the opaque JSON hop, `value` = points.  Granularity is
per-hour (the fixtures' timestamps are near-unique, so the hour plays the
role of the reference's per-class timestamp).

Every step is a plain DataFrame aggregation: Catalyst plans partial+final
hash aggregation around a single shuffle per step, and at 100 TB each step
shuffles only the (already heavily reduced) group keys.  The streaming form
of the same cascade lives in streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions.agg_state import (
    avg_merge,
    avg_state,
    max_merge,
    max_state,
    min_merge,
    min_state,
)
from apache_kafka_clickhouse_demo_spark.functions.json_extract import to_start_of_day


def typed_events(events: DataFrame) -> DataFrame:
    """MV #1 analogue (README.rst:95-103): schema-on-read hop — extract the
    JSON `props` payload into a typed column next to the fixed columns."""
    return events.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def attendance_granular(events: DataFrame) -> DataFrame:
    """MV #2 analogue (README.rst:154-162): per-(hour, type) attendance
    counts — count(student) GROUP BY (timestamp, subject)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("ts_hour"),
        "event_type",
    ).agg(F.count("event_id").alias("student_count"))


def attendance_daily_states(granular: DataFrame, block_col: str | None = None) -> DataFrame:
    """MV #3 analogue (README.rst:222-236): per-(day, subject) PARTIAL
    aggregate states over each insert block.

    `block_col` simulates the reference's insert-block boundaries: states
    are built per (day, type, block) so the stored table holds several
    partial rows per key — exactly the SummingMergeTree shape.  With
    block_col=None one state row per key is produced.
    """
    keys = [to_start_of_day("ts_hour").alias("day"), F.col("event_type")]
    if block_col:
        keys.append(F.col(block_col))
    return granular.groupBy(*keys).agg(
        max_state("student_count").alias("max_state"),
        min_state("student_count").alias("min_state"),
        avg_state("student_count").alias("avg_state"),
    )


def attendance_daily_merged(daily_states: DataFrame) -> DataFrame:
    """Read-path merge (README.rst:264-272): maxMerge/minMerge/avgMerge over
    the stored partial states, grouped by (day, subject)."""
    return (
        daily_states.groupBy("day", "event_type")
        .agg(
            max_merge("max_state").alias("max_students"),
            min_merge("min_state").alias("min_students"),
            F.round(avg_merge("avg_state"), 4).alias("avg_students"),
        )
        .orderBy("day", "event_type")
    )


def attendance_rollup(events: DataFrame, block_col_expr=None) -> DataFrame:
    """Full cascade: events -> granular -> per-block states -> merged.

    When `block_col_expr` is given — a Column over the GRANULAR schema
    (ts_hour / event_type / student_count), since it is resolved against
    the aggregated frame, not `events` — states are first built per
    block and then merged — the stored-partial-state path.  The result is
    identical either way (the round-trip invariant, tests/test_agg_state.py).
    """
    granular = attendance_granular(events)
    if block_col_expr is not None:
        granular = granular.withColumn("_block", block_col_expr)
        states = attendance_daily_states(granular, "_block")
    else:
        states = attendance_daily_states(granular)
    return attendance_daily_merged(states)
