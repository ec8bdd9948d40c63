"""Fixed StructType schemas — the engine's "schema-on-write" contract.

The reference declares every storage table's schema in DDL
(/root/reference/README.rst:79-89, 129-136, 206-216); only the Kafka hop is
schema-on-read (opaque `message String`, README.rst:64-73). We mirror that:
sources produce an opaque JSON string column, extraction produces these
typed schemas.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference pipeline schemas (SURVEY.md §1.4 / FIXTURES.md §A)
# ---------------------------------------------------------------------------

#: Payload of one NDJSON message on the `entry-events` topic
#: (README.rst:97-102): epoch-ms timestamp, strings, Int8 points, nested
#: student tuple.  This is the schema handed to `from_json`.
ENTRY_EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),  # epoch milliseconds (F5)
        T.StructField("subject", T.StringType()),
        T.StructField("teacher", T.StringType()),
        T.StructField("room", T.StringType()),
        T.StructField("points", T.IntegerType()),  # narrowed to Int8 on write (F6)
        T.StructField(
            "student",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("house", T.StringType()),
                ]
            ),
        ),
    ]
)

#: `student_entry_events` — typed raw-event store (README.rst:79-89),
#: MergeTree ORDER BY timestamp -> parquet sorted/partitioned by time.
STUDENT_ENTRY_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("subject", T.StringType()),
        T.StructField("teacher", T.StringType()),
        T.StructField("room", T.StringType()),
        T.StructField("points", T.ByteType()),  # Int8
        T.StructField(
            "student",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("house", T.StringType()),
                ]
            ),
        ),
    ]
)

#: `class_attendance_granular` (README.rst:129-136).  UInt16 -> int with
#: domain check (counts are bounded by class size).
CLASS_ATTENDANCE_GRANULAR_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("subject", T.StringType()),
        T.StructField("studentCount", T.IntegerType()),
    ]
)

#: `class_attendance_daily` (README.rst:206-216) — AggregateFunction columns
#: modeled as plain/struct state columns (SURVEY.md §2.4 A6).
CLASS_ATTENDANCE_DAILY_SCHEMA = T.StructType(
    [
        T.StructField("day", T.TimestampType()),
        T.StructField("subject", T.StringType()),
        T.StructField("max_state", T.IntegerType()),
        T.StructField("min_state", T.IntegerType()),
        T.StructField(
            "avg_state",
            T.StructType(
                [
                    T.StructField("sum", T.LongType()),
                    T.StructField("count", T.LongType()),
                ]
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (/root/repo/FIXTURES.md §B) — the `events` table's
# `props` column is the JSON-string ingestion hop in the driver fixtures.
# ---------------------------------------------------------------------------

EVENTS_PROPS_JSON_SCHEMA = T.StructType([T.StructField("k", T.LongType())])

#: All driver-generated tables, for sources.tables.load_table validation.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: UInt16 domain bounds (ClickHouse UInt16, README.rst:133) — enforced by
#: functions.agg_state.check_uint16_domain.
UINT16_MIN, UINT16_MAX = 0, 65535
