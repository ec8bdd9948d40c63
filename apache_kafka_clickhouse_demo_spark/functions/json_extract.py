"""JSON extraction + time/cast scalar functions (SURVEY.md §2.5, F1-F7).

The reference extracts typed columns out of an opaque JSON `message` string
with per-field JSONExtract* calls (/root/reference/README.rst:97-102).  The
Spark-first shape is ONE `from_json` with the full schema — a single parse
per row, fully inside whole-stage codegen — plus named helpers for the
per-field style when callers want it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_kafka_clickhouse_demo_spark.schemas import ENTRY_EVENT_JSON_SCHEMA


def json_get_string(message: Column | str, field: str) -> Column:
    """F2 — JSONExtractString(message, field) (README.rst:98-100)."""
    return F.get_json_object(F.col(message) if isinstance(message, str) else message, f"$.{field}")


def json_get_int(message: Column | str, field: str) -> Column:
    """F1/F3 — JSONExtract(U)Int(message, field) (README.rst:97,101)."""
    return json_get_string(message, field).cast(T.LongType())


def json_get_struct(message: Column | str, field: str, schema: T.StructType) -> Column:
    """F4 — JSONExtract(message, field, 'Tuple(...)') (README.rst:102)."""
    return F.from_json(json_get_string(message, field), schema)


def ts_from_epoch_millis(c: Column | str) -> Column:
    """F5 — fromUnixTimestamp64Milli (README.rst:97)."""
    return F.timestamp_millis((F.col(c) if isinstance(c, str) else c).cast(T.LongType()))


def to_int8(c: Column | str) -> Column:
    """F6 — toInt8 (README.rst:101). Wraps on overflow with ANSI off, like
    ClickHouse; documented, not chased (SURVEY.md §2.5)."""
    return (F.col(c) if isinstance(c, str) else c).cast(T.ByteType())


def to_start_of_day(c: Column | str) -> Column:
    """F7 — toStartOfDay (README.rst:224,246)."""
    return F.date_trunc("day", F.col(c) if isinstance(c, str) else c)


def extract_entry_event(message: Column | str) -> Column:
    """Parse one `entry-events` NDJSON payload into the typed event struct.

    Single `from_json` (one parse per row) covering F1-F6; the ingest MV's
    SELECT (README.rst:95-103) is `df.select(extract_entry_event("value").alias("e")).select("e.*")`.
    """
    msg = F.col(message) if isinstance(message, str) else message
    parsed = F.from_json(msg, ENTRY_EVENT_JSON_SCHEMA)
    return F.struct(
        F.timestamp_millis(parsed["timestamp"]).alias("timestamp"),
        parsed["subject"].alias("subject"),
        parsed["teacher"].alias("teacher"),
        parsed["room"].alias("room"),
        parsed["points"].cast(T.ByteType()).alias("points"),
        parsed["student"].alias("student"),
    )
