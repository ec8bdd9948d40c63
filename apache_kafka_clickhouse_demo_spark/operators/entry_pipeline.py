"""The reference pipeline on its TRUE record shape (SURVEY.md §1.4):

    {"timestamp": <epoch-ms>, "subject": ..., "teacher": ..., "room": ...,
     "points": -5..5, "student": {"name": ..., "house": ...}}

The driver fixtures have no nested-tuple column, so the producer step
synthesizes deterministic entry-event NDJSON messages FROM the events
fixture (a pure row-local mapping both Spark and the DuckDB oracle can
compute exactly).  Everything downstream is the real thing:

- `synth_entry_messages` : S2/S3 producer analogue — one NDJSON `message`
  string per event row (the opaque `message String` hop, README.rst:64-73).
- `typed_entry_events`   : M1 ingest MV (README.rst:95-103) — ONE
  `from_json` per row covering F1-F6, including the F4 nested
  `Tuple(name, house)` extraction and the F5 epoch-ms conversion.
- `house_points`         : the reference's flagship interactive query
  (README.rst:114-116) — P4 nested-field access `student.house`,
  A3 `sum(points)`, A4 single-key GROUP BY.
- `class_attendance`     : M2 (README.rst:154-162) — A2 `count(student)`,
  A5 composite-key GROUP BY (timestamp, subject).

The same `typed_entry_events` transform is what the streaming MV cascade
runs per block (streaming/pipeline.py); tests drive it through file-source
streams with this exact schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions.json_extract import extract_entry_event

#: Deterministic house assignment (user_id % 4) — alphabetical, so the
#: DuckDB oracle can mirror it with a CASE expression.
HOUSES = ("Gryffindor", "Hufflepuff", "Ravenclaw", "Slytherin")


def synth_entry_messages(events: DataFrame) -> DataFrame:
    """Producer analogue: one §1.4 NDJSON message per events-fixture row.

    Pure row-local column expressions (codegen, no shuffle):
    epoch-ms timestamp, subject = event_type, teacher/room/house keyed off
    user_id, points folded into the reference's -5..5 Int8 domain.
    """
    # pmod, not signed %: a negative user_id would make the signed form
    # index element_at with 0 (runtime crash) and a negative value would
    # escape the -5..5 points domain (code-review r6); the oracle mirrors
    # with ((x % k) + k) % k.  Identical on the non-negative fixtures.
    house = F.element_at(
        F.array(*[F.lit(h) for h in HOUSES]),
        (F.pmod(F.col("user_id"), F.lit(4)) + 1).cast("int"),
    )
    payload = F.struct(
        F.unix_millis("ts").alias("timestamp"),
        F.col("event_type").alias("subject"),
        F.concat(F.lit("t_"), F.pmod(F.col("user_id"), F.lit(7)).cast("string")).alias("teacher"),
        F.concat(F.lit("r_"), F.pmod(F.col("user_id"), F.lit(5)).cast("string")).alias("room"),
        (F.pmod(F.floor("value").cast("long"), F.lit(11)) - 5).cast("int").alias("points"),
        F.struct(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("name"),
            house.alias("house"),
        ).alias("student"),
    )
    return events.select(F.to_json(payload).alias("message"))


def typed_entry_events(messages: DataFrame) -> DataFrame:
    """M1 — the ingest MV's SELECT (README.rst:95-103): opaque `message`
    string -> typed columns, one `from_json` per row."""
    return messages.select(extract_entry_event("message").alias("e")).select("e.*")


def house_points(typed: DataFrame) -> DataFrame:
    """README.rst:114-116 — points per house, nested-field group key."""
    return (
        typed.groupBy(F.col("student.house").alias("house"))
        .agg(
            F.sum(F.col("points").cast("long")).alias("house_points"),
            F.count(F.lit(1)).alias("n_entries"),
        )
        .orderBy(F.col("house_points").desc(), F.col("house"))
    )


def class_attendance(typed: DataFrame) -> DataFrame:
    """M2 — per-(timestamp, subject) attendance (README.rst:154-162).

    No presentation orderBy here: this function is also the cascade's
    per-block MV transform, where a global sort would add a range
    exchange to EVERY micro-batch before an append write that preserves
    nothing (code-review r6).  Readers sort on the query side, exactly
    like attendance_granular."""
    return typed.groupBy("timestamp", "subject").agg(
        F.count("student").alias("n_students")
    )
