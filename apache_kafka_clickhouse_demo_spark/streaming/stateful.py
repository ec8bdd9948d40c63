"""Stateful streaming operators beyond the MV cascade (SURVEY.md §2.7).

The reference's MVs are stateless per insert block; these are the Spark
constructs a production pipeline adds on top for late/duplicate data and
custom per-key state:

- `streaming_dedup`       : exactly-once event dedup under a watermark
  (`dropDuplicatesWithinWatermark`) — state is bounded by the watermark
  delay instead of growing forever, which is what makes streaming dedup
  viable on an unbounded 100 TB/day feed.
- `windowed_counts`       : watermarked tumbling-window aggregation in
  append mode — closed windows are emitted exactly once.
- `running_totals`        : custom per-key state via
  `applyInPandasWithState` (Arrow-batched): running event count + value sum
  per key across micro-batches, the minimal template for bespoke stateful
  logic Spark's built-ins can't express.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    source: DataFrame,
    keys: list[str],
    watermark_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate events (same `keys`) arriving within the watermark.

    State per key is dropped once the watermark passes, so memory is
    bounded by (event rate x delay), not stream length.
    """
    return source.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


def windowed_counts(
    source: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    keys: Iterable[str] = (),
    delay: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts (append mode emits each closed
    window exactly once — the streaming twin of attendance_granular)."""
    return (
        source.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), *keys, "n_events")
    )


RUNNING_TOTALS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_TOTALS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the persistent state and
    emit the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals(source: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across micro-batches
    — custom state the built-in aggregations cannot persist per key with
    arbitrary update logic.  Arrow-batched; state lives in the state store,
    partitioned by user_id, so it scales horizontally with executors."""
    return source.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT_SCHEMA,
        stateStructType=RUNNING_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
