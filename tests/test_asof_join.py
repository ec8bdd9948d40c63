"""asof_join edge semantics: boundary inclusivity, direction, join mode.

The oracle gate proves parity with DuckDB's ASOF JOIN on fixture data; these
pin the corner cases a fixture may not hit."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),
            (2, 100, _ts("2024-01-01 12:00:00")),
            (3, 200, _ts("2024-01-01 09:00:00")),  # before any right row
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:00:00"), 1.0),  # exactly at left #1
            (100, _ts("2024-01-01 11:00:00"), 2.0),
            (200, _ts("2024-01-01 11:30:00"), 9.0),
        ],
        "user_id long, ts timestamp, val double",
    ).withColumn("val_ts", F.col("ts"))
    return left, right


def _rows(df):
    return {r["event_id"]: (r["val_ts"], r["val"]) for r in df.collect()}


def test_backward_is_inclusive_at_equal_ts(spark, tables):
    left, right = tables
    got = _rows(
        asof_join(left, right, on=["user_id"], ts_col="ts", payload_cols=["val_ts", "val"])
    )
    # left #1 matches the right row AT its own timestamp (>= semantics)
    assert got[1] == (_ts("2024-01-01 10:00:00"), 1.0)
    # left #2 takes the latest earlier row, not the first
    assert got[2] == (_ts("2024-01-01 11:00:00"), 2.0)
    # left #3 precedes every right row for its key -> null payload kept (left join)
    assert got[3] == (None, None)


def test_forward_matches_next_at_or_after(spark, tables):
    left, right = tables
    got = _rows(
        asof_join(
            left, right, on=["user_id"], ts_col="ts",
            payload_cols=["val_ts", "val"], direction="forward",
        )
    )
    assert got[1] == (_ts("2024-01-01 10:00:00"), 1.0)  # inclusive boundary
    assert got[2] == (None, None)  # nothing at-or-after 12:00 for user 100
    assert got[3] == (_ts("2024-01-01 11:30:00"), 9.0)


def test_inner_drops_unmatched_left_rows(spark, tables):
    left, right = tables
    got = _rows(
        asof_join(
            left, right, on=["user_id"], ts_col="ts",
            payload_cols=["val_ts", "val"], how="inner",
        )
    )
    assert set(got) == {1, 2}


def test_inner_keeps_matches_whose_payload_is_null(spark):
    """A matched right row whose payload column is legitimately NULL must
    survive how="inner" — the match marker, not the payload, decides."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts("2024-01-01 09:00:00"), None)],
        "user_id long, ts timestamp, val double",
    )
    got = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        payload_cols=["val"], how="inner",
    ).collect()
    assert len(got) == 1 and got[0]["val"] is None


def test_payload_collision_rejected(spark, tables):
    left, right = tables
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on=["user_id"], ts_col="ts", payload_cols=["ts"])


def test_bucketed_asof_equals_plain_asof_both_directions(spark):
    """asof_join_bucketed must reproduce asof_join exactly — including
    matches carried across many EMPTY buckets, boundary-timestamp ties,
    and inner-mode filtering — while sorting (key, bucket) units instead
    of whole keys."""
    import random

    from apache_kafka_clickhouse_demo_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    rng = random.Random(13)
    base = 1_700_000_000_000_000  # us
    # hot key 1: dense; key 2: sparse (long empty-bucket gaps); key 3: no
    # right rows at all (left-join null path)
    left_rows = (
        [(1, base + rng.randrange(0, 3_000_000_000)) for _ in range(2000)]
        + [(2, base + rng.randrange(0, 3_000_000_000)) for _ in range(50)]
        + [(3, base + rng.randrange(0, 3_000_000_000)) for _ in range(20)]
    )
    right_rows = [(1, base + rng.randrange(0, 3_000_000_000), rng.randrange(100)) for _ in range(300)] + [
        (2, base + i * 997_000_000, i) for i in range(3)  # sparse: ~16min apart
    ]
    # boundary collisions: right rows exactly at bucket starts
    right_rows += [(1, base + k * 60_000_000, 999) for k in range(3)]

    left = spark.createDataFrame(left_rows, "k long, us long").select(
        "k", F.timestamp_micros("us").alias("ts"), F.col("us").alias("probe_us")
    )
    # user tiebreak column built to be ADVERSARIAL for the synthetic-row
    # path (ADVICE r5): boundary-pinned REAL rows (quote 999) get seq=0,
    # every other right row seq>=500 — a carried synthetic row (seq>=500)
    # tying a real boundary row would WIN under a [user_tiebreak, _PREF]
    # ordering and lose (correctly) under [_PREF, user_tiebreak]
    right = spark.createDataFrame(right_rows, "k long, us long, quote long").select(
        "k",
        F.timestamp_micros("us").alias("ts"),
        "quote",
        F.when(F.col("quote") == 999, F.lit(0)).otherwise(
            (F.col("us") % 400) + 500
        ).alias("seq"),
    )

    for direction in ("backward", "forward"):
        for how in ("left", "inner"):
            for tiebreak in ((), ("seq",)):
                plain = asof_join(
                    left, right, on=["k"], ts_col="ts", payload_cols=["quote"],
                    direction=direction, how=how, tiebreak=tiebreak,
                )
                bucketed = asof_join_bucketed(
                    left, right, on=["k"], ts_col="ts", payload_cols=["quote"],
                    bucket_seconds=60, direction=direction, how=how,
                    tiebreak=tiebreak,
                )
                a = sorted(map(tuple, plain.select("k", "probe_us", "quote").collect()))
                b = sorted(map(tuple, bucketed.select("k", "probe_us", "quote").collect()))
                assert a == b, f"{direction}/{how}/tb={tiebreak}: {len(a)} vs {len(b)} rows"

    # derived default width (VERDICT r5 #6): bucket_seconds=None must give
    # the same answer, with the width coming from the right table's span
    from apache_kafka_clickhouse_demo_spark.operators.asof import (
        _derived_bucket_seconds,
    )

    derived = _derived_bucket_seconds(right, "ts")
    assert 1 <= derived < 3_000  # strictly narrower than the ~50min span
    plain = asof_join(
        left, right, on=["k"], ts_col="ts", payload_cols=["quote"], tiebreak=("seq",)
    )
    auto = asof_join_bucketed(
        left, right, on=["k"], ts_col="ts", payload_cols=["quote"], tiebreak=("seq",)
    )
    a = sorted(map(tuple, plain.select("k", "probe_us", "quote").collect()))
    b = sorted(map(tuple, auto.select("k", "probe_us", "quote").collect()))
    assert a == b


def test_asof_null_timestamps_never_match(spark):
    """NULL-ts right rows have no defined as-of relation (must not become
    spurious matches), and NULL-ts left rows are unmatched — symmetric in
    both directions."""
    import datetime

    from apache_kafka_clickhouse_demo_spark.operators.asof import asof_join

    t = lambda h: datetime.datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(9), "l9"), (1, None, "lnull")], "k long, ts timestamp, who string"
    )
    right = spark.createDataFrame(
        [(1, None, "Rnull"), (1, t(10), "R10"), (1, t(8), "R8")],
        "k long, ts timestamp, pay string",
    )
    back = {
        r["who"]: r["pay"]
        for r in asof_join(left, right, on=["k"], ts_col="ts", payload_cols=["pay"]).collect()
    }
    # 09:00 matches the 08:00 real row, never the NULL-ts row; NULL left unmatched
    assert back == {"l9": "R8", "lnull": None}
    fwd = {
        r["who"]: r["pay"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", payload_cols=["pay"], direction="forward"
        ).collect()
    }
    assert fwd == {"l9": "R10", "lnull": None}
    # inner mode drops both unmatched shapes
    inner = asof_join(
        left, right, on=["k"], ts_col="ts", payload_cols=["pay"], how="inner"
    ).collect()
    assert [r["who"] for r in inner] == ["l9"]


def test_asof_bucketed_rejects_nonpositive_width_and_skips_null_ts(spark):
    import datetime

    import pytest

    from apache_kafka_clickhouse_demo_spark.operators.asof import asof_join_bucketed

    t = lambda h: datetime.datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame([(1, t(9), "l9")], "k long, ts timestamp, who string")
    right = spark.createDataFrame(
        [(1, None, "Rnull"), (1, t(8), "R8")], "k long, ts timestamp, pay string"
    )
    with pytest.raises(ValueError, match="bucket_seconds"):
        asof_join_bucketed(
            left, right, on=["k"], ts_col="ts", payload_cols=["pay"], bucket_seconds=0
        )
    got = asof_join_bucketed(
        left, right, on=["k"], ts_col="ts", payload_cols=["pay"], bucket_seconds=3600
    ).collect()
    assert [(r["who"], r["pay"]) for r in got] == [("l9", "R8")]
