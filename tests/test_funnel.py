"""windowFunnel / retention semantics (operators/funnel.py) on hand-built
fixtures with known chains and boundary cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import funnel


def _events(spark, rows):
    return spark.createDataFrame(rows, "u long, s string, t string").select(
        "u", F.col("t").cast("timestamp").alias("ts"), F.col("s").alias("et")
    )


def _steps():
    # built lazily: Column construction needs an active SparkContext
    return [F.col("et") == s for s in ("view", "click", "buy")]


def _levels(spark, rows, window_s=3600):
    df = _events(spark, rows)
    return {
        r["k"]: r["funnel_level"]
        for r in funnel.window_funnel(df, "u", "ts", _steps(), window_s).collect()
    }


def test_basic_chain_and_window_boundary(spark):
    rows = [
        # u1: full chain inside the window
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:10:00"),
        (1, "buy", "2024-01-01 10:59:00"),
        # u2: buy lands EXACTLY window past the chain start -> still counts
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 10:30:00"),
        (2, "buy", "2024-01-01 11:00:00"),
        # u3: buy one microsecond past the window -> level 2
        (3, "view", "2024-01-01 10:00:00"),
        (3, "click", "2024-01-01 10:30:00"),
        (3, "buy", "2024-01-01 11:00:00.000001"),
        # u4: steps out of order -> only level 1
        (4, "buy", "2024-01-01 10:00:00"),
        (4, "click", "2024-01-01 10:10:00"),
        (4, "view", "2024-01-01 10:20:00"),
        # u5: no funnel step events at all -> absent from output
        (5, "other", "2024-01-01 10:00:00"),
    ]
    got = _levels(spark, rows)
    assert got == {1: 3, 2: 3, 3: 2, 4: 1}


def test_window_anchored_at_chain_start_not_previous_step(spark):
    # click is within window of view, buy within window of CLICK but not of
    # the view that started the chain -> level 2, not 3
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:50:00"),
        (1, "buy", "2024-01-01 11:30:00"),
    ]
    assert _levels(spark, rows) == {1: 2}
    # ...but a FRESHER view restarts the chain and rescues the buy
    rows.append((1, "view", "2024-01-01 10:45:00"))
    rows.append((1, "click", "2024-01-01 10:55:00"))
    assert _levels(spark, rows) == {1: 3}


def test_equal_timestamp_chains_in_step_order_and_dedup(spark):
    rows = [
        # equal-ts view+click chain in step order (non-strict mode)
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:00:00"),
        # duplicate (ts, step) events count once (no self-chaining)
        (2, "view", "2024-01-01 10:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
    ]
    assert _levels(spark, rows) == {1: 2, 2: 1}


def test_funnel_counts_cumulative(spark):
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:10:00"),
        (2, "view", "2024-01-01 10:00:00"),
    ]
    out = funnel.funnel_counts(_events(spark, rows), "u", "ts", _steps(), 3600)
    assert [(r["funnel_level"], r["n_reached"]) for r in out.collect()] == [
        (1, 2),
        (2, 1),
        (3, 0),
    ]


def test_retention_flags_and_cohort(spark):
    rows = [
        # u1 in cohort, returns day 1
        (1, "view", "2024-01-01 09:00:00"),
        (1, "view", "2024-01-02 09:00:00"),
        # u2 in cohort, never returns
        (2, "view", "2024-01-01 23:59:59"),
        # u3 NOT in cohort (active only day 1) -> excluded everywhere
        (3, "view", "2024-01-02 10:00:00"),
    ]
    out = funnel.retention(_events(spark, rows), "u", "ts", "2024-01-01", [0, 1, 2])
    assert [tuple(r) for r in out.collect()] == [
        (0, 2, 2),
        (1, 1, 2),
        (2, 0, 2),
    ]


def test_retention_requires_offset_zero(spark):
    with pytest.raises(ValueError):
        funnel.retention(_events(spark, []), "u", "ts", "2024-01-01", [1, 2])


def test_too_many_steps_rejected(spark):
    with pytest.raises(ValueError):
        funnel.window_funnel(
            _events(spark, []), "u", "ts", [F.lit(True)] * 9, 60
        )


def test_non_initial_step_only_key_absent(spark):
    # contract: a key whose events match only non-initial steps folds to
    # level 0 and must be ABSENT, like a key with no matching events
    rows = [
        (1, "click", "2024-01-01 10:00:00"),
        (1, "buy", "2024-01-01 10:10:00"),
        (2, "view", "2024-01-01 10:00:00"),
    ]
    assert _levels(spark, rows) == {2: 1}


def test_single_step_funnel(spark):
    df = _events(spark, [(1, "view", "2024-01-01 10:00:00")])
    out = funnel.window_funnel(df, "u", "ts", [F.col("et") == "view"], 60).collect()
    assert [(r["k"], r["funnel_level"]) for r in out] == [(1, 1)]


def test_retention_empty_cohort_reports_zero(spark):
    # nobody active on the cohort day: retained must be 0, not NULL
    out = funnel.retention(
        _events(spark, [(1, "view", "2024-02-01 10:00:00")]),
        "u",
        "ts",
        "2024-01-01",
        [0, 1],
    )
    assert [tuple(r) for r in out.collect()] == [(0, 0, 0), (1, 0, 0)]


def test_pre_epoch_timestamp_fails_loudly(spark):
    # ADVICE r6: negative unix_micros breaks the exact shift/mod tick
    # decode — such rows must raise, not fold a silently-wrong chain
    rows = [(1, "view", "1969-12-31 23:59:59"), (1, "click", "1970-01-01 00:10:00")]
    with pytest.raises(Exception, match="pre-epoch"):
        _levels(spark, rows)


def test_post_epoch_guard_is_transparent(spark):
    # the guard itself must not change any post-1970 decision
    rows = [
        (1, "view", "1970-01-01 00:00:01"),
        (1, "click", "1970-01-01 00:10:00"),
    ]
    assert _levels(spark, rows) == {1: 2}


# ---------------------------------------------------------------------------
# sequenceCount (operators/funnel.sequence_count)
# ---------------------------------------------------------------------------


def _counts(spark, rows):
    df = _events(spark, rows)
    return {
        r["k"]: r["n_matches"]
        for r in funnel.sequence_count(df, "u", "ts", _steps()).collect()
    }


def test_sequence_count_non_overlapping_greedy(spark):
    rows = [
        # u1: two disjoint complete chains with gaps and noise between
        (1, "view", "2024-01-01 10:00:00"),
        (1, "other", "2024-01-01 10:01:00"),
        (1, "click", "2024-01-01 10:02:00"),
        (1, "view", "2024-01-01 10:03:00"),  # gap event: pointer ignores it
        (1, "buy", "2024-01-01 10:04:00"),
        (1, "view", "2024-01-01 11:00:00"),
        (1, "click", "2024-01-01 11:01:00"),
        (1, "buy", "2024-01-01 11:02:00"),
        # u2: steps present but never in order -> absent
        (2, "buy", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 10:01:00"),
        (2, "view", "2024-01-01 10:02:00"),
        # u3: interleaved halves make exactly ONE chain (greedy, no overlap):
        # view click view buy buy -> first chain consumes view+click+buy;
        # leftover view (pos 3) has no later click
        (3, "view", "2024-01-01 10:00:00"),
        (3, "click", "2024-01-01 10:01:00"),
        (3, "view", "2024-01-01 10:02:00"),
        (3, "buy", "2024-01-01 10:03:00"),
        (3, "buy", "2024-01-01 10:04:00"),
    ]
    got = _counts(spark, rows)
    assert got == {1: 2, 3: 1}


def test_sequence_count_no_window_constraint(spark):
    # unlike window_funnel, chains may span any duration
    rows = [
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-06-01 00:00:00"),
        (1, "buy", "2024-12-31 00:00:00"),
    ]
    assert _counts(spark, rows) == {1: 1}


def test_sequence_count_equal_ts_orders_by_step(spark):
    # equal timestamps chain in step order (the tick encoding's low bits)
    rows = [
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:00:00"),
        (1, "buy", "2024-01-01 10:00:00"),
    ]
    assert _counts(spark, rows) == {1: 1}


def test_sequence_match_gaps_constrain_adjacent_pairs(spark):
    """r13 sequenceMatch('(?1)(?t<=g1)(?2)(?t<=g2)(?3)') parity: gaps
    bind per ADJACENT pair (not windowFunnel's whole-chain window), a
    fresher prior-step end rescues a chain an older one would fail
    (the dominance the fold relies on), and lower-bound forms raise."""
    import datetime as dt

    import pytest

    from apache_kafka_clickhouse_demo_spark.operators import funnel as FU

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(uid, etype, mins):
        return (uid, etype, t0 + dt.timedelta(minutes=mins))

    rows = [
        # u1: view@0 click@30 purchase@90 -> gaps 30m, 60m: full match
        ev(1, "view", 0), ev(1, "click", 30), ev(1, "purchase", 90),
        # u2: view@0 click@120 -> first gap 120m > 60m: stuck at 1
        ev(2, "view", 0), ev(2, "click", 120), ev(2, "purchase", 125),
        # u3: purchase only -> absent (no step-1 event)
        ev(3, "purchase", 5),
        # u4: dominance: early view@0 (click@70 fails 60m gap) but a
        # FRESHER view@20 makes click@70 valid; purchase@200 fails the
        # second gap (130m > 120m) -> level 2
        ev(4, "view", 0), ev(4, "view", 20), ev(4, "click", 70),
        ev(4, "purchase", 200),
        # u5: whole-chain duration 170m exceeds any 150m window, but
        # each adjacent gap is fine -> full match (the form windowFunnel
        # cannot express)
        ev(5, "view", 0), ev(5, "click", 55), ev(5, "purchase", 170),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    got = {
        r["k"]: r["seq_level"]
        for r in FU.sequence_match_gaps(
            df, "user_id", "ts", steps, (3600, 7200)
        ).collect()
    }
    assert got == {1: 3, 2: 1, 4: 2, 5: 3}

    with pytest.raises(ValueError):
        FU.sequence_match_gaps(df, "user_id", "ts", steps, (3600,))
