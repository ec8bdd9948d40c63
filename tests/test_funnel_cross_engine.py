"""Property test: the Spark windowFunnel fold matches the window-function
DuckDB oracle on RANDOM event sets — the greedy max-chain-start fold's
equivalence to the exists-a-chain predicate is the one non-obvious claim
behind the `funnel_levels` gate row, so it gets adversarial coverage
beyond the single fixture: dense equal-timestamp collisions, boundary
windows, duplicate (ts, step) events."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import funnel

#: tiny time domain (seconds 0..30 mapped into 2024) + tiny window => chain
#: and window boundaries are hit constantly; several events per instant
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=2),  # step index
        st.integers(min_value=0, max_value=30),  # second offset
    ),
    min_size=1,
    max_size=40,
)

_NAMES = ["view", "click", "buy"]
_WINDOW_S = 10


def _oracle(rows) -> dict[int, int]:
    w_us = _WINDOW_S * 1_000_000
    con = duckdb.connect()
    con.execute("CREATE TABLE ev_raw (u BIGINT, step BIGINT, sec BIGINT)")
    con.executemany("INSERT INTO ev_raw VALUES (?, ?, ?)", list(rows))
    q = f"""
WITH ev AS (
  SELECT DISTINCT u, (sec * 1000000) * 8 + step AS tick FROM ev_raw
), w1 AS (
  SELECT u, tick, tick % 8 AS step, tick // 8 AS us,
         max(CASE WHEN tick % 8 = 0 THEN tick // 8 END)
           OVER (PARTITION BY u ORDER BY tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_start
  FROM ev
), w2 AS (
  SELECT u, step, us, v_start,
         max(CASE WHEN step = 1 AND v_start IS NOT NULL
                       AND us - v_start <= {w_us} THEN v_start END)
           OVER (PARTITION BY u ORDER BY tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_start
  FROM w1
)
SELECT u,
       max(CASE WHEN step = 0 THEN 1 ELSE 0 END)
       + max(CASE WHEN step = 1 AND v_start IS NOT NULL
                       AND us - v_start <= {w_us} THEN 1 ELSE 0 END)
       + max(CASE WHEN step = 2 AND c_start IS NOT NULL
                       AND us - c_start <= {w_us} THEN 1 ELSE 0 END) AS lvl
FROM w2 GROUP BY u
"""
    out = {}
    for u, lvl in con.execute(q).fetchall():
        # cumulative flags == max level only when levels are prefix-closed;
        # the DP guarantees that (level j fires only through level j-1), so
        # the flag sum IS the depth — asserted against Spark below.
        # Spark's contract drops level-0 keys (only-non-initial-step users),
        # so mirror that here.
        if int(lvl) >= 1:
            out[int(u)] = int(lvl)
    con.close()
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_events)
def test_window_funnel_matches_oracle_on_random_events(spark, rows):
    sdf = spark.createDataFrame(
        [(u, _NAMES[s], sec) for u, s, sec in rows], "u long, et string, sec long"
    ).select(
        "u",
        "et",
        F.timestamp_micros(F.col("sec") * 1_000_000).alias("ts"),
    )
    steps = [F.col("et") == n for n in _NAMES]
    got = {
        r["k"]: r["funnel_level"]
        for r in funnel.window_funnel(sdf, "u", "ts", steps, _WINDOW_S).collect()
    }
    assert got == _oracle(rows)
