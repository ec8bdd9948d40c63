"""Property test: asof_join vs a brute-force reference on random inputs.

The union+window implementation must match the obvious O(n·m) definition
for every direction/how combination, across boundary ties, NULL payloads,
keys that exist on only one side, and duplicate left timestamps.  Right
inputs are pre-aggregated to one row per (key, ts) — the operator's
documented determinism contract.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_kafka_clickhouse_demo_spark.operators.asof import asof_join

_left_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 12)),  # (key, ts)
    min_size=1,
    max_size=8,
)
_right_rows = st.dictionaries(
    st.tuples(st.integers(0, 2), st.integers(0, 12)),  # (key, ts) unique
    st.one_of(st.none(), st.integers(0, 5)),  # payload value, may be NULL
    min_size=0,
    max_size=8,
)


def _reference(left, right, direction, how):
    out = {}
    for eid, (k, ts) in enumerate(left):
        if direction == "backward":
            cands = [rts for (rk, rts) in right if rk == k and rts <= ts]
            match_ts = max(cands) if cands else None
        else:
            cands = [rts for (rk, rts) in right if rk == k and rts >= ts]
            match_ts = min(cands) if cands else None
        if match_ts is None:
            if how == "left":
                out[eid] = (None, None)
        else:
            out[eid] = (match_ts, right[(k, match_ts)])
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows, direction_i=st.integers(0, 1), how_i=st.integers(0, 1))
def test_asof_matches_brute_force(spark, left, right, direction_i, how_i):
    direction = ("backward", "forward")[direction_i]
    how = ("left", "inner")[how_i]
    ldf = spark.createDataFrame(
        [(eid, k, ts) for eid, (k, ts) in enumerate(left)],
        "event_id long, user_id long, ts long",
    )
    rdf = spark.createDataFrame(
        [(k, ts, v, ts) for (k, ts), v in right.items()],
        "user_id long, ts long, val int, val_ts long",
    )
    got = {
        r["event_id"]: (r["val_ts"], r["val"])
        for r in asof_join(
            ldf, rdf, on=["user_id"], ts_col="ts",
            payload_cols=["val_ts", "val"],
            direction=direction, how=how,
        ).collect()
    }
    assert got == _reference(left, right, direction, how)
