"""Property test: collapse_versioned == a brute-force Python mirror on
random change logs — annihilation counts, winning-sign selection, the
max-tiebreak representative, and multiplicity weights all at once,
including re-collapse idempotence over the weighted output."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_kafka_clickhouse_demo_spark.sources.storage import collapse_versioned

_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),  # key
        st.integers(min_value=1, max_value=3),  # version
        st.sampled_from([1, -1]),  # sign
        st.integers(min_value=0, max_value=9),  # payload/tiebreak
    ),
    min_size=1,
    max_size=25,
)


def _mirror(rows):
    groups = defaultdict(list)
    for k, ver, sign, v in rows:
        groups[(k, ver)].append((sign, v))
    out = {}
    for (k, ver), members in groups.items():
        net = sum(s for s, _v in members)
        if net == 0:
            continue
        win = 1 if net > 0 else -1
        rep = max(v for s, v in members if s == win)
        out[(k, ver)] = (win, abs(net), rep)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_collapse_versioned_matches_brute_force(spark, rows):
    df = spark.createDataFrame(rows, "k string, ver int, sign int, v int")
    collapsed = collapse_versioned(df, ["k"], "sign", "ver", ["v"])
    got = {
        (r["k"], r["ver"]): (r["sign"], r["multiplicity"], r["v"])
        for r in collapsed.collect()
    }
    assert got == _mirror(rows)

    # idempotence over the weighted output: a second collapse is a no-op
    again = {
        (r["k"], r["ver"]): (r["sign"], r["multiplicity"], r["v"])
        for r in collapse_versioned(
            collapsed, ["k"], "sign", "ver", ["v"]
        ).collect()
    }
    assert again == got
