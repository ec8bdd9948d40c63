"""Exact weighted quantiles (operators/sampling.py: weighted_quantiles,
ClickHouse quantileExactWeighted parity) — the integer rule against a
pure-Python replica, tie/edge semantics, and the drop rule."""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark.operators import sampling as SMP


def _run(spark, rows, ps=(250, 500, 750)):
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = SMP.weighted_quantiles(df, "g", "v", "w", quantiles_permille=ps)
    return {r["g"]: r.asDict() for r in out.collect()}


def _ref(rows, p):
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v, w in rows:
        if v is None or w is None or w <= 0:
            continue
        by_g[g].append((v, w))
    out = {}
    for g, vw in by_g.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        target = -(-tot * p // 1000)  # ceil
        cum = 0
        for v, w in vw:
            cum += w
            if cum >= target:
                out[g] = v
                break
    return out


ROWS = [("a", (i * 13) % 50, (i % 7) + 1) for i in range(100)] + [
    ("b", i, 2 * i + 1) for i in range(20)
]


def test_matches_pure_python_replica(spark):
    got = _run(spark, ROWS)
    for p in (250, 500, 750):
        want = _ref(ROWS, p)
        for g in want:
            assert got[g][f"q{p}"] == want[g], (g, p)


def test_weighted_median_shifts_with_weight_mass(spark):
    # value 1 carries 9x the weight of value 100 -> median is 1
    rows = [("g", 1, 9), ("g", 100, 1)]
    got = _run(spark, rows)
    assert got["g"]["q500"] == 1
    # flip the mass -> median flips
    rows2 = [("g", 1, 1), ("g", 100, 9)]
    assert _run(spark, rows2)["g"]["q500"] == 100


def test_drop_rule_null_and_nonpositive_weights(spark):
    rows = [("g", 5, 1), ("g", 1, None), ("g", 2, 0), ("g", 3, -4), ("g", None, 7)]
    got = _run(spark, rows)
    assert got["g"]["q500"] == 5 and got["g"]["total_weight"] == 1


def test_p1000_is_max_and_ties_resolve_to_the_tied_value(spark):
    rows = [("g", 7, 3), ("g", 7, 2), ("g", 9, 1)]
    got = _run(spark, rows, ps=(500, 1000))
    assert got["g"]["q500"] == 7  # target 3 of 6 lands inside the 7-mass
    assert got["g"]["q1000"] == 9


def test_invalid_permille_raises(spark):
    df = spark.createDataFrame([("g", 1, 1)], "g string, v long, w long")
    with pytest.raises(ValueError):
        SMP.weighted_quantiles(df, "g", "v", "w", quantiles_permille=(0,))
    with pytest.raises(ValueError):
        SMP.weighted_quantiles(df, "g", "v", "w", quantiles_permille=(1001,))
