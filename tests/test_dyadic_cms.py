"""Dyadic count-min range counts (operators/sketches.py:
dyadic_decompose / dyadic_cms_build / dyadic_cms_range_counts) —
decomposition correctness, the never-undercount guarantee, the exact
regime, counter linearity, and the drop rule."""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark.operators import sketches as SK


def test_decompose_covers_exactly_and_disjointly():
    # sweep a grid of ranges: the pieces must tile [lo, hi) exactly
    for lo, hi in [(0, 1), (0, 1000), (123, 124), (7, 4096), (999, 1001),
                   (0, 65536), (65535, 65536), (40000, 49203)]:
        pieces = SK.dyadic_decompose(lo, hi)
        covered = []
        for lvl, key in pieces:
            covered.extend(range(key << lvl, (key + 1) << lvl))
        assert sorted(covered) == list(range(lo, hi)), (lo, hi)
        # at most 2 pieces per level — the classic bound
        levels = [lvl for lvl, _ in pieces]
        assert all(levels.count(l) <= 2 for l in set(levels))
    assert SK.dyadic_decompose(5, 5) == []


def _truth(vals, lo, hi):
    return sum(1 for v in vals if lo <= v < hi)


VALS = [(i * 131) % 50000 for i in range(400)] + [123] * 30 + [49999] * 7
RANGES = [(1, 0, 1000), (2, 1000, 5000), (3, 5000, 20000), (4, 20000, 65536),
          (5, 123, 124)]


def _est(spark, vals, ranges, width, depth=3):
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 16, width, depth)
    out = SK.dyadic_cms_range_counts(sk, ranges, 16, width, depth)
    return {r["range_id"]: r["est"] for r in out.collect()}


def test_never_undercounts(spark):
    # small width forces collisions: estimates may only move UP
    est = _est(spark, VALS, RANGES, width=64)
    for rid, lo, hi in RANGES:
        assert est[rid] >= _truth(VALS, lo, hi), (rid, lo, hi)


def test_exact_regime_wide_grid(spark):
    # width >> distinct prefixes per level: zero collisions -> the
    # estimate IS the true range count, including the point range
    est = _est(spark, VALS, RANGES, width=1 << 14)
    for rid, lo, hi in RANGES:
        assert est[rid] == _truth(VALS, lo, hi), (rid, lo, hi)


def test_counters_are_linear(spark):
    a = [(v,) for v in VALS[:200]]
    b = [(v,) for v in VALS[200:]]
    df_a = spark.createDataFrame(a, "cents long")
    df_b = spark.createDataFrame(b, "cents long")
    df_ab = spark.createDataFrame(a + b, "cents long")
    cells = lambda df: {  # noqa: E731
        (r["level"], r["d"], r["bucket"]): r["n"]
        for r in SK.dyadic_cms_build(df, "cents", 16, 256, 2).collect()
    }
    ca, cb, cab = cells(df_a), cells(df_b), cells(df_ab)
    merged = dict(ca)
    for k, n in cb.items():
        merged[k] = merged.get(k, 0) + n
    assert merged == cab


def test_null_and_out_of_range_dropped(spark):
    rows = [(100,), (None,), (-5,), (1 << 16,), ((1 << 16) - 1,)]
    df = spark.createDataFrame(rows, "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 16, 1 << 14, 2)
    out = SK.dyadic_cms_range_counts(sk, [(1, 0, 1 << 16)], 16, 1 << 14, 2)
    assert out.collect()[0]["est"] == 2  # only 100 and 65535 counted


def test_out_of_universe_range_raises(spark):
    df = spark.createDataFrame([(1,)], "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 8, 64, 2)
    with pytest.raises(ValueError):
        SK.dyadic_cms_range_counts(sk, [(1, 0, 257)], 8, 64, 2)
