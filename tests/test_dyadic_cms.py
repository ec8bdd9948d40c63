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


# ---------------------------------------------------------------------------
# dyadic_quantiles (r13): descent correctness, one-sided error, edge rules
# ---------------------------------------------------------------------------


def _exact_quantile(vals, p, bits=16):
    """The integer house rule: smallest v with count([0, v]) >= r,
    r = ceil(p * N / 1000), over in-universe values only."""
    inuniv = sorted(v for v in vals if 0 <= v < (1 << bits))
    n = len(inuniv)
    r = (p * n + 999) // 1000
    return inuniv[r - 1], r


def _quantiles(spark, vals, ps, width, depth=3, bits=16):
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    sk = SK.dyadic_cms_build(df, "cents", bits, width, depth)
    out = SK.dyadic_quantiles(sk, ps, bits, width, depth)
    return {r["p_permille"]: (r["q_value"], r["target_rank"])
            for r in out.collect()}


PS = [1, 250, 500, 750, 900, 990, 1000]


def test_quantiles_exact_in_wide_grid(spark):
    # no collisions -> every node estimate is the true prefix count ->
    # the descent IS the exact integer-rule quantile, ranks included
    got = _quantiles(spark, VALS, PS, width=1 << 14)
    for p in PS:
        q, r = _exact_quantile(VALS, p)
        assert got[p] == (q, r), (p, got[p], (q, r))


def test_quantiles_never_overshoot_and_bracket(spark):
    # narrow grid forces collisions: node estimates only OVERCOUNT, so
    # the walk can only turn left early -> q_sketch <= q_exact; and the
    # returned q must still bracket the rank under the sketch's own
    # estimates: est([0, q+1)) >= target_rank (the defining invariant)
    width = 64
    got = _quantiles(spark, VALS, PS, width=width)
    df = spark.createDataFrame([(v,) for v in VALS], "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 16, width, 3)
    probe = [(p, 0, int(got[p][0]) + 1) for p in PS]
    prefix_est = {
        r["range_id"]: r["est"]
        for r in SK.dyadic_cms_range_counts(sk, probe, 16, width, 3).collect()
    }
    for p in PS:
        q_sk, r = got[p]
        q_ex, _ = _exact_quantile(VALS, p)
        assert q_sk <= q_ex, (p, q_sk, q_ex)
        assert prefix_est[p] >= r, (p, prefix_est[p], r)


def test_quantiles_empty_universe_returns_empty(spark):
    rows = [(None,), (-5,), (1 << 16,)]
    df = spark.createDataFrame(rows, "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 16, 64, 2)
    assert SK.dyadic_quantiles(sk, [500], 16, 64, 2).collect() == []


def test_quantiles_validate_ps(spark):
    df = spark.createDataFrame([(1,)], "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 8, 64, 2)
    for bad in (0, -1, 1001):
        with pytest.raises(ValueError):
            SK.dyadic_quantiles(sk, [bad], 8, 64, 2)


def test_weighted_build_counts_weight_mass_and_drop_rule(spark):
    """weight_col switches the structure to weight-mass counts
    (quantileTimingWeighted parity): NULL/non-positive weights dropped,
    cells equal the unweighted build over the weight-expanded rows."""
    rows = [(5, 3), (5, None), (7, 0), (7, -2), (9, 2)]
    dfw = spark.createDataFrame(rows, "cents long, w long")
    expanded = spark.createDataFrame(
        [(5,)] * 3 + [(9,)] * 2, "cents long"
    )
    cw = {
        (r["level"], r["d"], r["bucket"]): r["n"]
        for r in SK.dyadic_cms_build(
            dfw, "cents", 8, 256, 2, weight_col="w"
        ).collect()
    }
    ce = {
        (r["level"], r["d"], r["bucket"]): r["n"]
        for r in SK.dyadic_cms_build(expanded, "cents", 8, 256, 2).collect()
    }
    assert cw == ce and len(cw) > 0


def test_weighted_quantiles_exact_in_wide_grid(spark):
    """The descent over a weighted structure answers the exact
    integer weighted-quantile rule (smallest v with cumulative weight
    >= ceil(p * W / 1000)) in the no-collision regime."""
    rows = [(v, (v * 7) % 5 + 1) for v in range(0, 200, 3)]
    df = spark.createDataFrame(rows, "cents long, w long")
    sk = SK.dyadic_cms_build(df, "cents", 16, 1 << 14, 3, weight_col="w")
    got = {
        r["p_permille"]: (r["q_value"], r["target_rank"])
        for r in SK.dyadic_quantiles(sk, PS, 16, 1 << 14, 3).collect()
    }
    total = sum(w for _, w in rows)
    cum = []
    acc = 0
    for v, w in sorted(rows):
        acc += w
        cum.append((v, acc))
    for p in PS:
        r = (p * total + 999) // 1000
        q = next(v for v, c in cum if c >= r)
        assert got[p] == (q, r), (p, got[p], (q, r))


def test_quantiles_property_sweep(spark):
    """Property sweep across deterministic pseudo-random corpora: in the
    wide-grid regime the descent equals the exact integer rule for
    every p; in a narrow grid it never overshoots and its target ranks
    are identical (ranks depend only on the exact root total).  One
    Spark session, several corpora — the hypothesis-style sweep without
    per-example session cost."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = rng.randint(30, 300)
        vals = [rng.randrange(0, 1 << 12) for _ in range(n)]
        # skew half the corpora: heavy duplicates stress tie handling
        if seed % 2:
            vals += [vals[0]] * rng.randint(10, 50)
        ps = sorted(rng.sample(range(1, 1001), 5))
        wide = _quantiles(spark, vals, ps, width=1 << 14)
        narrow = _quantiles(spark, vals, ps, width=32)
        for p in ps:
            q_ex, r_ex = _exact_quantile(vals, p)
            assert wide[p] == (q_ex, r_ex), (seed, p, wide[p], (q_ex, r_ex))
            q_na, r_na = narrow[p]
            assert r_na == r_ex  # rank from the exact root total
            assert q_na <= q_ex, (seed, p, q_na, q_ex)


def test_quantiles_reject_unmerged_duplicate_cells(spark):
    """ADVICE r14: the driver-walk dict would silently keep the LAST row
    of an un-merged store read (raw increments, one row per block per
    cell) — a different wrong answer than the r13 distributed walk's
    min-over-joined-rows.  Duplicate (level, d, bucket) rows must fail
    loudly; the same sketch pre-merged walks fine."""
    df = spark.createDataFrame([(v,) for v in (5, 9, 9, 12)], "cents long")
    sk = SK.dyadic_cms_build(df, "cents", 8, 64, 2)
    unmerged = sk.unionByName(sk)
    with pytest.raises(ValueError, match="duplicate sketch cell"):
        SK.dyadic_quantiles(unmerged, [500], 8, 64, 2)
    from pyspark.sql import functions as F

    remerged = unmerged.groupBy("level", "d", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )
    doubled = SK.dyadic_quantiles(remerged, [500], 8, 64, 2).collect()
    single = SK.dyadic_quantiles(sk, [500], 8, 64, 2).collect()
    # doubling every counter doubles N and target rank but the walk's
    # left/right decisions scale with it — same quantile value
    assert [r["q_value"] for r in doubled] == [r["q_value"] for r in single]
