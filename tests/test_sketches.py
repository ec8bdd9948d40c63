"""Heavy-hitters (Misra-Gries / topK) sketch: exact regime equals the exact
top-k; trimmed regime keeps guarantees (operators/sketches.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators.sketches import (
    _mg_trim,
    heavy_hitters_topk,
    heavy_hitters_topk_weighted,
)


def test_exact_regime_matches_exact_topk(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = heavy_hitters_topk(ev, "user_id", 5, capacity=1 << 14).collect()
    exact = (
        ev.groupBy(F.col("user_id").cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(5)
        .collect()
    )
    assert [(r["value"], r["count_lb"], r["count_ub"]) for r in got] == [
        (r["value"], r["n"], r["n"]) for r in exact
    ]


def test_trimmed_regime_keeps_bounds_and_heavy_hitter(spark):
    # one dominant value + a long tail, forced through a tiny capacity;
    # single partition so the trim path actually runs
    rows = [("hot",)] * 500 + [(f"tail{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").coalesce(1)
    out = {r["value"]: r for r in heavy_hitters_topk(df, "v", 3, capacity=8).collect()}
    assert "hot" in out  # n/ (C+1) error can never evict a 500/700 hitter
    hot = out["hot"]
    assert hot["count_lb"] <= 500 <= hot["count_ub"]
    # MG undercount bound: n / (capacity + 1)
    assert 500 - hot["count_lb"] <= 700 // 9


def test_mg_trim_invariants():
    counts = pd.Series({"a": 10, "b": 7, "c": 3, "d": 1})
    trimmed, sub = _mg_trim(counts, 2)
    assert sub == 3  # the (C+1)-th largest
    assert trimmed.to_dict() == {"a": 7, "b": 4}
    # under capacity: untouched
    same, sub0 = _mg_trim(counts, 10)
    assert sub0 == 0 and same.equals(counts)


def test_null_and_empty_inputs(spark):
    df = spark.createDataFrame([(None,), ("x",), (None,)], "v string")
    out = heavy_hitters_topk(df, "v", 5, capacity=4).collect()
    assert [(r["value"], r["count_lb"]) for r in out] == [("x", 1)]

    empty = spark.createDataFrame([], "v string")
    assert heavy_hitters_topk(empty, "v", 5, capacity=4).collect() == []


def test_weighted_exact_regime_matches_exact_weighted_topk(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = F.round(F.col("value") * 100).cast("long")
    got = heavy_hitters_topk_weighted(ev, "user_id", w, 5, capacity=1 << 14).collect()
    exact = (
        ev.filter(F.col("user_id").isNotNull() & (w > 0))
        .groupBy(F.col("user_id").cast("string").alias("value"))
        .agg(F.sum(w).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(5)
        .collect()
    )
    assert [(r["value"], r["count_lb"], r["count_ub"]) for r in got] == [
        (r["value"], r["n"], r["n"]) for r in exact
    ]


def test_weighted_unit_weights_equal_unweighted(spark):
    rows = [(f"v{i % 7}",) for i in range(300)]
    df = spark.createDataFrame(rows, "v string")
    a = heavy_hitters_topk(df, "v", 7, capacity=1 << 10).collect()
    b = heavy_hitters_topk_weighted(df, "v", F.lit(1), 7, capacity=1 << 10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_weighted_drops_null_and_nonpositive_weights(spark):
    rows = [("a", 5), ("a", 0), ("a", -3), ("b", None), ("b", 2)]
    df = spark.createDataFrame(rows, "v string, w long")
    got = {r["value"]: r["count_lb"] for r in
           heavy_hitters_topk_weighted(df, "v", "w", 5, capacity=8).collect()}
    assert got == {"a": 5, "b": 2}


def test_weighted_fold_stays_int64_with_null_weights():
    """ADVICE r12 (low): an Arrow batch CONTAINING null weights
    materializes `w` as float64; the per-batch fold must re-anchor to
    int64 after the drop so weighted sums are integer-exact
    unconditionally (not just below 2^53)."""
    import pandas as pd

    from apache_kafka_clickhouse_demo_spark.operators.sketches import (
        _mgw_partition,
    )

    # each weight is exactly float64-representable, but their int sum
    # 2^53 + 3 is NOT: a float64 fold rounds it to 2^53 + 4
    half = 1 << 52
    pdf = pd.DataFrame(
        {"value": ["a", "a", "a", "b"], "w": [half, half, 3, None]},
        dtype="object",
    )
    pdf["w"] = pdf["w"].astype("float64")  # the nullable-batch regime
    (out,) = list(_mgw_partition(capacity=8)([pdf]))
    got = dict(
        zip(
            out["value"].tolist(),
            out["count_lb"].tolist(),
            strict=True,
        )
    )
    assert got["a"] == (1 << 53) + 3
    assert out["count_lb"].dtype == "int64"


def test_weighted_trimmed_regime_keeps_bounds(spark):
    # dominant weight mass + long tail through a tiny capacity; the MG
    # bound is total_weight / (capacity + 1)
    rows = [("hot", 50)] * 10 + [(f"t{i}", 1) for i in range(200)]
    df = spark.createDataFrame(rows, "v string, w long").coalesce(1)
    out = {r["value"]: r for r in
           heavy_hitters_topk_weighted(df, "v", "w", 3, capacity=8).collect()}
    assert "hot" in out
    hot = out["hot"]
    assert hot["count_lb"] <= 500 <= hot["count_ub"]
    assert 500 - hot["count_lb"] <= 700 // 9


def test_count_min_never_undercounts_and_merges_linearly(spark):
    """CMS guarantees: est >= exact for EVERY key (one-sided), and two
    sketches of the same (width, depth, salt) merge by per-cell SUM into
    exactly the union corpus's sketch (mergeable-summaries linearity)."""
    from pyspark.sql import functions as F

    from apache_kafka_clickhouse_demo_spark.operators import sketches as SK

    rows = [(i % 37,) for i in range(500)] + [(1000 + i % 5,) for i in range(200)]
    df = spark.createDataFrame(rows, "k long")
    width, depth = 16, 3  # tiny width: collisions guaranteed
    sk = SK.count_min_build(df, "k", width=width, depth=depth)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["est"]
        for r in SK.count_min_lookup(
            sk, keys, "k", width=width, depth=depth
        ).collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)  # width=16 must collide

    # linearity: sketch(A) + sketch(B) == sketch(A union B), cell for cell
    a = df.filter(F.col("k") < 500)
    b = df.filter(F.col("k") >= 500)
    merged = (
        SK.count_min_build(a, "k", width=width, depth=depth)
        .unionByName(SK.count_min_build(b, "k", width=width, depth=depth))
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    want = {
        (r["d"], r["bucket"]): r["n"] for r in sk.collect()
    }
    got = {(r["d"], r["bucket"]): r["n"] for r in merged.collect()}
    assert got == want


def test_count_min_null_keys_are_not_counted(spark):
    from apache_kafka_clickhouse_demo_spark.operators import sketches as SK

    df = spark.createDataFrame([(1,), (None,), (1,)], "k string")
    sk = SK.count_min_build(df, "k", width=8, depth=2)
    total = sum(r["n"] for r in sk.collect()) // 2  # depth rows per key
    assert total == 2  # the NULL row contributed nothing
