"""Deterministic sampling/sharding operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.operators.sampling import (
    shuffle_shards,
    stratified_sample,
)
from apache_kafka_clickhouse_demo_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "source")


def test_stratified_two_phase_equals_window_reference(spark, sf_dir):
    """The partition-local reduction is EXACT: same rows and ranks as the
    single-window formulation, regardless of input partitioning."""
    docs = _docs(spark, sf_dir)
    n = 7
    hkey = H.h48(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(hkey, "doc_id")
    ref = sorted(
        tuple(r)
        for r in docs.withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= n)
        .select("source", "doc_id", "strat_rank")
        .collect()
    )
    for parts in (1, 13):
        got = sorted(
            tuple(r)
            for r in stratified_sample(
                docs.repartition(parts), "source", n, "doc_id"
            ).collect()
        )
        assert got == ref


def test_stratified_quota_exceeding_group_keeps_whole_group(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    group_sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    big_n = max(group_sizes.values()) + 5
    out = stratified_sample(docs, "source", big_n, "doc_id")
    got_sizes = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got_sizes == group_sizes
    # ranks are dense 1..size within each group
    assert (
        out.groupBy("source").agg(F.max("strat_rank").alias("m"), F.count("*").alias("n"))
        .filter(F.col("m") != F.col("n"))
        .count()
        == 0
    )


def test_stratified_plan_has_no_per_group_window(spark, sf_dir):
    """Scale contract: the plan is two hash aggregates (partial + merge),
    never a Window funneling a whole group through one task."""
    plan = stratified_sample(_docs(spark, sf_dir), "source", 5, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_shuffle_shards_deterministic_balanced_dense(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    a = sorted(tuple(r) for r in shuffle_shards(docs.repartition(3), "doc_id", 8).collect())
    b = sorted(tuple(r) for r in shuffle_shards(docs.repartition(17), "doc_id", 8).collect())
    assert a == b  # bit-stable across input partitionings
    n = docs.count()
    out = shuffle_shards(docs, "doc_id", 8)
    sizes = [r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 8 and sum(sizes) == n
    assert max(sizes) < 2.5 * min(sizes)  # hash-uniform, no hot shard
    # seq dense 1..count per shard
    assert (
        out.groupBy("shard").agg(F.max("seq").alias("m"), F.count("*").alias("n"))
        .filter(F.col("m") != F.col("n"))
        .count()
        == 0
    )


def test_shuffle_order_is_not_id_order(spark, sf_dir):
    """The within-shard order is actually shuffled: for at least one shard
    the id sequence is non-monotonic (h48 decorrelates ids)."""
    out = shuffle_shards(_docs(spark, sf_dir).select("doc_id"), "doc_id", 4)
    rows = out.collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["doc_id"])  # seq-ordered
    assert any(ids != sorted(ids) for ids in by_shard.values())


def test_mixture_sample_rates_default_and_monotonicity(spark, sf_dir):
    from apache_kafka_clickhouse_demo_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = {"src0": 1.0, "src1": 0.4, "src2": 0.0}
    out = mixture_sample(docs, "source", rates, "doc_id", default_rate=0.25)
    kept = {(r["doc_id"], r["source"]) for r in out.collect()}

    by_src_total = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    by_src_kept: dict[str, int] = {}
    for _id, s in kept:
        by_src_kept[s] = by_src_kept.get(s, 0) + 1
    # rate 1.0 keeps everything, rate 0.0 keeps nothing
    assert by_src_kept.get("src0", 0) == by_src_total["src0"]
    assert "src2" not in by_src_kept
    # intermediate and default rates land near target (hash-uniform; the
    # fixture groups are small, so allow wide-but-meaningful bounds)
    frac1 = by_src_kept.get("src1", 0) / by_src_total["src1"]
    assert 0.1 < frac1 < 0.75
    other = [s for s in by_src_total if s not in rates]
    frac_def = sum(by_src_kept.get(s, 0) for s in other) / sum(
        by_src_total[s] for s in other
    )
    assert 0.1 < frac_def < 0.45

    # monotonicity: raising one rate only ADDS members, never swaps
    out2 = mixture_sample(
        docs, "source", {**rates, "src1": 0.8}, "doc_id", default_rate=0.25
    )
    kept2 = {(r["doc_id"], r["source"]) for r in out2.collect()}
    assert kept <= kept2
    assert {k for k in kept2 - kept if k[1] != "src1"} == set()


def test_mixture_sample_is_scan_side_filter(spark, sf_dir):
    """Plan contract: a pure row-local filter — zero exchanges."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    plan = (
        mixture_sample(docs, "source", {"src0": 0.5}, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Window" not in plan


def test_stratified_sample_string_ids(spark):
    """Non-numeric id columns must keep their own type and ordering."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(f"doc-{i:03d}", "g1" if i % 2 else "g2") for i in range(40)]
    df = spark.createDataFrame(rows, "doc string, g string")
    out = stratified_sample(df, "g", 5, "doc")
    got = out.collect()
    assert len(got) == 10
    assert all(isinstance(r["doc"], str) and r["doc"].startswith("doc-") for r in got)
    # deterministic under repartitioning
    got2 = stratified_sample(df.repartition(7), "g", 5, "doc").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))


def test_sampling_ops_on_empty_input(spark):
    """Empty tables must produce empty, correctly-shaped results — the
    degenerate first-run of any pipeline stage."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        mixture_sample,
        shuffle_shards,
        stratified_sample,
    )

    empty = spark.createDataFrame([], "doc_id long, source string")
    s = stratified_sample(empty, "source", 5, "doc_id")
    assert s.columns == ["source", "doc_id", "strat_rank"] and s.count() == 0
    sh = shuffle_shards(empty, "doc_id", 4)
    assert sh.columns == ["doc_id", "shard", "seq"] and sh.count() == 0
    m = mixture_sample(empty, "source", {"a": 0.5}, "doc_id")
    assert m.columns == ["doc_id", "source"] and m.count() == 0


def test_diverse_sample_caps_head_cluster(spark):
    """A dominant embedding-space region (90% of vectors in one tight
    cluster) contributes exactly n_per_cell rows per cell — the
    diversity cap diverse_sample exists for — while every cell obeys the
    quota and ranks are 1..quota by the deterministic hash order."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import diverse_sample

    rows = [(i, [10.0, 0.1 * (i % 3)]) for i in range(90)] + [
        (100 + i, [-5.0 * (i + 1), 7.0 * (i + 1)]) for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = diverse_sample(emb, n_per_cell=2, target_centroids=4).collect()
    per_cell: dict = {}
    for r in got:
        per_cell.setdefault(r["cent_id"], []).append(r["strat_rank"])
    assert per_cell, "no cells sampled"
    for ranks in per_cell.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2
    # the head cluster (~90 vectors, a handful of cells) is capped at
    # 2/cell: the sample can never be >~ cells*2 rows
    assert len(got) <= 2 * len(per_cell)
    # deterministic: a second run returns the identical sample
    again = diverse_sample(emb, n_per_cell=2, target_centroids=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_temperature_mixture_flattens_head_and_saturates_tail(spark):
    """alpha=1/2 rebalancing: the head group's rate is capped below the
    tail's, tiny groups saturate at rate 1e6 and pass WHOLE, and the
    per-group rates match the documented integer formula exactly."""
    import math

    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = (
        [(i, "head") for i in range(800)]
        + [(1000 + i, "mid") for i in range(160)]
        + [(2000 + i, "tiny") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    target = 200
    out = temperature_mixture(df, "source", target, "doc_id").collect()

    counts = {"head": 800, "mid": 160, "tiny": 8}
    w = {g: math.isqrt(n * 1_000_000) for g, n in counts.items()}
    tw = sum(w.values())
    want_rate = {
        g: min(1_000_000, target * w[g] * 1_000_000 // (tw * n))
        for g, n in counts.items()
    }
    got_rate = {r["source"]: r["rate_micro"] for r in out}
    assert got_rate == want_rate
    # sqrt flattening: head keep-RATE strictly below tail's saturated 1.0
    assert want_rate["head"] < want_rate["mid"] < want_rate["tiny"] == 1_000_000
    kept = {g: sum(1 for r in out if r["source"] == g) for g in counts}
    assert kept["tiny"] == 8  # saturated group passes whole
    # expected counts ~ target * w_g / tw; h48 thresholding is unbiased,
    # allow wide slack at this tiny n
    assert 0 < kept["head"] < counts["head"]


def test_temperature_mixture_membership_is_stable_under_growth(spark):
    """Adding rows to OTHER groups never swaps a group's kept members
    when its own rate does not decrease (monotone threshold contract —
    here 'tiny' stays saturated, so its members are identical)."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        temperature_mixture,
    )

    small = [(i, "big") for i in range(100)] + [(900 + i, "tiny") for i in range(4)]
    grown = small + [(5000 + i, "new") for i in range(100)]
    k1 = {
        r["doc_id"]
        for r in temperature_mixture(
            spark.createDataFrame(small, "doc_id long, source string"),
            "source", 50, "doc_id",
        ).collect()
        if r["source"] == "tiny"
    }
    k2 = {
        r["doc_id"]
        for r in temperature_mixture(
            spark.createDataFrame(grown, "doc_id long, source string"),
            "source", 50, "doc_id",
        ).collect()
        if r["source"] == "tiny"
    }
    assert k1 == k2 == {900, 901, 902, 903}


def test_temperature_mixture_alpha_generalized_matches_replica(spark):
    """alpha = 0.3 (the mT5 point): kept rows and attached rates match
    an INDEPENDENT pure-Python replica of the documented integer rule
    row-for-row (the engine computes rates driver-side from bounded
    group counts via temperature_rates_py; the replica here re-derives
    them from the raw fixture with its own h48 threshold loop)."""
    import math

    from apache_kafka_clickhouse_demo_spark.functions.hashing import py_h48
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        temperature_mixture,
    )

    rows = (
        [(i, "head") for i in range(700)]
        + [(1000 + i, "mid") for i in range(120)]
        + [(2000 + i, "tiny") for i in range(6)]
    )
    target, alpha = 150, 0.3
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["source"], r["doc_id"], r["rate_micro"])
        for r in temperature_mixture(
            df, "source", target, "doc_id", alpha=alpha
        ).collect()
    )

    counts: dict[str, int] = {}
    for _, g in rows:
        counts[g] = counts.get(g, 0) + 1
    w = {g: math.floor(math.pow(n, alpha) * 1000.0) for g, n in counts.items()}
    tw = sum(w.values())
    rate = {
        g: min(1_000_000, target * w[g] * 1_000_000 // (tw * n))
        for g, n in counts.items()
    }
    want = sorted(
        (g, i, rate[g])
        for i, g in rows
        if py_h48("temp:" + str(i)) % 1_000_000 < rate[g]
    )
    assert got == want
    # alpha=0.3 flattens harder than alpha=0.5: the head group's rate is
    # strictly lower at 0.3 (same fixture, same target)
    got_half = {
        r["source"]: r["rate_micro"]
        for r in temperature_mixture(df, "source", target, "doc_id").collect()
    }
    assert rate["head"] < got_half["head"]
    assert rate["tiny"] == got_half["tiny"] == 1_000_000


def test_temperature_mixture_alpha_membership_stable(spark):
    """Monotone-threshold reproducibility holds on the alpha != 1/2
    path too: growing OTHER groups never swaps a saturated group's
    members."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        temperature_mixture,
    )

    small = [(i, "big") for i in range(100)] + [(900 + i, "tiny") for i in range(4)]
    grown = small + [(5000 + i, "new") for i in range(100)]

    def tiny_kept(rows):
        return {
            r["doc_id"]
            for r in temperature_mixture(
                spark.createDataFrame(rows, "doc_id long, source string"),
                "source", 50, "doc_id", alpha=0.3,
            ).collect()
            if r["source"] == "tiny"
        }

    assert tiny_kept(small) == tiny_kept(grown) == {900, 901, 902, 903}


def test_temperature_mixture_null_groups_excluded(spark):
    """ADVICE r11: NULL-group rows are dropped AND excluded from the
    weight total — real groups' rates are identical with or without
    NULL rows present (previously NULLs depressed every rate while the
    join silently dropped them)."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        temperature_mixture,
    )

    clean = [(i, "a") for i in range(60)] + [(100 + i, "b") for i in range(10)]
    noisy = clean + [(9000 + i, None) for i in range(500)]
    for alpha in (0.5, 0.3):
        r_clean = {
            (r["doc_id"], r["rate_micro"])
            for r in temperature_mixture(
                spark.createDataFrame(clean, "doc_id long, source string"),
                "source", 30, "doc_id", alpha=alpha,
            ).collect()
        }
        out_noisy = temperature_mixture(
            spark.createDataFrame(noisy, "doc_id long, source string"),
            "source", 30, "doc_id", alpha=alpha,
        ).collect()
        assert all(r["source"] is not None for r in out_noisy)
        r_noisy = {(r["doc_id"], r["rate_micro"]) for r in out_noisy}
        assert r_clean == r_noisy, alpha


def test_temperature_mixture_group_cardinality_guard(spark):
    """The alpha != 1/2 driver-side collect refuses a group column with
    more than MAX_TEMP_GROUPS distinct values (rates are per-source,
    not per-document)."""
    import pytest as _pytest

    from apache_kafka_clickhouse_demo_spark.operators import sampling as S

    df = spark.range(10).selectExpr("id AS doc_id", "CAST(id AS STRING) AS source")
    old = S.MAX_TEMP_GROUPS
    S.MAX_TEMP_GROUPS = 5
    try:
        with _pytest.raises(ValueError, match="distinct groups"):
            S.temperature_mixture(df, "source", 5, "doc_id", alpha=0.3)
    finally:
        S.MAX_TEMP_GROUPS = old


def test_calibrate_scores_integer_permille_rank(spark):
    """calib = (rank-1)*scale div (count-1): ties share a calibrated
    value, singleton groups calibrate to 0, endpoints hit 0 and scale,
    and the value is monotone in the score within each group."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        calibrate_scores,
    )

    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 40), (5, "a", 50),
        (6, "b", 7),                      # singleton group
        (7, "c", 1), (8, "c", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    got = {
        r["doc_id"]: r["calib"]
        for r in calibrate_scores(df, "source", "score", "doc_id").collect()
    }
    # group a (n=5): ranks 1,2,2,4,5 -> (rk-1)*1000 div 4
    assert got[1] == 0 and got[2] == got[3] == 250 and got[4] == 750
    assert got[5] == 1000
    assert got[6] == 0          # singleton: defined as 0
    assert got[7] == 0 and got[8] == 1000
    # monotone within group: higher score never calibrates lower
    assert got[1] <= got[2] <= got[4] <= got[5]


def test_calibrate_scores_cross_source_comparability(spark):
    """The operator's reason to exist: one source's scores sit far
    above another's, yet after calibration the two sources' medians
    coincide — a single calibrated threshold selects proportionally
    from both."""
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        calibrate_scores,
    )

    rows = [(i, "hi", 1000 + i) for i in range(11)] + [
        (100 + i, "lo", i) for i in range(11)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = calibrate_scores(df, "source", "score", "doc_id").collect()
    med = {
        s: sorted(r["calib"] for r in out if r["source"] == s)[5]
        for s in ("hi", "lo")
    }
    assert med["hi"] == med["lo"] == 500
    kept = [r for r in out if r["calib"] >= 500]
    assert sum(1 for r in kept if r["source"] == "hi") == sum(
        1 for r in kept if r["source"] == "lo"
    ) == 6
