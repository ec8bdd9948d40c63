"""Accuracy contract for the approximate sketches.

The hash gate can't check approximate operators (different engines, different
sketches by design), so their check lives here: the sketch answer must land
within its declared error bound of the exact answer on the same data."""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark import queries as Q


def test_approx_uniq_within_rsd_bound(spark, sf_dir):
    exact = {
        r["event_type"]: r["n_users"]
        for r in Q.q_type_user_stats(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["approx_uniq_users"]
        for r in Q.q_uniq_users_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        # rsd=0.02 is a standard deviation, not a hard cap — allow 4 sigma
        assert abs(approx[k] - ex) <= max(4 * 0.02 * ex, 2), (k, ex, approx[k])


def test_approx_percentile_rank_error_within_gk_bound(spark, sf_dir):
    """Production-scale contract for the GK quantile sketch: at a
    COMPRESSING accuracy (n/accuracy >> 1), every returned quantile's
    true rank is within eps*n = n/accuracy of the target rank — the
    Greenwald-Khanna guarantee that makes bounded-memory, mergeable
    quantiles safe at 100 TB.  (The gate query value_percentiles_approx
    runs uncompressed and is oracle-exact; this asserts the compressed
    regime.)"""
    from pyspark.sql import functions as F

    from apache_kafka_clickhouse_demo_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    accuracy = 100
    got = (
        events.groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(value, array(0.25, 0.5, 0.75), {accuracy})"
            ).alias("ps")
        )
        .collect()
    )
    vals = {
        r["event_type"]: sorted(
            x["value"]
            for x in events.filter(F.col("event_type") == r["event_type"])
            .select("value")
            .collect()
        )
        for r in got
    }
    import bisect

    for r in got:
        xs = vals[r["event_type"]]
        n = len(xs)
        assert n / accuracy > 1, "fixture too small to compress the sketch"
        for p, est in zip((0.25, 0.5, 0.75), r["ps"]):
            # rank band of the estimate in the true sorted values
            lo = bisect.bisect_left(xs, est)
            hi = bisect.bisect_right(xs, est)
            target = p * n
            err = min(abs(target - lo), abs(target - hi))
            assert err <= n / accuracy + 1, (
                r["event_type"], p, est, err, n / accuracy)
