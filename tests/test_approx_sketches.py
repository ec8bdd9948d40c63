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
