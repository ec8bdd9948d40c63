"""Catalog-bucketed tables (sources/bucketed.py): the co-located join and
aggregation plans really are EXCHANGE-FREE — the property the write-time
shuffle buys — and answers match the plain-join truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.plans.explain import formatted_plan
from apache_kafka_clickhouse_demo_spark.sources.bucketed import (
    bucketed_table,
    write_bucketed,
)


@pytest.fixture()
def tables(spark, tmp_path):
    ev = spark.range(5_000).selectExpr(
        "id as event_id", "cast(id % 97 as long) as user_id", "id * 2 as value"
    )
    dim = spark.range(97).selectExpr(
        "id as user_id", "concat('u', id) as name"
    )
    write_bucketed(
        ev, "ev_b", ["user_id"], 8, sort_cols=["user_id"],
        path=str(tmp_path / "ev_b"),
    )
    write_bucketed(
        dim, "dim_b", ["user_id"], 8, sort_cols=["user_id"],
        path=str(tmp_path / "dim_b"),
    )
    yield ev, dim
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")


def test_colocated_join_plans_without_exchange(spark, tables):
    ev, dim = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_table(spark, "ev_b").join(
            bucketed_table(spark, "dim_b"), "user_id"
        )
        plan = formatted_plan(joined)
        # the write-time shuffle is the ONLY shuffle: the join itself is
        # exchange-free (both sides' bucketing satisfies the distribution)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # and the answer is the plain join's answer
        want = ev.join(dim, "user_id").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_plans_without_exchange(spark, tables):
    ev, _dim = tables
    agg = (
        bucketed_table(spark, "ev_b")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
    )
    assert "Exchange" not in formatted_plan(agg)
    got = {r["user_id"]: r["total"] for r in agg.collect()}
    want = {
        r["user_id"]: r["total"]
        for r in ev.groupBy("user_id").agg(F.sum("value").alias("total")).collect()
    }
    assert got == want


def test_plain_parquet_read_of_same_files_still_shuffles(spark, tables, tmp_path):
    """The counter-example that proves the metadata matters: reading the
    bucketed FILES as plain parquet loses the layout and the same
    aggregation plans an Exchange again."""
    plain = spark.read.parquet(str(tmp_path / "ev_b"))
    agg = plain.groupBy("user_id").agg(F.sum("value").alias("total"))
    assert "Exchange" in formatted_plan(agg)


def test_compact_bucketed_rewrite_keeps_plan_and_answers(spark, tables, tmp_path):
    """VERDICT r6 #7: appends multiply files per bucket; compact_bucketed
    must shrink the file count while the rewritten table still plans the
    exchange-free join and answers identically."""
    import glob
    import os

    from apache_kafka_clickhouse_demo_spark.sources.bucketed import compact_bucketed

    ev, dim = tables
    # fragment: three appends, each multi-task
    for k in range(3):
        write_bucketed(
            ev.filter(F.col("event_id").between(k * 10, k * 10 + 9)).repartition(4),
            "ev_b",
            ["user_id"],
            8,
            sort_cols=["user_id"],
            mode="append",
        )
    files_before = len(glob.glob(str(tmp_path / "ev_b" / "*.parquet")))
    truth = sorted(
        map(tuple, bucketed_table(spark, "ev_b").join(dim, "user_id").collect())
    )

    compact_bucketed(spark, "ev_b", ["user_id"], 8, sort_cols=["user_id"])

    # NOTE: the staging table carries its own location; after the catalog
    # swap the table's files live wherever the catalog now points
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ev_b")
        .filter("col_name = 'Location'")
        .first()["data_type"]
    )
    files_after = len(glob.glob(os.path.join(loc.removeprefix("file:"), "*.parquet")))
    assert files_after < files_before

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_table(spark, "ev_b").join(
            bucketed_table(spark, "dim_b"), "user_id"
        )
        assert "Exchange" not in formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert sorted(
        map(tuple, bucketed_table(spark, "ev_b").join(dim, "user_id").collect())
    ) == truth
