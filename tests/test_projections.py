"""ProjectedTable — ClickHouse PROJECTION analogue (sources/projections.py):
routing picks the copy sorted for the predicate, every copy answers
identically, and the routed copy actually prunes row groups the primary
cannot."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.sources.projections import ProjectedTable


@pytest.fixture()
def table(spark, tmp_path):
    t = ProjectedTable(
        str(tmp_path / "pt"),
        {"primary": ["ts", "event_id"], "by_user": ["user_id", "ts"]},
    )
    df = (
        spark.range(20_000)
        .selectExpr(
            "id as event_id",
            "timestamp_micros(cast(id * 1000000 as long)) as ts",
            "cast(hash(id) % 500 as long) as user_id",
            "id * 2 as value",
        )
        .repartition(4)
    )
    t.write(df)
    return t, df


def test_routing_rule(table):
    t, _df = table
    assert t.choose(["ts"]) == "primary"
    assert t.choose(["user_id"]) == "by_user"
    assert t.choose(["user_id", "ts"]) == "by_user"  # longer prefix wins
    assert t.choose(["value"]) == "primary"  # unsorted filter -> primary
    assert t.choose([]) == "primary"


def test_all_copies_answer_identically(spark, table):
    t, df = table
    want = sorted(r["event_id"] for r in df.filter(F.col("user_id") == 77).collect())
    for cols in (["user_id"], ["ts"], ["value"]):
        got = sorted(
            r["event_id"]
            for r in t.read_for(spark, cols).filter(F.col("user_id") == 77).collect()
        )
        assert got == want


def test_projection_prunes_where_primary_cannot(spark, table):
    t, _df = table

    def span(dirname: str, col: str) -> float:
        """Mean per-FILE (max - min) of `col`, normalized by the full
        range — tight file spans are what min/max pruning feeds on (each
        projection file owns a narrow range slice of ITS sort key)."""
        spans, lo_all, hi_all = [], None, None
        for f in glob.glob(os.path.join(t.path, dirname, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            los = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
            his = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
            spans.append(max(his) - min(los))
            lo_all = min(los) if lo_all is None else min(lo_all, *los)
            hi_all = max(his) if hi_all is None else max(hi_all, *his)
        return (sum(spans) / len(spans)) / max(hi_all - lo_all, 1)

    # user_id file spans: ~1/slices in the by_user copy (4 slices on the
    # local[4] test session), near-full in primary
    assert span("by_user", "user_id") <= 0.3
    assert span("primary", "user_id") > 0.8
    assert span("by_user", "user_id") < span("primary", "user_id") / 2


def test_insert_keeps_per_file_sort(spark, table):
    t, df = table
    t.insert(df.filter(F.col("event_id") < 100))
    back = t.read_for(spark, ["user_id"])
    assert back.count() == 20_100
    # every file in the by_user copy is internally sorted on user_id
    for f in glob.glob(os.path.join(t.path, "by_user", "*.parquet")):
        vals = [r["user_id"] for r in spark.read.parquet(f).select("user_id").collect()]
        assert vals == sorted(vals)


def test_primary_required():
    with pytest.raises(ValueError):
        ProjectedTable("/tmp/x", {"by_user": ["user_id"]})


def test_optimize_restores_slice_layout_and_routing(spark, table):
    """VERDICT r6 #7: after inserts fragment each copy, optimize() must
    collapse it back to one range-sliced sorted file family — per-file
    disjoint slices, in-file sort, identical rows, routing intact."""
    t, df = table
    for k in range(3):
        t.insert(df.filter(F.col("event_id").between(k * 100, k * 100 + 99)))
    files_before = len(glob.glob(os.path.join(t.path, "by_user", "*.parquet")))
    rows_before = t.read_for(spark, ["user_id"]).count()

    t.optimize(spark, files=4)

    files_after = glob.glob(os.path.join(t.path, "by_user", "*.parquet"))
    assert len(files_after) == 4 < files_before
    assert t.read_for(spark, ["user_id"]).count() == rows_before
    # per-file disjoint user_id slices (the range layout) + in-file sort
    spans = []
    for f in files_after:
        vals = [r["user_id"] for r in spark.read.parquet(f).select("user_id").collect()]
        assert vals == sorted(vals)
        spans.append((vals[0], vals[-1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo
    # routing still serves the same rows through the rewritten copy
    routed = t.read_for(spark, ["user_id"]).filter(F.col("user_id") == 7)
    plain = spark.read.parquet(os.path.join(t.path, "primary")).filter(
        F.col("user_id") == 7
    )
    assert sorted(r["event_id"] for r in routed.collect()) == sorted(
        r["event_id"] for r in plain.collect()
    )
