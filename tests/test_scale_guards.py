"""pin_wide / is_wide_source (r9): corpus-sized join sides must never be
broadcast off a static size estimate.

Background: Catalyst's size-only estimator shrinks corpus-sized aggregates
(distinct-window tables, vocabularies, per-doc signature tables) below any
broadcast threshold; at the 100x rehearsal that planned a >1 GiB broadcast
collect which aborted the driver (substring_dedup).  The guard consults the
SOURCE scan's size statistic — the one size Catalyst gets right — and pins
corpus-derived sides to shuffle joins above the bound, while a small source
keeps its (measured ~2x faster) broadcast plans.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import dedup, text_analysis
from apache_kafka_clickhouse_demo_spark.sources.tables import (
    WIDE_SOURCE_BYTES,
    is_wide_source,
    load_table,
    pin_wide,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _counts(df) -> tuple[int, int]:
    s = _plan(df)
    return (
        len(re.findall(r"BroadcastHashJoin", s)) // 2,
        len(re.findall(r"SortMergeJoin", s)) // 2,
    )


@pytest.fixture(scope="module")
def wide_docs(spark):
    """A frame whose OPTIMIZED-PLAN size statistic exceeds the bound
    without materializing anything: range stats are exact (8 B/row)."""
    n = 4 * WIDE_SOURCE_BYTES // 8  # 4x over the bound from the range alone
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    assert is_wide_source(df)
    return df


def test_is_wide_source_on_real_fixtures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert not is_wide_source(docs)  # test fixtures are far under the bound
    assert is_wide_source(docs, bound_bytes=1)  # bound is honoured


def test_pin_wide_is_identity_when_small(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    side = docs.groupBy("doc_id").count()
    assert pin_wide(side, False) is side
    # hinted frame still analyzes to the same schema
    assert pin_wide(side, True).schema == side.schema


@pytest.mark.parametrize(
    "op",
    [
        lambda d: text_analysis.substring_dedup(d, 13),
        lambda d: text_analysis.chunk_dedup(d, 8),
        lambda d: text_analysis.unigram_rarity(d),
        lambda d: text_analysis.tfidf_top_terms(d, k=1),
        lambda d: dedup.minhash_signatures(d),
        lambda d: dedup.minhash_lsh_pairs(d),
        lambda d: dedup.simhash_pairs(d),
        lambda d: dedup.ngram_jaccard_pairs(d),
        lambda d: dedup.containment_pairs(d),
    ],
    ids=[
        "substring",
        "chunk",
        "rarity",
        "tfidf",
        "minhash_sigs",
        "minhash_pairs",
        "simhash_pairs",
        "ngram_pairs",
        "containment",
    ],
)
def test_wide_source_plans_have_no_broadcast_joins(wide_docs, op):
    """Above the bound every corpus-derived join side is pinned: zero
    BroadcastHashJoins in the whole plan (these operators broadcast
    nothing legitimately — no centroid tables or 1-row totals as JOIN
    builds; tfidf's 1-row corpus count rides an explicit crossJoin
    broadcast, which is a BroadcastNestedLoop, not a hash join)."""
    bhj, smj = _counts(op(wide_docs))
    assert bhj == 0
    assert smj >= 1  # the joins still exist, as shuffle joins


def test_small_source_keeps_broadcast_plans(spark, sf_dir):
    """Under the bound the un-hinted (measured-faster) broadcast plans
    survive — the guard must not tax test-scale runs."""
    docs = load_table(spark, sf_dir, "documents")
    bhj, _ = _counts(text_analysis.substring_dedup(docs, 13))
    assert bhj >= 1


def test_bcast_small_keeps_broadcasts_under_the_bound(spark, sf_dir):
    """bcast_small's small side (r10): at fixture scale the TPC-H dim
    broadcasts must SURVIVE — the guard degrades hints above the bound,
    it must not tax the measured-faster plans below it."""
    from apache_kafka_clickhouse_demo_spark import queries as Q

    # q5 moved to EXTRA_QUERIES in the r11 gate rotation; the plan under
    # test is the same either way
    q5 = {**Q.QUERIES, **Q.EXTRA_QUERIES}["q5_local_supplier_volume"]
    bhj, _ = _counts(q5(spark, sf_dir))
    assert bhj >= 3  # supp, nation, region(+filter) all stay broadcast


def test_bcast_small_pins_wide_sides(spark):
    """Above the bound bcast_small must MERGE-PIN (not merely un-hint):
    an un-hinted projection of a wide scan can shrink back under the
    auto-broadcast threshold and re-broadcast off the derived estimate."""
    from apache_kafka_clickhouse_demo_spark.sources.tables import bcast_small

    n = 4 * WIDE_SOURCE_BYTES // 8
    wide = spark.range(n).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    probe = spark.range(100).select(F.col("id").alias("k"))
    bhj, smj = _counts(probe.join(bcast_small(wide.select("k")), "k"))
    assert bhj == 0 and smj == 1
    # and under the bound the hint is a real broadcast
    small = spark.range(50).select(F.col("id").alias("k"))
    bhj2, _ = _counts(probe.join(bcast_small(small), "k"))
    assert bhj2 == 1
