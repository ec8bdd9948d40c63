"""Plan-shape tripwires: properties that make queries viable at 100 TB.

Value checks at sf0.01 can't see a silent regression to full scans or
shuffle joins; these tests pin the physical plan (SURVEY.md §4)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark import queries as Q
from apache_kafka_clickhouse_demo_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    formatted_plan,
    scan_read_schema,
)


def test_events_range_predicate_pushed_to_scan(spark, sf_dir):
    """P3: the timestamp range filter reaches the (normalized) parquet scan."""
    assert_pushed_filters(Q.q_events_after(spark, sf_dir), "ts")


def test_events_scan_prunes_columns(spark, sf_dir):
    """A projection query must not drag the wide `props` JSON column
    through the scan."""
    schemas = "\n".join(scan_read_schema(Q.q_user_activity(spark, sf_dir)))
    assert "props" not in schemas
    assert "user_id" in schemas


def test_q3_q5_broadcast_dimensions(spark, sf_dir):
    assert_broadcast_join(Q.q3_shipping_priority(spark, sf_dir), expect=1)
    assert_broadcast_join(Q.q5_local_supplier_volume(spark, sf_dir), expect=3)


def test_lsh_dedups_have_no_cartesian(spark, sf_dir):
    """Every pairwise dedup op must plan equi-joins only — a nested-loop or
    cartesian plan is O(n^2) compares and dead at 100 TB."""
    for q in (
        Q.q_dedup_minhash_lsh,
        Q.q_dedup_simhash,
        Q.q_dedup_ngram_jaccard,
        Q.q_embedding_near_dup,
    ):
        df = q(spark, sf_dir)
        assert_no_cartesian(df)
        assert "BroadcastNestedLoopJoin" not in formatted_plan(df)


def test_topk_is_take_ordered(spark, sf_dir):
    """O1: ORDER BY ... LIMIT 1 plans as TakeOrderedAndProject, not a full
    global sort."""
    plan = formatted_plan(Q.q_latest_event(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_brute_force_topk_no_window_shuffle(spark, sf_dir):
    """The two-phase top-k must not plan a window over the scored corpus."""
    plan = formatted_plan(Q.q_ann_topk(spark, sf_dir))
    assert "Window" not in plan


def test_asof_join_single_exchange_no_join(spark, sf_dir):
    """The as-of join must plan as union + running window: zero join
    operators and exactly one shuffle for the window keys (a range/theta
    join here would be the O(n^2)-per-key scale-killer it exists to avoid).
    """
    plan = formatted_plan(Q.q_asof_last_purchase(spark, sf_dir))
    assert "Join" not in plan, plan
    # two hash exchanges total: one belongs to the right side's (user, ts)
    # pre-aggregate, one to the as-of window itself
    n = plan.count("Arguments: hashpartitioning")
    assert n == 2, f"expected 2 hash exchanges, got {n}\n{plan}"


def test_text_profile_is_single_pass_no_exchange(spark, sf_dir):
    """text_profile folds lang-ID + quality + token counts into one
    row-local projection: its plan must contain NO exchange and NO join —
    the whole profile runs at scan throughput."""
    plan = formatted_plan(Q.q_text_profile(spark, sf_dir).limit(10))
    body = plan.split("AdaptiveSparkPlan")[0] if "AdaptiveSparkPlan" in plan else plan
    assert "Exchange" not in body.replace("Exchange SinglePartition", ""), plan
    assert "Join" not in plan, plan


def test_user_cumulative_value_single_window_exchange(spark, sf_dir):
    """Running sum + lag/lead share one (user_id; ts, event_id) partition
    spec — the plan must carry exactly one hash exchange, not one per
    analytic column."""
    plan = formatted_plan(Q.q_user_cumulative_value(spark, sf_dir))
    n = plan.count("Arguments: hashpartitioning")
    assert n == 1, f"expected 1 hash exchange, got {n}\n{plan}"


def test_ivf_centroid_table_broadcasts(spark, sf_dir):
    """IVF assignment/probing must broadcast the (fixed-target-size)
    centroid table; a shuffled centroid join would defeat the design."""
    plan = formatted_plan(Q.q_ann_ivf_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_q17_broadcasts_both_small_sides(spark, sf_dir):
    """Q17 shape: the brand part-key list and the per-part threshold table
    must both broadcast — shuffling lineitem twice for them is the 100 TB
    failure mode."""
    assert_broadcast_join(Q.q17_small_quantity_revenue(spark, sf_dir), expect=2)


def test_spread_small_skips_already_shuffled_inputs(spark, sf_dir):
    """VERDICT r4 #4: spread_small's scan-stage contract — a frame whose
    plan already contains a repartition (or any shuffle-producing node) is
    passed through untouched; `inputFiles()` on such a frame reports leaf
    files and would otherwise trigger a redundant full exchange."""
    from apache_kafka_clickhouse_demo_spark.sources.tables import load_table, spread_small

    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism

    pre_spread = docs.repartition(target)
    assert spread_small(pre_spread) is pre_spread  # no new node at all

    aggregated = docs.groupBy("lang").count()
    assert spread_small(aggregated) is aggregated

    # scan-stage single-file input still gets spread (the whole point)
    spread = spread_small(docs)
    assert spread is not docs
    assert "Repartition" in spread._jdf.queryExecution().analyzed().toString()

    # ADVICE r5: shuffle-node WORDS in aliases/literals must not suppress
    # the spread — node names count only at tree-prefix position
    from pyspark.sql import functions as F

    aliased = docs.select(
        F.col("text").alias("Sort"), F.col("doc_id").alias("Join_key")
    )
    assert spread_small(aliased) is not aliased


def test_spread_small_registry_plans_have_no_double_exchange(spark, sf_dir):
    """No registered query stacks spread_small's repartition on an input
    that was already exchanged: at most one round-robin Exchange per scan
    leg means the guard held everywhere it is used."""
    import re

    all_queries = {**Q.QUERIES, **Q.EXTRA_QUERIES}
    for name in ("ann_topk", "dedup_minhash_lsh", "doc_fingerprint"):
        plan = formatted_plan(all_queries[name](spark, sf_dir))
        # RoundRobin exchanges stacked directly on one another would show as
        # consecutive Exchange RoundRobinPartitioning nodes in the tree
        assert not re.search(
            r"Exchange RoundRobinPartitioning[^\n]*\n\s*\+- Exchange", plan
        ), name


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Sequence packing must shuffle ONCE (on the bucket key): the
    per-bucket running-sum window and the within-partition sort add no
    further exchange — a second exchange would mean packing serializes
    through a global stream."""
    plan = formatted_plan(Q.QUERIES["pack_sequences"](spark, sf_dir))
    # formatted plans list every node twice (tree + numbered details);
    # count the numbered detail entries
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_tpch_semi_anti_shapes(spark, sf_dir):
    """r7 TPC-H completion: the quantifier queries must plan hash
    SEMI/ANTI joins (never a per-row subquery or nested loop), and the
    part dimensions broadcast."""
    plan = formatted_plan(Q.q20_promo_part_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    plan = formatted_plan(Q.q16_supplier_count_by_part(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    plan = formatted_plan(Q.q22_global_sales_opportunity(spark, sf_dir))
    assert "LeftAnti" in plan, plan


def test_q18_group_having_then_joins(spark, sf_dir):
    """Q18's big-order key set is a HAVING aggregate feeding equi-joins —
    no cartesian, and the final limit is planned as TakeOrdered."""
    df = Q.q18_large_volume_customers(spark, sf_dir)
    plan = formatted_plan(df)
    assert_no_cartesian(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_q19_single_join_with_disjunction(spark, sf_dir):
    """Q19's OR-of-conjunctions must stay ONE broadcast equi-join on
    partkey with the disjunction as a residual condition — not three
    unioned scans of lineitem."""
    plan = formatted_plan(Q.q19_discounted_revenue(spark, sf_dir))
    assert "Union" not in plan, plan
    assert_broadcast_join(Q.q19_discounted_revenue(spark, sf_dir), expect=1)
