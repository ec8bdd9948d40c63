"""Plan lint over the whole gate registry: no query may ACCIDENTALLY plan a
cartesian product or a broadcast nested-loop join.

Value checks at sf0.01 cannot see an O(n²) join shape; this sweep can, for
every registered query at once.  Queries whose nested-loop is deliberate
and bounded are allow-listed with the reason inline.
"""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark import queries as Q
from apache_kafka_clickhouse_demo_spark.plans.explain import formatted_plan

# Queries that EXECUTE work at build time (streaming checkpoints, table
# writes) — their plans are exercised by their own dedicated tests.
_SKIP = {
    "mv_cascade_attendance",
    "mv_cascade_daily",
    "attendance_daily_compacted",
    "stream_dedup",
    "stream_near_dup",  # streaming build; per-block plans linted via dedup ops
    "stream_embed_near_dup",  # streaming build, same rationale
    "replacing_latest",  # writes+compacts a table at build; op plans in tests/test_mergetree_engines.py
    "collapsing_balance",  # same (VersionedCollapsing round trip)
    "replacing_deletes",  # same (Replacing(ver, is_deleted) round trip)
    "ttl_cleanup",  # same (TTL partition-drop round trip)
    "projection_routing",  # same (projection fan-out write); tests/test_projections.py
    "stream_funnel",  # streaming drain; fold linted via funnel_levels + stateful tests
    "stream_topk",  # streaming drain; sketch plan linted via top_users_sketch
    "stream_top_spenders",  # streaming drain; weighted sketch plan linted via top_users_weighted
    "stream_range_counts",  # streaming drain; dyadic grid plan linted via dyadic_range_counts
    "stream_sample",  # streaming drain; bottom-k rank plan is a TakeOrdered by construction
    "stream_index_bm25",  # streaming drain (feed -> index segments); lookup plan linted via bm25_indexed
    "phrase_indexed",  # builds+commits the index at query build; scan twin (phrase_search) is linted
    "ann_indexed",  # builds+commits the IVF index at query build; scan twin (ann_ivf_topk) is linted
    "ann_indexed_grown",  # same: builds + extends the IVF index at query build
    "ann_indexed_reclustered",  # same: builds + extends + reclusters at query build; lookup plan linted via ann_ivf_topk
    "ann_indexed_refined",  # same: builds + commits the trained-quantizer index at query build (r15); Lloyd plan linted via kmeans_clusters, lookup via ann_ivf_topk
    "stream_index_ann",  # streaming drain (feed -> ANN segments); lookup plan linted via ann_ivf_topk
    "stream_cms_counts",  # streaming drain (feed -> counter store); sketch lookup plan linted via cms_user_counts
    "stream_uniq_users",  # streaming drain (feed -> HLL state store); uniqMerge read linted via uniq_users_approx
    "stream_strat_sample",  # streaming drain (feed -> generational per-group bottom-k store); quota plan linted via sample_stratified
    "stream_token_cap",  # streaming drain (feed -> per-domain token-charge counters, r15); cumsum plan linted via domain_token_cap
}

# Deliberate, bounded nested-loop/cross shapes (reason must hold at scale):
_NESTED_LOOP_OK = {
    "ann_topk",  # brute-force baseline: corpus x broadcast(bounded query set)
    "margin_bitext",  # corpus x broadcast(bounded 16-vector mining batch); ann_topk's class
    "ann_sq8_topk",  # same shape over int8-quantized vectors
    "ann_ivf_topk",  # corpus x broadcast(fixed-target centroid table)
    "tfidf_top_terms",  # per-term rows x broadcast(1-row corpus-count agg)
    "text_prep",  # same tfidf stage: per-term rows x broadcast(1-row count agg)
    "top_users_sketch",  # survivor counters x broadcast(1-row total-error agg)
    "top_users_weighted",  # same finalize tail: survivors x broadcast(1-row error agg)
    "unigram_rarity",  # token occurrences x broadcast(1-row corpus-total agg); same class as tfidf_top_terms
    "bigram_rarity",  # bigram occurrences x broadcast(1-row corpus-total agg); same class as unigram_rarity
    "semantic_dedup",  # corpus x broadcast(fixed-target centroid table), like ann_ivf_topk
    "kmeans_clusters",  # per Lloyd round: corpus x broadcast(fixed-target centroid table), ann_ivf_topk's class; the mean aggregate is a key shuffle
    "diverse_sample",  # same shared quantizer: corpus x broadcast(fixed-target centroid table)
    "q11_important_parts",  # per-part values x broadcast(1-row scoped-total agg); inequality threshold keeps it a nested loop by construction
    "q22_global_sales_opportunity",  # customers x broadcast(1-row sum/count agg); same scalar-threshold class
    "bm25_search",  # matched (doc, term) rows x broadcast(1-row N/TOT corpus agg); same class as tfidf_top_terms
    "bm25_indexed",  # same scoring join (shared bm25_score_topk) fed from pruned posting reads
    "temperature_mixture",  # per-group weights x broadcast(1-row weight-total agg); same class as tfidf_top_terms
    "hybrid_rrf",  # its arms verbatim: ann_topk's corpus x broadcast(5-query set) + bm25_search's 1-row corpus agg
    "hard_negatives",  # the same two arms as hybrid_rrf (mining itself is a bounded anti-join)
    "hybrid_indexed",  # bm25_lookup's 1-row corpus-agg broadcast rides along (bm25_indexed's class)
    "perplexity_buckets",  # bigram_rarity's per-position rows x broadcast(1-row corpus-total agg)
    "ann_ivfpq_topk",  # probe selection: queries x broadcast(fixed-target centroid table), ann_ivf_topk's class (the PQ stages join on keys, no nested loop)
}

_ALL = {**Q.QUERIES, **Q.EXTRA_QUERIES}
_LINTABLE = sorted(k for k in _ALL if k not in _SKIP)


@pytest.mark.parametrize("name", _LINTABLE)
def test_no_accidental_quadratic_join(spark, sf_dir, name):
    plan = formatted_plan(_ALL[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    if name not in _NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin (not allow-listed)"
        )
