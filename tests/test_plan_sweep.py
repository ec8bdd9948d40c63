"""Registry-wide broadcast-misplan sweep (r10, VERDICT r9 #3).

The r9 100x rehearsal caught Catalyst planning a >1 GiB broadcast collect
off a shrunken size estimate (substring_dedup), and an ad-hoc 117-query
plan sweep found six more latent cases of the same class.  This module
pins that sweep as a regression test over EVERY batch query in the gate
and extras registries: with every table source widened past
WIDE_SOURCE_BYTES, a query's plan may contain a BroadcastHashJoin ONLY if
its build side is bounded by construction (fixed query sets, <=m/64-row
bitmap words, day-grain calendars, 1-row scalars) — each such case is an
audited ALLOWED_BHJ entry.  Any future operator that broadcasts a
corpus-derived side (unpinned aggregate, explicit hint on a scaling
dimension) shows up as an unexplained BroadcastHashJoin and fails here.

Widening recipe: union each real fixture table with a runtime-empty pad
(`range(N).filter(id < 0)`) whose columns are DERIVED from `id` — derived,
not literal NULLs, because a NULL-literal pad folds to an empty relation
the moment a join pushes `isNotNull(key)` into it, collapsing the union
back to the small real table and silently disarming the whole sweep
(found while building this test).  Size-only estimation never shrinks a
Filter, so the pad keeps its `N * 8 B` range statistic: `is_wide_source`
sees a wide scan, while every query computes its real fixture answer.

The r10 sweep this test bakes in found two real latent misplans, both
fixed alongside it: text_prep handed tfidf_top_terms a DERIVED
(anti-joined) frame whose shrunken estimate disarmed the operator's
is_wide_source pin (fixed by threading the caller's source-computed flag),
and every TPC-H dim broadcast was an unconditional F.broadcast on a
dimension that scales with SF — a guaranteed driver OOM at 100 TB, now
`bcast_small` (sources/tables.py), which keeps the measured-fast broadcast
under the bound and degrades to a shuffle join above it.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_kafka_clickhouse_demo_spark import queries as Q
from apache_kafka_clickhouse_demo_spark.sources import tables as TBL

SF_DIR = "/root/testdata/sf0.001"

# 64x over the wide bound from the range statistic alone — big enough that
# even a table pruned to ONE int column keeps a scan-rooted estimate above
# the session's 64 MB auto-broadcast threshold (at 4x, a pruned `region`
# estimated 48 MiB and Catalyst's broadcast of it was an HONEST mid-scale
# choice, not a misplan); derived aggregates still shrink under the
# threshold through stacked width ratios, which is the class this sweep
# exists to catch.  The pad is runtime-empty, so only queries with
# internal driver actions pay a (sub-second) scan-and-discard per action.
N_PAD = 64 * TBL.WIDE_SOURCE_BYTES // 8

#: Queries whose build step IS execution (streaming drains, sink-writing
#: round-trips): their join-side scale behavior is pinned by dedicated
#: tests (test_streaming_stateful/test_mergetree_engines/test_storage and
#: the measured drain profiles in SCALING.md), and running them here would
#: re-run checkpointed streams against widened feeds for no added plan
#: coverage.
EXECUTING = {
    "stream_dedup", "stream_sample", "stream_topk", "stream_funnel",
    "stream_near_dup", "stream_embed_near_dup", "stream_url_dedup",
    "stream_domain_cap",
    "mv_cascade_attendance", "mv_cascade_daily", "snapshot_changelog",
    "replacing_latest", "replacing_deletes", "collapsing_balance",
    "ttl_cleanup", "projection_routing", "attendance_daily_compacted",
    "shuffle_export", "entry_house_points", "entry_attendance",
    "extract_typed_events", "show_tables",
    # builds + commits the persisted inverted index at query build; its
    # pruned-read behavior and scan-path bit-identity are pinned by
    # tests/test_search_index.py, and the scan path itself IS swept
    # (bm25_search)
    "bm25_indexed",
    # streaming drain (checkpointed feed -> index segments); writer
    # exactly-once pinned in tests/test_streaming_stateful.py
    "stream_index_bm25",
    # builds + commits the index at query build, like bm25_indexed; the
    # scan-path twin (phrase_search) IS swept and bit-identity is pinned
    "phrase_indexed",
    # builds + commits the persisted IVF index at query build; scan twin
    # (ann_ivf_topk) is swept, bit-identity pinned
    "ann_indexed",
    # builds + extends the IVF index at query build (grown-index form)
    "ann_indexed_grown",
    # builds + extends + RECLUSTERS the index at query build (r12
    # generation swap); recluster semantics pinned in
    # tests/test_search_index.py, lookup plan swept via ann_ivf_topk
    "ann_indexed_reclustered",
    # builds + commits the TRAINED-quantizer index at query build (r15,
    # refine_rounds): the Lloyd-round plan is swept via kmeans_clusters,
    # the lookup via ann_ivf_topk; generation bit-identity pinned in
    # tests/test_search_index.py
    "ann_indexed_refined",
    # builds + commits BOTH persisted indexes at query build; each arm's
    # lookup plan is swept via its scan twin (bm25_search /
    # ann_ivf_topk) and the fuse is swept standalone via hybrid_rrf
    "hybrid_indexed",
    # streaming drain (feed -> ANN segments); fixed-centroid lookup
    # plan swept via ann_ivf_topk
    "stream_index_ann",
    # streaming drain (feed -> CMS counter store); the bounded-sketch
    # lookup plan is swept via the batch twin cms_user_counts, writer
    # exactly-once pinned in tests/test_streaming_stateful.py
    "stream_cms_counts",
    # streaming drain (feed -> HLL state store); the uniqMerge read
    # plan is swept via the batch twin uniq_users_approx, writer
    # exactly-once pinned in tests/test_streaming_stateful.py
    "stream_uniq_users",
    # streaming drain (feed -> MG summary store, weighted fold); the
    # weighted sketch plan is swept via the batch twin
    # top_users_weighted, writer machinery shared with stream_topk
    "stream_top_spenders",
    # streaming drain (feed -> dyadic CMS counter store); the bounded
    # grid lookup plan is swept via the batch twin dyadic_range_counts
    "stream_range_counts",
    # streaming drain (feed -> generational per-group bottom-k store);
    # the quota plan is swept via the batch twin sample_stratified
    "stream_strat_sample",
    # streaming drain (feed -> dyadic CMS store + live quantiles, r14);
    # the descent plan is swept via the batch twin sketch_quantiles
    "stream_sketch_quantiles",
    # build + commit the persisted IVFPQ index at query build (r14);
    # the serving plan is swept via the scan twin ann_ivfpq_topk,
    # bit-identity + pruned-read discipline pinned in
    # tests/test_search_index.py
    "ann_ivfpq_indexed",
    "ann_ivfpq_grown",
    "ann_ivfpq_reclustered",
    # streaming drain (feed -> IVFPQ index segments, r14); lookup plan
    # swept via the scan twin ann_ivfpq_topk
    "stream_index_ivfpq",
    # streaming drain (feed -> per-domain token-charge counter store,
    # r15); the cumsum/prune plan is swept via the batch twin
    # domain_token_cap, writer exactly-once shares _DomainCapStreamWriter
    "stream_token_cap",
}

#: Audited bounded-by-construction broadcast builds (count per query).
#: Every entry names WHY the build side cannot grow with the corpus.
ALLOWED_BHJ = {
    # the ANN query side is ANN_NUM_QUERIES (=32) rows by construction
    "ann_lsh_topk": 1,
    # k=4 probe joins against the <=m_bits/64-row Bloom bitmap word table
    # (size fixed by the m_bits constructor argument, never by data)
    "bloom_decontaminate": 4,
    # day-grain calendar: bounded by the corpus TIME SPAN, not its size
    "daily_big_values_filled": 1,
    # 1-row scalar max (empty-grouping aggregate) joined on equality
    "q15_top_supplier": 1,
    # (a) the literal (query_id, term) table — fixed query set; (b) the
    # document-frequency aggregate, whose row count is bounded by the
    # literal `isin(query terms)` filter upstream (<= |query vocabulary|
    # rows at ANY corpus size), not by an estimate
    "bm25_search": 2,
    # (a) the candidate-target id set, <= |src batch| x k rows by the
    # top-k construction, joined back to the corpus; (b) the per-target
    # k-NN means over that same bounded candidate set
    "margin_bitext": 2,
    # the CMS counter grid: depth * width rows by CONSTRUCTION (the
    # grouping keys are hash buckets), whatever the corpus size
    "cms_user_counts": 1,
    # the BM25 arm's two audited builds (bm25_search's entry verbatim —
    # the fuse itself joins nothing corpus-sized: its whole input is
    # <= |queries| * k * n_arms rank rows); the ANN arm's bounded query
    # broadcast is a BroadcastNestedLoopJoin, not a BHJ
    "hybrid_rrf": 2,
    # same two arms; the hard-negative anti-join runs over the two
    # bounded top-k rank frames, not the corpus
    "hard_negatives": 2,
    # the dyadic cell grid: (levels+1) * depth * width rows by
    # CONSTRUCTION (cms_user_counts' class), joined to the literal
    # decomposition table
    "dyadic_range_counts": 1,
    # PQ-ADC's three builds, all bounded by the sampling/query-set
    # construction at ANY corpus size: (a) the per-subspace codebook
    # (expected m * target_codes rows — the hash-sample modulus scales
    # with the corpus, the IVF cents argument) joined to encode the
    # corpus, (b) the same codebook joined to build the query distance
    # table, (c) the distance table itself (<= |queries| * m *
    # codebook rows) joined against the long-form codes
    "ann_pq_topk": 3,
    # IVF-PQ: the same bounded PQ builds — codebook x 2 (encode +
    # distance table) + the distance-table join; the IVF probe side is
    # a BroadcastNestedLoopJoin (lint-audited), not a BHJ, and the
    # cell/candidate joins are key shuffles
    "ann_ivfpq_topk": 3,
}


def _synth(dt: T.DataType):
    """A non-foldable, correctly-typed expression derived from `id`."""
    if isinstance(dt, T.ArrayType):
        return F.array(_synth(dt.elementType))
    if isinstance(dt, T.StructType):
        return F.struct(*[_synth(f.dataType).alias(f.name) for f in dt.fields])
    return F.col("id").cast(dt)


@pytest.fixture(scope="module", autouse=True)
def widened_loads(spark):
    """Patch BOTH load_table bindings (tables module + queries' import)
    to union every fixture table with the runtime-empty wide pad."""
    real_load = TBL.load_table

    def widened(spark_, sf_dir, name):
        real = real_load(spark_, sf_dir, name)
        pad = (
            spark_.range(N_PAD)
            .filter(F.col("id") < 0)
            .select(*[_synth(f.dataType).alias(f.name) for f in real.schema.fields])
        )
        wide = real.unionByName(pad)
        assert TBL.is_wide_source(wide), name
        return wide

    TBL.load_table = widened
    Q.load_table = widened
    try:
        yield
    finally:
        TBL.load_table = real_load
        Q.load_table = real_load


def _counts(df) -> dict[str, int]:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    # "formatted" names each node twice: once in the tree, once in details
    return {
        k: len(re.findall(p, s)) // 2
        for k, p in {
            "bhj": r"BroadcastHashJoin",
            "cartesian": r"CartesianProduct",
        }.items()
    }


SWEEP = sorted(set({**Q.QUERIES, **Q.EXTRA_QUERIES}) - EXECUTING)


@pytest.mark.parametrize("name", SWEEP)
def test_no_corpus_broadcast_under_wide_sources(spark, name):
    fn = {**Q.QUERIES, **Q.EXTRA_QUERIES}[name]
    c = _counts(fn(spark, SF_DIR))
    assert c["cartesian"] == 0, f"{name}: cartesian product in plan"
    allowed = ALLOWED_BHJ.get(name, 0)
    assert c["bhj"] == allowed, (
        f"{name}: {c['bhj']} BroadcastHashJoin(s) under wide sources, "
        f"{allowed} audited as bounded-by-construction — a new broadcast "
        f"build must be pinned (pin_wide / bcast_small) or audited into "
        f"ALLOWED_BHJ with its boundedness argument"
    )


def test_sweep_covers_every_registry_entry():
    """The EXECUTING skip list must not silently absorb new queries:
    every registry entry is either swept or explicitly skip-listed, and
    every skip-list / allowlist name still exists."""
    reg = set({**Q.QUERIES, **Q.EXTRA_QUERIES})
    assert EXECUTING <= reg, EXECUTING - reg
    assert set(ALLOWED_BHJ) <= reg, set(ALLOWED_BHJ) - reg
    assert set(SWEEP) | EXECUTING == reg
