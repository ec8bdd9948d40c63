"""ANN quality contracts (the accuracy sibling of the HLL error-bound
test): the approximate indexes must (a) retrieve PLANTED near-duplicates —
the case ANN exists for — and (b) beat the examined-fraction chance
baseline on structureless data.

The driver fixtures' embeddings are random vectors with no neighborhood
structure, so recall vs brute force there is inherently bounded by the
fraction of the corpus each probe examines (LSH: ~1/2^planes of the corpus
per bucket; IVF: ~nprobe/num_cells) — measured ~2x those chance floors at
the gate parameters.  Planting an exact-direction duplicate restores the
structured case: a scaled copy has cosine 1.0 and, because both the
hyperplane sign bits and the cell-assignment cosines are scale-invariant,
provably lands in the same bucket/cell — so rank-1 retrieval is a hard
guarantee, not a probabilistic hope.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import similarity as S

DIM = 16
CORPUS = 400
N_QUERIES = 8
PLANT_BASE = 10_000


def _fixture(spark):
    """Deterministic corpus + one scaled near-duplicate per query vector."""
    rng = random.Random(42)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(CORPUS)
    ]
    # queries are corpus vectors 0..N_QUERIES-1; plant v * 0.5 (cosine 1.0)
    rows += [
        (PLANT_BASE + i, [0.5 * x for x in rows[i][1]]) for i in range(N_QUERIES)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    return corpus, queries


def test_planted_near_duplicates_are_rank1_in_both_indexes(spark):
    corpus, queries = _fixture(spark)
    for build in (
        lambda: S.rp_lsh_ann_topk(corpus, queries, k=3, num_planes=4, dim=DIM),
        lambda: S.ivf_topk(corpus, queries, k=3, dim=DIM, target_centroids=16),
    ):
        top1 = {
            r["query_id"]: (r["neighbor_id"], r["cos_sim"])
            for r in build().collect()
            if r["rank"] == 1
        }
        assert len(top1) == N_QUERIES
        for q in range(N_QUERIES):
            nid, cos = top1[q]
            assert nid == PLANT_BASE + q, f"query {q}: rank-1 was {nid}"
            assert abs(cos - 1.0) < 1e-9


def test_recall_beats_examined_fraction_on_structureless_data(spark, sf_dir):
    """On the random driver fixture, recall@10 vs brute force must exceed
    the chance floor set by the examined corpus fraction (LSH ~1/16 of the
    corpus per 4-plane bucket; IVF ~2/16 cells probed).  Measured ~0.11 /
    ~0.25 at the gate parameters; floors leave regression slack."""
    from apache_kafka_clickhouse_demo_spark import queries as Q

    all_queries = {**Q.QUERIES, **Q.EXTRA_QUERIES}
    exact = all_queries["ann_topk"](spark, sf_dir).select("query_id", "neighbor_id")
    total = exact.count()
    for name, floor in (("ann_lsh_topk", 0.085), ("ann_ivf_topk", 0.18)):
        approx = all_queries[name](spark, sf_dir).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
        recall = hits / total
        print(f"{name}: recall@10 = {recall:.3f}")
        assert recall >= floor, f"{name} recall {recall:.3f} under floor {floor}"


def test_sq8_planted_duplicate_rank1_and_topk_recall(spark):
    """Int8 quantization contracts: (a) a planted exact-direction duplicate
    (cosine 1.0) must still be rank 1 — quantization is scale-invariant on
    the normalized vector, so the planted copy quantizes IDENTICALLY to its
    original and its integer dot is the maximal self-dot; (b) against
    brute-force float top-k on structureless data, int8's ~2^-8 component
    error must keep recall@10 high — bound 0.8, measured well above."""
    corpus, queries = _fixture(spark)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.sq8_topk(corpus, queries, k=10).collect()
    }
    for qid in range(N_QUERIES):
        assert got[(qid, 1)] == PLANT_BASE + qid

    exact = S.brute_force_topk(corpus, queries, k=10).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for qid in range(N_QUERIES):
        approx = {n for (q, _rk), n in got.items() if q == qid}
        hits += len(approx & exact_sets[qid])
        total += len(exact_sets[qid])
    assert hits / total >= 0.8, f"sq8 recall@10 {hits}/{total}"


def test_two_level_assignment_identical_to_one_hop(spark, monkeypatch):
    """VERDICT r7 #5: the two-level (super-centroid pruned) assignment
    must make EXACTLY the one-hop decision — same centroid, same
    tie-break — for every vector, so every downstream oracle hash
    (ivf_topk, semantic_dedup) is unchanged.  Forced on by dropping the
    switch to 0; compared against the one-hop path on the same corpus
    with enough centroids for real multi-cell pruning."""
    corpus, _q = _fixture(spark)
    target = 64  # ~64 cells over 408 vectors: several centroids per cell

    cents, assign1 = S.ivf_quantize(
        corpus, target, "embedding", "vec_id", "ivf:", corpus_count=408
    )
    one_hop = {
        r["vid"]: r["cent_id"] for r in assign1.select("vid", "cent_id").collect()
    }

    monkeypatch.setattr(S, "_TWO_LEVEL_MIN_CENTROIDS", 0)
    _c2, assign2 = S.ivf_quantize(
        corpus, target, "embedding", "vec_id", "ivf:", corpus_count=408
    )
    two_level = {
        r["vid"]: r["cent_id"] for r in assign2.select("vid", "cent_id").collect()
    }
    assert two_level == one_hop
    assert len(one_hop) == 408  # every vector assigned


def test_two_level_ivf_topk_results_identical(spark, monkeypatch):
    """End-to-end: ivf_topk under the forced two-level assignment returns
    byte-identical rows to the one-hop plan (same cells probed, same
    rerank, same ranks)."""
    corpus, queries = _fixture(spark)
    kw = dict(k=5, dim=DIM, target_centroids=64, nprobe=2, corpus_count=408)
    want = sorted(map(tuple, S.ivf_topk(corpus, queries, **kw).collect()))
    monkeypatch.setattr(S, "_TWO_LEVEL_MIN_CENTROIDS", 0)
    got = sorted(map(tuple, S.ivf_topk(corpus, queries, **kw).collect()))
    assert got == want


def test_margin_bitext_penalizes_hub_targets(spark):
    """The ratio margin's defining behavior (Artetxe & Schwenk): a HUB
    target — close to every source — scores a lower margin than a
    specific match of equal raw cosine, so the specific pair wins.  Two
    sources: src 0 has a dedicated near-duplicate target; src 1's best
    raw cosine is the hub that ALSO scores high against src 0.  Raw
    cosine would mine (1, hub); the margin must still mine (0, dedicated)
    and flag the hub pairing's margin below the dedicated pairing's."""
    from apache_kafka_clickhouse_demo_spark.operators.similarity import (
        margin_bitext,
    )

    src = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.99, 0.1, 0.0]),   # dedicated near-dup of src 0
            (11, [0.7, 0.7, 0.0]),    # hub: close to BOTH sources
            (12, [0.0, 0.0, 1.0]),    # filler
            (13, [0.1, 0.0, 0.9]),    # filler
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["src_id"]: (r["tgt_id"], r["margin"])
        for r in margin_bitext(src, corpus, k=2, threshold=0.0).collect()
    }
    assert got[0][0] == 10  # the dedicated match wins for src 0
    # and its margin beats the hub pairing src 1 is left with
    assert got[0][1] > got[1][1]


def test_diverse_sample_two_level_identical_to_one_hop(spark, monkeypatch):
    """VERDICT r10 #3: diverse_sample under the forced two-level
    quantizer returns byte-identical rows to the one-hop plan — the
    per-cell quota consumes only the assignment decision, so the
    two-level equality must survive the full composition (quantize ->
    stratified quota), not just the assignment."""
    from apache_kafka_clickhouse_demo_spark.operators import sampling

    corpus, _q = _fixture(spark)

    def rows(df):
        return sorted(
            (r["cent_id"], r["vec_id"], r["strat_rank"]) for r in df.collect()
        )

    one_hop = rows(sampling.diverse_sample(corpus, 2, target_centroids=64))
    monkeypatch.setattr(S, "_TWO_LEVEL_MIN_CENTROIDS", 0)
    two_level = rows(sampling.diverse_sample(corpus, 2, target_centroids=64))
    assert two_level == one_hop
    assert len({c for c, _, _ in one_hop}) > 10  # real multi-cell quota


def test_pq_planted_duplicate_rank1_and_recall(spark, sf_dir):
    """PQ-ADC contracts (r13): (a) a planted exact-direction duplicate
    normalizes to the identical vector, so every subvector takes the
    SAME code as its original and ADC(query, plant) is the minimal
    self-distance -> rank 1; (b) recall@10 vs brute force on the random
    gate fixture must clear a floor — PQ quantizes 8-dim subspaces to
    ~64 codes, far coarser than SQ8, so the floor is the approximate
    operator's honest level, not SQ8's 0.8."""
    corpus, queries = _fixture(spark)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.pq_adc_topk(
            corpus, queries, dim=DIM, k=10, m=4, target_codes=32
        ).collect()
    }
    for qid in range(N_QUERIES):
        assert got[(qid, 1)] == PLANT_BASE + qid

    from apache_kafka_clickhouse_demo_spark import queries as Q

    all_queries = {**Q.QUERIES, **Q.EXTRA_QUERIES}
    exact = all_queries["ann_topk"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    approx = all_queries["ann_pq_topk"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    total = exact.count()
    hits = exact.join(approx, ["query_id", "neighbor_id"]).count()
    recall = hits / total
    print(f"ann_pq_topk: recall@10 = {recall:.3f}")
    assert recall >= 0.3, f"pq recall {recall:.3f} under floor"


def test_ivfpq_planted_duplicate_rank1_and_probed_subset(spark, sf_dir):
    """IVF-PQ contracts (r13): (a) a planted exact-direction duplicate
    lands in its original's cell (scale-invariant assignment) AND takes
    identical codes -> rank 1; (b) its results are a SUBSET of plain
    PQ-ADC's candidate relation restricted to probed cells — per query
    every returned neighbor must also appear in that query's IVF cell
    probe (the pruning really prunes, scoring identical)."""
    corpus, queries = _fixture(spark)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.ivfpq_topk(
            corpus, queries, dim=DIM, k=10, m=4, target_codes=32,
            nprobe=2, target_centroids=16,
        ).collect()
    }
    for qid in range(N_QUERIES):
        assert got[(qid, 1)] == PLANT_BASE + qid

    from apache_kafka_clickhouse_demo_spark import queries as Q

    all_queries = {**Q.QUERIES, **Q.EXTRA_QUERIES}
    ivf = all_queries["ann_ivf_topk"](spark, sf_dir)
    ivfpq = all_queries["ann_ivfpq_topk"](spark, sf_dir)
    # same probe decisions: every IVF-PQ neighbor lives in a probed
    # cell, so it must appear among the IVF arm's CANDIDATES — checked
    # through the cell relation itself
    from apache_kafka_clickhouse_demo_spark.operators import similarity as SS

    emb = Q._t(spark, sf_dir, "embeddings")
    n = emb.count()
    cents, assign = SS.ivf_quantize(
        emb, Q.IVF_TARGET_CENTROIDS, "embedding", "vec_id", Q.IVF_SALT, n
    )
    q = emb.filter(F.col("vec_id") < Q.ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
    )
    probed = (
        ivfpq.select("query_id", F.col("neighbor_id").alias("vid"))
        .join(assign.select("vid", "cent_id"), "vid")
        .select("query_id", "cent_id")
        .distinct()
    )
    # each (query, cell) pair used by a returned neighbor must be one of
    # the query's nprobe probes — recompute them independently
    from pyspark.sql import Window as W

    from apache_kafka_clickhouse_demo_spark.functions import vectors as V

    qn = emb.filter(F.col("vec_id") < Q.ANN_NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), V.normalize("embedding").alias("qn")
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    probes = (
        qn.crossJoin(F.broadcast(cents))
        .select("query_id", "cent_id", V.dot("qn", "cv").alias("ccos"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= Q.IVF_NPROBE)
        .select("query_id", "cent_id")
    )
    stray = probed.join(probes, ["query_id", "cent_id"], "left_anti").count()
    assert stray == 0
