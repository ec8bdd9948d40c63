"""connected_components: fixpoint label propagation on known graph shapes.

The oracle gate checks the end-to-end minhash->clusters pipeline; these pin
the operator itself on graphs with known components — including a long
chain, the worst case for propagation round count."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators.dedup import connected_components


def _run(spark, node_ids, pair_list):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc_id long")
    pairs = spark.createDataFrame(
        pair_list or [(None, None)], "id_a long, id_b long"
    ).filter(F.col("id_a").isNotNull())
    out = connected_components(nodes, pairs)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_clique_chain_and_singleton(spark):
    # clique {1,2,3}, chain 10-11-12-13, singleton 20
    got = _run(
        spark,
        [1, 2, 3, 10, 11, 12, 13, 20],
        [(1, 2), (1, 3), (2, 3), (10, 11), (11, 12), (12, 13)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-12: diameter 12, forces many propagation rounds
    n = 13
    got = _run(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_bridged_components_merge(spark):
    # two cliques joined by one bridge edge collapse to one component
    got = _run(
        spark,
        [1, 2, 5, 6],
        [(1, 2), (5, 6), (2, 5)],
    )
    assert got == {1: 1, 2: 1, 5: 1, 6: 1}


def test_semantic_dedup_empty_centroid_sample_keeps_corpus(spark):
    """A corpus whose deterministic hash-sample yields ZERO centroids must
    deduplicate nothing — not silently drop every row (the survivors
    anti-join the INPUT corpus, not the assignment table)."""
    from apache_kafka_clickhouse_demo_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    # an absurd corpus_count forces modulus ~6e7: no id passes the sample
    out = semantic_dedup(
        emb, threshold=0.5, target_centroids=16, corpus_count=1_000_000_000
    )
    assert [r["vec_id"] for r in out.collect()] == [0, 1, 2, 3, 4]


def test_cluster_representatives_best_score_wins_ties_on_id(spark):
    """Keep-the-best-copy policy: highest score wins per cluster, score
    ties break on smallest id, singletons keep themselves, and
    cluster_size counts members."""
    from apache_kafka_clickhouse_demo_spark.operators.dedup import (
        cluster_representatives,
    )

    labeled = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 8), (9, 8)],
        "doc_id long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5), (8, 4), (9, 4)],
        "doc_id long, score_milli long",
    )
    got = {
        r["cluster_id"]: (r["rep_doc_id"], r["cluster_size"], r["rep_score_milli"])
        for r in cluster_representatives(labeled, scored, wide=False).collect()
    }
    assert got == {1: (2, 3, 99), 7: (7, 1, 5), 8: (8, 2, 4)}


def test_kmeans_refine_trains_deterministically(spark):
    """kmeans_refine (r14): one Lloyd round on a hand fixture — two
    obvious 2-D blobs whose hash draw lands one centroid each — must
    pull each centroid to its blob's renormalized integer-micro mean
    and keep every member assigned; rounds are deterministic (same
    inputs -> bit-identical assignment), and an emptied cell vanishes
    rather than resurrecting."""
    from apache_kafka_clickhouse_demo_spark.operators.similarity import (
        kmeans_refine,
    )

    # blob A around (1, 0), blob B around (0, 1); ids chosen so the
    # hash draw (modulus n // k) samples at least one of each side is
    # fixture-dependent — use target_centroids = n so EVERY point
    # founds a centroid, then one round must collapse assignments to
    # the min-id argmax structure deterministically
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.95, 0.05]),
        (10, [0.0, 1.0]), (11, [0.1, 0.9]), (12, [0.05, 0.95]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1, a1 = kmeans_refine(emb, rounds=1, target_centroids=2)
    c2, a2 = kmeans_refine(emb, rounds=1, target_centroids=2)
    got1 = sorted((r["vid"], r["cent_id"]) for r in a1.collect())
    got2 = sorted((r["vid"], r["cent_id"]) for r in a2.collect())
    assert got1 == got2 and len(got1) == 6
    # every member lands with its own blob: no assignment crosses blobs
    blob = {v: ("A" if v < 10 else "B") for v, _ in got1}
    by_cent: dict = {}
    for v, c in got1:
        by_cent.setdefault(c, set()).add(blob[v])
    assert all(len(s) == 1 for s in by_cent.values()), by_cent
    # centroids are unit-norm after the integer-micro mean
    for r in c1.collect():
        n2 = sum(x * x for x in r["cv"])
        assert abs(n2 - 1.0) < 1e-9


def test_cluster_safe_split_is_cluster_atomic_and_deterministic(spark):
    """r15: every member of a near-dup component gets the SAME split
    (keyed on the component label), matching the driver-side h48 of
    that label; singletons split independently like a per-doc hash."""
    from apache_kafka_clickhouse_demo_spark.functions.hashing import py_h48
    from apache_kafka_clickhouse_demo_spark.operators.dedup import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in cluster_safe_split(docs, pairs, 50, "s:").collect()
    }
    # component atomicity
    assert out[0] == out[1] == out[2]
    assert out[4] == out[5]
    # labels are component minima; singletons are their own cluster
    assert out[0][0] == 0 and out[4][0] == 4
    for d in (3, 6, 7):
        assert out[d][0] == d
    # the bucket is exactly h48(salt || label) % 100 < pct
    for d, (label, split) in out.items():
        want = "train" if py_h48(f"s:{label}") % 100 < 50 else "test"
        assert split == want, (d, label)
