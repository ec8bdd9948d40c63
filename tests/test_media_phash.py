"""Perceptual-hash media dedup pins (r12): _fake_phash edge contract +
banded pair generation vs the naive all-pairs form (exactness is also
hash-checked cross-engine by the media_phash_dedup oracle row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import multimodal as MM


def test_fake_phash_edges_and_determinism():
    assert MM._fake_phash(None) is None
    assert MM._fake_phash(b"") is None
    h = MM._fake_phash(b"hello world, a modestly long blob" * 4)
    assert isinstance(h, int) and 0 <= h < (1 << MM.PHASH_BITS)
    assert h == MM._fake_phash(b"hello world, a modestly long blob" * 4)
    # uniform bytes: every band mass EQUALS the mean -> strict > fails
    # everywhere -> hash 0 (the ties -> 0 rule)
    assert MM._fake_phash(b"\x41" * (MM.PHASH_BITS * 3)) == 0


def test_banded_pairs_equal_naive_all_pairs(spark):
    """The pigeonhole chunk-join returns EXACTLY the naive all-pairs
    result on a corpus with planted near-identical blobs (the guarantee
    the oracle checks cross-engine, pinned here engine-side)."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (0, base),
        (1, base + "x"),              # near-identical byte mass
        (2, base.replace("quick", "QUICK")),
        (3, "completely different content with other bytes " * 9),
        (4, None),                     # NULL blob -> NULL phash -> no pairs
        (5, ""),                       # empty -> NULL phash -> no pairs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = MM.attach_media(docs)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in MM.media_phash_pairs(media).collect()
    }

    hashes = {
        r["doc_id"]: r["phash"] for r in MM.media_phash(media).collect()
    }
    want = set()
    ids = sorted(k for k, v in hashes.items() if v is not None)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= MM.PHASH_MAX_HAMMING:
                want.add((a, b, ham))
    assert got == want
    assert any(p[:2] == (0, 1) for p in got)  # the planted near-dup pair
    assert all(4 not in p[:2] and 5 not in p[:2] for p in got)


def test_phash_matches_pure_python_replica(spark):
    """Engine phash == an independent pure-Python blockhash replica on
    real fixture docs (band sums over utf-8 bytes, strict-majority
    bits)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    got = {
        r["doc_id"]: r["phash"]
        for r in MM.media_phash(MM.attach_media(docs)).collect()
    }
    for row in docs.collect():
        t = row["text"]
        if t is None or len(t.encode()) == 0:
            assert got[row["doc_id"]] is None
            continue
        b = t.encode()
        bands = [0] * MM.PHASH_BITS
        for i, byte in enumerate(b):
            bands[i % MM.PHASH_BITS] += byte
        total = sum(bands)
        want = 0
        for j in range(MM.PHASH_BITS):
            if bands[j] * MM.PHASH_BITS > total:
                want |= 1 << j
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_phash_clusters_bound_output_and_keep_largest(spark):
    """r13 (VERDICT r12 #4): the cluster/representative form emits ONE
    row per component — linear in docs however heavy the duplication —
    and keeps the LARGEST copy (ties -> smallest doc_id; NULL blobs
    score 0 and cluster alone)."""
    from apache_kafka_clickhouse_demo_spark.operators import dedup as DD
    from apache_kafka_clickhouse_demo_spark.sources.tables import is_wide_source

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (0, base),
        (1, base + "x"),               # near-dup of 0, one byte LARGER
        (2, base.replace("quick", "QUICK")),  # near-dup, same size as 0
        (3, "completely different content with other bytes " * 9),
        (4, None),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = MM.attach_media(docs)
    pairs = MM.media_phash_pairs(media)
    labeled = DD.connected_components(media.select("doc_id"), pairs)
    scored = media.select(
        "doc_id", F.coalesce(F.col("meta.n_bytes"), F.lit(0)).alias("n_bytes")
    )
    reps = {
        r["cluster_id"]: (r["rep_doc_id"], r["cluster_size"], r["rep_score_milli"])
        for r in DD.cluster_representatives(
            labeled, scored, is_wide_source(docs), score_col="n_bytes"
        ).collect()
    }
    # one row per component: {0,1,2} cluster + 3 singletons = 4 rows,
    # bounded by |docs| no matter how many pairs the clique produced
    assert len(reps) == 4
    assert reps[0] == (1, 3, len(base) + 1)  # largest copy wins
    assert reps[3] == (3, 1, len(rows[3][1]))
    assert reps[4] == (4, 1, 0)  # NULL blob scores 0
    assert reps[5] == (5, 1, 0)


def test_edges_preserve_components_with_linear_star_mass(spark):
    """r15 (VERDICT r14 #5): media_phash_edges' equal-phash star
    collapse + distinct-fingerprint pigeonhole pairs yield EXACTLY the
    connected components of the full verified pair graph, while the
    edge count stays linear in copies (a 6-copy class emits 5 star
    edges, never C(6,2)=15 pairs)."""
    from apache_kafka_clickhouse_demo_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = (
        [(i, base) for i in range(6)]                # 6 exact copies
        + [(6, base + "x")]                          # near-dup of the class
        + [(7, "completely different content with other bytes " * 9)]
        + [(8, None), (9, "")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = MM.attach_media(docs)
    edges = MM.media_phash_edges(media)
    edge_rows = {(r["id_a"], r["id_b"]) for r in edges.collect()}
    pair_rows = {
        (r["id_a"], r["id_b"]) for r in MM.media_phash_pairs(media).collect()
    }
    # the full listing is quadratic in the copy class; the edge set is not
    assert edge_rows < pair_rows or len(edge_rows) < len(pair_rows)
    nodes = docs.select("doc_id")
    via_edges = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(nodes, edges).collect()
    }
    via_pairs = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(
            nodes, MM.media_phash_pairs(media)
        ).collect()
    }
    assert via_edges == via_pairs
    # the copy class connected through its min-doc rep, near-dup included
    assert {(i, 0) for i in range(7)} <= via_edges
