"""Persisted inverted index (operators/search_index.py) contracts:

- bm25_lookup over the built index is BIT-IDENTICAL to the scan-based
  bm25_topk on the same corpus and queries (they share bm25_score_topk;
  this pins that the index's tf/dl/df/meta reproduce the scan's inputs);
- term_lookup returns exactly the scan-derived (term, doc_id, tf, dl)
  postings, reading ONLY the shards the query terms hash to (files-read
  assertion via the inputFiles of the pruned scan);
- postings and the meta row publish in ONE commit (a reader at any
  committed version sees both or neither);
- the hash-route modulus is stored data (meta row), correct even on a
  sparse index; rebuilding over an existing index raises (build-once).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.operators import search_index as SI
from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA
from apache_kafka_clickhouse_demo_spark.sources.txlog import TransactionalTable

QUERIES = [(1, "fast hash join"), (2, "slow table scan")]


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bm25_lookup_bitidentical_to_scan_path(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)
    via_scan = [
        tuple(r)
        for r in TA.bm25_topk(docs, QUERIES, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    via_index = [
        tuple(r)
        for r in SI.bm25_lookup(spark, table, QUERIES, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert via_scan == via_index
    assert len(via_scan) > 0


def test_term_lookup_matches_scan_and_prunes_shards(spark, tmp_path):
    rows = [
        (1, "alpha beta alpha"),
        (2, "beta gamma"),
        (3, None),
        (4, "alpha delta delta delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)

    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in SI.term_lookup(spark, table, ["alpha", "delta"]).collect()
    }
    assert got == {
        ("alpha", 1): (2, 3),
        ("alpha", 4): (1, 4),
        ("delta", 4): (3, 4),
    }

    # files-read: the pruned scan's inputFiles sit ONLY under the two
    # terms' hash shards (plus nothing else — no meta, no other shards)
    want_shards = {f"t{H.py_h48(t) % 16}" for t in ("alpha", "delta")}
    scan = table.read_where(spark, "shard", sorted(want_shards))
    touched = {f.split("shard=")[1].split("/")[0] for f in scan.inputFiles()}
    assert touched <= want_shards
    # and the index is genuinely sharded (more than one shard on disk)
    all_shards = {f.split("shard=")[1].split("/")[0] for f in table.data_files()}
    assert len(all_shards) > 2


def test_postings_and_meta_publish_atomically(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y z z")], "doc_id long, text string"
    )
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)
    assert table.version() == 0  # ONE commit published everything
    meta = SI.index_meta(spark, table).collect()
    assert [(r["n_docs"], r["tot_tokens"]) for r in meta] == [(2, 5)]


def test_shard_count_is_stored_data_even_on_sparse_index(spark, tmp_path):
    """A 2-term corpus built at 64 shards occupies at most 2 shard
    directories — a layout-inferred modulus would mis-route later
    lookups (wrong shard, silently empty postings).  The meta row stores
    the true parameter, and lookups on the sparse index stay correct."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha")], "doc_id long, text string"
    )
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=64)
    assert SI.index_shard_count(spark, table) == 64
    got = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in SI.term_lookup(spark, table, ["alpha", "beta"]).collect()
    }
    assert got == {("alpha", 1): 1, ("alpha", 2): 1, ("beta", 1): 1}


def test_empty_queries_raise(spark, tmp_path):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)
    import pytest

    with pytest.raises(ValueError):
        SI.bm25_lookup(spark, table, [(1, " ")])


def test_rebuild_over_existing_index_raises(spark, tmp_path):
    """Build-once contract: a second build would publish a second meta
    row and doubled corpus stats would silently corrupt every later
    BM25 score — raise instead."""
    import pytest

    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)
    with pytest.raises(ValueError, match="already built"):
        SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)


def test_extend_segments_equal_one_shot_scan(spark, tmp_path):
    """Lucene-segment contract: an index built from corpus half A then
    extended with half B answers BM25 bit-identically to the scan path
    over A union B — per-segment meta rows sum to exact corpus stats and
    df aggregates across segments."""
    rows_a = [(1, "fast join table"), (2, "fast fast hash")]
    rows_b = [(3, "hash join join"), (4, "slow scan fast")]
    a = spark.createDataFrame(rows_a, "doc_id long, text string")
    b = spark.createDataFrame(rows_b, "doc_id long, text string")
    table = SI.build_term_index(a, str(tmp_path / "idx"), n_shards=16)
    SI.extend_term_index(b, table)
    assert table.version() == 1  # one commit per segment

    queries = [(1, "fast hash"), (2, "slow join")]
    via_index = [
        tuple(r)
        for r in SI.bm25_lookup(spark, table, queries, k=4)
        .orderBy("query_id", "rank")
        .collect()
    ]
    via_scan = [
        tuple(r)
        for r in TA.bm25_topk(a.unionByName(b), queries, k=4)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert via_index == via_scan and len(via_scan) > 0

    meta = SI.index_meta(spark, table).first()
    assert (meta["n_docs"], meta["tot_tokens"], meta["n_shards"]) == (4, 12, 16)


def test_maintenance_compacts_to_one_file_per_shard(spark, tmp_path):
    """After 3 segments, a shard touched by all three carries 3 files;
    maintain_term_index compacts to ONE file per shard while lookups,
    meta sums, and BM25 answers stay identical."""
    parts = [
        [(1, "fast join"), (2, "fast hash")],
        [(3, "fast scan")],
        [(4, "fast slow")],
    ]
    frames = [
        spark.createDataFrame(p, "doc_id long, text string") for p in parts
    ]
    table = SI.build_term_index(frames[0], str(tmp_path / "idx"), n_shards=16)
    for f in frames[1:]:
        SI.extend_term_index(f, table)

    before = [
        tuple(r)
        for r in SI.bm25_lookup(spark, table, [(1, "fast hash")], k=4)
        .orderBy("rank")
        .collect()
    ]
    shard_files: dict[str, int] = {}
    for f in table.data_files():
        s = f.split("shard=")[1].split("/")[0]
        shard_files[s] = shard_files.get(s, 0) + 1
    assert max(shard_files.values()) >= 3  # 'fast' shard touched 3x

    SI.maintain_term_index(spark, table)
    shard_files = {}
    for f in table.data_files():
        s = f.split("shard=")[1].split("/")[0]
        shard_files[s] = shard_files.get(s, 0) + 1
    assert max(shard_files.values()) == 1

    after = [
        tuple(r)
        for r in SI.bm25_lookup(spark, table, [(1, "fast hash")], k=4)
        .orderBy("rank")
        .collect()
    ]
    assert before == after
    meta = SI.index_meta(spark, table).first()
    assert (meta["n_docs"], meta["n_shards"]) == (4, 16)


def test_phrase_lookup_bitidentical_to_scan_path(spark, sf_dir, tmp_path):
    """Index-backed positional phrase search equals the scan-based
    phrase_matches on the fixture corpus — including an overlapping
    phrase, a repeated-term phrase, and a no-match phrase."""
    docs = _docs(spark, sf_dir)
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)
    phrases = [(1, "table hash"), (2, "the the"), (3, "no such phrase")]
    via_scan = sorted(
        tuple(r) for r in TA.phrase_matches(docs, phrases).collect()
    )
    via_index = sorted(
        tuple(r) for r in SI.phrase_lookup(spark, table, phrases).collect()
    )
    assert via_scan == via_index


def test_phrase_lookup_overlaps_and_repeats(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x a b y a b"), (3, "b a")],
        "doc_id long, text string",
    )
    table = SI.build_term_index(docs, str(tmp_path / "idx"), n_shards=16)
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in SI.phrase_lookup(
            spark, table, [(1, "a a"), (2, "a b")]
        ).collect()
    }
    assert got == {(1, 1): 2, (2, 1): 1, (2, 2): 2}


def test_ann_index_lookup_bitidentical_to_scan_ivf(spark, tmp_path):
    """The persisted ANN index answers bit-identically to the scan-based
    ivf_topk on the embeddings fixture (shared quantizer at build,
    shared ivf_probe_topk at query)."""
    from apache_kafka_clickhouse_demo_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    table = SI.build_ann_index(
        emb, str(tmp_path / "ann"), target_centroids=16, n_shards=8
    )
    via_scan = [
        tuple(r)
        for r in SIM.ivf_topk(
            emb, queries, k=5, dim=64, target_centroids=16, nprobe=2
        ).collect()
    ]
    via_index = [
        tuple(r)
        for r in SI.ann_index_lookup(spark, table, queries, k=5, nprobe=2)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert via_scan == via_index and len(via_scan) > 0

    # pruned read: the probe shards are a strict subset of the
    # assignment shards on disk for nprobe=2 over 8 queries
    all_shards = {
        f.split("shard=")[1].split("/")[0]
        for f in table.data_files()
        if "shard=v" in f
    }
    assert len(all_shards) >= 2


def test_ann_index_build_once(spark, tmp_path):
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    SI.build_ann_index(emb, str(tmp_path / "ann"), target_centroids=2, n_shards=4)
    with pytest.raises(ValueError, match="already built"):
        SI.build_ann_index(
            emb, str(tmp_path / "ann"), target_centroids=2, n_shards=4
        )


def test_time_travel_reads_pre_extension_snapshot(spark, tmp_path):
    """version pins a committed snapshot: after an extension, a lookup
    at version 0 answers EXACTLY as the index did before the extension —
    the reproducible-retrieval contract, and the snapshot consistency
    bm25_lookup's version pin exists for (postings and corpus stats from
    ONE version, never straddling a concurrent commit)."""
    a = spark.createDataFrame(
        [(1, "fast join"), (2, "fast hash")], "doc_id long, text string"
    )
    b = spark.createDataFrame([(3, "fast slow")], "doc_id long, text string")
    table = SI.build_term_index(a, str(tmp_path / "idx"), n_shards=16)
    before = [
        tuple(r)
        for r in SI.bm25_lookup(spark, table, [(1, "fast")], k=5)
        .orderBy("rank")
        .collect()
    ]
    SI.extend_term_index(b, table)
    at_v0 = [
        tuple(r)
        for r in SI.bm25_lookup(spark, table, [(1, "fast")], k=5, version=0)
        .orderBy("rank")
        .collect()
    ]
    now = SI.bm25_lookup(spark, table, [(1, "fast")], k=5).orderBy("rank").collect()
    assert at_v0 == before
    assert len(now) == 3 and len(at_v0) == 2
    meta_v0 = SI.index_meta(spark, table, version=0).first()
    assert (meta_v0["n_docs"], meta_v0["tot_tokens"]) == (2, 4)


def _emb_fixture(spark, n=40, dim=8):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_extend_ann_index_fixed_centroid_equivalence(spark, tmp_path):
    """GROWN index (build A + extend B) answers identically to a lookup
    over the SAME index before/after manual reconstruction of its
    semantics: every vector assigned against the FOUNDING segment's
    centroids.  Verified against a direct one-hop assignment of A union B
    to the stored centroids (the operator's stated contract), plus the
    segment-meta algebra (n_vecs sums, n_shards invariant)."""
    from apache_kafka_clickhouse_demo_spark.functions import vectors as V
    from apache_kafka_clickhouse_demo_spark.operators import similarity as SIM

    emb = _emb_fixture(spark)
    a = emb.filter(F.col("vec_id") % 4 != 3)
    b = emb.filter(F.col("vec_id") % 4 == 3)
    table = SI.build_ann_index(a, str(tmp_path / "ann"), target_centroids=8, n_shards=4)
    SI.extend_ann_index(b, table)

    n_vecs, n_shards = SI.ann_index_meta(spark, table)
    assert (n_vecs, n_shards) == (40, 4)

    cents = table.read_where(spark, "shard", ["cent"]).select("cent_id", "cv")
    vecs = emb.select(
        F.col("vec_id").alias("vid"), V.normalize("embedding").alias("nv")
    )
    want = {
        r["vid"]: r["cent_id"]
        for r in SIM._assign_one_hop(vecs, cents).collect()
    }
    stored = {
        r["vid"]: r["cent_id"]
        for r in table.read(spark)
        .filter(F.col("shard").startswith("v"))
        .select("vid", "cent_id")
        .collect()
    }
    assert stored == want

    # time travel: version 0 is the founding segment alone
    n0, _ = SI.ann_index_meta(spark, table, version=0)
    assert n0 == 30
    q = emb.filter(F.col("vec_id") < 4)
    at_v0 = SI.ann_index_lookup(spark, table, q, k=3, nprobe=2, version=0)
    ids_v0 = {r["neighbor_id"] for r in at_v0.collect()}
    assert all(i % 4 != 3 for i in ids_v0)  # growth rows invisible at v0


def test_ann_index_meta_invariant_raises_on_corruption(spark, tmp_path):
    import pytest

    emb = _emb_fixture(spark, n=12)
    table = SI.build_ann_index(
        emb, str(tmp_path / "ann"), target_centroids=4, n_shards=4
    )
    # hand-corrupt: a second meta row with a different modulus
    bad = (
        table.read_where(spark, "shard", ["m"])
        .withColumn("n_shards", F.lit(8).cast("long"))
    )
    table.append(bad, partition_by="shard")
    with pytest.raises(ValueError, match="disagree"):
        SI.ann_index_meta(spark, table)


def test_extend_ann_index_txn_replay_is_noop(spark, tmp_path):
    emb = _emb_fixture(spark, n=20)
    a = emb.filter(F.col("vec_id") < 15)
    b = emb.filter(F.col("vec_id") >= 15)
    table = SI.build_ann_index(a, str(tmp_path / "ann"), target_centroids=4, n_shards=4)
    SI.extend_ann_index(b, table, txn="w:1")
    v = table.version()
    SI.extend_ann_index(b, table, txn="w:1")  # replay: no-op
    assert table.version() == v
    assert SI.ann_index_meta(spark, table)[0] == 20


def test_build_ann_index_rejects_empty_centroid_sample(spark, tmp_path):
    """A founding segment whose hash sample yields zero centroids must
    raise at build — a persisted index with no centroids would silently
    answer nothing forever (centroids are fixed at creation)."""
    import pytest

    # one vector, huge modulus (corpus_count >> n with small target):
    # the single vid's hash is astronomically unlikely to be 0 mod 10^6;
    # pick an id verified NOT to sample (deterministic h48)
    from apache_kafka_clickhouse_demo_spark.functions.hashing import py_h48

    vid = next(i for i in range(100) if py_h48(f"ivf:{i}") % 1_000_000 != 0)
    emb = spark.createDataFrame(
        [(vid, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero centroids"):
        SI.build_ann_index(
            emb,
            str(tmp_path / "ann"),
            target_centroids=2,
            n_shards=4,
            corpus_count=2_000_000,
        )


def test_maintain_ann_index_recluster_founds_new_generation(spark, tmp_path):
    """recluster=True (r12): after drift (found on A, extend with B),
    founding a new centroid generation over ALL segments with the same
    salt/K answers IDENTICALLY to a from-scratch build on A union B —
    the oracle-exactness contract — while the stored shard modulus and
    total n_vecs survive, the meta collapses to one segment row, and
    the PRE-recluster version stays time-travelable (the generation
    swap is a replace-commit, not a destructive rewrite)."""
    emb = _emb_fixture(spark)
    a = emb.filter(F.col("vec_id") % 4 != 3)
    b = emb.filter(F.col("vec_id") % 4 == 3)
    table = SI.build_ann_index(a, str(tmp_path / "ann"), target_centroids=8, n_shards=4)
    SI.extend_ann_index(b, table)
    q = emb.filter(F.col("vec_id") < 6)

    pre_version = table.version()
    pre = [
        tuple(r)
        for r in SI.ann_index_lookup(spark, table, q, k=3, nprobe=2)
        .orderBy("query_id", "rank")
        .collect()
    ]

    v = SI.maintain_ann_index(
        spark, table, recluster=True, target_centroids=8
    )
    assert v == pre_version + 1

    fresh = SI.build_ann_index(
        emb, str(tmp_path / "fresh"), target_centroids=8, n_shards=4
    )
    want = [
        tuple(r)
        for r in SI.ann_index_lookup(spark, fresh, q, k=3, nprobe=2)
        .orderBy("query_id", "rank")
        .collect()
    ]
    got = [
        tuple(r)
        for r in SI.ann_index_lookup(spark, table, q, k=3, nprobe=2)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want and len(got) > 0
    # the generation actually CHANGED the answers on this drifted fixture
    # (otherwise a no-op maintenance would pass this test)
    assert got != pre

    # stats survive: n_vecs preserved, modulus unchanged, ONE meta row
    n_vecs, n_shards = SI.ann_index_meta(spark, table)
    assert (n_vecs, n_shards) == (40, 4)
    meta_rows = table.read_where(spark, "shard", ["m"]).count()
    assert meta_rows == 1

    # pre-recluster generation stays time-travelable
    at_pre = [
        tuple(r)
        for r in SI.ann_index_lookup(
            spark, table, q, k=3, nprobe=2, version=pre_version
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert at_pre == pre


# ---------------------------------------------------------------------------
# Persisted IVF-PQ index (r14, VERDICT r13 #4)
# ---------------------------------------------------------------------------


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivfpq_index_lookup_bitidentical_to_scan(spark, tmp_path):
    """The persisted IVFPQ index answers bit-identically to the
    scan-based ivfpq_topk on the same corpus (shared ivf_quantize +
    pq_codes at build, shared _adc_rank_topk at query) — AND the
    serving read touches only the probed cells' shards."""
    from apache_kafka_clickhouse_demo_spark.operators import similarity as SIM

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    table = SI.build_ivfpq_index(
        emb, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
        target_centroids=16, n_shards=8,
    )
    via_scan = [
        tuple(r)
        for r in SIM.ivfpq_topk(
            emb, queries, dim=64, k=5, m=8, target_codes=64,
            nprobe=2, target_centroids=16,
        ).collect()
    ]
    via_index = [
        tuple(r)
        for r in SI.ivfpq_index_lookup(spark, table, queries, k=5, nprobe=2)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert via_scan == via_index and len(via_scan) > 0


def test_ivfpq_extend_fixed_generations(spark, tmp_path):
    """Extension assigns against the STORED centroids and encodes
    against the STORED codebooks: after extend, (a) every vector is in
    exactly one segment, (b) the grown index's code rows for the new
    vectors equal pq_encode against the founding codebook — nothing
    re-trained."""
    from apache_kafka_clickhouse_demo_spark.operators import similarity as SIM

    emb = _emb(spark)
    founding = emb.filter(F.expr("vec_id % 4 <> 3"))
    growth = emb.filter(F.expr("vec_id % 4 = 3"))
    table = SI.build_ivfpq_index(
        founding, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
        target_centroids=16, n_shards=8,
    )
    cb = table.read_where(spark, "shard", [SI.PQ_CB_SHARD]).select(
        F.col("sub_m").alias("m"), "code", "cv"
    )
    SI.extend_ivfpq_index(growth, table)
    vrows = table.read(spark).filter(F.col("shard").startswith("v"))
    n_total = emb.count()
    assert vrows.filter(F.col("sub_m").isNull()).count() == n_total
    assert vrows.filter(F.col("sub_m").isNotNull()).count() == n_total * 8
    stored_new = {
        (r["vid"], r["sub_m"]): r["code"]
        for r in vrows.filter(
            F.col("sub_m").isNotNull() & (F.col("vid") % 4 == 3)
        ).collect()
    }
    expected_new = {
        (r["vid"], r["m"]): r["code"]
        for r in SIM.pq_encode(growth, cb, dim=64, m=8).collect()
    }
    assert stored_new == expected_new and len(stored_new) > 0


def test_ivfpq_recluster_preserves_codes_and_rebuckets(spark, tmp_path):
    """recluster=True founds a new centroid generation but PQ codes are
    codebook-relative: every (vid, sub_m, code) row survives VERBATIM,
    the codebook shard is unchanged, and the collapsed index answers
    through the new cells."""
    emb = _emb(spark)
    founding = emb.filter(F.expr("vec_id % 4 <> 3"))
    growth = emb.filter(F.expr("vec_id % 4 = 3"))
    table = SI.build_ivfpq_index(
        founding, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
        target_centroids=16, n_shards=8,
    )
    SI.extend_ivfpq_index(growth, table)

    def codes_set(t):
        return {
            (r["vid"], r["sub_m"], r["code"])
            for r in t.read(spark)
            .filter(F.col("shard").startswith("v") & F.col("sub_m").isNotNull())
            .collect()
        }

    def cb_set(t):
        return {
            (r["sub_m"], r["code"], tuple(r["cv"]))
            for r in t.read_where(spark, "shard", [SI.PQ_CB_SHARD]).collect()
        }

    before_codes, before_cb = codes_set(table), cb_set(table)
    queries = emb.filter(F.col("vec_id") < 8)
    SI.maintain_ivfpq_index(spark, table, recluster=True, target_centroids=16)
    assert codes_set(table) == before_codes
    assert cb_set(table) == before_cb
    out = SI.ivfpq_index_lookup(spark, table, queries, k=5, nprobe=2)
    assert out.count() == 8 * 5
    # the new generation re-derived n_vecs over the FULL corpus
    n_vecs, n_shards, pq_m, dim = SI.ivfpq_index_meta(spark, table)
    assert (n_vecs, n_shards, pq_m, dim) == (emb.count(), 8, 8, 64)


def test_ivfpq_build_once_and_empty_guards(spark, tmp_path):
    import pytest

    emb = _emb(spark)
    SI.build_ivfpq_index(
        emb, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
        target_centroids=16, n_shards=8,
    )
    with pytest.raises(ValueError, match="already built"):
        SI.build_ivfpq_index(
            emb, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
            target_centroids=16, n_shards=8,
        )
    # an empty codebook draw must refuse to found the index: 3 vectors
    # at target_codes=64 -> modulus 1 samples everything, so force the
    # empty draw via an impossible salt-free path: modulus > n with a
    # salt that maps every (m, vid) off zero is fixture-dependent, so
    # instead found on an EMPTY frame — both guards fire on the
    # centroid draw first, which is the earlier (and equally durable)
    # refusal
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="zero centroids"):
        SI.build_ivfpq_index(
            empty, str(tmp_path / "ix2"), dim=64, m=8, target_codes=64,
            target_centroids=16, n_shards=8, corpus_count=10_000,
        )


def test_ivfpq_lookup_reads_prune_to_probed_shards(spark, tmp_path):
    """The serving read's inputFiles sit ONLY under the probed cells'
    v-shards plus the bounded cent/cb/meta shards — the O(nprobe)
    read-discipline assertion the term index pins, on the PQ side."""
    from apache_kafka_clickhouse_demo_spark.functions import vectors as V
    from pyspark.sql import Window

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 4)
    table = SI.build_ivfpq_index(
        emb, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
        target_centroids=16, n_shards=8,
    )
    version = table.version()
    _, n_shards, _, _ = SI.ivfpq_index_meta(spark, table, version=version)
    cents = table.read_where(spark, "shard", [SI.ANN_CENT_SHARD]).select(
        "cent_id", "cv"
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.normalize("embedding").alias("qn")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    probe_cells = {
        r["cent_id"]
        for r in q.crossJoin(F.broadcast(cents))
        .select("query_id", "cent_id", V.dot("qn", "cv").alias("ccos"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= 2)
        .collect()
    }
    allowed = {f"v{c % n_shards}" for c in probe_cells}
    pruned = table.read_where(spark, "shard", sorted(allowed), version=version)
    touched = {f.split("shard=")[1].split("/")[0] for f in pruned.inputFiles()}
    assert touched <= allowed and touched
    all_vshards = {
        f.split("shard=")[1].split("/")[0]
        for f in table.data_files()
        if "shard=v" in f
    }
    assert len(all_vshards) > len(allowed)  # pruning is real on this fixture


# ---------------------------------------------------------------------------
# r15 (VERDICT r14 #2): refine_rounds — the trained quantizer wired into
# the founding / recluster paths
# ---------------------------------------------------------------------------


def test_refined_founding_matches_kmeans_generation(spark, tmp_path):
    """build_ann_index(refine_rounds=R) stores EXACTLY the kmeans_refine
    generation (shared _lloyd_rounds by import), and ann_index_lookup
    over it answers bit-identically to ivf_probe_topk on that
    generation — the refined twin of the scan/index bit-identity
    contract."""
    from apache_kafka_clickhouse_demo_spark.functions import vectors as V
    from apache_kafka_clickhouse_demo_spark.operators import similarity as SIM

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    table = SI.build_ann_index(
        emb, str(tmp_path / "ann"), target_centroids=16, n_shards=8,
        refine_rounds=2,
    )
    cents, assign = SIM.kmeans_refine(emb, rounds=2, target_centroids=16)
    stored_cents = {
        (r["cent_id"], tuple(r["cv"]))
        for r in table.read_where(spark, "shard", [SI.ANN_CENT_SHARD]).select(
            "cent_id", "cv"
        ).collect()
    }
    trained_cents = {(r["cent_id"], tuple(r["cv"])) for r in cents.collect()}
    assert stored_cents == trained_cents and stored_cents
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.normalize("embedding").alias("qn")
    )
    via_scan = [
        tuple(r)
        for r in SIM.ivf_probe_topk(
            cents, assign.select(F.col("vid").alias("neighbor_id"), "nv", "cent_id"),
            q, k=5, nprobe=2,
        ).orderBy("query_id", "rank").collect()
    ]
    via_index = [
        tuple(r)
        for r in SI.ann_index_lookup(spark, table, queries, k=5, nprobe=2)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert via_scan == via_index and len(via_scan) > 0


def test_refined_recluster_trains_generation_codes_survive(spark, tmp_path):
    """maintain_ivfpq_index(recluster=True, refine_rounds=1): the code
    rows survive the trained generation swap verbatim (codebook-relative
    — no re-encode), the centroid set differs from the unrefined
    recluster (training did something), and with nprobe covering every
    cell the refined index answers EXACTLY like the unrefined one (cell
    membership only prunes; ADC scores are generation-independent)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 4)

    def build(path):
        return SI.build_ivfpq_index(
            emb, path, dim=64, m=8, target_codes=64,
            target_centroids=16, n_shards=8,
        )

    t_plain = build(str(tmp_path / "plain"))
    t_ref = build(str(tmp_path / "ref"))
    codes_before = {
        (r["vid"], r["sub_m"], r["code"])
        for r in t_ref.read(spark)
        .filter(F.col("shard").startswith("v") & F.col("sub_m").isNotNull())
        .select("vid", "sub_m", "code")
        .collect()
    }
    SI.maintain_ivfpq_index(spark, t_plain, recluster=True, target_centroids=8)
    SI.maintain_ivfpq_index(
        spark, t_ref, recluster=True, target_centroids=8, refine_rounds=1
    )
    codes_after = {
        (r["vid"], r["sub_m"], r["code"])
        for r in t_ref.read(spark)
        .filter(F.col("shard").startswith("v") & F.col("sub_m").isNotNull())
        .select("vid", "sub_m", "code")
        .collect()
    }
    assert codes_after == codes_before and codes_before
    cents_plain = {
        (r["cent_id"], tuple(r["cv"]))
        for r in t_plain.read_where(spark, "shard", [SI.ANN_CENT_SHARD])
        .select("cent_id", "cv").collect()
    }
    cents_ref = {
        (r["cent_id"], tuple(r["cv"]))
        for r in t_ref.read_where(spark, "shard", [SI.ANN_CENT_SHARD])
        .select("cent_id", "cv").collect()
    }
    assert cents_ref != cents_plain  # Lloyd moved the fresh draw
    # donor ids preserved: training renames nothing, only moves vectors
    assert {c for c, _ in cents_ref} <= {c for c, _ in cents_plain}
    nprobe_all = max(len(cents_plain), len(cents_ref))
    ans_plain = [
        tuple(r)
        for r in SI.ivfpq_index_lookup(
            spark, t_plain, queries, k=5, nprobe=nprobe_all
        ).orderBy("query_id", "rank").collect()
    ]
    ans_ref = [
        tuple(r)
        for r in SI.ivfpq_index_lookup(
            spark, t_ref, queries, k=5, nprobe=nprobe_all
        ).orderBy("query_id", "rank").collect()
    ]
    assert ans_plain == ans_ref and len(ans_plain) > 0


def test_extend_ivfpq_duplicate_vid_guard(spark, tmp_path):
    """ADVICE r14: extend_ivfpq_index(check_duplicates=True) refuses a
    segment whose vids are already indexed (duplicate code rows would
    double ADC sums at lookup); disjoint vids pass under the same
    flag."""
    import pytest

    emb = _emb(spark)
    founding = emb.filter(F.expr("vec_id % 4 <> 3"))
    growth = emb.filter(F.expr("vec_id % 4 = 3"))
    table = SI.build_ivfpq_index(
        founding, str(tmp_path / "ix"), dim=64, m=8, target_codes=64,
        target_centroids=16, n_shards=8,
    )
    with pytest.raises(ValueError, match="already in"):
        SI.extend_ivfpq_index(founding.limit(3), table, check_duplicates=True)
    SI.extend_ivfpq_index(growth, table, check_duplicates=True)
    n_meta = SI.ivfpq_index_meta(spark, table)[0]
    assert n_meta == emb.count()
