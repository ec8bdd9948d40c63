"""Adversarial skew fixtures (VERDICT r4 #2): the 100 TB claims that were
previously argued in docstrings, executed.

Three hazards, one test each:
- a duplicate CLIQUE: every member of an identical-document group lands in
  the same LSH band bucket, so the candidate join's key distribution is
  maximally skewed AND its output is inherently quadratic in the clique
  size (C(n,2) true pairs — that is the answer, not an artifact).  AQE
  skew-join (on in session config) splits the hot bucket; the test pins
  completion and the exact pair count.
- a PATH graph: the worst diameter for label propagation.  Plain neighbor
  propagation needs ~n rounds on an n-node path; pointer jumping doubles
  reach per round, needing ~log2(n).  Running with max_iter far below n
  proves the jump engages (connected_components raises on non-convergence
  by design).
- a HOT as-of key: one key owning nearly all probe rows degrades the asof
  window to one sorted partition (the operator's documented failure mode —
  same as any keyed window).  The test pins that it still completes and
  answers exactly at 100k rows on one key.

Sizes are chosen so the adversarial structure is fully expressed while the
suite stays minutes-fast on local[4]: the clique's cost is its quadratic
OUTPUT (1k-clique -> 499,500 verified pairs; a 10k clique would be ~50M
pairs — nothing about the plan changes, only the answer size).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators.asof import asof_join
from apache_kafka_clickhouse_demo_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)

CLIQUE = 1000
PATH_NODES = 1000
HOT_ROWS = 100_000


def test_minhash_banding_survives_duplicate_clique(spark):
    """A CLIQUE-sized identical-document group: every doc shares every band
    key (maximal band-bucket skew).  The banding join must complete and
    return exactly C(CLIQUE, 2) verified pairs at jaccard 1.0, plus none
    for the distinct decoy docs."""
    clique = spark.range(CLIQUE).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog again and again").alias(
            "text"
        ),
    )
    # decoys with pairwise-disjoint vocabulary: no cross pairs
    decoys = spark.range(CLIQUE, CLIQUE + 50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}x"), F.col("id").cast("string")) for j in range(8)],
        ).alias("text"),
    )
    docs = clique.unionByName(decoys)

    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, num_perm=12, bands=4, shingle_n=3, threshold=0.5)
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("jaccard").alias("jmin"),
        F.max(F.greatest("id_a", "id_b")).alias("max_id"),
    ).first()
    elapsed = time.time() - t0
    print(f"clique banding: {agg['n']} pairs in {elapsed:.1f}s")

    assert agg["n"] == CLIQUE * (CLIQUE - 1) // 2
    assert agg["jmin"] == 1.0  # identical docs: exact Jaccard 1 everywhere
    assert agg["max_id"] < CLIQUE  # decoys produced no pairs


def test_connected_components_path_graph_pointer_jumping(spark):
    """PATH_NODES-node path: plain propagation needs ~PATH_NODES rounds;
    pointer jumping needs ~log2.  max_iter=14 (log2(1000)=10 + slack,
    64x below the path length) converges ONLY if the jump engages —
    connected_components raises otherwise, so passing is the proof."""
    nodes = spark.range(PATH_NODES).select(F.col("id").alias("doc_id"))
    pairs = spark.range(PATH_NODES - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.time()
    labeled = connected_components(nodes, pairs, max_iter=14)
    agg = labeled.agg(
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.max("cluster_id").alias("max_label"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    print(f"path CC: converged in <=14 rounds, {time.time() - t0:.1f}s")

    assert agg["n"] == PATH_NODES
    assert agg["n_clusters"] == 1  # one component
    assert agg["max_label"] == 0  # everyone reached the min id


def test_asof_join_hot_key_stays_bounded(spark):
    """HOT_ROWS probe rows on ONE key (plus a cold key as control): the
    union+window asof must complete and answer exactly — the running
    `last(ignorenulls)` frame is O(1) per row no matter how many rows the
    hot key owns, so a hot key costs one partition SORT, never a range
    explosion."""
    left = spark.range(HOT_ROWS).select(
        F.lit(1).alias("k"),
        F.timestamp_millis(F.col("id") * 1000).alias("ts"),
        F.col("id").alias("probe_ms"),
    ).unionByName(
        spark.range(100).select(
            F.lit(2).alias("k"),
            F.timestamp_millis(F.col("id") * 1000).alias("ts"),
            F.col("id").alias("probe_ms"),
        )
    )
    # right rows every 10s on both keys; payload = the right row's second
    right = (
        spark.range(HOT_ROWS // 10)
        .select(F.timestamp_millis(F.col("id") * 10_000).alias("ts"))
        .crossJoin(spark.range(1, 3).select(F.col("id").cast("int").alias("k")))
        .withColumn("quote_s", (F.unix_millis("ts") / 1000).cast("long"))
    )

    t0 = time.time()
    joined = asof_join(
        left, right, on=["k"], ts_col="ts", payload_cols=["quote_s"], how="left"
    )
    # backward asof against a 10s grid: match is floor(probe_s / 10) * 10
    bad = joined.filter(
        F.col("quote_s") != (F.col("probe_ms") - F.col("probe_ms") % 10) # noqa: E501
    ).count()
    n = joined.count()
    print(f"hot-key asof: {n} rows, {time.time() - t0:.1f}s")

    assert n == HOT_ROWS + 100
    assert bad == 0


def test_pack_chunks_stream_invariants(spark):
    """Packing semantics pinned structurally (not just vs the oracle hash):
    within every bucket, start_tok is the running sum of prior chunk
    lengths (contiguous stream, no gaps/overlaps), pack_id/pack_pos are
    exactly the cut of that stream at max_tokens boundaries, and buckets
    are document-atomic (a doc's chunks never split across buckets)."""
    from apache_kafka_clickhouse_demo_spark.operators.text_analysis import pack_chunks

    chunks = (
        spark.range(40)
        .selectExpr(
            "id % 8 AS doc_id",
            "CAST(id / 8 AS INT) AS chunk_idx",
            "CAST(id % 5 + 1 AS INT) AS n_tokens",
        )
    )
    rows = pack_chunks(chunks, max_tokens=7, buckets=3).collect()

    by_bucket: dict = {}
    doc_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
        assert doc_bucket.setdefault(r["doc_id"], r["bucket"]) == r["bucket"]
        assert r["pack_id"] == r["start_tok"] // 7
        assert r["pack_pos"] == r["start_tok"] % 7

    for rs in by_bucket.values():
        rs.sort(key=lambda r: (r["doc_id"], r["chunk_idx"]))
        running = 0
        for r in rs:
            assert r["start_tok"] == running  # contiguous, gapless stream
            running += r["n_tokens"]


def test_bucketed_asof_matches_plain_on_hot_key(spark):
    """The mitigation the plain operator's docstring points to, executed at
    the hot-key fixture's scale: the time-bucketed as-of answers 100k
    probes on one key identically to the plain operator while sorting
    ~bucket-sized units instead of the whole key."""
    from apache_kafka_clickhouse_demo_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    left = spark.range(HOT_ROWS).select(
        F.lit(1).alias("k"),
        F.timestamp_millis(F.col("id") * 1000).alias("ts"),
        F.col("id").alias("probe_s"),
    )
    right = (
        spark.range(HOT_ROWS // 10)
        .select(
            F.lit(1).alias("k"),
            F.timestamp_millis(F.col("id") * 10_000).alias("ts"),
            (F.col("id") * 10).alias("quote_s"),
        )
    )
    t0 = time.time()
    bucketed = asof_join_bucketed(
        left, right, on=["k"], ts_col="ts", payload_cols=["quote_s"],
        bucket_seconds=3600,  # ~28 one-hour sort units instead of one key
    )
    bad = bucketed.filter(
        F.col("quote_s") != (F.col("probe_s") - F.col("probe_s") % 10)
    ).count()
    n = bucketed.count()
    print(f"bucketed hot-key asof: {n} rows, {time.time() - t0:.1f}s")
    assert n == HOT_ROWS and bad == 0


def test_stratified_sample_giant_group_no_window_funnel(spark):
    """A single group owning ~all rows is the hazard stratified_sample's
    two-phase reduction exists for: a per-group window would sort the
    whole group in ONE task.  Execute at 500k rows on one group (+ small
    groups) and pin exactness against the window reference computed on
    the small groups plus a spot-check of the giant group's members."""
    from pyspark.sql import Window as W

    from apache_kafka_clickhouse_demo_spark.functions import hashing as H
    from apache_kafka_clickhouse_demo_spark.operators.sampling import (
        stratified_sample,
    )

    giant = spark.range(500_000).select(
        F.lit("giant").alias("g"), F.col("id").alias("rid")
    )
    small = spark.range(500_000, 500_300).select(
        F.concat(F.lit("s"), F.pmod("id", F.lit(3)).cast("string")).alias("g"),
        F.col("id").alias("rid"),
    )
    df = giant.unionByName(small).repartition(32)

    n = 25
    t0 = time.time()
    out = stratified_sample(df, "g", n, "rid", salt="sk:").persist()
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    elapsed = time.time() - t0
    print(f"stratified 500k giant group: {elapsed:.1f}s sizes={sizes}")
    assert sizes["giant"] == n
    assert all(v == n for v in sizes.values())  # every group hit its quota

    # exactness: same members+ranks as the window formulation
    hkey = H.h48(F.concat(F.lit("sk:"), F.col("rid").cast("string")))
    w = W.partitionBy("g").orderBy(hkey, "rid")
    ref = sorted(
        tuple(r)
        for r in df.withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= n)
        .select("g", "rid", "strat_rank")
        .collect()
    )
    got = sorted(tuple(r) for r in out.collect())
    out.unpersist()
    assert got == ref


def test_margin_bitext_full_hub_corpus_discounts_everything(spark):
    """VERDICT r10 #6 skew pin: a corpus where EVERY target is one hub
    neighborhood (pairwise cosine ~1) is the ratio margin's worst case
    AND its reason to exist — every source's best raw-cosine target is a
    hub, but both sides' k-NN means are equally high, so no hub pairing
    clears the margin threshold.  A single planted off-hub pair must
    still mine cleanly.  Also the bounded-candidate shape: all 8 hub
    sources share the same handful of targets, collapsing the candidate
    set far below |src| * k — the operator must not care."""
    from apache_kafka_clickhouse_demo_spark.operators.similarity import (
        margin_bitext,
    )

    dim = 8

    def hubv(seed: int) -> list[float]:
        # dominant first axis + tiny per-id noise: pairwise cosine ~1
        return [10.0] + [((seed * 31 + i * 7) % 97) / 1000.0 for i in range(dim - 1)]

    orth = [0.0, 10.0] + [0.0] * (dim - 2)
    # sources: 8 hub-aligned + 1 off-hub (id 8); corpus: 500 hub targets
    # + the planted off-hub match (id 1000)
    src = spark.createDataFrame(
        [(i, hubv(i)) for i in range(8)] + [(8, orth)],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [(100 + j, hubv(1000 + j)) for j in range(500)] + [(1000, orth)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["src_id"]: (r["tgt_id"], r["mined"], r["margin"])
        for r in margin_bitext(src, corpus, k=4, threshold=1.05).collect()
    }
    assert len(got) == 9
    tgt, mined, margin = got[8]
    assert (tgt, mined) == (1000, True) and margin > 2.0  # planted pair mines
    for s in range(8):  # hub pairings all discounted below threshold
        assert not got[s][1], (s, got[s])
        assert got[s][2] < 1.05


def test_bigram_rarity_zipf_hot_bigram_exact(spark):
    """VERDICT r10 #6 skew pin: one hot token at ~half of all positions
    puts ~25% of ALL bigram occurrences on one (zz, zz) key — the
    occurrence join's worst key skew.  The integer-exact scores must be
    unchanged by the skew: compared row-for-row against a pure-Python
    replica of the documented formula."""
    from apache_kafka_clickhouse_demo_spark.operators.text_analysis import (
        bigram_rarity,
    )

    docs = []
    for d in range(300):
        toks = [
            # deterministic ~52% coin WITH runs (a strict alternation
            # would never produce the hot (zz, zz) bigram)
            "zz" if ((d + 1) * (p + 3) * 2654435761) % 7 < 3
            else f"w{(d * 13 + p * 7) % 23}"
            for p in range(12)
        ]
        docs.append((d, " ".join(toks)))

    uni: dict[str, int] = {}
    bg: dict[tuple[str, str], int] = {}
    for _, t in docs:
        ts = t.split()
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(ts, ts[1:]):
            bg[(x, y)] = bg.get((x, y), 0) + 1
    T = sum(uni.values())
    assert bg[("zz", "zz")] * 4 > sum(bg.values())  # the skew is real

    want = {}
    for d, t in docs:
        ts = t.split()
        mass = 0
        for x, y in zip(ts, ts[1:]):
            mass += (2 * uni[x] * T) // (bg[(x, y)] * T + uni[y] * uni[x])
        nb = len(ts) - 1
        want[d] = (nb, mass, round(mass / nb, 4))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_mass"], r["avg_rarity"])
        for r in bigram_rarity(df).collect()
    }
    assert got == want
