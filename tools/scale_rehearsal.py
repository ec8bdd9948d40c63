"""10x scale rehearsal (VERDICT r5 #5): measure, don't extrapolate.

Every >sf0.1 scale claim in the repo rests on plan shape (no cartesian, no
collect, bucketed joins).  This tool turns those claims into measured
curves: blow `documents`/`embeddings` up ~10x locally, run the dedup / ANN
/ text families at both scales, and report sec + time ratio per query so
super-linear growth is visible as a number, not an argument.

Blow-up construction (replicate + perturb, DETERMINISTIC, and chosen so
the workload's OUTPUT scales linearly too — naive replication would make
every copy of a document a near-duplicate of its 9 siblings and grow the
pair set quadratically in the replication factor, measuring a different
problem):

- documents copy k: doc_id += k * (max_id + 1); every word gets the
  copy-specific suffix `c{k}` — a consistent token remap, so WITHIN-copy
  shingle overlap (and thus each copy's near-dup pair structure) is
  preserved exactly while CROSS-copy Jaccard is 0.
- embeddings copy k: vec_id += k * (max_id + 1); dimension i's sign flips
  when hash(i, k) is odd — sign patterns cancel within a copy
  (dot(s*a, s*b) = dot(a, b): within-copy cosines exact), while
  cross-copy dots average to ~0, far under every near-dup threshold.

Usage:
    python tools/scale_rehearsal.py [--build-only] [query ...]

Output dir: .scale10x/ at the repo root (gitignored; ~60 MB).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from apache_kafka_clickhouse_demo_spark import queries as Q  # noqa: E402
from apache_kafka_clickhouse_demo_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
#: SCALE_COPIES=<N> env var overrides (default 10); output dir .scale<N>x
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
SCALE_DIR = str(REPO / f".scale{COPIES}x")

#: The families whose 100 TB designs the rehearsal is meant to check.
FAMILIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "embedding_near_dup",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_profile",
    "text_prep",
    "doc_fingerprint",
    "pack_sequences",
    # training-export family (r6)
    "sample_stratified",
    "shuffle_export",
    "mixture_sample",
    # events families (r6): sessions / as-of / windows / sketches
    "user_sessions",
    "asof_last_purchase",
    "user_cumulative_value",
    "daily_type_rollup",
    "latest_value_per_user",
    "uniq_users_approx",
    "value_percentiles",
    # mid-r6 families: MergeTree engines / behavioral / sketch / passage dedup
    "replacing_latest",
    "collapsing_balance",
    "ttl_cleanup",
    "funnel_levels",
    "retention_cohort",
    "top_users_sketch",
    "passage_dedup",
    "semantic_dedup",
    # r8: containment dedup joins the measured set (VERDICT r7 #2)
    "containment_pairs",
    # r8: ExactSubstr span removal + unigram-rarity scoring
    "substring_dedup",
    "unigram_rarity",
    # r9: fastText-analog hashed linear quality classifier + Bloom-filter
    # corpus-prep decontamination
    "quality_classifier",
    "bloom_decontaminate",
    # r10: URL/host-level dedup (canonicalize + registered domain) +
    # per-domain quota cap + domain boilerplate-line removal
    "url_dedup",
    "domain_doc_counts",
    "domain_cap",
    "boilerplate_lines",
    # r10: ClickHouse array-function parity over events
    "array_functions",
    # r10: end-to-end web-curation composition
    "web_curation",
    # r10: Okapi BM25 keyword retrieval (integer-exact restatement).
    # Token remap caveat: the blow-up suffixes every word with c{k}, so
    # only copy 0 matches the fixed query terms — matching occurrences
    # stay constant while the SCANNED corpus (and N, TOT in the scoring)
    # grows k-fold, which is exactly the operator's scan-bound regime.
    "bm25_search",
    # r10: DSIR importance-weighted selection (row-local scoring +
    # TakeOrderedAndProject top-k — expected scan-bound)
    "dsir_select",
    # r10: keep-the-best-copy policy (CC labels x classifier scores);
    # the blow-up preserves within-copy near-dup structure, so clusters
    # (and the rep-selection workload) scale linearly with copies
    "cluster_representatives",
    # r10: positional phrase search (row-local sliding-window compare;
    # the token remap confines matches to copy 0 — scan-bound regime,
    # same caveat as bm25_search)
    "phrase_search",
    # r10: index-backed BM25 round trip (build + pruned lookup per run;
    # the BUILD's one (doc, term) shuffle dominates — the lookup itself
    # is O(query vocabulary) files by construction, pinned by test)
    "bm25_indexed",
    # r10: interpolated bigram-LM rarity (unigram_rarity's plan family:
    # two vocabulary aggregates + vocab-side enrichment + one occurrence
    # join — the blow-up's token remap scales the vocabularies linearly)
    "bigram_rarity",
    # r10: cluster-balanced diverse sampling (shared IVF quantizer +
    # two-phase per-cell quota; isqrt(n) centroids self-scale)
    "diverse_sample",
    # r10: typed PII redaction (row-local regex chain; scan-bound)
    "pii_redact",
    # r10: persisted-IVF ANN round trip (build + pruned probe lookup;
    # quantizer cost dominates, same regime as diverse_sample)
    "ann_indexed",
    # r10: CLIP-score pair filter (row-local double-normalize + dot;
    # scan-bound)
    "pair_cosine_filter",
    # r10: UT1-style registered-domain blocklist (row-local isin filter)
    "url_blocklist",
    # r10: margin-based bitext mining (bounded src batch x corpus fan-out
    # + bounded candidate-side means; linear in the corpus)
    "margin_bitext",
    # r11: Gopher rules (row-local regex-count projection; scan-bound)
    "gopher_rules",
    # r11: temperature mixture (one group count + bounded rates join)
    "temperature_mixture",
    # r11: grown ANN index (found 75% + extend 25%; build shuffle
    # dominates, lookup is O(nprobe) pruned reads like ann_indexed)
    "ann_indexed_grown",
    # r11: count-min sketch over events (depth-way fan-out + one bounded
    # counter aggregate; grouping cardinality depth*width at any scale)
    "cms_user_counts",
    # r12: re-centroided ANN index (found + extend + recluster + lookup
    # per run; two assignment passes + the recluster's one — all linear
    # in the corpus with isqrt(n)-self-scaling centroid draws)
    "ann_indexed_reclustered",
    # r12: perceptual-hash media dedup (one Arrow pass + pigeonhole
    # chunk self-join; copy-remapped texts shift band masses, so
    # cross-copy phash collisions stay rare and pairs scale ~linearly)
    "media_phash_dedup",
    # r12: C4 line/page cleaning (row-local split + array filter HOF;
    # scan-bound — the HOF is interpreted but single-pass per line)
    "c4_filters",
    # r12: hybrid RRF fusion (both retrieval arms run inside; the fuse
    # itself is bounded at |queries| * k * 2 rows — the curve measures
    # the arms' scan-bound growth, same caveat as bm25_search)
    "hybrid_rrf",
    # r12: DPR hard-negative mining (the same two arms; the anti-join
    # touches only the bounded rank frames)
    "hard_negatives",
    # r12: CCNet perplexity buckets (bigram_rarity's plan + one doc_id
    # join + one bounded-cardinality per-language window)
    "perplexity_buckets",
    # r12: weighted Misra-Gries (same per-task summary contract as the
    # unweighted topK — the weight column changes increments, not size)
    "top_users_weighted",
    # r12: Unicode normalization (one Arrow NFC pass + codegen rules;
    # row-local, scan-bound)
    "text_normalize",
    # r12: exact weighted quantiles (one bounded-group window shuffle +
    # one aggregate)
    "weighted_percentiles",
    # r12: dyadic CMS range counts (constant fan-out + bounded cell
    # grid aggregate; grid size independent of the corpus)
    "dyadic_range_counts",
    # r13: sketch quantiles (dyadic_range_counts' build + a walk over
    # broadcast level-slices of the bounded grid — query-time work is
    # corpus-independent by construction; the curve measures the build)
    "sketch_quantiles",
    # r13: the weighted form — identical bounded-grid walk, cells carry
    # weight mass (same universe-bounded aggregate regime)
    "sketch_quantiles_weighted",
    # r13: sequenceMatch time-condition form (window_funnel's plan
    # family verbatim: one tick aggregate + codegen fold)
    "sequence_match_time",
    # r13: PQ-ADC top-k (codebook draw + encode pass + bounded
    # distance-table join; corpus-side work is the m-way fan-out)
    "ann_pq_topk",
    # r13: IVF-PQ composition (coarse assignment + encode builds; the
    # serving join ships codes into ~nprobe/K of the corpus)
    "ann_ivfpq_topk",
    # r13: cluster/representative form of phash media dedup — the pair
    # blow-up (quadratic in duplicate-class size) collapses to one row
    # per component before any sink; curve = hash pass + CC rounds
    "media_phash_clusters",
    # r15 (VERDICT r14 #6): deterministic spherical k-means — per-round
    # work is one corpus x dim posexplode aggregate into k*dim cells +
    # one re-assignment; centroid count self-scales as isqrt(n), so the
    # two-level assignment path must engage at rehearsal K
    "kmeans_clusters",
    # r15 (VERDICT r14 #2): index founded on the trained quantizer —
    # the founding pays refine_rounds Lloyd passes (each linear in the
    # corpus), lookup stays O(nprobe) pruned reads
    "ann_indexed_refined",
    # r15: leakage-safe split — the dedup_clusters machinery (banded
    # pairs + star-star CC) plus one row-local hash projection
    "cluster_safe_split",
    # r15: per-domain token budget — one (optional) two-level rank
    # prune + one cumsum window whose partitions are <= budget rows by
    # construction.  The blow-up keeps the SAME ~92 registered domains
    # (urls derive from doc_id mod constants) while per-domain doc mass
    # grows with copies — exactly the skew regime the two-level prune
    # exists for, so the curve measures the operator's hard case
    "domain_token_cap",
]

PASSES = 2


def build(spark) -> None:
    os.makedirs(SCALE_DIR, exist_ok=True)
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    copies = []
    for k in range(COPIES):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * max_doc))
        if k > 0:
            # consistent token remap: within-copy shingle sets isomorphic,
            # cross-copy overlap zero
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\w+)", rf"$1c{k}")
            )
        copies.append(c.withColumn("n_chars", F.length("text")))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(f"{SCALE_DIR}/documents.parquet")

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    copies = []
    for k in range(COPIES):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * max_vec))
        if k > 0:

            def make_flip(kk: int):
                def flip(x, i):
                    return F.when(
                        F.pmod(F.xxhash64(i.cast("string"), F.lit(kk)), F.lit(2)) == 0,
                        x,
                    ).otherwise(-x)

                return flip

            c = c.withColumn("embedding", F.transform("embedding", make_flip(k)))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(16).write.mode("overwrite").parquet(f"{SCALE_DIR}/embeddings.parquet")

    # events x10: copy k shifts user_id and event_id into disjoint ranges
    # (per-user event streams are preserved exactly per copy, so session /
    # as-of / cumulative outputs scale linearly); timestamps unchanged
    # read through load_table so ts comes out TIMESTAMP_LTZ (the engine's
    # canonical type) and the rewritten parquet stays LTZ-annotated — a
    # plain spark.read would infer NTZ from the fixture and bake that
    # into the blow-up, breaking unix_millis in every timed query
    from apache_kafka_clickhouse_demo_spark.sources.tables import load_table

    ev = load_table(spark, BASE_SF, "events")
    max_ev = ev.agg(F.max("event_id")).first()[0] + 1
    max_u = ev.agg(F.max("user_id")).first()[0] + 1
    copies = []
    for k in range(COPIES):
        copies.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(k * max_ev))
            .withColumn("user_id", F.col("user_id") + F.lit(k * max_u))
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(f"{SCALE_DIR}/events.parquet")

    # remaining tables: symlink the sf0.1 originals so any query that
    # touches them still loads
    for f in os.listdir(BASE_SF):
        dst = os.path.join(SCALE_DIR, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE_SF, f), dst)


def measure(spark, names: list[str]) -> None:
    rows = []
    for name in names:
        fn = {**Q.QUERIES, **Q.EXTRA_QUERIES}[name]
        secs = {}
        out_rows = {}
        for label, sf in (("1x", BASE_SF), (f"{COPIES}x", SCALE_DIR)):
            best = float("inf")
            for _ in range(PASSES):
                spark.catalog.clearCache()
                t0 = time.time()
                df = fn(spark, sf)
                # noop sink (same action bench.py times): forces EVERY
                # column of every stage.  count() let Catalyst prune
                # prunable final projections / eliminate 1:1 left joins —
                # for row-local operators (quality_classifier) it timed
                # plan compilation, not work (caught in r9).
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            secs[label] = best
            out_rows[label] = fn(spark, sf).count()
        big = f"{COPIES}x"
        rows.append(
            (
                name,
                secs["1x"],
                secs[big],
                secs[big] / secs["1x"],
                out_rows["1x"],
                out_rows[big],
            )
        )
        print(
            f"{name:24s} 1x {secs['1x']:7.2f}s ({out_rows['1x']:>7} rows)   "
            f"{big} {secs[big]:7.2f}s ({out_rows[big]:>7} rows)   "
            f"ratio {secs[big] / secs['1x']:5.2f}x",
            flush=True,
        )
    big = f"{COPIES}x"
    print(f"\n| query | 1x sec | {big} sec | time ratio | 1x rows | {big} rows |")
    print("|---|---|---|---|---|---|")
    for name, s1, s10, r, n1, n10 in rows:
        print(f"| {name} | {s1:.2f} | {s10:.2f} | {r:.2f}x | {n1} | {n10} |")


def measure_stream_store_growth(spark) -> None:
    """VERDICT r7 #6: the drains' per-block-flat claim, measured against a
    store pre-seeded with the FULL blow-up corpus (COPIES x the gate
    fixture) instead of the 16x protocol of r6.  Seeds the minhash store
    by driving writer.process over the blown-up documents in large
    blocks + maintain(), then times gate-size (1250-doc, fresh-id) blocks
    against (a) a small sf0.1-seeded store and (b) the big store, and
    asserts the big store's pruned band read touches at most one file per
    shard (the post-maintenance layout contract)."""
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from apache_kafka_clickhouse_demo_spark.sources.txlog import TransactionalTable
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        minhash_stream_writer,
    )

    # r9 (VERDICT r8 #5): the shard counts are the store's corpus-scale
    # knob — STREAM_BAND_SHARDS/STREAM_ID_SHARDS rehearse the >= 1k-shard
    # regime production sizing (shards_for_store) would pick at real scale
    band_shards = int(os.environ.get("STREAM_BAND_SHARDS", "16"))
    id_shards = int(os.environ.get("STREAM_ID_SHARDS", "8"))

    def fresh_writer(root, tag):
        return minhash_stream_writer(
            spark,
            out_dir=f"{root}/kept_{tag}",
            store_dir=f"{root}/store_{tag}",
            band_shards=band_shards,
            id_shards=id_shards,
            writer_id=tag,
        )

    def seed(writer, docs_df, n_blocks, base_id):
        docs_df = docs_df.select(
            (F.col("doc_id") + F.lit(base_id)).alias("doc_id"), "text"
        )
        hi = docs_df.agg(F.max("doc_id")).first()[0]
        lo = docs_df.agg(F.min("doc_id")).first()[0] - 1
        span = (hi - lo) // n_blocks + 1
        for i in range(n_blocks):
            blk = docs_df.filter(
                (F.col("doc_id") > lo + i * span)
                & (F.col("doc_id") <= lo + (i + 1) * span)
            )
            writer.process(blk, i)
        writer.maintain()

    def probe_blocks(writer, start_batch):
        """Four gate-size blocks of FRESH synthetic docs; per-block sec."""
        secs = []
        for j in range(4):
            rows = [
                (10_000_000 + start_batch * 100_000 + j * 5000 + i,
                 " ".join(f"w{start_batch}b{j}r{i}t{t}" for t in range(40)))
                for i in range(1250)
            ]
            blk = spark.createDataFrame(rows, "doc_id long, text string")
            t0 = _time.time()
            writer.process(blk, start_batch + j)
            secs.append(_time.time() - t0)
        return secs

    root = tempfile.mkdtemp(prefix="stream_scale_")
    try:
        small_docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
        big_docs = spark.read.parquet(f"{SCALE_DIR}/documents.parquet")
        w_small = fresh_writer(root, "small")
        seed(w_small, small_docs, 2, 0)
        w_big = fresh_writer(root, "big")
        seed(w_big, big_docs, 10, 0)
        n_small = TransactionalTable(f"{root}/store_small/store").read(spark).count()
        n_big = TransactionalTable(f"{root}/store_big/store").read(spark).count()

        s_small = probe_blocks(w_small, 100)
        s_big = probe_blocks(w_big, 100)
        print(f"store rows: small={n_small} big={n_big} ({n_big/n_small:.0f}x)")
        print("per-block sec small store:", " ".join(f"{x:.2f}" for x in s_small))
        print("per-block sec big   store:", " ".join(f"{x:.2f}" for x in s_big))
        ratio = min(s_big) / min(s_small)
        print(f"per-block min ratio big/small: {ratio:.2f}x "
              f"(store grew {n_big/n_small:.0f}x)")

        # files-read assertion: the big store's pruned band read touches at
        # most one file per band shard (post-maintenance layout)
        from apache_kafka_clickhouse_demo_spark.sources import txlog as TX

        calls = []
        orig = TX.TransactionalTable.read_where

        def spy(self, spark_, col, values, version=None):
            df = orig(self, spark_, col, values, version=version)
            calls.append((sorted(values), df.inputFiles()))
            return df

        w_big.maintain()  # back to one file per shard before the assert
        TX.TransactionalTable.read_where = spy
        try:
            w_big.process(
                spark.createDataFrame(
                    [(99_000_000 + i, " ".join(f"q{i}t{t}" for t in range(40)))
                     for i in range(1250)],
                    "doc_id long, text string",
                ),
                999,
            )
        finally:
            TX.TransactionalTable.read_where = orig
        band_call = next(c for c in calls if all(v.startswith("b") for v in c[0]))
        shards, files = band_call
        per_shard: dict = {}
        for f in files:
            sh = f.split("shard=")[1].split("/")[0]
            per_shard[sh] = per_shard.get(sh, 0) + 1
        print(f"band read touched {len(files)} files over {len(shards)} shards; "
              f"max files/shard = {max(per_shard.values())}")
        # post-maintenance + pre-append-pinned read: exactly the compacted
        # layout, one file per touched band shard
        assert max(per_shard.values()) == 1, per_shard
    finally:
        shutil.rmtree(root, ignore_errors=True)


def measure_skew(spark) -> None:
    """VERDICT r10 #6: margin_bitext and bigram_rarity under ADVERSARIAL
    skew — the r10 rehearsals used the uniform blow-up, which never
    stresses the operators' bounded-broadcast claims.

    Hub-heavy embeddings (margin_bitext): EVERY corpus vector sits near
    one direction, so every source's top-k hits the same handful of hub
    targets — the worst case for the target-side k-NN (the hub's
    collect_list group sees the whole src batch) and exactly the corpus
    shape the ratio margin exists to discount.  The bounded-broadcast
    claim under test: the candidate set stays <= |src| * k rows however
    hubby the corpus, so the target-side pass and margin join stay
    broadcast-sized.

    Zipf-vocab documents (bigram_rarity): ~half of all token positions
    are ONE hot token (deterministic per-position coin), so one bigram
    key carries ~25% of all occurrences — the worst case for the
    (prev, cur) occurrence join.  The claim under test: counts attach to
    the bigram VOCABULARY (bounded rows) and join back by key, so the
    hot key costs one fat-but-partitionable join side, never a window or
    a driver funnel.

    Both fixtures print 1x-vs-{COPIES}x ratios like `measure` (2 passes,
    noop sink); linear-ish growth = the skew claims hold as numbers."""
    from apache_kafka_clickhouse_demo_spark.operators import (
        similarity,
        text_analysis,
    )

    dim = 64
    src_n, base_corpus = 32, 20_000
    base_docs, toks_per_doc = 12_500, 40

    def hub_embeddings(n: int) -> "DataFrame":
        # deterministic: dim 0 carries the hub direction, the rest is
        # small hash noise => every pair of corpus vectors has cosine
        # ~0.99 (one giant hub neighborhood, no planted structure)
        ids = spark.range(n).select(F.col("id").alias("vec_id"))
        noise = F.transform(
            F.sequence(F.lit(1), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("vec_id").cast("string"), i.cast("string")), F.lit(1000))
                / 10000.0
            ),
        )
        return ids.select(
            "vec_id",
            F.concat(F.array(F.lit(10.0)), noise).alias("embedding"),
        )

    def zipf_docs(n: int) -> "DataFrame":
        # position p of doc d: hot token "zz" when hash(d, p) is even
        # (~50% of ALL positions -> (zz, zz) alone is ~25% of bigrams),
        # else one of 997 tail tokens — Zipf head + long tail
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        tok = lambda p: F.when(  # noqa: E731
            F.pmod(F.xxhash64(F.col("doc_id").cast("string"), p.cast("string")), F.lit(2)) == 0,
            F.lit("zz"),
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(p.cast("string"), F.col("doc_id").cast("string")), F.lit(997)).cast("string"),
            )
        )
        return ids.select(
            "doc_id",
            F.array_join(
                F.transform(F.sequence(F.lit(0), F.lit(toks_per_doc - 1)), tok), " "
            ).alias("text"),
        )

    cases = {
        "margin_bitext[hub]": lambda scale: similarity.margin_bitext(
            hub_embeddings(src_n).withColumnRenamed("vec_id", "vec_id"),
            hub_embeddings(base_corpus * scale + src_n).filter(
                F.col("vec_id") >= src_n
            ),
            k=4,
        ),
        "bigram_rarity[zipf]": lambda scale: text_analysis.bigram_rarity(
            zipf_docs(base_docs * scale)
        ),
    }
    print(f"\n| query | 1x sec | {COPIES}x sec | time ratio | 1x rows | {COPIES}x rows |")
    print("|---|---|---|---|---|---|")
    for name, make in cases.items():
        secs, nrows = {}, {}
        for label, scale in (("1x", 1), (f"{COPIES}x", COPIES)):
            best = float("inf")
            for _ in range(PASSES):
                spark.catalog.clearCache()
                t0 = time.time()
                make(scale).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            secs[label] = best
            nrows[label] = make(scale).count()
        big = f"{COPIES}x"
        print(
            f"| {name} | {secs['1x']:.2f} | {secs[big]:.2f} | "
            f"{secs[big] / secs['1x']:.2f}x | {nrows['1x']} | {nrows[big]} |",
            flush=True,
        )


def main() -> int:
    args = sys.argv[1:]
    build_only = "--build-only" in args
    streams = "--streams" in args
    skew = "--skew" in args
    names = [a for a in args if not a.startswith("--")] or FAMILIES
    spark = get_spark(app_name="scale_rehearsal")
    if skew:
        # synthetic fixtures built inline — no blow-up needed
        measure_skew(spark)
        spark.stop()
        return 0
    # sentinel written after the LAST build step — checking only the first
    # output would leave a crashed half-build permanently skipped
    if not os.path.exists(f"{SCALE_DIR}/_BUILT"):
        print(f"building {COPIES}x blow-up ...", flush=True)
        build(spark)
        with open(f"{SCALE_DIR}/_BUILT", "w") as fh:
            fh.write("ok\n")
    if streams:
        measure_stream_store_growth(spark)
    elif not build_only:
        measure(spark, names)
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
