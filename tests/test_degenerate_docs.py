"""Degenerate-document semantics for the hash/dedup operators (ADVICE r02):
NULL-text and empty/short docs must produce exactly the rows the DuckDB
oracles produce — no silently dropped documents from explode-based rewrites.

These run the REAL oracle SQL from queries.py against a hand-built
`documents` table containing the degenerate shapes the parquet fixtures
don't contain, and compare row sets with the Spark operators.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark import queries as Q
from apache_kafka_clickhouse_demo_spark.operators import dedup, text_analysis

DOCS = [
    (0, None),  # NULL text: NULL token array -> kept with NULL fingerprints
    (1, ""),  # empty text: one "" token, real hashes
    (2, "alpha"),  # short doc: single shingle
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 3
    (5, "ducks and sparks compose entirely different sentences here"),
]


@pytest.fixture(scope="module")
def sdocs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _drows(con, sql):
    return set(map(tuple, con.execute(sql).fetchall()))


def test_doc_fingerprint_keeps_null_text_docs(sdocs, duck):
    got = _rows(text_analysis.doc_fingerprint(sdocs))
    want = _drows(duck, Q._all_oracles()["doc_fingerprint"])
    assert {r[0] for r in got} == {d for d, _ in DOCS}  # every doc has a row
    assert got == want


def test_simhash_pairs_match_oracle_with_degenerate_docs(sdocs, duck):
    got = _rows(dedup.simhash_pairs(sdocs, max_hamming=Q.SIMHASH_MAX_HAMMING))
    want = _drows(duck, Q._all_oracles()["dedup_simhash"])
    assert got == want
    assert (3, 4, 0) in got  # the true dup pair is still found
    assert not any(0 in (a, b) for a, b, *_ in got)  # NULL doc pairs nothing


def test_simhash_null_text_yields_null_hash(sdocs):
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash(sdocs).collect()}
    assert set(sims) == {d for d, _ in DOCS}
    assert sims[0] is None
    assert sims[1] is not None  # "" is a real (single-token) doc


def test_minhash_pairs_match_oracle_with_degenerate_docs(sdocs, duck):
    got = _rows(
        dedup.minhash_lsh_pairs(
            sdocs,
            num_perm=Q.MINHASH_PERM,
            bands=Q.MINHASH_BANDS,
            shingle_n=Q.MINHASH_SHINGLE_N,
            threshold=Q.MINHASH_THRESHOLD,
        )
    )
    want = _drows(duck, Q._all_oracles()["dedup_minhash_lsh"])
    assert got == want
    assert any((a, b) == (3, 4) for a, b, *_ in got)


def test_repetition_stats_match_oracle_with_degenerate_docs(sdocs, duck):
    got = _rows(text_analysis.repetition_stats(sdocs))
    want = _drows(duck, Q._all_oracles()["repetition_stats"])
    assert got == want
    assert {r[0] for r in got} == {d for d, _ in DOCS}


def test_minhash_signatures_keep_every_doc(sdocs):
    sigs = {r["doc_id"]: r["sig"] for r in dedup.minhash_signatures(sdocs).collect()}
    assert set(sigs) == {d for d, _ in DOCS}
    assert all(v is None for v in sigs[0])  # NULL text -> all-NULL signature


def test_exact_dedup_null_texts_stay_distinct(spark):
    """NULL-text documents (extraction failures) must NOT collapse into
    one duplicate group — each keys on its own id, matching the repo-wide
    'NULL pairs nothing' contract the other dedup operators enforce."""
    from apache_kafka_clickhouse_demo_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "same text"), (4, "same text"), (5, None)],
        "doc_id long, text string",
    )
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 5: 1}


def test_ngram_jaccard_pair_exact_at_threshold_boundary(spark):
    """The float-boundary guard: with threshold 0.4 and sets {x,g,h} vs
    {y,z,g,h}, Jaccard is exactly 2/5 = 0.4 and the exact positional
    bound (ceil(0.4/1.4 * 7) = 2) admits the pair — but IEEE doubles
    compute ceil(2.0000000000000004) = 3 and a naive filter silently
    drops it.  The operator must agree with the naive oracle here."""
    from apache_kafka_clickhouse_demo_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "x g h"), (2, "y z g h")], "doc_id long, text string"
    )
    got = ngram_jaccard_pairs(docs, shingle_n=1, threshold=0.4).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert abs(got[0]["jaccard"] - 0.4) < 1e-12


def test_media_operators_match_oracle_on_degenerate_docs(sdocs, duck, spark):
    """NULL/empty-text documents flowing into the media plumbing: NULL
    blobs must not crash the Python stages (len(None)/bytes(None)) and
    must produce exactly the oracle's rows — NULL features/resize for
    NULL, zero-features and md5('') resize for empty, no sampled frames
    for either."""
    from apache_kafka_clickhouse_demo_spark.operators import multimodal

    media = multimodal.attach_media(sdocs)

    # media_features shape (the gate query's combination)
    got = {
        tuple(r)
        for r in multimodal.media_profile(media)
        .select(
            "doc_id",
            "media_type",
            "n_bytes",
            F.when(
                F.col("feature").isNotNull(),
                F.concat_ws(
                    "|",
                    F.transform("feature", lambda x: F.round(x * 1e6).cast("long")),
                ),
            ).alias("feature_ufp"),
            "resized_bytes",
            "resized_md5",
        )
        .collect()
    }
    want = _drows(duck, Q._all_oracles()["media_features"])
    assert got == want

    got_frames = {
        tuple(r) for r in multimodal.sample_frames(media).collect()
    }
    want_frames = _drows(duck, Q._all_oracles()["media_frame_sample"])
    assert got_frames == want_frames
    # the NULL-text doc (id 0, image) and empty doc (id 1, audio) are not
    # videos here; pin the null-video case directly too
    null_video = spark.createDataFrame([(2, None)], "doc_id long, text string")
    assert multimodal.sample_frames(multimodal.attach_media(null_video)).count() == 0


def test_winnow_fingerprints_match_oracle_with_degenerate_docs(sdocs, duck):
    # review r7: Spark's array_join renders a [NULL] selection as '' while
    # DuckDB renders NULL — the operator must emit NULL for NULL text
    got = _rows(
        text_analysis.winnow_fingerprints(
            sdocs, k=Q.WINNOW_K, window=Q.WINNOW_WINDOW
        )
    )
    want = _drows(duck, Q._all_oracles()["winnow_fingerprint"])
    assert {r[0] for r in got} == {d for d, _ in DOCS}  # every doc has a row
    assert got == want


def test_containment_superset_pair_and_degenerate_docs(sdocs, duck):
    # a doc fully quoted inside a longer one: containment(A in B) = 1
    # regardless of B's extra content (the class Jaccard misses), NULL
    # docs pair with nothing, and the oracle agrees exactly
    import pandas as pd

    rows = DOCS + [
        (10, "the quick brown fox jumps over the lazy dog plus much "
             "additional unrelated trailing content follows here"),
    ]
    sdf = sdocs.sparkSession.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = _rows(dedup.containment_pairs(sdf, shingle_n=2, threshold=0.8))
    want = _drows(con, Q._all_oracles()["containment_pairs"])
    assert got == want
    pairs = {(a, b) for a, b, _c in got}
    assert (3, 10) in pairs and (4, 10) in pairs  # quoted docs contained in 10
    assert (10, 3) not in pairs  # the superset is NOT contained in the quote
    assert not any(0 in (a, b) for a, b in pairs)  # NULL doc pairs nothing


def test_containment_exact_when_sketch_prunes_nothing(sdocs, duck, monkeypatch):
    # r8: the hashed-sketch prefilter must be a pure NECESSARY-condition
    # prune.  Shrink the sketch to 1 word (64 bits — heavy collisions, the
    # bound saturates toward "no prune") and pin that the exact verify
    # still produces the oracle answer: a sketch that cannot prune must
    # never change results, only cost.
    import pandas as pd

    rows = DOCS + [
        (10, "the quick brown fox jumps over the lazy dog plus much "
             "additional unrelated trailing content follows here"),
    ]
    sdf = sdocs.sparkSession.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = _drows(con, Q._all_oracles()["containment_pairs"])
    monkeypatch.setattr(dedup, "_SKETCH_WORDS", 1)
    got = _rows(dedup.containment_pairs(sdf, shingle_n=2, threshold=0.8))
    assert got == want


def test_pair_cosine_filter_nulls_and_threshold(spark):
    """pair_cosine_filter: identical vectors keep (cos=1), opposed
    vectors drop, a NULL embedding on either side yields NULL cos and
    keep=false (dropped, never silently retained)."""
    from apache_kafka_clickhouse_demo_spark.operators.multimodal import (
        pair_cosine_filter,
    )

    rows = [
        (1, [1.0, 0.0], [1.0, 0.0]),
        (2, [1.0, 0.0], [-1.0, 0.0]),
        (3, None, [1.0, 0.0]),
        (4, [1.0, 0.0], None),
    ]
    pairs = spark.createDataFrame(
        rows, "doc_id long, a array<double>, b array<double>"
    )
    got = {
        r["doc_id"]: (r["pair_cos"], r["keep"])
        for r in pair_cosine_filter(pairs, "a", "b", threshold=0.5).collect()
    }
    assert got[1] == (1.0, True)
    assert got[2][0] == -1.0 and got[2][1] is False
    assert got[3] == (None, False) and got[4] == (None, False)
