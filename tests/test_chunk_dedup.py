"""Passage-level (line) dedup semantics (text_analysis.chunk_dedup)."""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark.operators.text_analysis import chunk_dedup


def _run(spark, docs, chunk_words=2):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
        for r in chunk_dedup(df, chunk_words).collect()
    }


def test_first_occurrence_wins_across_docs(spark):
    got = _run(
        spark,
        [
            (1, "a b c d"),  # chunks: "a b", "c d"
            (2, "a b x y"),  # "a b" already seen in doc 1 -> dropped
        ],
    )
    assert got[1] == (2, 2, "a b c d")
    assert got[2] == (2, 1, "x y")


def test_fully_duplicated_doc_disappears(spark):
    got = _run(spark, [(1, "a b c d"), (2, "a b c d")])
    assert 2 not in got and got[1] == (2, 2, "a b c d")


def test_within_doc_repeat_dropped_and_order_preserved(spark):
    got = _run(spark, [(1, "a b z w a b c d")])
    # chunks: "a b", "z w", "a b"(dup), "c d" -> order preserved in rebuild
    assert got[1] == (4, 3, "a b z w c d")


def test_short_doc_single_partial_chunk(spark):
    got = _run(spark, [(1, "solo")])
    assert got[1] == (1, 1, "solo")


def test_doc_id_ordering_defines_first(spark):
    # the SMALLER doc_id keeps the passage regardless of input row order
    got = _run(spark, [(9, "p q"), (3, "p q")])
    assert got == {3: (1, 1, "p q")}


def test_invalid_chunk_words(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_dedup(df, 0)


def test_hash_collision_keeps_distinct_passage(spark, monkeypatch):
    # ADVICE r6: two DISTINCT passages colliding on h48 must not lose one.
    # Force the collision by collapsing the hash; the text-confirm guard
    # must keep the second distinct passage (and may keep its later
    # duplicates — under-dedup is the safe failure direction).
    from pyspark.sql import functions as F

    from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA

    monkeypatch.setattr(TA.H, "h48", lambda _c: F.lit(0).cast("long"))
    got = _run(spark, [(1, "a b"), (2, "c d"), (3, "a b")])
    # doc 2's distinct content survives the collision; doc 3 is a true
    # duplicate of doc 1 (same hash AND same text) and is dropped
    assert got == {1: (1, 1, "a b"), 2: (1, 1, "c d")}


# ---------------------------------------------------------------------------
# Winnowing fingerprints (text_analysis.winnow_fingerprints)
# ---------------------------------------------------------------------------


def _winnow(spark, docs, k=4, window=5):
    from apache_kafka_clickhouse_demo_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_grams"], set(r["fingerprint"].split("-")))
        for r in winnow_fingerprints(df, k=k, window=window).collect()
    }


def test_winnowing_shared_run_guarantee(spark):
    # The SIGMOD'03 guarantee: a shared token run of >= window + k - 1
    # tokens (here 5 + 4 - 1 = 8) yields >= 1 COMMON selected hash, at any
    # position in either document.
    shared = "the quick brown fox jumps over lazy dogs"  # 8 tokens
    docs = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"unrelated prefix words here entirely {shared}"),
        (3, "no overlap with anything else at all whatsoever truly"),
    ]
    got = _winnow(spark, docs)
    assert got[1][1] & got[2][1], "shared 8-token run must share a fingerprint"
    assert not (got[1][1] & got[3][1])


def test_winnowing_density_and_short_doc_floor(spark):
    # fingerprint is a strict subset (~2/(w+1)) of the gram hashes for a
    # long doc; a doc shorter than k tokens still fingerprints (single
    # full-string shingle)
    long_text = " ".join(f"tok{i}" for i in range(200))
    got = _winnow(spark, [(1, long_text), (2, "tiny doc")])
    n_grams, fp = got[1]
    assert n_grams == 197
    assert len(fp) < n_grams / 2  # winnowing's 2/(w+1)=1/3 expected density
    assert got[2][0] == 1 and len(got[2][1]) == 1
