"""ExactSubstr repeated-span removal (text_analysis.substring_dedup).

Planted fixtures pin the window-granular Lee et al. 2022 semantics: only
>= window_words-token repeats are removed, the globally first occurrence
survives verbatim, overlapping duplicated windows merge into maximal
spans, and the h48-collision guard fails safe (keep, never destroy).
"""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark.operators.text_analysis import (
    substring_dedup,
)


def _run(spark, docs, w=3):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["kept_text"])
        for r in substring_dedup(df, w).collect()
    }


def test_cross_doc_repeat_removed_from_later_doc_only(spark):
    got = _run(
        spark,
        [
            (1, "a b c x y"),
            (2, "p q a b c r"),  # "a b c" recurs -> removed here only
        ],
    )
    assert got[1] == (5, 0, "a b c x y")
    assert got[2] == (6, 3, "p q r")


def test_long_repeat_merges_overlapping_windows_into_one_span(spark):
    # a 5-token repeat = three overlapping duplicated 3-windows in doc 2;
    # they must merge into ONE 5-token span, not remove 3*3 tokens
    got = _run(spark, [(1, "a b c d e"), (2, "x a b c d e y")])
    assert got[1] == (5, 0, "a b c d e")
    assert got[2] == (7, 5, "x y")


def test_below_window_repeat_survives(spark):
    # a 2-token repeat is invisible to 3-token windows
    got = _run(spark, [(1, "a b x y z"), (2, "a b p q r")])
    assert got[2] == (5, 0, "a b p q r")


def test_within_doc_repeat_removed(spark):
    got = _run(spark, [(1, "a b c z z a b c")])
    # second "a b c" (positions 5-7) duplicates positions 0-2
    assert got[1] == (8, 3, "a b c z z")


def test_doc_id_ordering_defines_first(spark):
    # the SMALLER doc_id keeps the span regardless of input row order
    got = _run(spark, [(9, "a b c"), (3, "a b c")])
    assert got[3] == (3, 0, "a b c")
    assert got[9] == (3, 3, "")


def test_short_doc_passes_through_whole(spark):
    got = _run(spark, [(1, "a b"), (2, "a b")])  # both shorter than w=3
    assert got[1] == (2, 0, "a b")
    assert got[2] == (2, 0, "a b")


def test_adjacent_spans_and_tail_rebuild(spark):
    # two separate repeats inside one doc, with live tokens between and
    # after — the cursor fold must emit every uncovered segment
    got = _run(
        spark,
        [
            (1, "a b c m n o"),
            (2, "a b c k m n o t u"),
        ],
    )
    assert got[2] == (9, 6, "k t u")


def test_invalid_window(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_dedup(df, 0)


def test_hash_collision_keeps_distinct_span(spark, monkeypatch):
    # two DISTINCT windows colliding on h48 must not lose either; a true
    # duplicate (same hash AND same text) is still removed
    from pyspark.sql import functions as F

    from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA

    monkeypatch.setattr(TA.H, "h48", lambda _c: F.lit(0).cast("long"))
    got = _run(spark, [(1, "a b c"), (2, "d e f"), (3, "a b c")])
    assert got[1] == (3, 0, "a b c")
    assert got[2] == (3, 0, "d e f")  # distinct text survives the collision
    assert got[3] == (3, 3, "")  # true duplicate still removed


# ---------------------------------------------------------------------------
# Unigram-rarity quality scoring (text_analysis.unigram_rarity)
# ---------------------------------------------------------------------------


def test_unigram_rarity_planted_counts(spark):
    from apache_kafka_clickhouse_demo_spark.operators.text_analysis import (
        unigram_rarity,
    )

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b rare"), (3, "a")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["rarity_mass"], r["avg_rarity"])
        for r in unigram_rarity(df).collect()
    }
    # total=7; df: a=4, b=2, rare=1 -> contribs floor(7/4)=1, 3, 7
    assert got[1] == (3, 5, 1.6667)
    assert got[2] == (3, 11, 3.6667)
    assert got[3] == (1, 1, 1.0)
