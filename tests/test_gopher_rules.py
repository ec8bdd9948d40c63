"""Gopher rule-based quality gate (operators/text_analysis.py:
gopher_rules, Rae et al. 2021 table A1) — edge semantics the oracle's
fixture garnish cannot isolate: NULL/empty text, boundary word counts,
the non-overlapping alpha-word regex, bullet/ellipsis line anchors, and
symbol counting."""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in TA.gopher_rules(df).collect()}


def test_null_and_empty_text_emit_zero_words_keep_false(spark):
    got = _run(spark, [(1, None), (2, ""), (3, "   ")])
    for d in (1, 2, 3):
        assert got[d]["n_words"] == 0
        assert got[d]["mean_word_len_milli"] is None  # 0/0 is undefined
        assert got[d]["keep"] is False


def test_word_count_bounds_and_stopword_rule(spark):
    # 60 plain words + 2 required stopwords -> passes count+stop rules;
    # word lengths ~4 chars keep mean in [3, 10]
    good = " ".join(f"word{i % 10}" for i in range(58)) + " the with"
    short = "the with tiny doc"  # < 50 words
    one_stop = " ".join(f"word{i % 10}" for i in range(59)) + " the"
    got = _run(spark, [(1, good), (2, short), (3, one_stop)])
    assert got[1]["keep"] is True and got[1]["n_stop_hits"] == 2
    assert got[2]["keep"] is False  # n_words below 50
    assert got[3]["keep"] is False and got[3]["n_stop_hits"] == 1


def test_alpha_word_regex_counts_each_word_once(spark):
    # "a1b2" has letters (1 hit), "123" none, "x" one — non-overlapping
    # boundary-anchored matches must count letter-bearing words exactly once
    got = _run(spark, [(1, "a1b2 123 x 9 zz9zz")])
    assert got[1]["n_words"] == 5
    assert got[1]["alpha_word_milli"] == 3 * 1000 // 5


def test_bullet_and_ellipsis_line_anchors(spark):
    text = "- one\n  - two\nplain\ntrails off...\n* starred"
    got = _run(spark, [(1, text)])
    # 5 lines; 3 bullet-led (-, indented -, *), 1 ellipsis-ended
    assert got[1]["bullet_line_milli"] == 3 * 1000 // 5
    assert got[1]["ellipsis_line_milli"] == 1 * 1000 // 5


def test_symbol_ratio_counts_hashes_and_ellipses(spark):
    # 4 words, one '#' and one '...' -> 2*1000//4 = 500
    got = _run(spark, [(1, "alpha # beta ...")])
    assert got[1]["symbol_ratio_milli"] == 2 * 1000 // 4


def test_mean_word_length_bounds(spark):
    # 50 single-char words: mean 1000 milli < 3000 -> fail
    chars = " ".join(["a the with"] + ["b"] * 47)
    longs = " ".join(["the with"] + ["w" * 12] * 48)  # mean > 10000 -> fail
    got = _run(spark, [(1, chars), (2, longs)])
    assert got[1]["keep"] is False
    assert got[2]["keep"] is False
    assert got[2]["mean_word_len_milli"] > 10_000
