"""CCNet perplexity bucketing (operators/text_analysis.py:
perplexity_buckets, Wenzek et al. 2020) — per-language calibration
independence, the thirds cut, tie semantics, and the bigram_rarity
row contract the composition inherits."""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return {r["doc_id"]: r.asDict() for r in TA.perplexity_buckets(df).collect()}


def test_buckets_cut_into_thirds_within_language(spark):
    # 6 docs, one language; texts built so avg_rarity strictly increases
    # with doc_id (rarer continuations later) -> calib 0,200,400,600,800,
    # 1000 -> buckets head,head,middle,middle,tail,tail
    rows = [
        (0, "a a a a a a a a", "en"),
        (1, "a a a a a a a b", "en"),
        (2, "a a a a a a b c", "en"),
        (3, "a a a a a b c d", "en"),
        (4, "a a a a b c d e", "en"),
        (5, "a a a b c d e f", "en"),
    ]
    got = _run(spark, rows)
    rarities = [got[d]["avg_rarity"] for d in range(6)]
    assert rarities == sorted(rarities) and len(set(rarities)) == 6
    assert [got[d]["calib"] for d in range(6)] == [0, 200, 400, 600, 800, 1000]
    assert [got[d]["bucket"] for d in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]


def test_languages_calibrate_independently(spark):
    # the same three texts in two languages: each language's ranks are
    # computed over its own rows, so calib repeats per language
    texts = ["x x x x x x", "x x x x x y", "x x x y z w"]
    rows = [(i, t, "en") for i, t in enumerate(texts)] + [
        (10 + i, t, "fr") for i, t in enumerate(texts)
    ]
    got = _run(spark, rows)
    en = [got[i]["calib"] for i in range(3)]
    fr = [got[10 + i]["calib"] for i in range(3)]
    assert en == fr == [0, 500, 1000]
    assert {got[i]["lang"] for i in range(3)} == {"en"}


def test_ties_share_calibrated_rank_and_bucket(spark):
    rows = [
        (0, "a a a a", "en"),
        (1, "a a a a", "en"),  # identical text -> identical rarity
        (2, "a a b c", "en"),
    ]
    got = _run(spark, rows)
    assert got[0]["avg_rarity"] == got[1]["avg_rarity"]
    assert got[0]["calib"] == got[1]["calib"] == 0  # RANK semantics
    assert got[2]["calib"] == 1000 and got[2]["bucket"] == "tail"


def test_single_doc_language_calibrates_to_head(spark):
    rows = [(0, "a a b", "en"), (1, "z z z q", "zz")]
    got = _run(spark, rows)
    assert got[1]["calib"] == 0 and got[1]["bucket"] == "head"


def test_short_docs_emit_no_row(spark):
    # < 2 tokens -> no bigram -> no row (the bigram_rarity contract)
    rows = [(0, "solo", "en"), (1, "", "en"), (2, None, "en"), (3, "a b", "en")]
    got = _run(spark, rows)
    assert set(got) == {3}
