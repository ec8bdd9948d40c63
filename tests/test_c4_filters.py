"""C4 line/page cleaning (operators/text_analysis.py: c4_filters,
Raffel et al. 2020 §2.2) — edge semantics the oracle's fixture garnish
cannot isolate: per-line terminal-punctuation / word-count / javascript
rules, page-level flag firing, token-exact badword matching, and the
clean_text recomposition contract."""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in TA.c4_filters(df, **kw).collect()}


GOOD = "This proper sentence line has enough words."


def test_null_and_empty_text_keep_false_empty_clean_text(spark):
    got = _run(spark, [(1, None), (2, "")])
    for d in (1, 2):
        assert got[d]["n_kept_lines"] == 0
        assert got[d]["clean_text"] == ""
        assert got[d]["keep"] is False
    # '' splits to one (empty) line — same as the engine-side split rule
    assert got[2]["n_lines"] == 1


def test_terminal_punctuation_variants(spark):
    text = "\n".join(
        [
            "ends with a period so it stays.",
            "ends with a bang so it stays too!",
            "does this question line stay as well?",
            'ends with a quote so it "stays"',
            "no terminal punctuation on this line",
            "trailing whitespace after the period stays.   ",
        ]
    )
    got = _run(spark, [(1, text)])
    assert got[1]["n_lines"] == 6
    assert got[1]["n_kept_lines"] == 5
    assert "no terminal punctuation" not in got[1]["clean_text"]


def test_min_line_words_boundary(spark):
    four = "only four words here."
    five = "exactly five words right here."
    got = _run(spark, [(1, four + "\n" + five)])
    assert got[1]["n_kept_lines"] == 1
    assert got[1]["clean_text"] == five


def test_javascript_rule_is_case_insensitive(spark):
    text = (
        "Please enable JavaScript to continue reading this.\n"
        "Please enable javascript to continue reading this.\n" + GOOD
    )
    got = _run(spark, [(1, text)])
    assert got[1]["n_kept_lines"] == 1
    assert got[1]["clean_text"] == GOOD


def test_page_flags_fire_independently(spark):
    base = "\n".join([GOOD] * 3)
    got = _run(
        spark,
        [
            (1, base),
            (2, base + "\nsome Lorem Ipsum filler text."),
            (3, base + "\nif (x) { y(); }"),
            (4, base + "\nthis line mentions a badword today."),
        ],
    )
    assert got[1]["keep"] is True
    assert (got[1]["has_lorem"], got[1]["has_brace"], got[1]["has_badword"]) == (
        False,
        False,
        False,
    )
    assert got[2]["has_lorem"] is True and got[2]["keep"] is False
    assert got[3]["has_brace"] is True and got[3]["keep"] is False
    assert got[4]["has_badword"] is True and got[4]["keep"] is False


def test_badword_matches_whole_tokens_not_substrings(spark):
    base = "\n".join([GOOD] * 3)
    # 'badwords' (plural) is a DIFFERENT token — the distinct-token
    # intersection must not fire on substrings
    got = _run(spark, [(1, base + "\nthese are badwords only as a substring.")])
    assert got[1]["has_badword"] is False and got[1]["keep"] is True


def test_min_kept_lines_boundary_and_custom_badwords(spark):
    two = "\n".join([GOOD] * 2)
    three = "\n".join([GOOD] * 3)
    got = _run(spark, [(1, two), (2, three)])
    assert got[1]["n_kept_lines"] == 2 and got[1]["keep"] is False
    assert got[2]["n_kept_lines"] == 3 and got[2]["keep"] is True
    # caller-supplied blocklist replaces the stand-in default
    got = _run(spark, [(1, three + "\nthe word proper is now blocked.")],
               badwords=("proper",))
    assert got[1]["has_badword"] is True and got[1]["keep"] is False


def test_clean_text_preserves_line_order(spark):
    lines = [
        "The first surviving line is right here.",
        "dropped line",
        "The second surviving line follows the first.",
    ]
    got = _run(spark, [(1, "\n".join(lines))])
    assert got[1]["clean_text"] == lines[0] + "\n" + lines[2]
