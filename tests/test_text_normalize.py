"""Unicode + whitespace normalization (operators/text_analysis.py:
normalize_text) — per-rule edges the oracle garnish cannot isolate:
NFC composition, rule ORDER (CR before control-strip, NBSP before
collapse), NULL passthrough, and the changed flag."""

from __future__ import annotations

import unicodedata

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in TA.normalize_text(df).collect()}


def test_nfc_composes_decomposed_accents(spark):
    deco = "café naivë"
    got = _run(spark, [(1, deco)])
    assert got[1]["norm_text"] == unicodedata.normalize("NFC", deco)
    assert got[1]["norm_text"] == "café naivë"
    assert got[1]["changed"] is True


def test_null_text_stays_null_changed_false(spark):
    got = _run(spark, [(1, None), (2, "plain ok")])
    assert got[1]["norm_text"] is None and got[1]["changed"] is False
    assert got[2]["norm_text"] == "plain ok" and got[2]["changed"] is False


def test_crlf_and_lone_cr_become_lf(spark):
    got = _run(spark, [(1, "a\r\nb\rc\nd")])
    assert got[1]["norm_text"] == "a\nb\nc\nd"


def test_nbsp_becomes_space_then_collapses(spark):
    # NBSP -> space happens BEFORE run-collapse, so 'x<nbsp><space>y'
    # ends with a single space (explicit escape, not a pasted glyph)
    got = _run(spark, [(1, "x\u00a0 y")])
    assert got[1]["norm_text"] == "x y"
    assert got[1]["changed"] is True


def test_control_chars_stripped_but_tab_and_lf_survive_as_structure(spark):
    # C0 bell, C0 unit separator, DEL, C1 NEL all vanish; the tab
    # collapses into the space run; the LF survives
    got = _run(spark, [(1, "a\x07b\x1fc\x7fde\tf\ng")])
    assert got[1]["norm_text"] == "abcde f\ng"


def test_space_runs_collapse_and_trim(spark):
    got = _run(spark, [(1, "  lots\t \tof   space  ")])
    assert got[1]["norm_text"] == "lots of space"


def test_lf_edges_survive_trim(spark):
    # trim removes spaces only — structural newlines at the edges stay,
    # and a string with nothing to normalize reports changed = False
    got = _run(spark, [(1, "\nkeep\n")])
    assert got[1]["norm_text"] == "\nkeep\n"
    assert got[1]["changed"] is False


def test_already_normal_text_unchanged(spark):
    got = _run(spark, [(1, "one two\nthree")])
    assert got[1]["norm_text"] == "one two\nthree"
    assert got[1]["changed"] is False
