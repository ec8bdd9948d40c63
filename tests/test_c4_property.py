"""Property tests: c4_filters vs a pure-Python replica of the C4 rule
set, and dyadic_decompose's cover/disjointness/size invariants, over
random inputs (hypothesis — the asof_property pattern)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_kafka_clickhouse_demo_spark.operators import sketches as SK
from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA

_PROP = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random lines from a vocabulary that exercises every rule: terminal
# punctuation (or not), short lines, javascript mentions, badwords,
# braces, lorem ipsum
_WORDS = ["alpha", "beta", "Javascript", "badword", "lorem", "ipsum", "{x}"]
_line = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=7).map(" ".join)
_ending = st.sampled_from([".", "!", "?", '"', "", " ", "..."])
_doc = st.lists(
    st.tuples(_line, _ending).map(lambda t: t[0] + t[1]),
    min_size=0,
    max_size=8,
).map("\n".join)


def _ref_c4(text: str | None, badwords=TA.C4_BADWORDS):
    raw = text or ""
    lines = raw.split("\n")
    kept = [
        x
        for x in lines
        if re.search(r'[.!?"]$', x.strip())
        and len([w for w in x.strip().split() if w]) >= TA.C4_MIN_LINE_WORDS
        and "javascript" not in x.lower()
    ]
    low = raw.lower()
    toks = set(low.strip().split())
    has_lorem = "lorem ipsum" in low
    has_brace = "{" in raw
    has_bad = bool(toks & set(badwords))
    keep = (
        len(kept) >= TA.C4_MIN_KEPT_LINES
        and not has_lorem
        and not has_brace
        and not has_bad
    )
    return (
        len(lines),
        len(kept),
        has_lorem,
        has_brace,
        has_bad,
        "\n".join(kept),
        keep,
    )


@settings(**_PROP)
@given(docs=st.lists(_doc, min_size=1, max_size=6))
def test_c4_filters_matches_reference(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_kept_lines"], r["has_lorem"], r["has_brace"],
            r["has_badword"], r["clean_text"], r["keep"],
        )
        for r in TA.c4_filters(df).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == _ref_c4(text), (i, text)


_vocab_piece = st.text(alphabet="abc", min_size=1, max_size=4)


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=10),
    vocab=st.dictionaries(
        _vocab_piece, st.integers(-9000, -1), min_size=0, max_size=12
    ),
)
def test_viterbi_segment_matches_reference(word, vocab):
    """Viterbi decode vs the richer-state reference DP from
    test_unigram_lm, over random words and random small vocabularies —
    tie pile-ups (equal scores) are common under the coarse score
    range, which is exactly what the tie rule must survive."""
    from apache_kafka_clickhouse_demo_spark.operators import tokenizer as TK
    from tests.test_unigram_lm import _ref_segment

    got = TK._viterbi_segment(word, vocab, 6, TK.UNIGRAM_UNK_MILLI)
    want = _ref_segment(word, vocab, 6, TK.UNIGRAM_UNK_MILLI)
    assert got == want
    assert "".join(got) == word  # decode is a segmentation


@settings(max_examples=200, deadline=None)
@given(
    lo=st.integers(0, 1 << 16),
    span=st.integers(0, 1 << 12),
)
def test_dyadic_decompose_invariants(lo, span):
    hi = min(lo + span, 1 << 16)
    pieces = SK.dyadic_decompose(lo, hi)
    total = 0
    for lvl, key in pieces:
        a, b = key << lvl, (key + 1) << lvl
        assert lo <= a and b <= hi  # pieces stay inside the range
        total += b - a
    assert total == hi - lo  # exact cover (with disjointness implied:
    # in-range pieces whose sizes sum to the span cannot overlap)
    levels = [lvl for lvl, _ in pieces]
    assert all(levels.count(l) <= 2 for l in set(levels))
