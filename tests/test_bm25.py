"""bm25_topk (Okapi BM25, integer-exact restatement) contracts:

- exact scores on a hand-computed corpus (the cleared-denominator
  integer formula evaluated independently in pure Python);
- BM25's defining behaviors survive the restatement: rarer terms
  outweigh common ones at equal tf, and longer documents score below
  shorter ones at equal tf (the b-normalization direction);
- rank ties break on doc_id ascending; k bounds output; queries whose
  terms match nothing emit no rows; NULL text counts toward N and TOT;
- empty query set raises.
"""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA

IDF_S = TA.BM25_IDF_SCALE
TF_S = TA.BM25_TF_SCALE


def test_exact_scores_vs_pure_python(spark):
    corpus = {
        1: "fast fast join table",
        2: "fast join join hash hash hash",
        3: "table scan slow slow",
        4: "the quick brown fox",
        5: None,  # NULL text still counts toward N and TOT (as [''])
    }
    queries = [(1, "fast hash"), (2, "slow scan"), (3, "nomatch")]
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = [
        tuple(r)
        for r in TA.bm25_topk(docs, queries, k=3).orderBy("query_id", "rank").collect()
    ]
    # mirror the operator's NULL handling: coalesce -> '' -> [''] (1 token)
    pytoks = {
        d: ([""] if t is None else t.lower().split()) for d, t in corpus.items()
    }
    assert (len(pytoks), sum(len(t) for t in pytoks.values())) == (5, 19)
    want = _py_bm25_toks(pytoks, queries, 3)
    assert got == want
    # query 3 matched nothing -> absent entirely
    assert all(q != 3 for q, *_ in got)


def _py_bm25_toks(toks: dict[int, list[str]], queries, k):
    """Independent pure-Python evaluation of the operator's documented
    integer formula (k1=6/5, b=3/4 cleared to integers)."""
    n = len(toks)
    tot = sum(len(t) for t in toks.values())
    qt = sorted({(qid, t) for qid, q in queries for t in q.lower().split()})
    terms = {t for _, t in qt}
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    out = []
    for qid in sorted({q for q, _ in qt}):
        scores = {}
        for d, tk in toks.items():
            dl, s = len(tk), 0
            for q2, t in qt:
                if q2 != qid or t not in tk:
                    continue
                tf = tk.count(t)
                idf = (2 * n - 2 * df[t] + 1) * IDF_S // (2 * df[t] + 1)
                tfs = 44 * tf * tot * TF_S // (20 * tf * tot + 6 * tot + 18 * dl * n)
                s += idf * tfs
            if s > 0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(qid, r + 1, d, s) for r, (d, s) in enumerate(ranked)]
    return out


def test_idf_direction_rare_term_wins(spark):
    """Docs 1..4 all contain 'common'; only doc 5 contains 'rare'.  A
    query for both must rank doc 5 first: the rare term's idf dominates
    at equal tf/dl — BM25's defining property, preserved by the ratio
    surrogate (monotone decreasing in df)."""
    rows = [(d, "common word pad pad") for d in range(1, 5)] + [
        (5, "rare word pad pad")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = TA.bm25_topk(docs, [(1, "common rare")], k=5).orderBy("rank").collect()
    assert got[0]["doc_id"] == 5


def test_length_normalization_shorter_doc_wins(spark):
    """Equal tf, longer document -> smaller tf-saturation factor (b=3/4
    length penalty), so the short doc ranks first."""
    docs = spark.createDataFrame(
        [(1, "term " + "pad " * 50), (2, "term pad")],
        "doc_id long, text string",
    )
    got = TA.bm25_topk(docs, [(1, "term")], k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [2, 1]


def test_tie_breaks_on_doc_id_and_k_bound(spark):
    docs = spark.createDataFrame(
        [(d, "same text here") for d in (7, 3, 9, 1)],
        "doc_id long, text string",
    )
    got = TA.bm25_topk(docs, [(1, "same")], k=3).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [1, 3, 7]
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert len({r["bm25_score_micro"] for r in got}) == 1


def test_empty_queries_raise(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TA.bm25_topk(docs, [(1, "   ")])


# ---------------------------------------------------------------------------
# phrase_matches (positional phrase search)
# ---------------------------------------------------------------------------


def test_phrase_matches_counts_and_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),      # "a a" overlaps: 2 occurrences
            (2, "x a a y a a"),  # 2 non-adjacent occurrences
            (3, "a b a"),        # none
            (4, None),           # NULL text matches nothing
            (5, "a"),            # shorter than the phrase
        ],
        "doc_id long, text string",
    )
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in TA.phrase_matches(docs, [(1, "a a"), (2, "a b a")]).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 2, (2, 3): 1}


def test_phrase_matches_rejects_empty_phrase(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TA.phrase_matches(docs, [(1, "  ")])


def test_phrase_matches_regex_metachars_and_boundaries(spark):
    """The r11 regexp_count formulation must treat phrase tokens as
    LITERALS (regex metacharacters escaped) and match only at token
    boundaries — 'a' must not count inside 'aa', and a token containing
    a non-breaking space (one TOKEN under the ASCII-whitespace rule)
    must match itself exactly."""
    nb = "fast join"  # NBSP: one token on both engine and driver side
    docs = spark.createDataFrame(
        [
            (1, "c++ (x) c++"),   # metachars: +, (, )
            (2, "aa a aaa"),      # boundary anchoring for 'a'
            (3, f"{nb} z {nb}"),  # NBSP-bearing token
            (4, "a.b acb"),       # '.' must not act as regex wildcard
        ],
        "doc_id long, text string",
    )
    got = {
        (r["phrase_id"], r["doc_id"]): r["n_matches"]
        for r in TA.phrase_matches(
            docs, [(1, "c++"), (2, "(x)"), (3, "a"), (4, nb), (5, "a.b")]
        ).collect()
    }
    assert got == {
        (1, 1): 2,
        (2, 1): 1,
        (3, 2): 1,
        (4, 3): 2,
        (5, 4): 1,  # literal 'a.b' only — 'acb' would make this 2
    }
