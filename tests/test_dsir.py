"""DSIR (Xie et al. 2023 importance-resampling data selection) contracts:

- the Python demo lambda table and the Spark expression form agree
  bit-for-bit (the identity that makes the literal-array staging safe
  and the oracle exact);
- `dsir_fit` learns the documented add-alpha log-ratio exactly (checked
  against an independent pure-Python recount of the hashed features);
- a table fit on a two-domain corpus ranks target-domain docs above
  off-domain docs through `dsir_select`;
- `dsir_weights` matches a pure-Python application of the same table;
  NULL text scores as empty; k bounds and doc_id tie-breaks hold.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def _py_feats(text: str | None) -> list[str]:
    """Pure-Python mirror of TX.tokens + word_shingles(2) concat."""
    toks = (text or "").lower().split() or [""]
    if len(toks) < 2:
        bigrams = [" ".join(toks)]
    else:
        bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    return toks + bigrams


def _py_bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:12], 16) % TA.QC_BUCKETS


def test_demo_table_matches_expression_form(spark):
    table = TA.dsir_lambda_table()
    assert len(table) == TA.QC_BUCKETS
    df = spark.range(TA.QC_BUCKETS).select(
        F.col("id").cast("int").alias("b"),
        TA._dsir_demo_lambda(F.col("id")).alias("w"),
    )
    got = {r["b"]: r["w"] for r in df.collect()}
    assert got == dict(enumerate(table))
    # distinct from the classifier's demo model (different salt)
    assert table != TA.qc_weight_table()


def test_fit_matches_pure_python_log_ratio(spark):
    target = [(1, "alpha beta gamma"), (2, "alpha alpha beta")]
    raw = [(1, "delta epsilon"), (2, "alpha zeta"), (3, None)]
    lam = TA.dsir_fit(
        spark.createDataFrame(target, "doc_id long, text string"),
        spark.createDataFrame(raw, "doc_id long, text string"),
        alpha=1,
        scale_millis=1000,
    )
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, t in target:
        for f in _py_feats(t):
            b = _py_bucket(f)
            tc[b] = tc.get(b, 0) + 1
    for _, t in raw:
        for f in _py_feats(t):
            b = _py_bucket(f)
            rc[b] = rc.get(b, 0) + 1
    td = sum(tc.values()) + TA.QC_BUCKETS
    rd = sum(rc.values()) + TA.QC_BUCKETS
    want = [
        round(
            1000
            * (
                math.log((tc.get(b, 0) + 1) / td)
                - math.log((rc.get(b, 0) + 1) / rd)
            )
        )
        for b in range(TA.QC_BUCKETS)
    ]
    assert lam == want


def test_fit_then_select_prefers_target_domain(spark):
    """Fit on a target sample about one vocabulary, select from a mixed
    pool: every top-k pick must be a target-domain doc."""
    target = spark.createDataFrame(
        [(i, "spark shuffle partition executor codegen") for i in range(10)],
        "doc_id long, text string",
    )
    pool_rows = [
        (i, "spark shuffle partition executor codegen tuning") for i in range(5)
    ] + [(100 + i, "banana smoothie recipe with mango and kale") for i in range(5)]
    pool = spark.createDataFrame(pool_rows, "doc_id long, text string")
    lam = TA.dsir_fit(target, pool)
    got = TA.dsir_select(pool, k=5, lam=lam).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3, 4]


def test_weights_match_pure_python_and_null_text(spark):
    lam = TA.dsir_lambda_table()
    rows = [(1, "alpha beta"), (2, None), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_features"], r["weight_millis"])
           for r in TA.dsir_weights(docs).collect()}
    for d, t in rows:
        feats = _py_feats(t)
        want = sum(lam[_py_bucket(f)] for f in feats)
        assert got[d] == (len(feats), want), d
    # NULL and empty text score identically (both -> [''])
    assert got[2] == got[3]


def test_select_k_bound_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(d, "identical text") for d in (9, 2, 5, 7)],
        "doc_id long, text string",
    )
    got = TA.dsir_select(docs, k=2).collect()
    assert [r["doc_id"] for r in got] == [2, 5]


def test_bad_table_length_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        TA.dsir_weights(docs, lam=[1, 2, 3])


# ---------------------------------------------------------------------------
# bigram_rarity (interpolated bigram-LM surprisal)
# ---------------------------------------------------------------------------


def test_bigram_rarity_matches_pure_python(spark):
    rows = [
        (1, "a b a b c"),
        (2, "a a"),
        (3, "zz"),     # single token: no bigram, no output row
        (4, None),     # NULL text: no output row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_mass"])
        for r in TA.bigram_rarity(docs).collect()
    }
    toks = {d: t.lower().split() for d, t in rows if t}
    uni: dict[str, int] = {}
    bg: dict[tuple[str, str], int] = {}
    for tk in toks.values():
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for p, c in zip(tk, tk[1:]):
            bg[(p, c)] = bg.get((p, c), 0) + 1
    tt = sum(uni.values())
    want = {}
    for d, tk in toks.items():
        ps = list(zip(tk, tk[1:]))
        if not ps:
            continue
        mass = sum(
            (2 * uni[p] * tt) // (bg[(p, c)] * tt + uni[c] * uni[p])
            for p, c in ps
        )
        want[d] = (len(ps), mass)
    assert got == want
    assert 3 not in got and 4 not in got


def test_bigram_rarity_rare_continuation_scores_higher(spark):
    """Rare continuations of a COMMON prefix must out-score the prefix's
    dominant continuation — the conditional-surprisal direction that
    distinguishes the bigram filter from the unigram one.  Doc 1 repeats
    'the cat' (p(cat|the) = 1/2 across the corpus); doc 2 pairs the same
    'the' with ten one-off continuations (p(ri|the) = 1/20 each)."""
    doc1 = "the cat " * 10
    doc2 = " ".join(f"the r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, doc1.strip()), (2, doc2)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["avg_rarity"] for r in TA.bigram_rarity(docs).collect()}
    assert got[2] > got[1]
