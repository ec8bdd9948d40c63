"""Property test: the text/hash primitives match DuckDB bit-for-bit on
random inputs — these primitives are the foundation EVERY hash oracle
(MinHash, SimHash, fingerprints, train/test split) is built on, so a
divergence here would silently invalidate many gate checks at once.

Input domain: printable ASCII (the fixture corpus domain).  Known edge
outside it: Java regex \\s includes \\x0B (vertical tab), RE2's does not —
documents containing control characters are outside the oracle contract.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.functions import text as TX

_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=60,
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_tokens_shingles_h48_match_duckdb(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    toks = TX.tokens("text")
    got = {
        r["doc_id"]: (r["h"], r["toks"], r["sh"], r["sig"])
        for r in sdf.select(
            "doc_id",
            H.h48(F.lower(F.trim(F.col("text")))).alias("h"),
            toks.alias("toks"),
            TX.word_shingles(toks, 3).alias("sh"),
            H.minhash_signature(F.array_distinct(TX.word_shingles(toks, 3)), 6).alias("sig"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql_toks = TX.sql_tokens("text")
    sql = f"""
    WITH t AS (
      SELECT doc_id, {H.sql_h48('lower(trim(text))')} AS h,
             {sql_toks} AS toks,
             {TX.sql_word_shingles(sql_toks, 3)} AS sh
      FROM docs
    ), hs AS (
      SELECT doc_id, h, toks, sh,
             {H.sql_hashed_shingles('list_distinct(sh)')} AS hashed
      FROM t
    )
    SELECT doc_id, h, toks, sh, {H.sql_minhash_signature('hashed', 6)} AS sig
    FROM hs
    """
    want = {
        d: (h, list(tk), list(s), list(sg))
        for d, h, tk, s, sg in con.execute(sql).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# URL primitives (r10): normalization + registered-domain must match DuckDB
# bit-for-bit — the url_dedup/domain_cap/boilerplate oracles are built on
# them.  The strategy composes STRUCTURED urls from adversarial parts
# (case, ports, dots, tracking params, empty segments, fragments) rather
# than raw text: an unparseable string is outside the operator contract
# (url_parts guards it to NULL before these expressions run).
# ---------------------------------------------------------------------------

_label = st.text(
    alphabet=st.sampled_from("abcXYZ019-"), min_size=1, max_size=6
).filter(lambda s: not s.startswith("-"))
_urls = st.lists(
    st.builds(
        lambda scheme, labels, port, segs, params, frag: (
            scheme
            + "://"
            + ".".join(labels)
            + port
            + "".join("/" + s for s in segs)
            + ("?" + "&".join(params) if params else "")
            + frag
        ),
        scheme=st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        labels=st.lists(_label, min_size=1, max_size=4),
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        segs=st.lists(
            st.text(alphabet=st.sampled_from("abc09._-~"), max_size=5),
            max_size=3,
        ),
        params=st.lists(
            st.sampled_from(
                ["a=1", "b=2", "id=7", "utm_source=x", "utm_campaign=y",
                 "fbclid=z", "ref=r", "q=", ""]
            ),
            max_size=4,
        ),
        frag=st.sampled_from(["", "#f", "#a/b?c=1"]),
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=_urls)
def test_url_primitives_match_duckdb(spark, urls):
    rows = [(i, u) for i, u in enumerate(urls)]
    sdf = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: (r["n"], r["h"], r["rd"])
        for r in sdf.select(
            "doc_id",
            TX.url_normalize("url").alias("n"),
            TX.url_host("url").alias("h"),
            TX.registered_domain(TX.url_host("url")).alias("rd"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "url"]))
    sql = f"""
    SELECT doc_id,
           {TX.sql_url_normalize('url')} AS n,
           {TX.sql_url_host('url')} AS h,
           {TX.sql_registered_domain(TX.sql_url_host('url'))} AS rd
    FROM docs
    """
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == want
