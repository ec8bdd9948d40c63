"""URL/host-level dedup (r10, VERDICT r9 #4): canonicalization,
public-suffix registered-domain extraction, URL-level dedup, and the
per-domain rollup.  Cross-engine value equality is pinned by the
url_dedup/domain_doc_counts oracle rows (tools/oracle_check.py); these
tests pin the SEMANTICS on hand-built cases the synthesized fixture URLs
cannot isolate (degenerate inputs, each canonicalization rule alone)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import text as TX
from apache_kafka_clickhouse_demo_spark.operators import dedup


def _norm(spark, *urls: str) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(TX.url_normalize("url")).collect()]


def _regdom(spark, *hosts: str) -> list[str]:
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [r[0] for r in df.select(TX.registered_domain(F.col("host"))).collect()]


def test_each_canonicalization_rule(spark):
    assert _norm(
        spark,
        "HTTP://WWW.Site1.CO.UK:443/p/3/?utm_source=x&b=2&a=1#frag",  # all rules
        "https://site.com:80/a",       # default http port stripped
        "https://site.com:8080/a",     # non-default port KEPT
        "https://site.com/a/",         # trailing slash
        "https://site.com/a?b=2&a=1",  # param order canonicalized
        "https://site.com/a?utm_campaign=x&fbclid=1",  # tracking-only -> no query
        "https://site.com/a?id=",      # empty VALUE is a real param, kept
    ) == [
        "http://site1.co.uk/p/3?a=1&b=2",
        "https://site.com/a",
        "https://site.com:8080/a",
        "https://site.com/a",
        "https://site.com/a?a=1&b=2",
        "https://site.com/a",
        "https://site.com/a?id=",
    ]


def test_registered_domain_psl_rules(spark):
    assert _regdom(
        spark,
        "x.y.example.com",   # 1-label suffix, deep subdomain
        "blog.site1.co.uk",  # 2-label suffix
        "site1.co.uk",       # exactly registered domain already
        "co.uk",             # host IS a public suffix (degenerate)
        "foo.bar.weirdtld",  # unknown TLD: PSL default '*' rule -> last 2
        "localhost",         # single label
    ) == [
        "example.com",
        "site1.co.uk",
        "site1.co.uk",
        "co.uk",
        "bar.weirdtld",
        "localhost",
    ]


def test_url_dedup_keeps_min_id_and_groups_correctly(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://www.site.com/a/"),
            (2, "HTTPS://site.com:443/a?utm_source=x"),  # dup of 1
            (3, "https://blog.site.com/a"),  # blog. is NOT strippable
            (4, "https://site.com/a?id=7"),  # real param -> distinct
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r["url_norm"] for r in dedup.url_dedup(docs).collect()}
    assert rows == {
        1: "https://site.com/a",
        3: "https://blog.site.com/a",
        4: "https://site.com/a?id=7",
    }


def test_invalid_urls_never_collapse(spark):
    """Degenerate-doc contract: NULL and unparseable URLs each survive as
    their own group (NULL canonical), never one shared '' bucket."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "not a url"), (4, "also-not-one"),
         (5, "https://real.com/x")],
        "doc_id long, url string",
    )
    out = dedup.url_dedup(docs).collect()
    assert len(out) == 5
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3, 4, 5]
    by_id = {r["doc_id"]: r for r in out}
    for bad in (1, 2, 3, 4):
        assert by_id[bad]["url_norm"] is None
        assert by_id[bad]["reg_domain"] is None
    assert by_id[5]["reg_domain"] == "real.com"


def test_domain_doc_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://www.site.com/a"),
            (2, "https://site.com/a#frag"),   # same canonical URL
            (3, "https://site.com/b"),        # same domain, new URL
            (4, "https://sub.site.co.uk/a"),  # different registered domain
        ],
        "doc_id long, url string",
    )
    rows = {
        r["reg_domain"]: (r["n_docs"], r["n_urls"])
        for r in dedup.domain_doc_counts(docs).collect()
    }
    assert rows == {"site.com": (3, 2), "site.co.uk": (1, 1)}


def test_plan_is_row_local_plus_single_aggregate(spark):
    """url_dedup at scale: no join anywhere (the suffix list is an InSet,
    not a table), exactly one exchange — the min-aggregate shuffle."""
    docs = spark.createDataFrame(
        [(1, "https://site.com/a")], "doc_id long, url string"
    )
    plan = dedup.url_dedup(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_domain_cap_keeps_lowest_ids(spark):
    docs = spark.createDataFrame(
        [(i, f"https://big.com/p/{i}") for i in range(10)]
        + [(100, "https://small.org/x"), (101, "https://small.org/y")],
        "doc_id long, url string",
    )
    out = dedup.domain_cap(docs, cap=3).collect()
    got = sorted((r["reg_domain"], r["doc_id"], r["domain_rank"]) for r in out)
    assert got == [
        ("big.com", 0, 1), ("big.com", 1, 2), ("big.com", 2, 3),
        ("small.org", 100, 1), ("small.org", 101, 2),
    ]


def test_domain_cap_two_level_matches_naive_window(spark):
    """The skew-safe two-level top-k must equal the naive single window
    for every (cap, pre_shards) — exactness of the per-shard prefilter."""
    from pyspark.sql import Window as W

    docs = spark.createDataFrame(
        [(i, f"https://dom{i % 5}.com/p/{i % 13}") for i in range(200)],
        "doc_id long, url string",
    )
    for cap, shards in ((1, 2), (4, 3), (7, 16)):
        fast = {
            (r["reg_domain"], r["doc_id"])
            for r in dedup.domain_cap(
                docs, cap=cap, pre_shards=shards, two_level=True
            ).collect()
        }
        parts = dedup.url_parts(docs)
        w = W.partitionBy("reg_domain").orderBy("doc_id")
        naive = {
            (r["reg_domain"], r["doc_id"])
            for r in parts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= cap)
            .collect()
        }
        assert fast == naive, (cap, shards)


def test_boilerplate_lines_strips_and_keeps(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://site.com/a", "FOOTER\ncontent one"),
            (2, "https://site.com/b", "FOOTER\ncontent two"),
            (3, "https://site.com/c", "content three"),   # no footer
            (4, "https://other.org/a", "FOOTER\nsolo"),   # 1 doc < min_docs
        ],
        "doc_id long, url string, text string",
    )
    rows = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in dedup.boilerplate_lines(docs, min_frac=0.5, min_docs=2).collect()
    }
    # FOOTER in 2/3 site.com docs (>=50%, >=2) -> stripped there; other.org
    # has it in 1 doc only -> kept (min_docs guard)
    assert rows == {
        1: ("content one", 2, 1),
        2: ("content two", 2, 1),
        3: ("content three", 1, 0),
        4: ("FOOTER\nsolo", 2, 0),
    }


def test_boilerplate_lines_degenerate_docs(spark):
    """All-boilerplate docs come out EMPTY (not missing); NULL-text docs
    pass through with NULL clean_text."""
    docs = spark.createDataFrame(
        [
            (1, "https://s.com/a", "FOOTER"),
            (2, "https://s.com/b", "FOOTER"),
            (3, "https://s.com/c", None),
        ],
        "doc_id long, url string, text string",
    )
    rows = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in dedup.boilerplate_lines(docs, min_frac=0.5, min_docs=2).collect()
    }
    assert rows == {1: ("", 1, 1), 2: ("", 1, 1), 3: (None, 0, 0)}


# ---------------------------------------------------------------------------
# Streaming URL dedup writer (driven directly, no stream harness)
# ---------------------------------------------------------------------------


def _url_writer(spark, tmp_path, tag="w"):
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _UrlDedupStreamWriter,
    )

    return _UrlDedupStreamWriter(
        spark,
        out_dir=str(tmp_path / f"out_{tag}"),
        store_dir=str(tmp_path / f"store_{tag}"),
        key_shards=4,
        writer_id=tag,
    )


def _out_rows(spark, writer):
    return {
        r["doc_id"]: r["url_norm"]
        for r in writer.out.read(spark).collect()
    }


def test_stream_url_dedup_first_arrival_across_blocks(spark, tmp_path):
    w = _url_writer(spark, tmp_path)
    b0 = spark.createDataFrame(
        [(1, "https://www.site.com/a/"), (2, "https://site.com/a?utm_source=x"),
         (3, "https://other.org/x")],
        "doc_id long, url string",
    )
    w.process(b0, 0)
    # block 1 re-crawls site.com/a (drops) and adds a fresh URL
    b1 = spark.createDataFrame(
        [(10, "HTTPS://site.com:443/a"), (11, "https://fresh.io/y")],
        "doc_id long, url string",
    )
    w.process(b1, 1)
    assert _out_rows(spark, w) == {
        1: "https://site.com/a",
        3: "https://other.org/x",
        11: "https://fresh.io/y",
    }


def test_stream_url_dedup_retry_is_idempotent(spark, tmp_path):
    """A replayed batch id (foreachBatch retry) must publish nothing new —
    including the half-committed case where the store landed but out did
    not (the != doc_id guard's whole purpose)."""
    w = _url_writer(spark, tmp_path)
    b0 = spark.createDataFrame(
        [(1, "https://a.com/1"), (2, "https://a.com/1#frag")],
        "doc_id long, url string",
    )
    w.process(b0, 0)
    first = _out_rows(spark, w)
    w.process(b0, 0)  # full replay
    assert _out_rows(spark, w) == first == {1: "https://a.com/1"}
    # half-committed replay: wipe ONLY the out table's txn marker by
    # simulating a new writer against the same store with the same txn —
    # the store append no-ops, survivors re-derive identically, and the
    # out append must publish the SAME single row (not zero, not two)
    w2 = _url_writer(spark, tmp_path, tag="w")
    w2.out = type(w.out)(str(tmp_path / "out_fresh"))
    w2.process(b0, 0)
    assert _out_rows(spark, w2) == first


def test_stream_url_dedup_invalid_urls_never_collapse(spark, tmp_path):
    w = _url_writer(spark, tmp_path)
    b0 = spark.createDataFrame(
        [(1, None), (2, None), (3, "garbage")], "doc_id long, url string"
    )
    w.process(b0, 0)
    out = _out_rows(spark, w)
    assert sorted(out) == [1, 2, 3]
    assert all(v is None for v in out.values())


def test_stream_url_dedup_store_read_is_shard_pruned(spark, tmp_path):
    """The suppression read must touch only the block's own key shards."""
    from apache_kafka_clickhouse_demo_spark.sources import txlog as TXL

    w = _url_writer(spark, tmp_path)
    w.process(
        spark.createDataFrame(
            [(i, f"https://s{i}.com/p") for i in range(20)],
            "doc_id long, url string",
        ),
        0,
    )
    calls = []
    orig = TXL.TransactionalTable.read_where

    def spy(self, spark_, col, values, version=None):
        calls.append(sorted(values))
        return orig(self, spark_, col, values, version=version)

    TXL.TransactionalTable.read_where = spy
    try:
        w.process(
            spark.createDataFrame(
                [(100, "https://s1.com/p")], "doc_id long, url string"
            ),
            1,
        )
    finally:
        TXL.TransactionalTable.read_where = orig
    assert len(calls) == 1 and len(calls[0]) == 1  # one shard for one key


def test_url_blocklist_blocks_subdomains_not_substrings(spark):
    """A blocked REGISTERED domain drops all its subdomain URLs; a
    domain merely containing the blocked name as a substring survives;
    unparseable URLs (NULL reg_domain) pass through by contract."""
    from apache_kafka_clickhouse_demo_spark.operators.dedup import (
        url_blocklist_filter,
    )

    rows = [
        (1, "https://evil.co.uk/a"),
        (2, "http://www.evil.co.uk/b"),
        (3, "https://blog.evil.co.uk/c"),
        (4, "https://notevil.co.uk/d"),     # substring, different domain
        (5, "https://evil.co.uk.phish.com/e"),  # blocked name in a SUBDOMAIN
        (6, "not a url"),                    # unparseable -> survives
        (7, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"] for r in url_blocklist_filter(docs, ["evil.co.uk"]).collect()}
    assert got == {4, 5, 6, 7}


def test_domain_token_cap_budget_boundary_and_charge_floor(spark):
    """r15: a doc is kept iff its RUNNING greatest(ws_tokens, 1) charge
    fits the budget in doc_id order; a zero/empty-text doc charges 1
    (the floor that bounds the skew prune), and a doc that would
    overflow the budget is dropped along with everything after it."""
    rows = [
        (0, "https://big.com/a", "one two three"),          # 3 -> cum 3
        (1, "https://big.com/b", ""),                        # floor 1 -> 4
        (2, "https://big.com/c", "a b c d e"),               # 5 -> 9
        (3, "https://big.com/d", "x y"),                     # 2 -> 11 > 10
        (4, "https://big.com/e", "z"),                       # after overflow
        (5, "https://tiny.org/a", " ".join(["t"] * 10)),     # 10 -> exactly 10
        (6, "https://tiny.org/b", "u"),                      # 1 -> 11 > 10
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {
        r["doc_id"]: (r["reg_domain"], r["doc_tokens"], r["cum_tokens"])
        for r in dedup.domain_token_cap(docs, budget=10).collect()
    }
    assert out == {
        0: ("big.com", 3, 3),
        1: ("big.com", 1, 4),
        2: ("big.com", 5, 9),
        5: ("tiny.org", 10, 10),
    }


def test_domain_token_cap_two_level_matches_naive_window(spark):
    """The budget-rank prefilter is exact: two_level=True equals the
    naive single-window cumsum for every (budget, pre_shards), including
    a skewed domain far larger than the budget."""
    from pyspark.sql import Window as W

    rows = [
        (i, f"https://dom{i % 3}.com/p", "w " * ((i % 7) + 1)) for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    for budget, shards in ((5, 2), (23, 3), (80, 16)):
        fast = {
            (r["doc_id"], r["cum_tokens"])
            for r in dedup.domain_token_cap(
                docs, budget=budget, pre_shards=shards, two_level=True
            ).collect()
        }
        t = F.trim(F.lower(F.col("text")))
        charge = F.greatest(F.size(F.split(t, r"\s+")), F.lit(1)).cast("long")
        parts = dedup.url_parts(docs).join(
            docs.select("doc_id", charge.alias("doc_tokens")), "doc_id"
        )
        w = (
            W.partitionBy("reg_domain")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        naive = {
            (r["doc_id"], r["cum_tokens"])
            for r in parts.withColumn("cum_tokens", F.sum("doc_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget)
            .collect()
        }
        assert fast == naive, (budget, shards)
