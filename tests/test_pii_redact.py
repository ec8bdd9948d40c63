"""pii_redact (typed PII detect-and-replace) contracts:

- each type is found and replaced; counts equal replacements made;
- PROGRESSIVE semantics: a pattern occurring inside an earlier
  pattern's match is never double-counted (the IP-shaped host of an
  email is gone by the time the IPv4 pass runs);
- NULL text passes through as NULL with zero counts.
"""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark.operators.text_analysis import pii_redact


def _run(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in pii_redact(docs).collect()}


def test_each_type_redacts_and_counts(spark):
    got = _run(
        spark,
        [
            (1, "mail a.b@x.io and c@y.org now"),
            (2, "host 192.168.0.1 and 10.0.0.7"),
            (3, "call +1-555-0100 today"),
            (4, "clean text"),
        ],
    )
    assert got[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[2]["redacted"] == "host <IP> and <IP>"
    assert got[2]["n_ipv4"] == 2
    assert got[3]["redacted"] == "call <PHONE> today"
    assert got[3]["n_phone"] == 1
    assert got[4]["redacted"] == "clean text"
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (0, 0, 0)


def test_progressive_no_double_count(spark):
    """An email whose local part is digit-heavy contains an IPv4-shaped
    substring ONLY while the email is still present — after the email
    pass replaces it, the IPv4 pass must count zero."""
    got = _run(spark, [(1, "x 10.0.0.7@host.com y")])
    assert got[1]["n_email"] == 1
    assert got[1]["n_ipv4"] == 0
    assert got[1]["redacted"] == "x <EMAIL> y"


def test_null_text_passes_through(spark):
    got = _run(spark, [(1, None)])
    assert got[1]["redacted"] is None
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 0, 0)
