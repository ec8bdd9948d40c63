"""bloom_decontaminate (r9): Bloom-prefiltered eval decontamination.

Exactness contract: the Bloom filter has no false negatives and every hit
is confirmed by the exact hash equi-join, so the OUTPUT is byte-identical
to cross_split_contamination for ANY (m_bits, k) — undersizing the filter
raises only the false-positive (extra-work) rate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.operators import dedup


@pytest.fixture(scope="module")
def split_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bucket = H.h48(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return docs.withColumn(
        "split", F.when(bucket < 80, F.lit("train")).otherwise(F.lit("test"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_direct_join_exactly(split_docs):
    direct = dedup.cross_split_contamination(
        split_docs, shingle_n=5, report_split="train", against_split="test"
    )
    bloom = dedup.bloom_decontaminate(split_docs, shingle_n=5)
    assert _rows(bloom) == _rows(direct)
    assert bloom.columns == direct.columns


def test_output_independent_of_filter_sizing(split_docs):
    """A pathologically small filter (m=64 bits, k=1 — nearly every probe
    a false positive) must still produce the exact answer: FPs die in the
    verify join."""
    base = _rows(dedup.bloom_decontaminate(split_docs, shingle_n=5))
    tiny = _rows(
        dedup.bloom_decontaminate(split_docs, shingle_n=5, m_bits=64, k=1)
    )
    big = _rows(
        dedup.bloom_decontaminate(split_docs, shingle_n=5, m_bits=1 << 24, k=6)
    )
    assert tiny == base
    assert big == base


def test_no_test_side_means_no_output(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g", "train"), (2, "a b c d e f g", "train")],
        "doc_id long, text string, split string",
    )
    assert dedup.bloom_decontaminate(docs, shingle_n=3).count() == 0


def test_rejects_unaligned_bitmap(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "train")], "doc_id long, text string, split string"
    )
    with pytest.raises(ValueError):
        dedup.bloom_decontaminate(docs, m_bits=100)
    # m_bits=0 would silently NULL every pmod probe (false negatives);
    # k=0 would raise a confusing TypeError deep in reduce() — both must
    # fail loudly at the door instead.
    with pytest.raises(ValueError):
        dedup.bloom_decontaminate(docs, m_bits=0)
    with pytest.raises(ValueError):
        dedup.bloom_decontaminate(docs, m_bits=-64)
    with pytest.raises(ValueError):
        dedup.bloom_decontaminate(docs, k=0)


def test_shared_gram_counts_are_exact(spark):
    """Hand-built corpus: train doc 1 shares exactly three distinct 3-grams
    with the test side, train doc 2 shares none."""
    docs = spark.createDataFrame(
        [
            (1, "x y z q r s", "train"),   # grams {x y z, y z q, z q r, q r s}
            (2, "u v w a b c", "train"),
            (10, "x y z q r", "test"),     # shares "x y z", "y z q", "z q r"
        ],
        "doc_id long, text string, split string",
    )
    rows = {r["doc_id"]: r["n_shared_shingles"] for r in
            dedup.bloom_decontaminate(docs, shingle_n=3).collect()}
    assert rows == {1: 3}
