"""quality_classifier (DCLM/fastText-analog hashed linear model) contracts:

- the Python weight table, the Spark expression form, and (via the oracle
  check) the DuckDB formula all agree bit-for-bit;
- the trained-weights JOIN path scores identically to the inline
  literal-array path when fed the same vector;
- NULL text scores as empty text; the keep flag is an exact integer
  threshold on mean milli-weight per feature.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def test_weight_table_matches_expression_form(spark):
    """qc_weight_table (Python md5) == _qc_weight (Spark md5 expression)
    over every bucket id — the bit-identity that makes the literal-array
    optimization safe and the oracle exact."""
    table = TA.qc_weight_table()
    assert len(table) == TA.QC_BUCKETS
    df = spark.range(TA.QC_BUCKETS).select(
        F.col("id").cast("int").alias("bucket"),
        TA._qc_weight(F.col("id")).alias("w_expr"),
    )
    got = {r["bucket"]: r["w_expr"] for r in df.collect()}
    assert got == {b: w for b, w in enumerate(table)}
    assert all(-TA.QC_WEIGHT_SPAN <= w <= TA.QC_WEIGHT_SPAN for w in table)


def test_trained_weights_path_equals_inline_path(spark, sf_dir):
    """Feeding the demo vector through the `weights` DataFrame argument
    (explode + broadcast join + re-aggregate) must reproduce the inline
    row-local scores exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inline = TA.quality_classifier(docs).orderBy("doc_id").collect()
    wdf = spark.createDataFrame(
        [(b, w) for b, w in enumerate(TA.qc_weight_table())],
        "bucket int, weight long",
    )
    joined = TA.quality_classifier(docs, weights=wdf).orderBy("doc_id").collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in joined]


def test_null_and_empty_text_and_threshold(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "good text here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TA.quality_classifier(docs).collect()}
    # NULL scores exactly as empty text (same features, same score)
    assert (
        rows[1]["n_features"],
        rows[1]["weight_sum"],
        rows[1]["keep"],
    ) == (rows[2]["n_features"], rows[2]["weight_sum"], rows[2]["keep"])
    # keep is the integer mean-threshold, no float comparison involved
    for r in rows.values():
        assert r["keep"] == (r["weight_sum"] * 1000 >= TA.QC_TAU_MILLIS * r["n_features"])
        assert r["n_features"] >= 1  # tokenization never yields zero features


def test_threshold_moves_the_keep_boundary(spark):
    """tau_millis is a real knob: raising it can only shrink the kept set,
    and a tau above the max mean weight drops everything."""
    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some words") for i in range(20)],
        "doc_id long, text string",
    )
    base = TA.quality_classifier(docs, tau_millis=0)
    kept0 = {r["doc_id"] for r in base.filter("keep").collect()}
    kept_hi = {
        r["doc_id"]
        for r in TA.quality_classifier(docs, tau_millis=500).filter("keep").collect()
    }
    assert kept_hi <= kept0
    assert (
        TA.quality_classifier(docs, tau_millis=1001 * 1000).filter("keep").count() == 0
    )
