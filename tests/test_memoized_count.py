"""_memoized_count cache-key safety (VERDICT r4 #5 / ADVICE r4): the IVF
sampling modulus must never come from a stale corpus count."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.operators import similarity as S


def test_count_invalidates_when_table_data_changes(spark, tmp_path):
    """Appending files to a table (same semantic plan, new data) must yield
    a fresh count — a stale one silently fixes a wrong IVF modulus."""
    path = str(tmp_path / "corpus")
    spark.range(0, 100).select(F.col("id").alias("vec_id")).write.parquet(path)
    assert S._memoized_count(spark.read.parquet(path)) == 100

    spark.range(100, 250).select(F.col("id").alias("vec_id")).write.mode(
        "append"
    ).parquet(path)
    assert S._memoized_count(spark.read.parquet(path)) == 250  # not 100


def test_count_cache_key_is_session_uid_not_object_id(spark, tmp_path):
    """The key's session component is `spark.app.id` (unique per session
    lifetime), never `id(session)` — a recycled object address from a NEW
    session must not alias a stopped session's entries."""
    path = str(tmp_path / "corpus2")
    spark.range(0, 7).write.parquet(path)
    df = spark.read.parquet(path)
    S._memoized_count(df)

    app_id = spark.conf.get("spark.app.id")
    matching = [k for k in S._COUNT_CACHE if k[0] == app_id]
    assert matching, "cache key must embed spark.app.id"
    assert all(isinstance(k[0], str) for k in S._COUNT_CACHE)

    # memoization still works: same plan + same data -> cached (no rescan)
    before = dict(S._COUNT_CACHE)
    S._memoized_count(spark.read.parquet(path))
    assert dict(S._COUNT_CACHE) == before
