"""Phase-wall profiler for the batch index-build gate rows (r16,
VERDICT r15 tasks 3/4): times each driver-sequential phase of
build_ivfpq_index / extend / recluster and of build_term_index +
bm25_lookup, so the scheduler-idle question ("is there serial driver
time between independent training jobs?") is answered with numbers
before any overlap is attempted (guide §1).

Usage: python tools/profile_index_builds.py [ivfpq|bm25|ann] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apache_kafka_clickhouse_demo_spark.session import get_spark  # noqa: E402
from apache_kafka_clickhouse_demo_spark import queries as Q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_ivfpq(spark, variant: str):
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI
    from apache_kafka_clickhouse_demo_spark.operators.similarity import (
        _lloyd_rounds,
        _memoized_count,
        ivf_quantize,
        pq_codes,
    )
    from apache_kafka_clickhouse_demo_spark.sources.txlog import (
        TransactionalTable,
    )

    emb = Q._t(spark, SF_DIR, "embeddings")
    if variant != "indexed":
        founding = emb.filter(F.expr(Q.ANN_GROWN_FOUNDING_PRED))
        growth = emb.filter(~F.expr(Q.ANN_GROWN_FOUNDING_PRED))
    else:
        founding, growth = emb, None
    work = Q._workdir("prof_ivfpq_")
    path = f"{work}/ix"
    t: dict[str, float] = {}

    t0 = time.time()
    n = _memoized_count(founding)
    t["count"] = time.time() - t0

    t0 = time.time()
    cents, assign = ivf_quantize(
        founding, Q.IVF_TARGET_CENTROIDS, "embedding", "vec_id", Q.IVF_SALT, n
    )
    cb, codes = pq_codes(
        founding,
        Q.EMBED_DIM,
        m=Q.PQ_M,
        target_codes=Q.PQ_TARGET_CODES,
        vec_col="embedding",
        id_col="vec_id",
        salt="pq:",
        corpus_count=n,
    )
    t["plan"] = time.time() - t0

    t0 = time.time()
    cents_empty = cents.isEmpty()
    t["cents_isEmpty"] = time.time() - t0
    t0 = time.time()
    cb_empty = cb.isEmpty()
    t["cb_isEmpty"] = time.time() - t0
    assert not cents_empty and not cb_empty

    table = TransactionalTable(path)
    n_shards = SI.shards_for_store(n)
    t0 = time.time()
    table.append(
        SI._ivfpq_segment_frames(
            assign, codes, n_shards, Q.PQ_M, Q.EMBED_DIM, cents, cb
        ),
        partition_by="shard",
        cas_version=-1,
    )
    t["append"] = time.time() - t0

    if variant in ("grown", "reclustered"):
        t0 = time.time()
        SI.extend_ivfpq_index(growth, table, ivf_salt=Q.IVF_SALT)
        t["extend"] = time.time() - t0
    if variant == "reclustered":
        t0 = time.time()
        SI.maintain_ivfpq_index(
            spark,
            table,
            recluster=True,
            target_centroids=Q.IVF_TARGET_CENTROIDS,
            salt=Q.IVF_SALT,
        )
        t["recluster"] = time.time() - t0

    t0 = time.time()
    _noop(
        SI.ivfpq_index_lookup(
            spark,
            table,
            emb.filter(F.col("vec_id") < Q.ANN_NUM_QUERIES),
            k=Q.ANN_K,
            nprobe=Q.IVF_NPROBE,
        ).orderBy("query_id", "rank")
    )
    t["lookup"] = time.time() - t0
    return t


def profile_bm25(spark):
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    docs = Q._t(spark, SF_DIR, "documents")
    work = Q._workdir("prof_bm25_")
    t: dict[str, float] = {}
    t0 = time.time()
    table = SI.build_term_index(docs, f"{work}/idx", n_shards=64)
    t["build"] = time.time() - t0
    t0 = time.time()
    _noop(
        SI.bm25_lookup(spark, table, Q.BM25_QUERIES, k=Q.BM25_K).orderBy(
            "query_id", "rank"
        )
    )
    t["lookup"] = time.time() - t0
    return t


def profile_ann(spark, variant: str):
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = Q._t(spark, SF_DIR, "embeddings")
    founding = emb.filter(F.expr(Q.ANN_GROWN_FOUNDING_PRED))
    growth = emb.filter(~F.expr(Q.ANN_GROWN_FOUNDING_PRED))
    work = Q._workdir("prof_ann_")
    t: dict[str, float] = {}
    t0 = time.time()
    table = SI.build_ann_index(
        founding,
        f"{work}/ix",
        target_centroids=Q.IVF_TARGET_CENTROIDS,
        salt=Q.IVF_SALT,
    )
    t["build"] = time.time() - t0
    t0 = time.time()
    SI.extend_ann_index(growth, table, salt=Q.IVF_SALT)
    t["extend"] = time.time() - t0
    if variant == "reclustered":
        t0 = time.time()
        SI.maintain_ann_index(
            spark,
            table,
            recluster=True,
            target_centroids=Q.IVF_TARGET_CENTROIDS,
            salt=Q.IVF_SALT,
        )
        t["recluster"] = time.time() - t0
    t0 = time.time()
    _noop(
        SI.ann_index_lookup(
            spark,
            table,
            emb.filter(F.col("vec_id") < Q.ANN_NUM_QUERIES),
            k=Q.ANN_K,
            nprobe=Q.IVF_NPROBE,
        ).orderBy("query_id", "rank")
    )
    t["lookup"] = time.time() - t0
    return t


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "ivfpq"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name=f"profile_{which}")
    Q.ALL_QUERIES["count_events"](spark, SF_DIR).collect()  # warm-up
    for p in range(passes):
        spark.catalog.clearCache()
        if which == "bm25":
            t = profile_bm25(spark)
        elif which == "ann":
            t = profile_ann(spark, "reclustered")
        elif which in ("indexed", "grown", "reclustered"):
            t = profile_ivfpq(spark, which)
        else:
            t = profile_ivfpq(spark, "reclustered")
        total = sum(t.values())
        print(
            f"pass {p}: total={total:.2f}s  "
            + "  ".join(f"{k}={v:.2f}" for k, v in t.items()),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
