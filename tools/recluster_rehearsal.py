"""Skewed-drift rehearsal for the ANN recluster path (VERDICT r11 #3).

The honest IVF trade: `extend_ann_index` assigns new vectors against the
FOUNDING centroids, so a drifted corpus piles into few cells and probe
cost degrades toward a scan of the hot cell.  This rehearsal builds that
failure deliberately, then shows `maintain_ann_index(recluster=True)`
recovering probe cost:

- founding segment: the sf0.1 embeddings fixture (isotropic-ish);
- drift segment: DRIFT_FACTOR x founding count of HUB vectors — every
  one in a tight cosine-~1 neighborhood of a direction the founding
  corpus barely covers (deterministic h48 jitter), so fixed-centroid
  assignment funnels them into one or two founding cells;
- measure: hub-query lookup wall + probed-cell row count on the grown
  index, then again after recluster (new generation sized by the FULL
  corpus: K = isqrt(n_total)).

Usage: python tools/recluster_rehearsal.py
Prints the SCALING.md row inputs; nothing is persisted outside /tmp.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from apache_kafka_clickhouse_demo_spark.functions import hashing as H  # noqa: E402
from apache_kafka_clickhouse_demo_spark.operators import search_index as SI  # noqa: E402
from apache_kafka_clickhouse_demo_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
DRIFT_FACTOR = 4
DIM = 64
NPROBE = 2
K_QUERIES = 32


def hub_vectors(spark, n: int, id_offset: int):
    """n deterministic vectors in a cone around e1: component 1 is 1.0,
    the rest h48-jitter in [0, 0.25) — pairwise cosine high enough that
    founding centroids (from an unrelated distribution) funnel them into
    few cells, wide enough that a reclustered generation can genuinely
    partition the cone."""
    # jitter keys on the OFFSET id (code-review r12: keying on the raw
    # spark.range id made the query batch byte-identical twins of drift
    # vectors 0..31 — every lookup a degenerate cos=1 self-match)
    vid = F.col("id") + id_offset
    jit = lambda i: (  # noqa: E731
        F.pmod(
            H.h48(
                F.concat(
                    F.lit("drift:"),
                    vid.cast("string"),
                    F.lit(":"),
                    i.cast("string"),
                )
            ),
            F.lit(1000),
        ).cast("double")
        / 4000.0
    )
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: F.when(i == 1, F.lit(1.0)).otherwise(jit(i)),
    )
    return spark.range(n).select(vid.alias("vec_id"), vec.alias("embedding"))


def probed_cell_rows(spark, table, queries) -> int:
    """Row count of the cells the hub queries probe — the quantity probe
    cost is proportional to."""
    from apache_kafka_clickhouse_demo_spark.functions import vectors as V
    from pyspark.sql import Window

    version = table.version()
    _, n_shards = SI.ann_index_meta(spark, table, version=version)
    cents = table.read_where(spark, "shard", ["cent"], version=version).select(
        "cent_id", "cv"
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.normalize("embedding").alias("qn")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    cells = [
        r["cent_id"]
        for r in q.crossJoin(F.broadcast(cents))
        .select("query_id", "cent_id", V.dot("qn", "cv").alias("ccos"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= NPROBE)
        .select("cent_id")
        .distinct()
        .collect()
    ]
    shards = sorted({f"v{c % n_shards}" for c in cells})
    return (
        table.read_where(spark, "shard", shards, version=version)
        .filter(F.col("cent_id").isin(cells))
        .count()
    )


def timed_lookup(spark, table, queries) -> float:
    t0 = time.time()
    SI.ann_index_lookup(spark, table, queries, k=10, nprobe=NPROBE).collect()
    return time.time() - t0


def main() -> None:
    spark = get_spark()
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n0 = emb.count()
    drift = hub_vectors(spark, DRIFT_FACTOR * n0, id_offset=10_000_000)
    queries = hub_vectors(spark, K_QUERIES, id_offset=90_000_000)

    work = tempfile.mkdtemp(prefix="reclust_rehearsal_")
    table = SI.build_ann_index(emb, f"{work}/ann", corpus_count=(1 + DRIFT_FACTOR) * n0)
    SI.extend_ann_index(drift, table)

    rows_grown = probed_cell_rows(spark, table, queries)
    t_grown = min(timed_lookup(spark, table, queries) for _ in range(2))

    t0 = time.time()
    SI.maintain_ann_index(spark, table, recluster=True)
    t_reclust = time.time() - t0

    rows_after = probed_cell_rows(spark, table, queries)
    t_after = min(timed_lookup(spark, table, queries) for _ in range(2))

    print(
        f"founding={n0} drift={DRIFT_FACTOR * n0} "
        f"probed_rows grown={rows_grown} reclustered={rows_after} "
        f"lookup_s grown={t_grown:.2f} reclustered={t_after:.2f} "
        f"recluster_pass_s={t_reclust:.1f}"
    )


if __name__ == "__main__":
    main()
