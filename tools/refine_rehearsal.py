"""What does `refine_rounds` buy the persisted ANN index? (VERDICT r14 #2)

`build_ann_index(refine_rounds=N)` founds the index on the TRAINED
quantizer (the shared integer-micro Lloyd rounds of `kmeans_refine`)
instead of the one-shot hash draw.  Lloyd's objective is within-cell
cosine tightness, which for IVF serving shows up as two measurables:

- **cell balance**: the one-shot draw leaves accidental hot cells; a
  hot cell inflates every lookup that probes it (probe cost is the sum
  of probed-cell sizes).  Measured: max/mean cell size and the mean
  rows actually scanned per query at nprobe=2.
- **recall**: tighter cells put true neighbors into the probed cells
  more often at fixed nprobe.  Measured: recall@K against
  `similarity.brute_force_topk` on the same corpus.

Method: build the unrefined and the refined (rounds=2) index over the
same fixture (default the 10x rehearsal blow-up if present, else
sf0.1), run the identical `ann_index_lookup` batch over both, and print
the SCALING.md row inputs.  Also verifies the TWO-LEVEL assignment
path engages at rehearsal K: a 1-round refine with
target_centroids > similarity._TWO_LEVEL_MIN_CENTROIDS must route
through `_assign_two_level` (asserted by instrumentation), the path a
100 TB corpus's isqrt(n) centroid count lands in by default.

Usage: python tools/refine_rehearsal.py
Nothing is persisted outside /tmp.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from apache_kafka_clickhouse_demo_spark.operators import (  # noqa: E402
    search_index as SI,
    similarity as SIM,
)
from apache_kafka_clickhouse_demo_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALE10 = str(REPO / ".scale10x")
DIM = 64
K = 10
NPROBE = 2
N_QUERIES = 64
ROUNDS = 2


def cell_stats(spark, table) -> tuple[int, float]:
    sizes = (
        table.read(spark)
        .filter(F.col("shard").startswith("v"))
        .groupBy("cent_id")
        .count()
        .collect()
    )
    ns = [r["count"] for r in sizes]
    return max(ns), sum(ns) / len(ns)


def probed_rows(spark, table, queries, nprobe: int) -> int:
    """Rows the lookup actually scans: sum of probed-cell sizes over the
    query batch (the serving-cost proxy ann_index_lookup's pruning
    bounds)."""
    from apache_kafka_clickhouse_demo_spark.functions import vectors as V
    from pyspark.sql import Window

    version = table.version()
    cents = table.read_where(spark, "shard", [SI.ANN_CENT_SHARD], version=version)
    q = queries.select(
        F.col("vec_id").alias("query_id"), V.normalize("embedding").alias("qn")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents.select("cent_id", "cv")))
        .select("query_id", "cent_id", V.dot("qn", "cv").alias("ccos"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cent_id")
    )
    sizes = (
        table.read(spark, version=version)
        .filter(F.col("shard").startswith("v"))
        .groupBy("cent_id")
        .count()
    )
    return (
        probes.join(sizes, "cent_id")
        .agg(F.sum("count").alias("s"))
        .first()["s"]
    )


def recall(spark, table, emb, queries) -> float:
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=K).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SI.ann_index_lookup(spark, table, queries, k=K, nprobe=NPROBE).collect()
    }
    return len(got & truth) / len(truth)


def main() -> None:
    spark = get_spark()
    fixture = SCALE10 if Path(SCALE10, "_BUILT").exists() else BASE
    emb = spark.read.parquet(f"{fixture}/embeddings.parquet")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    print(f"fixture: {fixture} ({n} vectors)")

    results = {}
    for label, rounds in (("unrefined", 0), ("refined", ROUNDS)):
        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            table = SI.build_ann_index(
                emb, f"{td}/ann", refine_rounds=rounds
            )
            build_s = time.time() - t0
            mx, mean = cell_stats(spark, table)
            rows = probed_rows(spark, table, queries, NPROBE)
            t0 = time.time()
            rec = recall(spark, table, emb, queries)
            look_s = time.time() - t0
            results[label] = (build_s, mx, mean, rows, rec)
            print(
                f"{label:10s} build {build_s:6.2f}s  max/mean cell "
                f"{mx}/{mean:.1f} = {mx / mean:.2f}x  probed rows/query "
                f"{rows / N_QUERIES:.1f}  recall@{K}(nprobe={NPROBE}) "
                f"{rec:.3f}  (lookup+truth pass {look_s:.1f}s)"
            )

    (b0, mx0, me0, r0, rec0) = results["unrefined"]
    (b1, mx1, me1, r1, rec1) = results["refined"]
    print(
        f"\nSCALING.md row: refine_rounds={ROUNDS} buys "
        f"hot-cell {mx0 / me0:.2f}x -> {mx1 / me1:.2f}x of mean, "
        f"probed rows/query {r0 / N_QUERIES:.1f} -> {r1 / N_QUERIES:.1f} "
        f"({r1 / r0:.2f}x), recall@{K} {rec0:.3f} -> {rec1:.3f}, "
        f"build {b0:.2f}s -> {b1:.2f}s ({b1 / b0:.2f}x)"
    )

    # --- two-level assignment engages at rehearsal K ------------------
    engaged = {"n": 0}
    orig = SIM._assign_two_level

    def spy(*a, **kw):
        engaged["n"] += 1
        return orig(*a, **kw)

    SIM._assign_two_level = spy
    try:
        k_big = SIM._TWO_LEVEL_MIN_CENTROIDS + 1
        cents, assign = SIM.kmeans_refine(
            emb, rounds=1, target_centroids=k_big
        )
        t0 = time.time()
        n_cells = assign.groupBy("cent_id").count().count()
        wall = time.time() - t0
    finally:
        SIM._assign_two_level = orig
    assert engaged["n"] >= 1, "two-level path did not engage"
    print(
        f"two-level assignment engaged at K={k_big} "
        f"({engaged['n']} invocations, {n_cells} non-empty cells, "
        f"round+count {wall:.1f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
