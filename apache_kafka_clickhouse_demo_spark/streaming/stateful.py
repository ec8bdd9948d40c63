"""Stateful streaming operators beyond the MV cascade (SURVEY.md §2.7).

The reference's MVs are stateless per insert block; these are the Spark
constructs a production pipeline adds on top for late/duplicate data and
custom per-key state:

- `streaming_dedup`       : exactly-once event dedup under a watermark
  (`dropDuplicatesWithinWatermark`) — state is bounded by the watermark
  delay instead of growing forever, which is what makes streaming dedup
  viable on an unbounded 100 TB/day feed.
- `windowed_counts`       : watermarked tumbling-window aggregation in
  append mode — closed windows are emitted exactly once.
- `running_totals`        : custom per-key state via
  `applyInPandasWithState` (Arrow-batched): running event count + value sum
  per key across micro-batches, the minimal template for bespoke stateful
  logic Spark's built-ins can't express.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    source: DataFrame,
    keys: list[str],
    watermark_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate events (same `keys`) arriving within the watermark.

    State per key is dropped once the watermark passes, so memory is
    bounded by (event rate x delay), not stream length.
    """
    return source.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


def windowed_counts(
    source: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    keys: Iterable[str] = (),
    delay: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts (append mode emits each closed
    window exactly once — the streaming twin of attendance_granular)."""
    return (
        source.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), *keys, "n_events")
    )


RUNNING_TOTALS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

RUNNING_TOTALS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the persistent state and
    emit the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals(source: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across micro-batches
    — custom state the built-in aggregations cannot persist per key with
    arbitrary update logic.  Arrow-batched; state lives in the state store,
    partitioned by user_id, so it scales horizontally with executors."""
    return source.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_OUTPUT_SCHEMA,
        stateStructType=RUNNING_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def minhash_dedup_stream(
    spark,
    source: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
):
    """Streaming NEAR-duplicate dedup: continuous MinHash-LSH filtering of
    an unbounded document feed against an accumulating signature store —
    the streaming twin of `dedup.minhash_lsh_pairs`, and the filter a
    continuously-ingesting training-data pipeline actually runs (batch
    dedup of a 100 TB corpus is a rebuild; this keeps the corpus clean as
    it grows).

    Per insert block (foreachBatch):
      1. compute the block's signatures (doc_id, shingles, sig) — the same
         codegen hash pipeline as batch;
      2. candidate-join the block's band keys against the STORE's and
         against in-block earlier docs (band equality + `earlier.doc_id <
         doc.doc_id`);
      3. exact-Jaccard verify candidates (same expression as batch); a doc
         with any verified earlier partner is dropped;
      4. append survivors to `out_dir` and the WHOLE block's signatures
         (kept and dropped alike) to `store_dir`.

    Semantics: a document survives iff NO earlier-id document anywhere in
    the stream is a verified near-duplicate — "earlier" is the document id,
    so feed blocks in id order for the cross-block decisions to be final
    (the gate fixture does; out-of-order arrival would need a compaction
    pass over `out_dir`, the same reconciliation any streaming dedup with
    late data needs).

    Scale notes: the store grows with the corpus, but each block touches it
    through ONE band-key equi-join (8-byte keys) plus one shingles lookup
    join for the candidate doc ids only — never a scan of store text.  At
    100 TB the store would live in a transactional table with the band key
    as the sort/bucket column so the per-block join prunes to matching
    buckets; state never lives in executor memory.
    """
    from apache_kafka_clickhouse_demo_spark.operators.dedup import (
        band_key_rows,
        jaccard_of,
        minhash_signatures,
    )

    def _block(block: DataFrame, _batch_id: int) -> None:
        sigs_b = minhash_signatures(
            block, text_col, id_col, num_perm, shingle_n
        ).persist()
        try:
            store = spark.read.parquet(store_dir)
        except Exception:  # first block: empty store
            store = sigs_b.limit(0)

        # candidates: block docs vs earlier docs (store + earlier in-block)
        earlier = store.unionByName(sigs_b)
        cand = (
            band_key_rows(sigs_b, num_perm, bands)
            .alias("b")
            .join(
                band_key_rows(earlier, num_perm, bands).alias("a"),
                on=[
                    F.col("a.band") == F.col("b.band"),
                    F.col("a.band_key") == F.col("b.band_key"),
                    F.col("a.doc_id") < F.col("b.doc_id"),
                ],
            )
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .distinct()
        )
        dropped = (
            cand.join(
                earlier.select("doc_id", "shingles").alias("sa"),
                cand.id_a == F.col("sa.doc_id"),
            )
            .join(
                sigs_b.select("doc_id", "shingles").alias("sb"),
                cand.id_b == F.col("sb.doc_id"),
            )
            .filter(jaccard_of("sa.shingles", "sb.shingles") >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        survivors = block.join(dropped, id_col, "left_anti")
        survivors.write.mode("append").parquet(out_dir)
        # store EVERY seen doc's signature — dropped docs still suppress
        # future copies of their cluster
        sigs_b.write.mode("append").parquet(store_dir)
        sigs_b.unpersist()

    return (
        source.writeStream.foreachBatch(_block)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_sessions(
    source: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    delay: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming sessionization: Spark's native
    `session_window` merges a user's events whenever they arrive within
    `gap` of the session's current end — the streaming twin of the batch
    lag+running-sum sessionization (`queries.q_user_sessions`, same
    inactivity-gap semantics).

    Append mode emits each session exactly once, when the watermark passes
    gap past its last event — which is what makes this viable on an
    unbounded feed: state per user is one open session, closed sessions
    leave the store.  `delay` bounds how late an event may arrive and
    still extend its session; later ones are dropped (the watermark
    contract every streaming aggregation makes)."""
    return (
        source.withWatermark(ts_col, delay)
        .groupBy(F.col(user_col), F.session_window(ts_col, gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))
            ).alias("duration_ms"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "duration_ms",
        )
    )


def embedding_dedup_stream(
    spark,
    source: DataFrame,
    out_dir: str,
    store_dir: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    dim: int = 64,
    num_tables: int = 8,
    planes_per_table: int = 4,
    seed: int = 101,
):
    """Streaming embedding near-dup dedup — the cosine sibling of
    `minhash_dedup_stream`: each arriving block is multi-table RP-LSH
    bucketed against an accumulating store of normalized vectors, bucket
    collisions are verified with the exact cosine, and a vector with any
    verified earlier-id partner is dropped.  Same LSH tables, hyperplanes,
    and threshold as the batch `dedup.embedding_near_dup_pairs`, so the
    stream makes exactly the batch pair-finder's decisions.

    Store schema: (vid, nv, buckets) — the normalized vector plus its
    num_tables bucket ids, both computed ONCE at arrival; later blocks
    explode the store's bucket array for the candidate equi-join and touch
    `nv` only for verified candidate ids.  At 100 TB the store would be
    bucket-partitioned in a transactional table so the per-block join
    prunes to colliding buckets.
    """
    from apache_kafka_clickhouse_demo_spark.functions import vectors as V
    from apache_kafka_clickhouse_demo_spark.operators.similarity import (
        rp_bucket,
        rp_hyperplanes,
    )

    buckets_expr = F.array(
        *[
            rp_bucket(F.col(vec_col), rp_hyperplanes(planes_per_table, dim, seed + t))
            for t in range(num_tables)
        ]
    )

    def _tabled(sigs: DataFrame) -> DataFrame:
        return sigs.select("vid", F.posexplode("buckets").alias("tbl", "bucket"))

    def _block(block: DataFrame, _batch_id: int) -> None:
        sigs_b = block.select(
            F.col(id_col).alias("vid"),
            V.normalize(vec_col).alias("nv"),
            buckets_expr.alias("buckets"),
        ).persist()
        try:
            store = spark.read.parquet(store_dir)
        except Exception:  # first block: empty store
            store = sigs_b.limit(0)

        earlier = store.unionByName(sigs_b)
        cand = (
            _tabled(sigs_b)
            .alias("b")
            .join(
                _tabled(earlier).alias("a"),
                on=[
                    F.col("a.tbl") == F.col("b.tbl"),
                    F.col("a.bucket") == F.col("b.bucket"),
                    F.col("a.vid") < F.col("b.vid"),
                ],
            )
            .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
            .distinct()
        )
        dropped = (
            cand.join(earlier.select("vid", "nv").alias("va"), cand.id_a == F.col("va.vid"))
            .join(sigs_b.select("vid", "nv").alias("vb"), cand.id_b == F.col("vb.vid"))
            .filter(V.dot("va.nv", "vb.nv") >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        block.join(dropped, id_col, "left_anti").write.mode("append").parquet(out_dir)
        sigs_b.write.mode("append").parquet(store_dir)
        sigs_b.unpersist()

    return (
        source.writeStream.foreachBatch(_block)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
