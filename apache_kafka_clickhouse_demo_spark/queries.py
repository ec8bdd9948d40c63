"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, with an exactly-mirrored DuckDB
oracle SQL string for the driver's correctness gate.

Mirroring rules (what makes the hashes match):
- identical output column names, aliased on BOTH sides;
- integer results are exact; double results are either bit-identical by
  construction (same left-to-right operation order: cosine, Jaccard) or
  rounded on both sides (multi-partition double sums, where accumulation
  order legitimately differs);
- all hash-based operators use the engine-portable h48 family
  (functions/hashing.py), so MinHash/SimHash oracles are exact, not
  approximate;
- every ORDER BY carries a full deterministic tiebreak wherever a LIMIT
  makes the *set* order-sensitive;
- oracle sums over DuckDB integers are CAST to BIGINT (DuckDB widens to
  HUGEINT, which pandas canonicalization degrades to float64 — the r02
  `user_sessions` false negative);
- no result column is array-typed: sequences are '|'-joined strings and
  float vectors become micro-int strings (round(x*1e6) as long) — list
  cells crash the driver's pandas canonicalization, and integer strings
  sidestep cross-engine float formatting.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.functions import text as TX
from apache_kafka_clickhouse_demo_spark.functions import vectors as V
from apache_kafka_clickhouse_demo_spark.operators import (
    asof,
    attendance,
    dedup,
    entry_pipeline,
    funnel,
    multimodal,
    sampling,
    similarity,
    sketches,
    text_analysis,
)
from apache_kafka_clickhouse_demo_spark.schemas import TESTDATA_TABLES
from apache_kafka_clickhouse_demo_spark.sources.tables import (
    bcast_small,
    is_wide_source,
    load_table,
    pin_wide,
    register_views,
)

# ---------------------------------------------------------------------------
# Tuning constants (shared by Spark queries and oracle generators)
# ---------------------------------------------------------------------------

EMBED_DIM = 64
ANN_NUM_QUERIES = 32
ANN_K = 10
RP_PLANES = 4
RP_SEED = 7
# Fixed TARGET centroid count (not a corpus ratio): the sampling modulus is
# derived as max(1, n // target) on both engines, so the centroid broadcast
# stays ~constant-size no matter how large the corpus grows (VERDICT r02 #4).
IVF_TARGET_CENTROIDS = 16
IVF_NPROBE = 2
IVF_SALT = "ivf:"

MINHASH_PERM = 12
MINHASH_BANDS = 4
MINHASH_SHINGLE_N = 3
MINHASH_THRESHOLD = 0.5

SIMHASH_MAX_HAMMING = 3
NGRAM_N = 2
NGRAM_THRESHOLD = 0.6
# 0.40 is chosen so the fixture yields a non-empty answer set (max pairwise
# cosine at sf0.01 is ~0.513 — the synthetic vectors have no true near-dups).
# 8 tables x 8 planes are production parameters: at a real dedup threshold
# (0.9) they give ~93% recall; at the fixture's artificially low 0.40 they
# still yield a non-vacuous answer while keeping buckets small enough that
# the candidate join stays near-linear.
NEAR_DUP_COS = 0.40
NEAR_DUP_TABLES = 8
NEAR_DUP_PLANES = 8
NEAR_DUP_SEED = 101

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

SPLIT_SALT = "split:"
SPLIT_TRAIN_PCT = 90
SAMPLE_SALT = "sample:"
SAMPLE_PCT = 10
STRAT_SALT = "strat:"
STRAT_N = 10
SHUFFLE_SALT = "shuf:"
SHUFFLE_SHARDS = 8
MIX_SALT = "mix:"
MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.1}
MIX_DEFAULT_RATE = 0.25
#: approx_percentile accuracy — far above any gate-scale group size, so
#: the GK sketch stays uncompressed and the oracle is exact (coupon-mode
#: analogue); production would use ~1e4 (rank error n/1e4) for bounded
#: memory
GK_ACCURACY = 1_000_000
FILL_MIN_VALUE = 300.0
CURATION_MIN_QUALITY = 0.5
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

#: funnel steps (ordered) and chain window; 6h makes the sf0.01 fixture
#: discriminating (150/118/11 users reach levels 1/2/3) instead of saturated
FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WINDOW_S = 21600
#: cohort day + day offsets for the retention report; activity = purchases
#: (user-day coverage ~36% at sf0.01, so retained < cohort is non-trivial)
RETENTION_DAY0 = "2024-01-02"
RETENTION_OFFSETS = [0, 1, 2, 3, 4, 5, 6]
TOPK_K = 10
TOPK_CAPACITY = 1 << 14
PASSAGE_WORDS = 8
#: ExactSubstr window (Lee et al. 2022 use 50 BPE tokens at crawl scale;
#: 13 whitespace tokens matches DECON_SHINGLE_N and the fixture's planted
#: repeated-run lengths)
SUBSTR_WINDOW = 13
WINNOW_K = 4
WINNOW_WINDOW = 5
SAMPLE_K = 200
#: mid-day TTL cutoff: exercises BOTH apply_ttl paths (whole-day partition
#: drops AND the boundary-day filter rewrite)
TTL_CUTOFF = "2024-01-15 12:00:00"

EVENTS_CUTOFF = "2024-01-15 00:00:00"
Q1_CUTOFF = "1998-09-02 00:00:00"
Q3_DATE = "1998-01-01 00:00:00"
Q5_START, Q5_END = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _workdir(prefix: str) -> str:
    """mkdtemp + register for atexit cleanup (ADVICE r4): the streaming-MV
    gate queries each materialize a full NDJSON + parquet copy of their
    input under /tmp; repeated gate/bench builds must not accumulate
    multi-copy debris.  Cleanup happens only at process exit because the
    returned DataFrame reads these files lazily for the caller's lifetime."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _stamp_feed_block(feed: str, stamped: set, block_idx: int, base: float) -> None:
    """Pin a feed block's arrival order for FileStreamSource (ADVICE r6):
    the source orders files by modification time, and coarse filesystem
    mtime granularity can TIE two blocks written back-to-back — breaking
    any stream whose semantics depend on in-order delivery (running_funnel's
    contract; the near-dup drains' keep-smallest-id decisions).  Stamping
    each block's new parquet files with a strictly increasing mtime makes
    delivery deterministic, with no sleep."""
    for name in os.listdir(feed):
        p = os.path.join(feed, name)
        if name.endswith(".parquet") and p not in stamped:
            os.utime(p, (base + block_idx * 10, base + block_idx * 10))
            stamped.add(p)


def _write_feed_blocks(df, work: str, blk_col, n: int = 4) -> str:
    """Write an n-block file-stream feed in ONE Spark job (r8, VERDICT r7
    #4): the per-block form ran n filtered coalesce(1) write jobs — pure
    fixed cost billed to every streaming gate query.  `blk_col` is an int
    column 0..n-1 assigning each row its arrival block (the caller states
    the same boundaries the old filters used).  One partitioned write
    lands each block as one file (repartition by blk -> one task holds a
    given blk value); the files are then MOVED into the flat feed dir
    with the strictly-increasing mtimes `_stamp_feed_block` documents, so
    FileStreamSource delivery order is unchanged and deterministic."""
    import glob
    import shutil
    import time as _time

    feed = f"{work}/feed"
    tmp = f"{work}/feed_tmp"
    (
        df.withColumn("blk", blk_col)
        .repartition(F.col("blk"))
        .write.partitionBy("blk")
        .mode("overwrite")
        .parquet(tmp)
    )
    os.makedirs(feed, exist_ok=True)
    base = _time.time()
    for i in range(n):
        for j, p in enumerate(sorted(glob.glob(f"{tmp}/blk={i}/part-*.parquet"))):
            dest = os.path.join(feed, f"block{i}-{j}.parquet")
            os.rename(p, dest)
            os.utime(dest, (base + i * 10, base + i * 10))
    shutil.rmtree(tmp, ignore_errors=True)
    return feed


def _dec2(c) -> "F.Column":
    """Exact decimal(18,2) copy of a money column (every fixture money/value
    column carries at most 2 decimals, so this cast is lossless)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


_DEC_ONE = "CAST(1 AS DECIMAL(18,2))"


def _money_sum(expr) -> "F.Column":
    """Order-independent money sum -> double.

    A double sum's half-cent rounding boundary flips with accumulation
    order, and the driver's session partitions differently than local runs
    — summing exact decimals makes the cents deterministic.  The oracles
    mirror this as CAST(round(sum(<decimal expr>), 2) AS DOUBLE): DuckDB
    round() is HALF_UP like Spark's decimal cast (DuckDB's decimal CAST is
    half-even — do not use it there)."""
    return F.sum(expr).cast("decimal(18,2)").cast("double")


# ===========================================================================
# Reference-parity queries (events table = the reference's entry events;
# SURVEY.md §2.2-2.6)
# ===========================================================================


def q_extract_typed_events(spark, sf_dir):
    """M1/P1/F1-F6: schema-on-read JSON hop -> typed projection."""
    return attendance.typed_events(_t(spark, sf_dir, "events"))


def q_count_events(spark, sf_dir):
    """A1: count(*) sanity check (README.rst:109)."""
    return _t(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n_events"))


def q_value_by_type(spark, sf_dir):
    """A3/A4: the house-points leaderboard shape (README.rst:114-116)."""
    return (
        attendance.typed_events(_t(spark, sf_dir, "events"))
        .groupBy("event_type")
        .agg(
            _money_sum(_dec2("value")).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.col("total_value").desc())
    )


def q_events_limit_by(spark, sf_dir):
    """ClickHouse `ORDER BY ... LIMIT n BY col` parity: the latest 2
    events per event type, in one windowed group-limit.  Spark's
    WindowGroupLimit rewrite turns the rank filter into a partial/final
    per-partition top-n (no full sort of the corpus — the same
    optimization the latest_event plan test pins); groups here are
    bounded-cardinality, and the unbounded-key scale path is the
    two-phase top-k reduction the similarity module documents."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "event_type", "event_id", "ts",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .orderBy("event_type", "rn")
    )


DYADIC_BITS = 16
DYADIC_WIDTH = 2048
DYADIC_DEPTH = 3
#: (range_id, lo, hi) half-open value_cents bands
DYADIC_RANGES = [
    (1, 0, 1_000),
    (2, 1_000, 5_000),
    (3, 5_000, 10_000),
    (4, 10_000, 20_000),
    (5, 20_000, 1 << DYADIC_BITS),
]


def q_dyadic_range_counts(spark, sf_dir):
    """Dyadic count-min range counts (sketches.dyadic_cms_build /
    dyadic_cms_range_counts — Cormode & Muthukrishnan §4.2, the sketch
    that answers 'how many values fall in [lo, hi)' from
    O(levels * depth * width) counters): value_cents bands over the
    events stream.  The decompositions are driver-side literals inlined
    into BOTH engines, so the oracle replays the identical cell sums."""
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    sk = sketches.dyadic_cms_build(
        ev, "cents", DYADIC_BITS, DYADIC_WIDTH, DYADIC_DEPTH
    )
    return sketches.dyadic_cms_range_counts(
        sk, DYADIC_RANGES, DYADIC_BITS, DYADIC_WIDTH, DYADIC_DEPTH
    )


def _oracle_dyadic_range_counts() -> str:
    """Mirror of the dyadic CMS: same grid (h48-seeded per (level, d)),
    same literal decompositions, same min-over-d / sum-over-pieces."""
    from apache_kafka_clickhouse_demo_spark.operators.sketches import (
        dyadic_decompose,
    )

    def h(l_expr: str, d_expr: str, k_expr: str) -> str:
        return H.sql_h48(
            f"'dcms:' || CAST({l_expr} AS VARCHAR) || ':' || "
            f"CAST({d_expr} AS VARCHAR) || ':' || CAST({k_expr} AS VARCHAR)"
        )

    pieces_vals = ",\n  ".join(
        f"({rid}, {lo}, {hi}, {lvl}, {key}, {d})"
        for rid, lo, hi in DYADIC_RANGES
        for lvl, key in dyadic_decompose(lo, hi)
        for d in range(DYADIC_DEPTH)
    )
    return f"""
WITH vals AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL
    AND CAST(round(value * 100) AS BIGINT) >= 0
    AND CAST(round(value * 100) AS BIGINT) < {1 << DYADIC_BITS}
), cells AS (
  SELECT t.l AS level, dd.d AS d,
         {h('t.l', 'dd.d', '(v >> t.l)')} % {DYADIC_WIDTH} AS bucket,
         count(*) AS n
  FROM vals, range({DYADIC_BITS + 1}) t(l), range({DYADIC_DEPTH}) dd(d)
  GROUP BY 1, 2, 3
), pieces(range_id, lo, hi, level, key, d) AS (VALUES
  {pieces_vals}
), pc AS (
  SELECT p.range_id, p.lo, p.hi, p.level, p.key,
         min(coalesce(c.n, 0)) AS piece_est
  FROM pieces p
  LEFT JOIN cells c
    ON c.level = p.level AND c.d = p.d
   AND c.bucket = {h('p.level', 'p.d', 'p.key')} % {DYADIC_WIDTH}
  GROUP BY 1, 2, 3, 4, 5
)
SELECT CAST(range_id AS INTEGER) AS range_id, CAST(lo AS BIGINT) AS lo,
       CAST(hi AS BIGINT) AS hi, CAST(sum(piece_est) AS BIGINT) AS est
FROM pc GROUP BY 1, 2, 3 ORDER BY range_id
"""


#: permille fractions for the sketch-quantile parity row
DYADIC_QUANTILE_PS = [250, 500, 750, 900, 990]


def q_sketch_quantiles(spark, sf_dir):
    """Sketch quantiles (sketches.dyadic_quantiles — Cormode &
    Muthukrishnan §5, quantiles by descent over the dyadic CMS): the
    ClickHouse `quantileTiming`-class path for value_cents over the
    events stream, answering quantile(p) from the bounded counter grid
    with zero corpus-scale work at query time.  The grid is h48-seeded
    both sides and the descent is deterministic, so the DuckDB oracle
    replays the identical walk (recursive CTE over the same cells) and
    the row is hash-exact, not approximate-close."""
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    sk = sketches.dyadic_cms_build(
        ev, "cents", DYADIC_BITS, DYADIC_WIDTH, DYADIC_DEPTH
    )
    return sketches.dyadic_quantiles(
        sk, DYADIC_QUANTILE_PS, DYADIC_BITS, DYADIC_WIDTH, DYADIC_DEPTH
    )


def q_sketch_quantiles_weighted(spark, sf_dir):
    """quantileTimingWeighted-class parity (r13): the same dyadic-CMS
    quantile descent over WEIGHT MASS — value_cents weighted by the
    props.k payload (weighted_percentiles' exact inputs, so the sketch
    path and the exact per-group window funnel answer the same
    distribution family).  Build counts weight sums per cell (NULL /
    non-positive weights dropped, the topKWeighted convention); the
    descent is unchanged — counters are counters."""
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    sk = sketches.dyadic_cms_build(
        ev, "cents", DYADIC_BITS, DYADIC_WIDTH, DYADIC_DEPTH, weight_col="k"
    )
    return sketches.dyadic_quantiles(
        sk, DYADIC_QUANTILE_PS, DYADIC_BITS, DYADIC_WIDTH, DYADIC_DEPTH
    )


def _oracle_sketch_quantiles(weighted: bool = False) -> str:
    """Mirror of the dyadic-CMS quantile descent: same grid, same root
    total, same integer rank rule, and the SAME walk — a recursive CTE
    descending one level per step, estimating each LEFT child as
    min-over-d of its addressed counters (absent = 0).  `weighted`
    switches the cells to per-value weight sums (the engine build's
    weight_col path)."""
    from apache_kafka_clickhouse_demo_spark.functions.hashing import py_h48

    def h(l_expr: str, d_expr: str, k_expr: str) -> str:
        return H.sql_h48(
            f"'dcms:' || CAST({l_expr} AS VARCHAR) || ':' || "
            f"CAST({d_expr} AS VARCHAR) || ':' || CAST({k_expr} AS VARCHAR)"
        )

    root_vals = ",\n  ".join(
        f"({d}, {py_h48(f'dcms:{DYADIC_BITS}:{d}:0') % DYADIC_WIDTH})"
        for d in range(DYADIC_DEPTH)
    )
    ps_vals = ", ".join(f"({p})" for p in DYADIC_QUANTILE_PS)
    if weighted:
        vals_sql = f"""
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS wt
  FROM events
  WHERE value IS NOT NULL
    AND CAST(round(value * 100) AS BIGINT) >= 0
    AND CAST(round(value * 100) AS BIGINT) < {1 << DYADIC_BITS}
    AND CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 0"""
        mass = "sum(wt)"
    else:
        vals_sql = f"""
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL
    AND CAST(round(value * 100) AS BIGINT) >= 0
    AND CAST(round(value * 100) AS BIGINT) < {1 << DYADIC_BITS}"""
        mass = "count(*)"
    return f"""
WITH RECURSIVE vals AS ({vals_sql}
), cells AS (
  SELECT t.l AS level, dd.d AS d,
         {h('t.l', 'dd.d', '(v >> t.l)')} % {DYADIC_WIDTH} AS bucket,
         {mass} AS n
  FROM vals, range({DYADIC_BITS + 1}) t(l), range({DYADIC_DEPTH}) dd(d)
  GROUP BY 1, 2, 3
), root(d, bucket) AS (VALUES
  {root_vals}
), tot AS (
  SELECT CAST(min(coalesce(c.n, 0)) AS BIGINT) AS n_total
  FROM root r LEFT JOIN cells c
    ON c.level = {DYADIC_BITS} AND c.d = r.d AND c.bucket = r.bucket
), ps(p_permille) AS (VALUES {ps_vals}
), ranks AS (
  SELECT p_permille,
         (CAST(p_permille AS BIGINT) * n_total + 999) // 1000 AS r
  FROM ps, tot WHERE n_total >= 1
), nodes AS (
  SELECT t.lvl AS lvl, 2 * r.k AS key
  FROM range({DYADIC_BITS}) t(lvl), range({1 << (DYADIC_BITS - 1)}) r(k)
  WHERE 2 * r.k < (1 << ({DYADIC_BITS} - t.lvl))
), est AS (
  SELECT nc.lvl, nc.key, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS e
  FROM (SELECT n.lvl, n.key, dd.d,
               {h('n.lvl', 'dd.d', 'n.key')} % {DYADIC_WIDTH} AS bucket
        FROM nodes n, range({DYADIC_DEPTH}) dd(d)) nc
  LEFT JOIN cells c
    ON c.level = nc.lvl AND c.d = nc.d AND c.bucket = nc.bucket
  GROUP BY 1, 2
), walk(p_permille, r, lvl, rem, pos) AS (
  SELECT p_permille, r, {DYADIC_BITS}, r, CAST(0 AS BIGINT) FROM ranks
  UNION ALL
  SELECT w.p_permille, w.r, w.lvl - 1,
         CASE WHEN e.e >= w.rem THEN w.rem ELSE w.rem - e.e END,
         CASE WHEN e.e >= w.rem THEN 2 * w.pos ELSE 2 * w.pos + 1 END
  FROM walk w JOIN est e ON e.lvl = w.lvl - 1 AND e.key = 2 * w.pos
  WHERE w.lvl > 0
)
SELECT CAST(p_permille AS INTEGER) AS p_permille,
       CAST(r AS BIGINT) AS target_rank,
       CAST(pos AS BIGINT) AS q_value
FROM walk WHERE lvl = 0 ORDER BY p_permille
"""


def q_stream_range_counts(spark, sf_dir):
    """Streaming dyadic count-min (stateful.dyadic_cms_stream): the
    events feed — value_cents precomputed — drains as four blocks into
    a cell-sharded counter store — increments and the LIVE value-band
    histogram in ONE atomic commit per block (r13); counters are LINEAR,
    so the drained store's merge-on-read structure equals the batch
    dyadic_cms_build cell-for-cell and the final band estimates are
    dyadic_range_counts' verbatim — the oracle is the batch SQL
    unchanged."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _DyadicCmsStreamWriter,
        dyadic_cms_stream,
    )

    work = _workdir("stream_dcms_")
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    blk = F.pmod(F.coalesce(F.col("cents"), F.lit(0)), F.lit(4)).cast("int")
    _write_feed_blocks(ev, work, blk)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = dyadic_cms_stream(
        spark,
        src,
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        value_col="cents",
        ranges=DYADIC_RANGES,
        universe_bits=DYADIC_BITS,
        width=DYADIC_WIDTH,
        depth=DYADIC_DEPTH,
    )
    q.processAllAvailable()
    q.stop()
    writer = _DyadicCmsStreamWriter(
        spark,
        f"{work}/store",
        value_col="cents",
        ranges=DYADIC_RANGES,
        universe_bits=DYADIC_BITS,
        width=DYADIC_WIDTH,
        depth=DYADIC_DEPTH,
        writer_id=f"{work}/ck",
    )
    return writer.range_counts()


def q_stream_sketch_quantiles(spark, sf_dir):
    """Live sketch quantiles at ingest (r14, VERDICT r13 #6): the
    dyadic CMS drain of q_stream_range_counts with `ps` set — each
    block publishes its increments, the running band histogram AND the
    running quantiles (the r13 descent over the pre-append snapshot +
    block cells) in ONE atomic commit.  Counters are linear, so the
    drained store's descent equals the batch dyadic_quantiles over a
    one-shot build of the full feed verbatim — the oracle is
    sketch_quantiles' batch SQL unchanged; the per-block running rows
    and the injected-failure replay are pinned in
    tests/test_streaming_stateful.py."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _DyadicCmsStreamWriter,
        dyadic_cms_stream,
    )

    work = _workdir("stream_dq_")
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    blk = F.pmod(F.coalesce(F.col("cents"), F.lit(0)), F.lit(4)).cast("int")
    _write_feed_blocks(ev, work, blk)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = dyadic_cms_stream(
        spark,
        src,
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        value_col="cents",
        ranges=DYADIC_RANGES,
        universe_bits=DYADIC_BITS,
        width=DYADIC_WIDTH,
        depth=DYADIC_DEPTH,
        ps=DYADIC_QUANTILE_PS,
    )
    q.processAllAvailable()
    q.stop()
    writer = _DyadicCmsStreamWriter(
        spark,
        f"{work}/store",
        value_col="cents",
        ranges=DYADIC_RANGES,
        universe_bits=DYADIC_BITS,
        width=DYADIC_WIDTH,
        depth=DYADIC_DEPTH,
        writer_id=f"{work}/ck",
        ps=DYADIC_QUANTILE_PS,
    )
    return writer.quantiles()


def q_weighted_percentiles(spark, sf_dir):
    """ClickHouse quantileExactWeighted parity
    (sampling.weighted_quantiles): exact weighted quartiles of
    value_cents per event type, weighted by the props.k payload —
    all-integer rule (smallest value whose running weight reaches
    ceil(total * p / 1000)), no interpolation to diverge
    cross-engine."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return sampling.weighted_quantiles(
        ev, "event_type", "value_cents", "k"
    ).orderBy("event_type")


def q_value_by_type_totals(spark, sf_dir):
    """ClickHouse `GROUP BY ... WITH TOTALS` parity: the per-type rollup
    plus ONE grand-total row, emitted from a single ROLLUP aggregate
    (Spark computes both grouping sets in one pass — no second scan for
    the totals row, which is the WITH TOTALS point).  `is_total` comes
    from GROUPING(), not from NULL-ness of the key, so a NULL group
    value in the data could never masquerade as the totals row."""
    ev = attendance.typed_events(_t(spark, sf_dir, "events"))
    return (
        ev.rollup("event_type")
        .agg(
            # grouping() is only resolvable INSIDE the rollup aggregate
            F.grouping("event_type").cast("int").alias("is_total"),
            _money_sum(_dec2("value")).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("event_type", "is_total", "total_value", "n_events")
        # event_type tiebreak: equal rounded totals must order the same
        # in both engines (code-review r12)
        .orderBy("is_total", F.col("total_value").desc(), "event_type")
    )


def q_latest_event(spark, sf_dir):
    """O1: latest-event top-1 (README.rst:142-145) — TakeOrderedAndProject."""
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
    )


def q_events_after(spark, sf_dir):
    """P3: timestamp range predicate, pushed to the parquet scan."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") >= F.lit(EVENTS_CUTOFF).cast("timestamp"))
        .select("event_id", "ts", "event_type", "value")
    )


def q_attendance_granular(spark, sf_dir):
    """M2/A5: per-(hour, type) counts (README.rst:154-162)."""
    return attendance.attendance_granular(_t(spark, sf_dir, "events"))


def q_attendance_daily_merged(spark, sf_dir):
    """M3 + A6/A7: daily partial states per hourly block, merged on read
    (README.rst:222-236, 264-272).  The Spark path goes through stored
    state columns; the oracle is the direct aggregate — equal iff the
    state/merge round-trip invariant holds."""
    events = _t(spark, sf_dir, "events")
    return attendance.attendance_rollup(events, block_col_expr=F.col("ts_hour"))


def q_user_activity(spark, sf_dir):
    """A5 composite-key aggregate + O3 multi-column order."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(_dec2("value")).alias("total_value"),
        )
        .orderBy("user_id")
    )


def q_type_user_stats(spark, sf_dir):
    """A3/A4 + DISTINCT aggregate coverage in one hash aggregate: per-type
    exact count-distinct, row count, and money sum (absorbs the former
    value_by_type gate slot — same groupBy key, same scan)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(_dec2("value")).alias("total_value"),
        )
        .orderBy("event_type")
    )


def q_entry_house_points(spark, sf_dir):
    """P4/F4/F5/F6 + A3/A4 on the TRUE reference record shape: synthesize
    §1.4 NDJSON messages, run the real M1 from_json extraction, group by the
    nested `student.house` field (README.rst:114-116)."""
    messages = entry_pipeline.synth_entry_messages(_t(spark, sf_dir, "events"))
    return entry_pipeline.house_points(entry_pipeline.typed_entry_events(messages))


def q_entry_attendance(spark, sf_dir):
    """M2/A2/A5 on the true reference shape: count(student) per
    (timestamp, subject) after the JSON hop (README.rst:154-162)."""
    messages = entry_pipeline.synth_entry_messages(_t(spark, sf_dir, "events"))
    return entry_pipeline.class_attendance(entry_pipeline.typed_entry_events(messages))


def q_events_preview(spark, sf_dir):
    """P2/O2 — bare `SELECT *` preview (README.rst:194,258)."""
    return (
        _t(spark, sf_dir, "events").select("*").orderBy("event_id").limit(20)
    )


def q_mv_cascade_attendance(spark, sf_dir):
    """M1+M2+M4 through the REAL streaming path (not a batch stand-in):
    produce NDJSON, run the checkpointed ingest MV, then drive the cascaded
    aggregating MV through the reference's BACKFILL/STREAM CUTOVER — rows
    before the cutover timestamp arrive via the one-shot `INSERT…SELECT`
    backfill, rows at-or-after it via checkpointed stream blocks (multiple
    insert blocks -> partial rows) — and finally merge-on-read.

    This is the reference's core loop INCLUDING its signature M4 seam
    (README.rst:64-73, 95-103, 121-123, 154-162, 178-185, 254-272) executed
    inside the correctness gate: the oracle is the direct batch aggregate,
    equal iff the cascade + cutover lose/duplicate nothing across the seam
    and the partial rows merge exactly.
    """
    from apache_kafka_clickhouse_demo_spark.operators import entry_pipeline as EP
    from apache_kafka_clickhouse_demo_spark.sources.storage import compact_files
    from apache_kafka_clickhouse_demo_spark.streaming.cascade import (
        CascadeStage,
        run_cascade,
    )

    work = _workdir("mv_cascade_")
    raw = f"{work}/raw"
    # producer hop: NDJSON files on disk (4 arrival chunks)
    EP.synth_entry_messages(_t(spark, sf_dir, "events")).repartition(4).write.text(raw)

    src1 = spark.readStream.format("text").load(raw).withColumnRenamed("value", "message")
    counts = run_cascade(
        spark,
        src1,
        [
            # MV#1: opaque message -> typed table; then the S5
            # background-merge analogue LOAD-BEARING in the gate (r05):
            # collapse MV#1's per-block file debris before the next stage
            # scans it (README.rst:88).  target_files=4 keeps >= 2
            # downstream insert blocks so the partial-row property holds;
            # the oracle equality proves the swap loses/duplicates nothing.
            CascadeStage(
                "typed",
                EP.typed_entry_events,
                post_compact=lambda s, p: compact_files(
                    s, p, target_files=4, sort_cols=["timestamp"]
                ),
            ),
            # MV#2 with M4 cutover: typed -> per-(timestamp, subject)
            # PARTIAL counts.  History (< T) backfills in one shot; the
            # stream handles >= T, one block per pair of files so the
            # stored table really holds several partial rows per key.
            CascadeStage(
                "counts",
                EP.class_attendance,
                max_files_per_trigger=2,
                cutover_predicate=F.col("timestamp")
                >= F.lit(EVENTS_CUTOFF).cast("timestamp"),
            ),
        ],
        work,
    )

    # read path: merge the stored partial rows
    return (
        spark.read.parquet(counts)
        .groupBy("timestamp", "subject")
        .agg(F.sum("n_students").alias("n_students"))
        .orderBy("timestamp", "subject")
    )


def q_mv_cascade_daily(spark, sf_dir):
    """The reference's FULL three-MV cascade (README.rst:95-103, 154-162,
    222-236, 264-272) executed end-to-end under checkpointed streams:

      NDJSON -> [MV#1 stream] typed -> [MV#2 stream] granular partial
      counts -> [S6 summing compaction] -> [MV#3 stream + M4 cutover]
      daily partial max/min/avg states -> merge-on-read.

    The S6 compaction between MV#2 and MV#3 is load-bearing, exactly as it
    is in the reference: `class_attendance_granular` is a SummingMergeTree
    (README.rst:129-136), and max/min/avgState over it are only correct
    once same-key partial count rows have been collapsed — a maxState over
    uncompacted partials under-counts no matter the engine.  Running the
    compaction before MV#3 consumes the table makes every (hour, type) key
    block-atomic, so MV#3's per-block states are over COMPLETE hourly
    counts while still landing as several partial state rows per (day,
    type) — the stored AggregateFunction-column shape.

    MV#3 runs through the M4 backfill/stream cutover (history < T in one
    INSERT…SELECT, stream handles >= T), matching README.rst:222-252's
    future-timestamp pattern.  The oracle is the direct batch daily
    aggregate — equal iff every seam (ingest, partial counts, compaction,
    cutover, state merge) loses and duplicates nothing."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import compact_summing
    from apache_kafka_clickhouse_demo_spark.streaming.cascade import (
        CascadeStage,
        run_cascade,
    )

    work = _workdir("mv_daily_")
    events = _t(spark, sf_dir, "events")
    ev_schema = events.schema

    # producer hop: raw events as NDJSON messages, 4 arrival chunks
    events.select(
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        ).alias("value")
    ).repartition(4).write.text(f"{work}/raw")

    src1 = (
        spark.readStream.format("text").load(f"{work}/raw")
        .withColumnRenamed("value", "message")
    )
    daily = run_cascade(
        spark,
        src1,
        [
            # MV#1: opaque message -> typed table (checkpointed stream)
            CascadeStage(
                "typed",
                lambda b: b.select(
                    F.from_json("message", ev_schema).alias("e")
                ).select("e.*"),
            ),
            # MV#2: typed -> per-(hour, type) PARTIAL counts, one block per
            # pair of files (several partial rows per key), then the S6
            # SummingMergeTree background merge collapses same-key partials
            # BEFORE MV#3 scans the table — load-bearing, see docstring.
            CascadeStage(
                "granular",
                attendance.attendance_granular,
                max_files_per_trigger=2,
                post_compact=lambda s, p: compact_summing(
                    s,
                    p,
                    keys=["ts_hour", "event_type"],
                    agg_exprs={"student_count": F.sum("student_count")},
                ),
            ),
            # MV#3 with M4 cutover: granular -> per-(day, type) partial
            # aggregate states
            CascadeStage(
                "daily",
                attendance.attendance_daily_states,
                max_files_per_trigger=4,
                cutover_predicate=F.col("ts_hour")
                >= F.lit(EVENTS_CUTOFF).cast("timestamp"),
            ),
        ],
        work,
    )

    # read path: maxMerge/minMerge/avgMerge over the stored partial states
    return attendance.attendance_daily_merged(spark.read.parquet(daily))


def q_attendance_daily_compacted(spark, sf_dir):
    """S5-sink + S6/A8 in the gate: write per-block daily states to engine
    storage, run the SummingMergeTree-style compaction, and answer from the
    COMPACTED table (README.rst:206-216, 264-272).  Equal to the direct
    aggregate iff compaction preserves the merge."""
    from apache_kafka_clickhouse_demo_spark.functions import agg_state as S
    from apache_kafka_clickhouse_demo_spark.sources.storage import (
        compact_summing,
        read_table,
        write_sorted,
    )

    events = _t(spark, sf_dir, "events")
    granular = attendance.attendance_granular(events).withColumn(
        "_block", F.col("ts_hour")
    )
    states = attendance.attendance_daily_states(granular, "_block").drop("_block")

    path = _workdir("daily_states_") + "/t"
    write_sorted(states, path, sort_cols=["day", "event_type"])
    compact_summing(
        spark,
        path,
        keys=["day", "event_type"],
        agg_exprs={
            "max_state": S.max_merge("max_state"),
            "min_state": S.min_merge("min_state"),
            "avg_state": S.sum_states("avg_state"),
        },
    )
    return attendance.attendance_daily_merged(read_table(spark, path))


def q_stream_dedup(spark, sf_dir):
    """Streaming exactly-once dedup in the gate: feed the events table
    DOUBLED through a watermarked `dropDuplicatesWithinWatermark` stream;
    the result must be exactly the original table (oracle: plain SELECT)."""
    from apache_kafka_clickhouse_demo_spark.streaming import streaming_dedup

    work = _workdir("stream_dedup_")
    events = _t(spark, sf_dir, "events")
    events.unionAll(events).repartition(6).write.parquet(f"{work}/doubled")

    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{work}/doubled")
    )
    deduped = streaming_dedup(src, keys=["event_id"], watermark_col="ts", delay="3650 days")
    q = (
        deduped.writeStream.foreachBatch(
            lambda b, _i: b.write.mode("append").parquet(f"{work}/out")
        )
        .option("checkpointLocation", f"{work}/ck")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(f"{work}/out").orderBy("event_id")


def q_stream_near_dup(spark, sf_dir):
    """Streaming NEAR-dup dedup (streaming/stateful.minhash_dedup_stream):
    the documents table arrives as four id-ordered insert blocks; each
    block is MinHash-banded against the accumulating signature store and
    verified-near-duplicates of ANY earlier document are dropped.  Oracle:
    survivors = documents minus every `id_b` of the batch LSH pair set —
    equal iff the continuous filter makes exactly the decisions the batch
    pair-finder would."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        minhash_dedup_stream,
    )

    work = _workdir("stream_neardup_")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).first()[0]
    # sequential id-ordered chunks, same quartile boundaries as the old
    # per-block filters; one write job (see _write_feed_blocks)
    blk = (
        F.when(F.col("doc_id") <= (hi * 1) // 4, 0)
        .when(F.col("doc_id") <= (hi * 2) // 4, 1)
        .when(F.col("doc_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    feed = _write_feed_blocks(docs, work, blk)

    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = minhash_dedup_stream(
        spark,
        src,
        out_dir=f"{work}/kept",
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        shingle_n=MINHASH_SHINGLE_N,
        threshold=MINHASH_THRESHOLD,
        # gate blocks are ~1.2k docs: 32 task-files per survivors commit is
        # pure fsync overhead (stateful.py's out_files note)
        out_files=4,
    )
    q.processAllAvailable()
    q.stop()
    return (
        spark.read.parquet(f"{work}/kept")
        .select("doc_id")
        .sortWithinPartitions("doc_id")
    )


def q_stream_embed_near_dup(spark, sf_dir):
    """Streaming embedding near-dup dedup (stateful.embedding_dedup_stream):
    the embeddings table arrives as four id-ordered blocks; each is RP-LSH
    bucketed against the accumulating vector store and cosine-verified
    near-duplicates of any earlier vector are dropped.  Oracle: survivors =
    embeddings minus the batch LSH pair set's id_b side."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        embedding_dedup_stream,
    )

    work = _workdir("stream_embdup_")
    emb = _t(spark, sf_dir, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0]
    # sequential id-ordered chunks, same quartile boundaries as the old
    # per-block filters; one write job (see _write_feed_blocks)
    blk = (
        F.when(F.col("vec_id") <= (hi * 1) // 4, 0)
        .when(F.col("vec_id") <= (hi * 2) // 4, 1)
        .when(F.col("vec_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    feed = _write_feed_blocks(emb, work, blk)

    src = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = embedding_dedup_stream(
        spark,
        src,
        out_dir=f"{work}/kept",
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        threshold=NEAR_DUP_COS,
        dim=EMBED_DIM,
        num_tables=NEAR_DUP_TABLES,
        planes_per_table=NEAR_DUP_PLANES,
        seed=NEAR_DUP_SEED,
        out_files=4,
    )
    q.processAllAvailable()
    q.stop()
    return (
        spark.read.parquet(f"{work}/kept")
        .select("vec_id")
        .sortWithinPartitions("vec_id")
    )


def q_sql_busy_days(spark, sf_dir):
    """Pure `spark.sql()` text surface (the reference's native interface is
    SQL): aggregate + HAVING over the registered views."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n_events
        FROM events
        GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
        HAVING count(*) >= 50
        ORDER BY event_type, day
        """
    )


def q_show_tables(spark, sf_dir):
    """S8 — catalog listing (README.rst:37): SHOW TABLES over the registered
    views, restricted to the engine's table set."""
    register_views(spark, sf_dir)
    return (
        spark.sql("SHOW TABLES")
        .filter(F.col("tableName").isin(*TESTDATA_TABLES))
        .select(F.col("tableName").alias("name"))
        .orderBy("name")
    )


# ===========================================================================
# TPC-H-ish analytics (bench headliners; general agg/join/sort/limit)
# ===========================================================================


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 with integer-cents money arithmetic (VERDICT r3 #2).

    The fixture's money columns carry at most 2 decimals, so every product
    is EXACT in scaled-integer space: price in cents (1e-2), price*(1-disc)
    in 1e-4 units, price*(1-disc)*(1+tax) in 1e-6 units.  Per-row work is
    three double->long roundings plus long multiplies — all whole-stage
    codegen — instead of r3's decimal(18,2) multiplications (37-precision
    intermediates, BigDecimal path), which cost q1 a 1.73x regression.

    The product sums accumulate as decimal(38,0), not long: a long sum of
    1e-6-unit charges overflows around SF50 (9.2e18 / ~4e10 per row), and
    this engine is sized for 100 TB.  decimal(38,0) of a long-valued input
    keeps Spark's compact representation on the hot path while being exact
    to 1e38.  The final doubles are nearest-double of the same exact
    integer on both engines (DuckDB sums BIGINT into HUGEINT), so the gate
    hash stays exact with no rounding step at all on the big sums."""
    li = _t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    scaled = li.filter(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        price_c.alias("price_c"),
        disc_c.alias("disc_c"),
        (price_c * (100 - disc_c)).alias("disc_price_u4"),
        (price_c * (100 - disc_c) * (100 + tax_c)).alias("charge_u6"),
    )
    n = F.count(F.lit(1))
    return (
        scaled.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (F.sum(F.col("price_c").cast("decimal(38,0)")).cast("double") / 100.0)
            .alias("sum_base_price"),
            (F.sum(F.col("disc_price_u4").cast("decimal(38,0)")).cast("double") / 10000.0)
            .alias("sum_disc_price"),
            (F.sum(F.col("charge_u6").cast("decimal(38,0)")).cast("double") / 1000000.0)
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(F.col("price_c").cast("decimal(38,0)")).cast("double") / 100.0 / n, 4
            ).alias("avg_price"),
            # disc_c <= 100 per row: a plain long sum cannot overflow below
            # ~1e14 rows, far past 100 TB
            F.round(F.sum("disc_c").cast("double") / 100.0 / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark, sf_dir):
    cust, orders, li = (
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )
    return (
        li.filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
        .join(orders.filter(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_small(cust.filter(F.col("c_mktsegment") == "BUILDING")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_money_sum(
            _dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec2("l_discount"))
        ).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark, sf_dir):
    cust, orders, li, supp, nation, region = (
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(bcast_small(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(bcast_small(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(bcast_small(region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_money_sum(
            _dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec2("l_discount"))
        ).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate pushes
    to the parquet scan, no shuffle beyond the final partial/final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q5_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q5_END).cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_money_sum(_dec2("l_extendedprice") * _dec2("l_discount")).alias("revenue"))
    )


def q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag + running sum
    windows — the canonical event-analytics pattern.  Partitioned by
    user_id, so the shuffle is one exchange on the session key."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    is_new = F.when(gap_ms.isNull() | (gap_ms > 30 * 60 * 1000), 1).otherwise(0)
    sessions = (
        _t(spark, sf_dir, "events")
        .withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(w))
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
        )
        .orderBy("user_id", "session_idx")
    )


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape — LEFT SEMI join (EXISTS): orders in Q1-1996 with at
    least one late-shipping lineitem, counted per priority.  The semi join
    stops probing after the first match and never duplicates orders."""
    orders, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    late = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_customers_no_orders(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS): customers with no order in 1996
    (restricted window so the fixture yields a non-empty answer — every
    customer has SOME order, which would make the check vacuous)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    orders_96 = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    )
    return (
        cust.join(orders_96, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_value_percentiles(spark, sf_dir):
    """Exact quantiles (sort-based percentile, linear interpolation) per
    event type — the exact twin of the approx-quantile sketches a
    monitoring pipeline would use at 100 TB."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("ps"))
        .select(
            "event_type",
            F.round(F.element_at("ps", 1), 6).alias("p25"),
            F.round(F.element_at("ps", 2), 6).alias("p50"),
            F.round(F.element_at("ps", 3), 6).alias("p75"),
        )
        .orderBy("event_type")
    )


def q_value_percentiles_approx(spark, sf_dir):
    """The 100 TB quantile path: `approx_percentile` (the Greenwald-
    Khanna summary, SIGMOD'01, as implemented by Spark — bounded memory
    per group, MERGEABLE map-side partials,
    unlike exact `percentile` which buffers every value in one
    aggregation task).  Same HLL-style oracle trick as
    `uniq_users_approx`: at gate scale the accuracy parameter exceeds
    the group sizes, the sketch never compresses, and the answer is the
    exact discrete quantile — bit-equal to DuckDB's `quantile_disc`
    (convention verified: element at rank ceil(p*n)).  The
    production-scale accuracy contract (rank error <= n/accuracy at
    compressing accuracies) is asserted in
    tests/test_approx_sketches.py."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(value, array(0.25, 0.5, 0.75), {GK_ACCURACY})"
            ).alias("ps")
        )
        .select(
            "event_type",
            F.round(F.element_at("ps", 1), 6).alias("p25"),
            F.round(F.element_at("ps", 2), 6).alias("p50"),
            F.round(F.element_at("ps", 3), 6).alias("p75"),
        )
        .orderBy("event_type")
    )


def q_click_purchase_users(spark, sf_dir):
    """FULL OUTER join: per-user click and purchase counts side by side,
    keeping users who only ever did one of the two.  Both sides pre-aggregate
    before the join, so the shuffle carries one row per user per side."""
    events = _t(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("c_user"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        clicks.join(purchases, clicks.c_user == purchases.p_user, "full_outer")
        .select(
            F.coalesce("c_user", "p_user").alias("user_id"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .orderBy("user_id")
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape — per-group average as a join (the scalable form of a
    correlated scalar subquery): lineitems below 20% of their part's mean
    quantity, for one brand.  The per-part aggregate is tiny after the
    brand filter, so it broadcasts."""
    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    brand_items = li.join(bcast_small(brand_parts), li.l_partkey == F.col("p_partkey"))
    part_avg = brand_items.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return brand_items.join(
        # part_avg is DERIVED (aggregate of a join), so its estimate can't
        # be trusted either way — gate its broadcast on the lineitem scan
        bcast_small(
            part_avg.withColumnRenamed("l_partkey", "t_partkey"),
            wide=is_wide_source(li),
        ),
        F.col("l_partkey") == F.col("t_partkey"),
    ).filter(F.col("l_quantity") < F.col("qty_threshold")).agg(
        F.round(F.sum(_dec2("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly")
    )


def q_purchase_gaps(spark, sf_dir):
    """lag/lead coverage: per-user gap to the previous purchase and
    time-to-next purchase, in milliseconds (exact integer arithmetic, so
    the oracle is bit-free)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            (ms - F.lag(ms).over(w)).alias("ms_since_prev"),
            (F.lead(ms).over(w) - ms).alias("ms_to_next"),
        )
        .orderBy("event_id")
    )


def q_user_cumulative_value(spark, sf_dir):
    """Windowed analytics in ONE pass over one partition spec: running sum
    (unbounded-preceding frame) + lag/lead inter-purchase gaps.  Sharing the
    (user_id; ts, event_id) window means Catalyst plans a single exchange +
    sort for all three analytic columns — this query absorbs the former
    purchase_gaps gate slot at zero extra shuffle."""
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.sum("value").over(wf), 6).alias("cum_value"),
            (ms - F.lag(ms).over(w)).alias("ms_since_prev"),
            (F.lead(ms).over(w) - ms).alias("ms_to_next"),
        )
        .orderBy("event_id")
    )


def q_daily_big_values_filled(spark, sf_dir):
    """Gap-filled daily series (`ORDER BY ... WITH FILL` parity): daily
    count of high-value events over the dataset's full [min, max] day
    range, absent days densified to zero.  The calendar spine is one
    min/max aggregate + sequence() — no driver collect — and the sparse
    daily counts broadcast to the left join against it."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = (
        ev.filter(F.col("value") > FILL_MIN_VALUE)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        # day-grain aggregate: bounded by the corpus TIME SPAN (~thousands
        # of rows after decades), not the corpus size — broadcast is safe
        # by construction at any scale, so it stays unconditional
        days.join(F.broadcast(daily), "day", "left")
        .select("day", F.coalesce("n_events", F.lit(0)).alias("n_events"))
        .orderBy("day")
    )


def q_value_histogram(spark, sf_dir):
    """Histogram binning: fixed-width buckets as a plain group-by — one hash
    aggregate with map-side partials, the way a 100 TB profile pass bins."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.floor(F.col("value") / 50).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec2("value")).cast("double") / F.count(F.lit(1)), 6).alias("avg_value"),
        )
        .orderBy("bucket")
    )


def q_user_event_sequence(spark, sf_dir):
    """groupArray parity (ordered collect): each user's full event-type
    sequence in (ts, event_id) order.  collect_list + array_sort on a
    struct gives a deterministic order without a window pass.

    The sequence is emitted as a '|'-joined STRING (not array<string>):
    semantics are identical, and a scalar column is what downstream
    hash/compare tooling — including the driver's pandas canonicalization,
    which cannot factorize list cells — can digest."""
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s.event_type,
    )
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws("|", seq).alias("seq_types"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


ARRAYF_T_CENTS = 5000  # arrayFilter threshold: 50.00 in cents


def q_array_functions(spark, sf_dir):
    """ClickHouse array-function family parity (`README.rst:283`'s linked
    array-functions topic) in ONE query: groupArray (ordered collect) ->
    arrayMap (x*2) -> arrayFilter (> threshold) -> arraySum fold, plus
    arraySort/arrayDistinct/arraySlice (top-3 distinct) and has() — each
    mapped to the Spark higher-order builtin (transform / filter /
    aggregate / array_sort / array_distinct / slice / array_contains),
    all row-local after the single grouping shuffle.  Money kept in
    integer cents so every fold is exact and order-independent."""
    v_c = F.round(F.col("value") * 100).cast("long")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", v_c.alias("v")))),
        lambda s: s.v,
    )
    doubled_big = F.filter(
        F.transform(vals, lambda x: x * 2), lambda x: x > ARRAYF_T_CENTS
    )
    top3 = F.slice(F.reverse(F.array_sort(F.array_distinct(vals))), 1, 3)
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.size(vals).alias("n_vals"),
            F.aggregate(
                doubled_big, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("big_doubled_sum_c"),
            F.concat_ws("|", F.transform(top3, lambda x: x.cast("string"))).alias(
                "top3_c"
            ),
            F.array_contains(vals, F.lit(0).cast("long")).alias("has_zero"),
        )
        .orderBy("user_id")
    )


def q_daily_type_rollup(spark, sf_dir):
    """ROLLUP grouping sets: per-(day, type) + per-day + grand total in one
    pass — Catalyst expands to a single Expand + hash aggregate."""
    return (
        _t(spark, sf_dir, "events")
        .rollup(F.to_date("ts").alias("day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(_dec2("value")).alias("total_value"),
        )
        .orderBy(
            F.col("day").asc_nulls_first(), F.col("event_type").asc_nulls_first()
        )
    )


def q_type_day_cube(spark, sf_dir):
    """CUBE grouping sets (the ROLLUP sibling `daily_type_rollup` lacks):
    all four grouping combinations — (day, type), (day), (type), () — in
    ONE Expand + hash aggregate, with `grouping_id()` distinguishing the
    levels exactly as DuckDB's GROUPING(day, event_type) bitmask does."""
    return (
        _t(spark, sf_dir, "events")
        .cube(F.to_date("ts").alias("day"), F.col("event_type"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(_dec2("value")).alias("total_value"),
        )
        .orderBy(
            "gid",
            F.col("day").asc_nulls_first(),
            F.col("event_type").asc_nulls_first(),
        )
    )


def q_value_window_analytics(spark, sf_dir):
    """Rank-family window functions + a time-RANGE frame in one pass, the
    §2.6 surface beyond row_number/lag: per user, each event's
    percent_rank / cume_dist / quartile over a TOTAL value order
    (value_cents, event_id — ties would make ntile nondeterministic), and
    the trailing-1h event count + exact-cents sum over a RANGE frame
    keyed on epoch millis (identical integer ordering in both engines).
    One exchange: every window shares the user_id partitioning."""
    wv = Window.partitionBy("user_id").orderBy("value_cents", "event_id")
    wt = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
        .select(
            "event_id",
            "user_id",
            "value_cents",
            F.round(F.percent_rank().over(wv), 6).alias("value_pct_rank"),
            F.round(F.cume_dist().over(wv), 6).alias("value_cume_dist"),
            F.ntile(4).over(wv).alias("value_quartile"),
            F.count(F.lit(1)).over(wt).alias("n_events_1h"),
            F.sum("value_cents").over(wt).alias("sum_cents_1h"),
        )
        .orderBy("event_id")
    )


def q_repeat_users(spark, sf_dir):
    """Set operation (INTERSECT): users active in both the first and the
    last week of the dataset."""
    events = _t(spark, sf_dir, "events")
    first_week = events.filter(F.dayofmonth("ts") <= 7).select("user_id")
    last_week = events.filter(F.dayofmonth("ts") >= 22).select("user_id")
    return first_week.intersect(last_week).orderBy("user_id")


def q_churned_users(spark, sf_dir):
    """Set operation (EXCEPT): users who purchased in the first week but not
    in the last week — the set-difference twin of repeat_users.  (Scoped to
    purchases so the fixture yields a non-empty answer set; any-activity
    churn is empty at sf0.01.)"""
    events = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    first_week = events.filter(F.dayofmonth("ts") <= 7).select("user_id")
    last_week = events.filter(F.dayofmonth("ts") >= 22).select("user_id")
    return first_week.subtract(last_week).orderBy("user_id")


def q_user_set_ops(spark, sf_dir):
    """Set-operation coverage (INTERSECT + EXCEPT) in one gate query: users
    active in both the first and last week ('repeat'), and users who
    purchased in the first week but not the last ('churned').  Each branch
    is the same distinct-shuffle a standalone set op would plan; the union
    of the two tagged results adds no exchange."""
    events = _t(spark, sf_dir, "events")
    first_week = events.filter(F.dayofmonth("ts") <= 7).select("user_id")
    last_week = events.filter(F.dayofmonth("ts") >= 22).select("user_id")
    repeat = first_week.intersect(last_week).select(
        F.lit("repeat").alias("set_op"), "user_id"
    )
    purch = events.filter(F.col("event_type") == "purchase")
    churned = (
        purch.filter(F.dayofmonth("ts") <= 7)
        .select("user_id")
        .subtract(purch.filter(F.dayofmonth("ts") >= 22).select("user_id"))
        .select(F.lit("churned").alias("set_op"), "user_id")
    )
    return repeat.unionByName(churned).orderBy("set_op", "user_id")


def q_asof_last_purchase(spark, sf_dir):
    """ASOF JOIN (backward): each click joined to the user's most recent
    purchase at-or-before it.  Union+window implementation — one shuffle on
    user_id, no range explosion (operators/asof.py)."""
    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # one row per (user, ts) so the closest match is engine-independent
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .withColumn("purchase_ts", F.col("ts"))
    )
    return asof.asof_join(
        clicks, purchases, on=["user_id"], ts_col="ts",
        payload_cols=["purchase_ts", "purchase_value"],
    ).orderBy("event_id")


def q_asof_next_error(spark, sf_dir):
    """ASOF JOIN (forward): each signup joined to the user's next error
    at-or-after it — the inner variant drops signups with no later error."""
    events = _t(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("error_value"))
        .withColumn("error_ts", F.col("ts"))
    )
    return asof.asof_join(
        signups, errors, on=["user_id"], ts_col="ts",
        payload_cols=["error_ts", "error_value"],
        direction="forward", how="inner",
    ).orderBy("event_id")


def q_latest_value_per_user(spark, sf_dir):
    """argMax/argMin parity (`max_by`/`min_by` with a struct ordering key):
    first and last event value per user in one hash aggregate — no window,
    no self-join, map-side partials apply."""
    key = F.struct("ts", "event_id")  # unique → deterministic across engines
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.max_by("value", key).alias("last_value"),
            F.min_by("value", key).alias("first_value"),
        )
        .orderBy("user_id")
    )


def q_train_test_split(spark, sf_dir):
    """Deterministic train/test split by content-independent hash bucket:
    h48(salt || doc_id) % 100 < 90 → train.  Row-local (no shuffle), stable
    across runs/engines/cluster sizes — the property a 100 TB training
    pipeline needs so re-runs never leak test docs into train."""
    docs = _t(spark, sf_dir, "documents")
    bucket = H.h48(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    # independent-salt sampling flag in the same row-local pass (absorbs the
    # former hash_sample gate slot): reproducible ~SAMPLE_PCT% subset,
    # decorrelated from the split by the distinct salt
    sample_bucket = (
        H.h48(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))) % 100
    )
    return docs.select(
        "doc_id",
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
        (sample_bucket < SAMPLE_PCT).alias("in_sample"),
    ).orderBy("doc_id")


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape — 4-table join: revenue lost to returns per customer
    in one quarter.  lineitem (the 100 TB side) is filtered first; orders
    carries the date predicate into its scan; customer and nation broadcast,
    so the only data-sized shuffle is the final group-by."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    o_q = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o_q, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_small(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(bcast_small(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # exact decimal arithmetic: the fixture's prices/discounts have 2
            # decimals, so the sum is order-independent and the half-cent
            # rounding boundary (which double sums land on either side of,
            # depending on accumulation order) cannot occur
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_brand_revenue(spark, sf_dir):
    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    return (
        li.join(bcast_small(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            _money_sum(
            _dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec2("l_discount"))
        ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand"))
        .limit(10)
    )


def q_top_orders_per_customer(spark, sf_dir):
    """Window-function coverage: top-3 orders per customer (row_number)."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


# ===========================================================================
# Beyond-parity: dedup / similarity / text analysis / multimodal (§2.7)
# ===========================================================================


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        shingle_n=MINHASH_SHINGLE_N,
        threshold=MINHASH_THRESHOLD,
    )


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the MinHash-LSH near-dup pairs: every doc
    labeled with the smallest doc_id in its duplicate group — the final
    'keep one per group' step of a dedup pipeline."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs,
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        shingle_n=MINHASH_SHINGLE_N,
        threshold=MINHASH_THRESHOLD,
    )
    # sortWithinPartitions: global-sort range sampling would re-run the
    # label join; driver hashing is order-insensitive
    return dedup.connected_components(docs, pairs).sortWithinPartitions("doc_id")


#: Cluster-atomic split salt — distinct from SPLIT_SALT so the two
#: splits are decorrelated (a doc's per-doc bucket says nothing about
#: its cluster's bucket)
CSPLIT_SALT = "csplit:"


def q_cluster_safe_split(spark, sf_dir):
    """Leakage-safe train/test split (dedup.cluster_safe_split, r15):
    near-dup clusters (MinHash-LSH pairs -> connected components, the
    dedup_clusters machinery verbatim) assigned ATOMICALLY to train or
    test by h48 on the component label — the split contract Lee et al.
    2022 show plain per-doc splits violate.  Oracle: the recursive-CTE
    transitive closure + the same h48 bucket on cluster_id."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs,
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        shingle_n=MINHASH_SHINGLE_N,
        threshold=MINHASH_THRESHOLD,
    )
    return dedup.cluster_safe_split(
        docs, pairs, SPLIT_TRAIN_PCT, CSPLIT_SALT
    ).orderBy("doc_id")


def q_event_type_matrix(spark, sf_dir):
    """countIf/sumIf-style conditional aggregation (manual pivot): one hash
    aggregate producing a wide per-user activity matrix — no per-type
    scans, no join, map-side partials carry 7 numbers per user."""
    events = _t(spark, sf_dir, "events")
    per_type = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return (
        events.groupBy("user_id")
        .agg(
            *per_type,
            _money_sum(
                F.when(F.col("event_type") == "purchase", _dec2("value")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).alias("purchase_value"),
        )
        .orderBy("user_id")
    )


def q_corpus_curation(spark, sf_dir):
    """End-to-end curation pipeline — the capstone composition: keep a doc
    iff it is (a) the canonical representative of its near-dup cluster,
    (b) predicted English, and (c) above the quality threshold; attach the
    deterministic train/test split to survivors.  Every stage is one of the
    gate operators composed unchanged, which is the point: the curation
    pass a 100 TB corpus runs is exactly these row-local scores plus the
    banded-LSH dedup, joined on doc_id."""
    docs = _t(spark, sf_dir, "documents")
    lang = text_analysis.language_id(docs).select("doc_id", "pred_lang")
    qual = text_analysis.quality_score(docs).select("doc_id", "quality")
    pairs = dedup.minhash_lsh_pairs(
        docs,
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        shingle_n=MINHASH_SHINGLE_N,
        threshold=MINHASH_THRESHOLD,
    )
    canon = (
        dedup.connected_components(docs, pairs)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
    )
    bucket = H.h48(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    wide = is_wide_source(docs)  # per-doc sides are corpus-sized; pin_wide
    return (
        docs.select("doc_id")
        .join(pin_wide(canon, wide), "doc_id")
        .join(pin_wide(lang, wide), "doc_id")
        .join(pin_wide(qual, wide), "doc_id")
        .filter((F.col("pred_lang") == "en") & (F.col("quality") >= CURATION_MIN_QUALITY))
        .select(
            "doc_id",
            "quality",
            F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        # sortWithinPartitions: global-sort range sampling would re-run the
        # curation join tree; driver hashing is order-insensitive
        .sortWithinPartitions("doc_id")
    )


def q_hash_sample(spark, sf_dir):
    """Deterministic ~10% sample by hash bucket on the row key — unlike
    TABLESAMPLE this is reproducible across runs, engines, and cluster
    sizes, which is what training-data curation needs (resampling must not
    silently change the corpus).  Row-local, no shuffle; the filter runs in
    the scan stage."""
    ev = _t(spark, sf_dir, "events")
    keep = (
        H.h48(F.concat(F.lit(SAMPLE_SALT), F.col("event_id").cast("string"))) % 100
        < SAMPLE_PCT
    )
    return ev.filter(keep).select("event_id", "event_type", "user_id").orderBy("event_id")


def q_uniq_users_approx(spark, sf_dir):
    """`uniq` parity through the PERSISTABLE state path (r04): per-(type,
    day) HLL sketch states (`uniqState`, agg_state.uniq_state — the
    AggregateFunction(uniq) column) merged on read per type (`uniqMerge`)
    — the sketch pipeline a 100 TB deployment stores and rolls up, same
    shape as the max/min/avg state cascade.  Each state is a fixed ~KB
    binary, map-side mergeable; the sketch-union round-trip (merge of any
    block split == whole-input sketch, exactly) and the SummingMergeTree
    compaction path are property-tested in tests/test_agg_state.py.

    Oracle (r05): exact COUNT(DISTINCT) — legitimate at gate scale because
    a DataSketches HLL sketch stays in exact coupon mode until ~512
    distinct values and sf0.01 has 150 users per type, so the estimate IS
    the exact count there.  At production cardinalities the operator is
    approximate by design; the error-bound contract vs the exact count is
    asserted in tests/test_approx_sketches.py."""
    from apache_kafka_clickhouse_demo_spark.functions import agg_state as S

    states = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(S.uniq_state("user_id").alias("uniq_state"))
    )
    return (
        states.groupBy("event_type")
        .agg(S.uniq_merge("uniq_state").alias("approx_uniq_users"))
        .orderBy("event_type")
    )


def q_pii_scrub(spark, sf_dir):
    """Text scrubbing for training data: redact numeric tokens from the raw
    props payload before it ever reaches a training corpus.  Row-local
    regexp_replace — embarrassingly parallel, no shuffle."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.regexp_replace("props", "[0-9]+", "#").alias("props_scrubbed"),
        )
        .orderBy("event_id")
    )


def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAX_HAMMING)


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), shingle_n=NGRAM_N, threshold=NGRAM_THRESHOLD
    )


def q_embedding_near_dup(spark, sf_dir):
    return dedup.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=NEAR_DUP_COS,
        dim=EMBED_DIM,
        num_tables=NEAR_DUP_TABLES,
        planes_per_table=NEAR_DUP_PLANES,
        seed=NEAR_DUP_SEED,
    )


def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < ANN_NUM_QUERIES), k=ANN_K
    )


PQ_M = 8
PQ_TARGET_CODES = 64


def q_ann_pq_topk(spark, sf_dir):
    """PQ-ADC approximate top-k (similarity.pq_adc_topk — Jégou et al.
    2011, the FAISS memory-bound serving path): per-subspace
    hash-sampled codebooks, corpus compressed to m codes per vector,
    queries scored by summing integer micro-unit distance-table cells.
    Completes the ANN quantization family (SQ8 = scalar, IVF = coarse,
    PQ = product); recall vs the exact operator bounded in
    tests/test_ann_recall.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        dim=EMBED_DIM,
        k=ANN_K,
        m=PQ_M,
        target_codes=PQ_TARGET_CODES,
    )


def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ (similarity.ivfpq_topk — the full FAISS IVFPQ serving
    composition): the gate-green coarse quantizer prunes to nprobe
    cells, the PQ machinery ADC-scores only the pruned candidates over
    m-code compressed vectors — at 100 TB the cell join ships codes,
    not embeddings, and scoring touches ~nprobe/K of the corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        dim=EMBED_DIM,
        k=ANN_K,
        m=PQ_M,
        target_codes=PQ_TARGET_CODES,
        nprobe=IVF_NPROBE,
        target_centroids=IVF_TARGET_CENTROIDS,
    )


def q_ann_ivfpq_indexed(spark, sf_dir):
    """IVF-PQ over the PERSISTED index (search_index.build_ivfpq_index
    + ivfpq_index_lookup — r14, VERDICT r13 #4): centroids, PQ
    codebooks, cell assignments AND the m-code compressed corpus stored
    in one transactional table; the lookup probes nprobe cells, reads
    only those shards' CODE columns (parquet column pruning never
    decodes the stored vectors) and ADC-scores against the bounded
    distance table.  Same quantizer + encoder as the scan path by
    import, so the oracle is the ivfpq_topk mirror verbatim (the
    hybrid_indexed precedent: the oracle mirrors the index content, so
    probe drift cannot pass)."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    work = _workdir("ivfpq_index_")
    table = SI.build_ivfpq_index(
        emb,
        f"{work}/ix",
        dim=EMBED_DIM,
        m=PQ_M,
        target_codes=PQ_TARGET_CODES,
        target_centroids=IVF_TARGET_CENTROIDS,
        ivf_salt=IVF_SALT,
    )
    return SI.ivfpq_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_ann_ivfpq_grown(spark, sf_dir):
    """Grown IVFPQ index (extend_ivfpq_index): build on the founding
    75%, extend with the rest — new vectors are assigned against the
    STORED centroids and encoded against the STORED codebooks (both
    generations fixed at creation, the extend contract), published as
    one atomic segment commit.  The oracle mirrors the founding-only
    draws for BOTH the IVF centroids and the PQ codebooks, which
    differs from the full-corpus ann_ivfpq_indexed oracle on this
    fixture — a lookup that secretly re-trained either generation
    cannot fake this row green."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    founding = emb.filter(F.expr(ANN_GROWN_FOUNDING_PRED))
    growth = emb.filter(~F.expr(ANN_GROWN_FOUNDING_PRED))
    work = _workdir("ivfpq_grown_")
    table = SI.build_ivfpq_index(
        founding,
        f"{work}/ix",
        dim=EMBED_DIM,
        m=PQ_M,
        target_codes=PQ_TARGET_CODES,
        target_centroids=IVF_TARGET_CENTROIDS,
        ivf_salt=IVF_SALT,
    )
    SI.extend_ivfpq_index(growth, table, ivf_salt=IVF_SALT)
    return SI.ivfpq_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_ann_ivfpq_reclustered(spark, sf_dir):
    """Reclustered IVFPQ index (maintain_ivfpq_index recluster=True):
    grow as above, then found a NEW centroid generation from a full-
    corpus draw and re-bucket every row in one CAS replace-commit.  PQ
    codes are codebook-relative and survive the swap VERBATIM (no
    re-encode) — so the oracle is the full-corpus IVF quantizer
    composed with the FOUNDING-ONLY codebook draw, which differs from
    both the indexed and the grown oracles on this fixture."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    founding = emb.filter(F.expr(ANN_GROWN_FOUNDING_PRED))
    growth = emb.filter(~F.expr(ANN_GROWN_FOUNDING_PRED))
    work = _workdir("ivfpq_reclust_")
    table = SI.build_ivfpq_index(
        founding,
        f"{work}/ix",
        dim=EMBED_DIM,
        m=PQ_M,
        target_codes=PQ_TARGET_CODES,
        target_centroids=IVF_TARGET_CENTROIDS,
        ivf_salt=IVF_SALT,
    )
    SI.extend_ivfpq_index(growth, table, ivf_salt=IVF_SALT)
    SI.maintain_ivfpq_index(
        spark,
        table,
        recluster=True,
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    return SI.ivfpq_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


KMEANS_ROUNDS = 2


def q_kmeans_clusters(spark, sf_dir):
    """Deterministic spherical k-means (similarity.kmeans_refine — r14):
    the shared IVF hash draw as init, then two Lloyd rounds with
    INTEGER-MICRO member means (order-free sums, DIV quotients, shared
    renormalize), the trained-quantizer upgrade SemDeDup/IVF-class
    curation runs at 100 TB (Jégou et al. train the coarse quantizer by
    exactly this process).  Output: every vector's final cluster.  The
    oracle replays both unrolled rounds cell-for-cell, so the row is
    hash-exact, not approximately-close."""
    emb = _t(spark, sf_dir, "embeddings")
    _, assign = similarity.kmeans_refine(
        emb,
        rounds=KMEANS_ROUNDS,
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    return assign.select(
        F.col("vid").alias("vec_id"), F.col("cent_id")
    ).orderBy("vec_id")


def q_ann_sq8_topk(spark, sf_dir):
    """Int8-quantized brute-force ANN (similarity.sq8_topk): per-vector
    symmetric scalar quantization, integer-dot scoring — the ~4-8x
    bytes-moved cut for the 100 TB verify/rerank stages; recall vs the
    exact operator bounded in tests/test_ann_recall.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.sq8_topk(
        emb, emb.filter(F.col("vec_id") < ANN_NUM_QUERIES), k=ANN_K
    )


def q_ann_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.rp_lsh_ann_topk(
        emb,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        num_planes=RP_PLANES,
        seed=RP_SEED,
        dim=EMBED_DIM,
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: hash-sampled centroids sized to a FIXED target count
    (constant broadcast at any corpus size), nprobe-cell probe, exact
    rerank within cells (operators/similarity.ivf_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        dim=EMBED_DIM,
        target_centroids=IVF_TARGET_CENTROIDS,
        nprobe=IVF_NPROBE,
        salt=IVF_SALT,
    )


def q_media_frame_sample(spark, sf_dir):
    """Frame sampling over video blobs (mapInPandas fan-out); per-frame md5
    of the exact blob slice makes the Python path hash-checkable."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    # sortWithinPartitions: a global sort's range-sampling job would run
    # the mapInPandas stage twice; driver hashing is order-insensitive
    return multimodal.sample_frames(media).sortWithinPartitions("doc_id", "frame_idx")


def q_media_resize(spark, sf_dir):
    """Fake-resize over blobs (strided downsample, mapInPandas): resized
    length + md5, hash-checked against the same slicing done in SQL."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return multimodal.resize_media(media).sortWithinPartitions("doc_id")


def q_lang_id(spark, sf_dir):
    return text_analysis.language_id(_t(spark, sf_dir, "documents"))


def q_text_quality(spark, sf_dir):
    return text_analysis.quality_score(_t(spark, sf_dir, "documents"))


def q_token_counts(spark, sf_dir):
    return text_analysis.token_counts(_t(spark, sf_dir, "documents"))


def q_doc_chunks(spark, sf_dir):
    """Context-window chunking (training-data prep): overlapping
    fixed-token windows per document, row-local fan-out."""
    return text_analysis.doc_chunks(
        _t(spark, sf_dir, "documents"),
        chunk_tokens=CHUNK_TOKENS,
        stride=CHUNK_STRIDE,
    ).orderBy("doc_id", "chunk_idx")


DECON_SHINGLE_N = 13

PACK_MAX_TOKENS = 64
PACK_BUCKETS = 8
PACK_SALT = "pack:"


def q_pack_sequences(spark, sf_dir):
    """Sequence packing (training-data prep, the step after chunking):
    chunks hash-bucketed by document, each bucket's chunk stream
    concatenated and cut every PACK_MAX_TOKENS tokens
    (text_analysis.pack_chunks).  One shuffle on the bucket key; the
    running-sum window runs per bucket, never globally."""
    chunks = text_analysis.doc_chunks(
        _t(spark, sf_dir, "documents"),
        chunk_tokens=CHUNK_TOKENS,
        stride=CHUNK_STRIDE,
    ).select("doc_id", "chunk_idx", "n_tokens")
    return text_analysis.pack_chunks(
        chunks,
        max_tokens=PACK_MAX_TOKENS,
        buckets=PACK_BUCKETS,
        salt=PACK_SALT,
    ).sortWithinPartitions("bucket", "doc_id", "chunk_idx")


def q_stream_strat_sample(spark, sf_dir):
    """Streaming stratified quota sample (r13,
    stateful.reservoir_sample_stream with group_col — the per-group
    generalization of the r7 uniform reservoir): the documents feed
    drains as four blocks into the generational bottom-k-PER-GROUP
    store (state <= groups * N rows); per-group bottom-k is mergeable
    exactly like the uniform sketch, so the drained sample equals the
    batch `stratified_sample` statement over the whole feed VERBATIM —
    the oracle is sample_stratified's SQL unchanged."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        reservoir_sample_stream,
        reservoir_stream_writer,
    )

    work = _workdir("stream_strat_")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    blk = F.pmod(F.col("doc_id"), F.lit(4)).cast("int")
    feed = _write_feed_blocks(docs, work, blk)
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = reservoir_sample_stream(
        spark,
        src,
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        id_col="doc_id",
        k=STRAT_N,
        salt=STRAT_SALT,
        group_col="source",
    )
    q.processAllAvailable()
    q.stop()
    w = reservoir_stream_writer(
        spark,
        f"{work}/store",
        id_col="doc_id",
        k=STRAT_N,
        writer_id=f"{work}/ck",
        salt=STRAT_SALT,
        group_col="source",
    )
    return w.stratified().orderBy("source", "strat_rank")


def q_sample_stratified(spark, sf_dir):
    """Exact per-source quota sample (N smallest h48 per source) via the
    two-phase partition-local reduction — no per-group window funnel, so
    a 100 TB group costs one map-side slice per partition, not one task
    (operators/sampling.stratified_sample)."""
    from apache_kafka_clickhouse_demo_spark.operators import sampling

    return sampling.stratified_sample(
        _t(spark, sf_dir, "documents"),
        group_col="source",
        n_per_group=STRAT_N,
        id_col="doc_id",
        salt=STRAT_SALT,
    )


def q_shuffle_export(spark, sf_dir):
    """Deterministic global shuffle into dataloader shards: h48 position,
    hash-balanced shard, bit-stable within-shard order
    (operators/sampling.shuffle_shards)."""
    from apache_kafka_clickhouse_demo_spark.operators import sampling

    return sampling.shuffle_shards(
        _t(spark, sf_dir, "documents"),
        id_col="doc_id",
        num_shards=SHUFFLE_SHARDS,
        salt=SHUFFLE_SALT,
    )


def q_mixture_sample(spark, sf_dir):
    """Deterministic data-mixture sampling: per-source keep rates applied
    as one row-local hash filter (operators/sampling.mixture_sample) —
    src0/src1/src2 at distinct rates, everything else at the default."""
    from apache_kafka_clickhouse_demo_spark.operators import sampling

    return sampling.mixture_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "source"),
        group_col="source",
        rates=MIX_RATES,
        id_col="doc_id",
        salt=MIX_SALT,
        default_rate=MIX_DEFAULT_RATE,
    ).orderBy("doc_id")


def q_repetition_stats(spark, sf_dir):
    """Gopher/C4-style duplicate-token / duplicate-2-gram fractions."""
    return text_analysis.repetition_stats(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_decontaminate_split(spark, sf_dir):
    """Eval decontamination: test docs sharing a 13-gram with any train doc
    (split = the deterministic hash split of train_test_split)."""
    docs = _t(spark, sf_dir, "documents")
    bucket = H.h48(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    with_split = docs.withColumn(
        "split",
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train")).otherwise(F.lit("test")),
    )
    return dedup.cross_split_contamination(with_split, shingle_n=DECON_SHINGLE_N)


def q_bloom_decontaminate(spark, sf_dir):
    """Corpus-prep decontamination through the Bloom prefilter
    (dedup.bloom_decontaminate): TRAIN docs sharing a 13-gram with any
    TEST doc, found by probing a broadcast fixed-size Bloom bitmap of the
    test grams row-locally and exact-verifying only the hits — the
    100 TB shape of decontaminate_split's direct equi-join (which
    shuffles every train gram).  Exact by two-phase construction; the
    oracle is the direct join SQL."""
    docs = _t(spark, sf_dir, "documents")
    bucket = H.h48(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    with_split = docs.withColumn(
        "split",
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train")).otherwise(F.lit("test")),
    )
    return dedup.bloom_decontaminate(
        with_split,
        shingle_n=DECON_SHINGLE_N,
        report_split="train",
        against_split="test",
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 characteristic terms, exact-integer TF-IDF."""
    return text_analysis.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3).orderBy(
        "doc_id", "rank"
    )


def q_text_prep(spark, sf_dir):
    """Training-corpus preparation — the text twin of corpus_curation's
    composition: (1) deterministic hash split, (2) decontaminate the TRAIN
    side (drop every train doc sharing a 13-gram with any test doc — the
    corpus-prep direction of cross_split_contamination), (3) chunk the
    surviving train docs into overlapping context windows, (4) annotate
    every chunk with its document's top TF-IDF term computed over the CLEAN
    train corpus (the statistics a tokenizer/filter pass would use).

    One gate query driver-attests three operators' outputs at once:
    doc_chunks (chunk_idx/chunk_text/n_tokens), tfidf_top_terms (term +
    exact integer score), and cross_split_contamination (which docs
    survive).  Plan shape at 100 TB: the shingle-hash equi-join of the
    decontamination stage, the row-local chunk fan-out, tf/df's two linear
    shuffles, and one doc_id equi-join chunks⋈top-term — no all-pairs
    stage anywhere.  LEFT join for the term so degenerate (NULL-text) train
    docs keep their single NULL chunk row instead of vanishing."""
    docs = _t(spark, sf_dir, "documents")
    wide = is_wide_source(docs)  # pin_wide rationale: sources/tables.py
    bucket = H.h48(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
    with_split = docs.withColumn(
        "split",
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train")).otherwise(F.lit("test")),
    )
    contaminated = dedup.cross_split_contamination(
        with_split,
        shingle_n=DECON_SHINGLE_N,
        report_split="train",
        against_split="test",
    ).select("doc_id")
    clean_train = (
        with_split.filter(F.col("split") == "train")
        .join(pin_wide(contaminated, wide), "doc_id", "left_anti")
        .select("doc_id", "text")
    )
    chunks = text_analysis.doc_chunks(
        clean_train, chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE
    )
    # clean_train is DERIVED (anti-joined), so the operator's own
    # is_wide_source default would read a shrunken estimate — pass the
    # source-computed flag (r10 sweep finding)
    top1 = text_analysis.tfidf_top_terms(clean_train, k=1, wide=wide).select(
        "doc_id",
        F.col("term").alias("top_term"),
        F.col("score_micro").alias("top_score_micro"),
    )
    return (
        chunks.join(pin_wide(top1, wide), "doc_id", "left")
        .select(
            "doc_id", "chunk_idx", "chunk_text", "n_tokens",
            "top_term", "top_score_micro",
        )
        # sortWithinPartitions: a global sort's range-sampling job re-runs
        # the final join stage; driver hashing is order-insensitive
        .sortWithinPartitions("doc_id", "chunk_idx")
    )


def q_text_profile(spark, sf_dir):
    """Language ID + quality features + token counts as ONE row-local pass
    (operators/text_analysis.text_profile) — the gate query for all three
    text-analysis operators; no data-sized shuffle, scan-throughput at
    100 TB.

    sortWithinPartitions, NOT orderBy: a global sort's range partitioner
    runs a sampling job that evaluates the whole (expensive, row-local)
    profile projection a second time — measured 2.9s vs 0.9s at sf0.1 —
    and the driver's hash compare canonicalizes row order anyway, so the
    global order bought nothing."""
    return text_analysis.text_profile(
        _t(spark, sf_dir, "documents")
    ).sortWithinPartitions("doc_id")


def q_doc_fingerprint(spark, sf_dir):
    return text_analysis.doc_fingerprint(_t(spark, sf_dir, "documents"))


def q_containment_pairs(spark, sf_dir):
    """Near-superset dedup (dedup.containment_pairs): gram containment
    |A∩B|/|A| >= 0.8 — the quotation/boilerplate-inclusion duplicate
    class Jaccard misses; one-sided prefix-filtered probe against a full
    gram index, exact verify."""
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"), shingle_n=NGRAM_N, threshold=0.8
    )


def q_winnow_fingerprint(spark, sf_dir):
    """MOSS winnowing fingerprints (text_analysis.winnow_fingerprints):
    per-window min of word-4-gram h48s, the local alignment-free
    similarity sketch — one row-local projection chain, zero exchanges."""
    return text_analysis.winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=WINNOW_K, window=WINNOW_WINDOW
    ).orderBy("doc_id")


def q_media_summary(spark, sf_dir):
    return multimodal.media_summary(multimodal.attach_media(_t(spark, sf_dir, "documents")))


def q_media_phash_dedup(spark, sf_dir):
    """Near-duplicate media by perceptual-hash Hamming distance (r12,
    multimodal.media_phash_pairs — the LAION/DataComp image-dedup step):
    blockhash-style PHASH_BITS fingerprints over Arrow blob batches,
    pigeonhole chunk-join (never all-pairs), bit_count verify.  The
    oracle is the NAIVE all-pairs form over the same deterministic band
    sums, so the banding's exactness is hash-checked, not argued."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return multimodal.media_phash_pairs(media).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_media_phash_clusters(spark, sf_dir):
    """Bounded cluster/representative form of perceptual-hash media
    dedup (VERDICT r12 #4): the pair LISTING is quadratic in
    duplicate-class size — correct, but the wrong API for
    heavy-duplication corpora at 100 TB, where the LAION-style consumer
    wants ONE canonical doc per near-dup class.  Composition of three
    proven pieces: media_phash_edges -> connected_components ->
    cluster_representatives, keeping the LARGEST copy per cluster
    (n_bytes as score — the keep-the-highest-resolution analog; ties ->
    smallest doc_id; NULL blobs score 0).  Output is one row per
    cluster — LINEAR in docs whatever the duplicate structure, so the
    quadratic pair relation never reaches a sink.  Since r15 (VERDICT
    r14 #5) the EDGE SET is linear too: equal-phash star collapse +
    pigeonhole pairs over distinct fingerprints only
    (multimodal.media_phash_edges — connectivity proof in its
    docstring), so heavy-duplication corpora never materialize the
    quadratic pair relation anywhere in this plan.  The oracle stays
    the all-pairs transitive closure — hash-exact means the collapse
    provably changed nothing."""
    docs = _t(spark, sf_dir, "documents")
    wide = is_wide_source(docs)
    media = multimodal.attach_media(docs)
    pairs = multimodal.media_phash_edges(media)
    labeled = dedup.connected_components(media.select("doc_id"), pairs)
    scored = media.select(
        "doc_id",
        F.coalesce(F.col("meta.n_bytes"), F.lit(0)).alias("n_bytes"),
    )
    return (
        dedup.cluster_representatives(
            labeled, scored, wide, score_col="n_bytes"
        )
        .select(
            "cluster_id",
            "rep_doc_id",
            "cluster_size",
            F.col("rep_score_milli").alias("rep_n_bytes"),
        )
        .orderBy("cluster_id")
    )


def q_media_features(spark, sf_dir):
    """SINGLE mapInPandas pass computing feature extraction + fake resize
    over Arrow blob batches (multimodal.media_profile) — the gate query for
    both Python-side media operators; each blob crosses the Arrow boundary
    once and no doc_id join is needed.  The stub decode is a deterministic
    strided byte-sum with floor-based rounding, so even this Python-side
    path is fully hash-checked against a DuckDB oracle.

    The feature vector is emitted as `feature_ufp`: '|'-joined micro-units
    (round(x * 1e6) as long).  Integers format identically everywhere,
    sidestepping both cross-engine float-formatting hazards and the
    driver's list-cell canonicalization limit; no information is lost (the
    features are floor-quantized to 1e-6 by construction)."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return (
        multimodal.media_profile(media)
        .select(
            "doc_id",
            "media_type",
            "n_bytes",
            # concat_ws would silently turn a NULL feature array into '' —
            # keep NULL NULL to match the oracle's degenerate contract
            F.when(
                F.col("feature").isNotNull(),
                F.concat_ws(
                    "|", F.transform("feature", lambda x: F.round(x * 1e6).cast("long"))
                ),
            ).alias("feature_ufp"),
            "resized_bytes",
            "resized_md5",
        )
        # sortWithinPartitions: global-sort range sampling would re-run the
        # whole mapInPandas stage; driver hashing is order-insensitive
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Gate registry — AT MOST 50 entries (the driver's correctness gate emits
# rows for the first 50 registry keys; round 2 registered 65 and the last 15
# were silently never checked).  Every operator family keeps exactly one
# gate query; the absorbed/overlapping variants live in EXTRA_QUERIES below,
# still oracle-checked locally by tools/oracle_check.py.
#
# Order matters: queries that had no driver row in round 2 (or changed this
# round) come FIRST, so even a truncated gate records them.
# ---------------------------------------------------------------------------

# ===========================================================================
# r06 additions: MergeTree engine family (Replacing / VersionedCollapsing /
# TTL), funnel + retention analytics, heavy-hitters sketch, passage dedup
# ===========================================================================


def q_replacing_latest(spark, sf_dir):
    """ReplacingMergeTree round trip (the upsert/CDC engine): treat each
    user's events as versioned upserts of one state row (version = ts,
    tiebreak = event_id), write them as a table, run the background merge
    (`compact_replacing`), and answer through the `FINAL` read
    (`read_replacing_final`) — which must equal the plain latest-row-per-key
    query whether or not the merge already ran."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import (
        compact_replacing,
        read_replacing_final,
        read_table,
        write_sorted,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    path = _workdir("replacing_") + "/t"
    write_sorted(ev, path, sort_cols=["user_id", "ts"])
    compact_replacing(
        spark, path, keys=["user_id"], version_col="ts", tiebreak=["event_id"]
    )
    return (
        read_replacing_final(
            read_table(spark, path), ["user_id"], "ts", ["event_id"]
        )
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            "event_type",
            "value_cents",
        )
        .orderBy("user_id")
    )


def q_replacing_deletes(spark, sf_dir):
    """ReplacingMergeTree(ver, is_deleted) round trip — CDC deletes as
    tombstone upserts: each user's events are versioned upserts of one
    state row, and an 'error' event is the user's DELETE (is_deleted=1).
    Write -> background merge (default: winning tombstones retained so
    older replays cannot resurrect) -> FINAL read with tombstone
    suppression.  A user whose LAST event is an error is absent; everyone
    else shows their latest state."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import (
        compact_replacing,
        read_replacing_final,
        read_table,
        write_sorted,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        (F.col("event_type") == "error").cast("int").alias("is_deleted"),
    )
    path = _workdir("replacing_del_") + "/t"
    write_sorted(ev, path, sort_cols=["user_id", "ts"])
    compact_replacing(
        spark,
        path,
        keys=["user_id"],
        version_col="ts",
        tiebreak=["event_id"],
        deleted_col="is_deleted",
    )
    return (
        read_replacing_final(
            read_table(spark, path),
            ["user_id"],
            "ts",
            ["event_id"],
            deleted_col="is_deleted",
        )
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            "event_type",
            "value_cents",
        )
        .orderBy("user_id")
    )


def q_collapsing_balance(spark, sf_dir):
    """VersionedCollapsingMergeTree round trip (the mutable-state engine):
    each user's running balance is kept as a collapsing change log — every
    event appends a cancel (-1) of the previous state row and a new state
    (+1) at the next version — then the background merge
    (`compact_collapsing`) annihilates all matched pairs.  Exactly the
    final state row per user must survive, so the compacted table read IS
    the per-user (n_events, balance); the oracle states that directly as
    count/sum over the raw events."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import (
        compact_collapsing,
        read_table,
    )

    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    log = _t(spark, sf_dir, "events").select(
        "user_id",
        F.row_number().over(w).alias("version"),
        cents.alias("_cents"),
        F.sum(cents).over(wsum).alias("balance_cents"),
    )
    states = log.select(
        "user_id", "version", F.lit(1).alias("sign"), "balance_cents"
    )
    cancels = log.filter(F.col("version") > 1).select(
        "user_id",
        (F.col("version") - 1).alias("version"),
        F.lit(-1).alias("sign"),
        (F.col("balance_cents") - F.col("_cents")).alias("balance_cents"),
    )
    path = _workdir("collapsing_") + "/t"
    states.unionByName(cancels).write.parquet(path)
    compact_collapsing(
        spark, path, keys=["user_id"], sign_col="sign", version_col="version"
    )
    return (
        read_table(spark, path)
        .select(
            "user_id", F.col("version").alias("n_events"), "balance_cents"
        )
        .orderBy("user_id")
    )


def q_ttl_cleanup(spark, sf_dir):
    """Row TTL on a day-partitioned table: write events partitioned by day,
    expire everything before a MID-day cutoff (`apply_ttl` — whole expired
    days are unlinked from partition values alone, only the boundary day is
    filter-rewritten), and report the surviving per-day counts/sums."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import (
        apply_ttl,
        read_table,
        write_sorted,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = _workdir("ttl_") + "/t"
    write_sorted(ev, path, sort_cols=["ts"], partition_cols=["day"])
    apply_ttl(spark, path, "ts", TTL_CUTOFF, partition_day_col="day")
    return (
        read_table(spark, path)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .orderBy("day")
    )


def q_funnel_levels(spark, sf_dir):
    """windowFunnel parity: how many users complete each prefix of the
    view -> click -> purchase journey within a 6h window of the chain's
    first event (operators/funnel.py; chain semantics in its docstring)."""
    steps = [F.col("event_type") == s for s in FUNNEL_STEPS]
    return funnel.funnel_counts(
        _t(spark, sf_dir, "events"), "user_id", "ts", steps, FUNNEL_WINDOW_S
    )


def q_retention_cohort(spark, sf_dir):
    """retention() parity: of the users who purchased on the cohort day,
    how many purchased again k days later, for k in 0..6."""
    purchases = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return funnel.retention(
        purchases, "user_id", "ts", RETENTION_DAY0, RETENTION_OFFSETS
    )


def q_top_users_sketch(spark, sf_dir):
    """topK parity via the mergeable Misra-Gries sketch
    (operators/sketches.py): 10 most active users with frequency bounds.
    capacity >> distinct users here, so the sketch is in its EXACT regime
    (count_lb == count_ub) and the oracle is the plain exact top-k."""
    return sketches.heavy_hitters_topk(
        _t(spark, sf_dir, "events"), "user_id", TOPK_K, TOPK_CAPACITY
    )


def q_top_users_weighted(spark, sf_dir):
    """topKWeighted parity via the weighted Misra-Gries sketch
    (sketches.heavy_hitters_topk_weighted): 10 users by total spend
    (exact integer value_cents weights).  capacity >> distinct users, so
    the sketch is in its EXACT regime and the oracle is the plain exact
    weighted top-k with the same NULL/non-positive-weight drop rule."""
    ev = _t(spark, sf_dir, "events")
    return sketches.heavy_hitters_topk_weighted(
        ev,
        "user_id",
        F.round(F.col("value") * 100).cast("long"),
        TOPK_K,
        TOPK_CAPACITY,
    )


def q7_nation_trade(spark, sf_dir):
    """TPC-H Q7 (volume shipping): revenue shipped between two nations in
    either direction, by supplier nation / customer nation / year.  Plan:
    lineitem->orders->customer chain with two BROADCAST nation dims; the
    pair predicate applies after both nation joins; integer-u4 money
    (q1's exact-cents pattern) summed as decimal."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = bcast_small(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = bcast_small(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", (price_c * (100 - disc_c)).alias("vol_u4"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (F.sum(F.col("vol_u4").cast("decimal(38,0)")).cast("double") / 10000.0).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    revenue sold to customers in region ASIA, by order year.  The
    share is a conditional-sum ratio inside one aggregate — numerator and
    denominator in a single pass, no self-join; part/nation/region dims
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    n_cust = bcast_small(
        # derived through a join: gate on the SOURCE scans, not the estimate
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("c_nk")),
        wide=is_wide_source(nation) or is_wide_source(region),
    )
    n_supp = bcast_small(
        nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    econ = bcast_small(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    vol = (
        li.select("l_orderkey", "l_partkey", "l_suppkey", (price_c * (100 - disc_c)).alias("vol_u4"))
        .join(econ, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(bcast_small(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("c_nk"))
        .join(bcast_small(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("s_nk"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("vol_u4")).otherwise(F.lit(0)).cast("decimal(38,0)")
    )
    den = F.sum(F.col("vol_u4").cast("decimal(38,0)"))
    return (
        vol.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H completion (r7): the remaining 13 query SHAPES.  The reduced fixture
# (TESTDATA.md) has no partsupp table and no shipmode/commitdate/receiptdate/
# container/comment/phone columns, so the canonical text of Q2/9/11/12/16/
# 19/20/21/22 is not expressible verbatim; each adaptation below preserves
# the query's defining plan shape (the thing that matters at 100 TB —
# correlated mins, anti/semi joins, scalar-subquery thresholds, disjunctive
# join predicates) on the columns that exist, and says exactly what changed.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part), adapted: no partsupp,
    so the per-(part, supplier) cost is the MINIMUM per-unit price the
    supplier ever charged for the part in lineitem (min(extprice/qty) in
    exact cents-per-unit scale).  Shape preserved: region-filtered dims +
    the correlated-minimum join (part's global min cost re-joined to pick
    the matching suppliers), ordered by supplier acctbal."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    eu_supp = bcast_small(
        # derived through joins: gate on the supplier SOURCE scan
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name"),
        wide=is_wide_source(supp),
    )
    pparts = bcast_small(
        part.filter(F.col("p_size").isin(5, 15, 25, 35, 45)).select(
            "p_partkey", "p_name"
        )
    )
    # exact unit cost in cents*100 per unit: round once at cents, then
    # integer-scale the division to 4 decimals (floor) — deterministic
    # across engines, no double rounding drift
    unit_c4 = F.floor(
        (F.round(F.col("l_extendedprice") * 100).cast("long") * 100)
        / F.col("l_quantity").cast("long")
    ).cast("long")
    costs = (
        li.join(pparts, F.col("l_partkey") == F.col("p_partkey"))
        .join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit_c4).alias("cost_c4"))
    )
    best = bcast_small(
        # per-part minimum: scales with the part table — gate on its scan
        costs.groupBy(F.col("p_partkey").alias("bp")).agg(
            F.min("cost_c4").alias("best_c4")
        ),
        wide=is_wide_source(part) or is_wide_source(li),
    )
    return (
        costs.join(
            best,
            (F.col("p_partkey") == F.col("bp"))
            & (F.col("cost_c4") == F.col("best_c4")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("cost_c4").cast("double") / 10000.0).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (product profit by nation and year), adapted: no
    partsupp means no supplycost term, so profit is discounted revenue.
    Shape preserved: part-NAME substring filter (p_name LIKE '%red%'),
    the lineitem->orders + supplier->nation chain, nation x year group."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    red = bcast_small(part.filter(F.col("p_name").contains("red")).select("p_partkey"))
    ndim = bcast_small(
        nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    )
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey", (price_c * (100 - disc_c)).alias("vol_u4"))
        .join(red, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ndim, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(F.col("vol_u4").cast("decimal(38,0)")).cast("double") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock), adapted: no partsupp, so a
    part's held value is the total shipped value from lineitem
    (sum(qty * extprice) in cents).  Shape preserved: per-key aggregate
    HAVING value > fraction x the SAME aggregate globally — the
    scalar-subquery threshold that makes Q11 interesting (computed once,
    broadcast into the filter, never a self-join per row)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nat = bcast_small(
        nation.filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    )
    nsupp = bcast_small(
        # derived through a join: gate on the supplier SOURCE scan
        supp.join(nat, supp.s_nationkey == F.col("n_nationkey")).select("s_suppkey"),
        wide=is_wide_source(supp),
    )
    val_c = (
        F.col("l_quantity").cast("long")
        * F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    scoped = li.join(nsupp, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_partkey", val_c.alias("val_c")
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(F.col("val_c").cast("decimal(38,0)")).alias("value_c")
    )
    # scalar threshold: FRACTION (1/500 here — ~90 of 2000 parts pass at
    # sf0.01; Q11 uses 1/10000 at SF1) of the same scoped total — one
    # 1-row broadcast join, and the comparison stays in exact integer
    # cents (value*500 > total) so no engine's decimal-vs-double
    # promotion can flip a boundary row
    total = scoped.agg(
        F.sum(F.col("val_c").cast("decimal(38,0)")).alias("total_c")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 500 > F.col("total_c"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_c").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipmode/priority matrix), adapted: no shipmode or
    commit/receipt dates, so 'late' is l_shipdate > o_orderdate + 90 days
    and the grouping surrogate is l_linestatus.  Shape preserved: the
    join-then-conditional-count matrix (high-priority vs low-priority
    line counts per group in ONE aggregate pass)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 (customer distribution): orders per customer via LEFT
    join (customers with zero orders count in the c_count=0 bucket), then
    the distribution of those counts.  The canonical comment NOT-LIKE
    filter becomes o_orderpriority != '4-NOT SPECIFIED' (the fixture has
    no comment column) — same filtered-outer-join shape."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        cust.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
                "o_custkey", "o_orderkey"
            ),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): PROMO parts' share of one month's
    discounted revenue, numerator and denominator in a single aggregate
    pass (conditional sum), part dim broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    pt = bcast_small(part.select("p_partkey", "p_type"))
    vol = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_partkey", (price_c * (100 - disc_c)).alias("vol_u4"))
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("vol_u4")).otherwise(F.lit(0)).cast("decimal(38,0)")
    )
    total = F.sum(F.col("vol_u4").cast("decimal(38,0)"))
    return vol.agg(
        F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6).alias(
            "promo_revenue_pct"
        )
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, then the
    supplier(s) whose revenue EQUALS the maximum — the view + scalar-max
    self-reference, expressed as one aggregate reused for both sides
    (persist-free: Catalyst dedups the shared subplan under AQE; the max
    is a 1-row broadcast, never a per-row correlated subquery)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_suppkey", (price_c * (100 - disc_c)).alias("vol_u4"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("vol_u4").cast("decimal(38,0)")).alias("rev_u4"))
    )
    mx = revenue.agg(F.max("rev_u4").alias("max_u4"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_u4") == F.col("max_u4"))
        .join(supp.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_u4").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q16_supplier_count_by_part(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship), adapted: the
    part-supplier relation comes from lineitem (who actually shipped the
    part) instead of partsupp, and the excluded-supplier set is
    s_acctbal < 0 instead of the comment filter.  Shape preserved: the
    NOT-IN anti-join against a computed supplier set, then
    count(DISTINCT supplier) per (brand, type, size) descending."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    bad = bcast_small(
        supp.filter(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("bad_sk"))
    )
    pdim = bcast_small(
        part.filter(
            (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(pdim, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("bad_sk"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold (group-HAVING over lineitem as a SEMI-join key
    set), joined back to customer + orders + lineitem for the report.
    The threshold 250 sits at the fixture's ~98.5th percentile — the same
    selectivity role 300 plays at SF1."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("order_qty"))
        .filter(F.col("order_qty") > 250)
        .select(F.col("l_orderkey").alias("big_ok"), "order_qty")
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("big_ok"))
        .join(cust.select("c_custkey", "c_name"), orders.o_custkey == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("order_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive predicate revenue), adapted: no
    container column, so the three OR-branches pair brand with a size
    range instead of container classes.  Shape preserved: the
    OR-of-conjunctions join predicate across lineitem x part that forces
    the optimizer to keep ONE join with a residual disjunction (not three
    unioned scans) — plus the quantity band per branch."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    pd = bcast_small(part.select("p_partkey", "p_brand", "p_size"))
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.select("l_partkey", "l_quantity", (price_c * (100 - disc_c)).alias("vol_u4"))
        .join(pd, F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            (F.sum(F.col("vol_u4").cast("decimal(38,0)")).cast("double") / 10000.0).alias("revenue")
        )
    )


def q20_promo_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (suppliers of surplus promo parts), adapted: no
    partsupp availqty, so the inner threshold is 'shipped more than 400
    units of PROMO parts during 1996'.  Shape preserved: the nested
    semi-join chain — supplier IN (suppliers passing a per-(supplier)
    aggregate over a part-filtered lineitem scan) — with the nation
    filter on the outer query block."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    promo = bcast_small(part.filter(F.col("p_type") == "PROMO").select("p_partkey"))
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
        .filter(F.col("promo_qty") > 400)
        .select(F.col("l_suppkey").alias("hv_sk"))
    )
    nat = bcast_small(
        nation.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")).select(
            "n_nationkey"
        )
    )
    return (
        supp.join(heavy, supp.s_suppkey == F.col("hv_sk"), "left_semi")
        .join(nat, supp.s_nationkey == F.col("n_nationkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted: no
    commit/receipt dates, so 'late' is l_shipdate > o_orderdate + 90
    days.  Shape preserved — the part that makes Q21 hard: per failing
    line, EXISTS another supplier's line in the same order AND NOT EXISTS
    another supplier's LATE line (this supplier is the sole blocker),
    over multi-supplier 'F' orders; both quantifiers as aggregated
    semi-join sides, never per-row subqueries."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    lo = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late"),
        )
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    # this supplier late + others exist + no OTHER supplier late
    return (
        lo.filter(F.col("late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("ok"))
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1),
        )
        .join(supp.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity), adapted: no phone
    column, so the grouping key is the customer's nation instead of the
    phone country code, and — because every fixture customer has at least
    one order — 'never ordered' becomes DORMANT: no order since
    1999-01-01.  Shape preserved: scalar subquery (average positive
    balance) feeding a filter, anti-join against (date-filtered) orders,
    then group/aggregate."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    # the scalar average in exact integer cents: bal*cnt > sum compares in
    # integers, so Spark's and DuckDB's float summation orders cannot
    # disagree on a boundary customer
    bal_c = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_c.cast("decimal(38,0)")).alias("sum_c"),
        F.count(F.lit(1)).alias("cnt"),
    )
    ndim = bcast_small(
        nation.select(F.col("n_nationkey").alias("nk"), F.col("n_name").alias("cntrycode"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(bal_c.cast("decimal(38,0)") * F.col("cnt") > F.col("sum_c"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            )
            .select("o_custkey")
            .distinct(),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(ndim, cust.c_nationkey == F.col("nk"))
        .select("cntrycode", bal_c.alias("bal_c"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(F.col("bal_c").cast("decimal(38,0)")).cast("double") / 100.0).alias(
                "totacctbal"
            ),
        )
        .orderBy("cntrycode")
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup parity (dedup.semantic_dedup): coarse-cluster the
    embeddings on the IVF hash-sampled centroids, drop within-cluster
    semantic near-duplicates, return survivors.  Threshold reuses the
    fixture-calibrated NEAR_DUP_COS."""
    return dedup.semantic_dedup(
        _t(spark, sf_dir, "embeddings"),
        threshold=NEAR_DUP_COS,
        # target_centroids omitted: the operator derives isqrt(n) itself,
        # mirrored by the oracle's floor(sqrt(count(*))) quantizer CTE
        salt=IVF_SALT,
    )


def q_stream_funnel(spark, sf_dir):
    """Streaming windowFunnel drain (streaming/stateful.running_funnel):
    the events table arrives as four ts-ordered blocks; each key's LAST
    emitted depth is the answer.  Oracle: the batch funnel's per-user
    window-function SQL rolled up to (funnel_level, n_users) — equal iff
    the stream's constant-state fold reproduces the batch fold."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        running_funnel,
    )

    work = _workdir("stream_funnel_")
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 4
    # ts-ordered blocks, same quartile boundaries as the old per-block
    # filters; one write job (see _write_feed_blocks)
    blk = (
        F.when(F.col("ts") <= F.lit(lo + span * 1), 0)
        .when(F.col("ts") <= F.lit(lo + span * 2), 1)
        .when(F.col("ts") <= F.lit(lo + span * 3), 2)
        .otherwise(3)
    )
    feed = _write_feed_blocks(ev, work, blk)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    steps = [F.col("event_type") == s for s in FUNNEL_STEPS]
    q = (
        running_funnel(src, "user_id", "ts", steps, FUNNEL_WINDOW_S)
        .writeStream.foreachBatch(
            lambda b, i: b.withColumn("batch_id", F.lit(i))
            .write.mode("append")
            .parquet(f"{work}/out")
        )
        .option("checkpointLocation", f"{work}/ck")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    w = Window.partitionBy("k").orderBy(F.col("batch_id").desc())
    final = (
        spark.read.parquet(f"{work}/out")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1 AND funnel_level >= 1")
    )
    # the batch gate's cumulative report, from the SAME code object — the
    # stream and the batch cannot diverge in shape (code-review mid-r6)
    return funnel.cumulative_report(final, len(FUNNEL_STEPS))


def q_stream_sample(spark, sf_dir):
    """Streaming uniform k-sample (stateful.reservoir_sample_stream): the
    events feed folds block by block into a bottom-k-by-hash generational
    store; the drained sample must equal the batch statement of the same
    sketch — the k smallest h48('sample:' || event_id) ranks over the
    WHOLE feed (a fixed hash order is a uniform random order, so this IS
    a uniform k-sample, stated directly by the oracle)."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        reservoir_sample_stream,
        reservoir_stream_writer,
    )

    work = _workdir("stream_sample_")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    hi = ev.agg(F.max("event_id")).first()[0]
    # id-ordered blocks, same quartile boundaries as the old per-block
    # filters; one write job (see _write_feed_blocks)
    blk = (
        F.when(F.col("event_id") <= (hi * 1) // 4, 0)
        .when(F.col("event_id") <= (hi * 2) // 4, 1)
        .when(F.col("event_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    feed = _write_feed_blocks(ev, work, blk)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = reservoir_sample_stream(
        spark,
        src,
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        id_col="event_id",
        k=SAMPLE_K,
        payload_cols=["user_id", "event_type"],
        compact_every=2,
    )
    q.processAllAvailable()
    q.stop()
    return (
        reservoir_stream_writer(
            spark, f"{work}/store", "event_id", SAMPLE_K
        )
        .sample()
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


def q_stream_topk(spark, sf_dir):
    """Streaming topK drain (streaming/stateful.heavy_hitters_stream): the
    events feed folds into the generational Misra-Gries store block by
    block; the stored summary's top-10 must equal the exact count top-10
    (capacity >> distinct users: the sketch's exact regime)."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        heavy_hitters_stream,
        topk_stream_writer,
    )

    work = _workdir("stream_topk_")
    ev = _t(spark, sf_dir, "events").select("user_id")
    ev.repartition(4).write.parquet(f"{work}/feed")
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = heavy_hitters_stream(
        spark,
        src,
        f"{work}/store",
        f"{work}/ck",
        "user_id",
        capacity=TOPK_CAPACITY,
        compact_every=2,
    )
    q.processAllAvailable()
    q.stop()
    writer = topk_stream_writer(
        spark, f"{work}/store", "user_id", capacity=TOPK_CAPACITY, writer_id=f"{work}/ck"
    )
    return writer.topk(TOPK_K)


def q_stream_top_spenders(spark, sf_dir):
    """Streaming topKWeighted drain (heavy_hitters_stream with
    weight_col): the events feed — with exact value_cents weights
    precomputed — folds into the SAME generational Misra-Gries store
    block by block; capacity >> distinct users, so the drained summary's
    top-10 must equal the exact weighted top-10 (oracle =
    top_users_weighted's SQL verbatim — weighted summaries merge by the
    identical mergeable-summaries argument)."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        heavy_hitters_stream,
        topk_stream_writer,
    )

    work = _workdir("stream_topkw_")
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("value_cents")
    )
    ev.repartition(4).write.parquet(f"{work}/feed")
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = heavy_hitters_stream(
        spark,
        src,
        f"{work}/store",
        f"{work}/ck",
        "user_id",
        capacity=TOPK_CAPACITY,
        compact_every=2,
        weight_col="value_cents",
    )
    q.processAllAvailable()
    q.stop()
    writer = topk_stream_writer(
        spark,
        f"{work}/store",
        "user_id",
        capacity=TOPK_CAPACITY,
        writer_id=f"{work}/ck",
    )
    return writer.topk(TOPK_K)


def q_snapshot_changelog(spark, sf_dir):
    """CDC snapshot diff (storage.snapshot_diff): per-user state snapshots
    before the cutoff vs over the whole table; the diff is the
    VersionedCollapsing-style change log — one -1 (superseded state) and
    one +1 (new state) per user whose state changed, nothing for
    untouched users.  Oracle: EXCEPT ALL both directions."""
    from apache_kafka_clickhouse_demo_spark.sources.storage import snapshot_diff

    ev = _t(spark, sf_dir, "events")
    cents = F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents")

    def state(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), cents
        )

    old = state(ev.filter(F.col("ts") < F.lit(EVENTS_CUTOFF).cast("timestamp")))
    new = state(ev)
    return snapshot_diff(old, new).orderBy("user_id", "sign")


def q_projection_routing(spark, sf_dir):
    """PROJECTION parity (sources/projections.py): events materialized
    under two sort orders (primary = ts, by_user = user_id); the router
    serves a per-user aggregate from the by_user copy — identical rows to
    the plain-table oracle, but each scanned file owns a narrow user
    slice, so the predicate prunes at file granularity."""
    from apache_kafka_clickhouse_demo_spark.sources.projections import (
        ProjectedTable,
    )

    t = ProjectedTable(
        _workdir("projected_") + "/t",
        {"primary": ["ts", "event_id"], "by_user": ["user_id", "ts"]},
    )
    t.write(_t(spark, sf_dir, "events"))
    routed = t.read_for(spark, ["user_id"]).filter(F.col("user_id") < 30)
    return (
        routed.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("user_id")
    )


def q_passage_dedup(spark, sf_dir):
    """Passage-level dedup (CCNet/C4 line-dedup rule) over the documents
    table: 8-word passages, first global occurrence survives, documents
    rebuilt from their surviving passages (text_analysis.chunk_dedup)."""
    return text_analysis.chunk_dedup(
        _t(spark, sf_dir, "documents"), PASSAGE_WORDS
    ).orderBy("doc_id")


def q_sequence_count(spark, sf_dir):
    """sequenceCount('(?1).*(?2).*(?3)') parity: per user, how many
    non-overlapping view -> click -> purchase chains occur in time order,
    gaps allowed (operators/funnel.py sequence_count; sequenceMatch of the
    same pattern is n_matches >= 1)."""
    steps = [F.col("event_type") == s for s in FUNNEL_STEPS]
    return (
        funnel.sequence_count(_t(spark, sf_dir, "events"), "user_id", "ts", steps)
        .select(F.col("k").alias("user_id"), "n_matches")
        .orderBy("user_id")
    )


#: adjacent-pair gap bounds for the sequenceMatch time-condition row
SEQ_GAPS_S = (3600, 7200)


def q_sequence_match_time(spark, sf_dir):
    """sequenceMatch('(?1)(?t<=3600)(?2)(?t<=7200)(?3)') parity (r13,
    operators/funnel.py sequence_match_gaps): per user, the longest
    prefix of view -> click -> purchase completed by a chain whose
    ADJACENT steps each land within their own gap — the time-CONDITION
    pattern form windowFunnel's single first-event-anchored window
    cannot express.  seq_level = 3 is the full-pattern sequenceMatch."""
    steps = [F.col("event_type") == s for s in FUNNEL_STEPS]
    return (
        funnel.sequence_match_gaps(
            _t(spark, sf_dir, "events"), "user_id", "ts", steps, SEQ_GAPS_S
        )
        .select(F.col("k").alias("user_id"), "seq_level")
        .orderBy("user_id")
    )


def q_unigram_rarity(spark, sf_dir):
    """Unigram-LM surprisal quality filter (CCNet/Gopher perplexity-filter
    family) over the documents table: per-document reciprocal-frequency
    mass under the corpus's own unigram model
    (text_analysis.unigram_rarity)."""
    return text_analysis.unigram_rarity(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def q_substring_dedup(spark, sf_dir):
    """Repeated-substring removal (ExactSubstr, Lee et al. 2022) over the
    documents table: every overlapping SUBSTR_WINDOW-token window that
    re-occurs in the corpus is removed from all but its globally first
    occurrence; documents are rebuilt from the uncovered tokens
    (text_analysis.substring_dedup).  Complements passage_dedup's
    non-overlapping whole-passage rule with arbitrary-alignment span
    removal."""
    return text_analysis.substring_dedup(
        _t(spark, sf_dir, "documents"), SUBSTR_WINDOW
    ).orderBy("doc_id")


def q_quality_classifier(spark, sf_dir):
    """Model-based quality scoring over the documents table: DCLM/
    RefinedWeb-style fastText-analog linear classifier — hashed unigram +
    bigram features, integer milli-unit weights, keep when the mean
    weight per feature clears the threshold
    (text_analysis.quality_classifier; fully row-local, zero exchanges)."""
    return text_analysis.quality_classifier(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def _synth_url() -> "Column":
    """Deterministic per-doc URL for the URL-dedup operators (the fixture
    has no url column, same pattern as entry_pipeline's synthesized Kafka
    messages).  The residue classes are chosen so every canonicalization
    rule does real work AND creates duplicate groups: scheme case (%2),
    strippable www. vs meaningful blog. (%3), 23 domains x 4 TLDs (two of
    them multi-label public suffixes), default port (%5), trailing slash
    (%6), tracking-only vs real vs mixed vs order-scrambled query (%5),
    fragment (%9).  Mirrored literally by _SQL_SYNTH_URL."""
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP"))
    sub = (
        F.when(d % 3 == 1, F.lit("www."))
        .when(d % 3 == 2, F.lit("blog."))
        .otherwise(F.lit(""))
    )
    tld = (
        F.when(d % 4 == 0, F.lit("com"))
        .when(d % 4 == 1, F.lit("co.uk"))
        .when(d % 4 == 2, F.lit("org"))
        .otherwise(F.lit("io"))
    )
    host = F.concat(sub, F.lit("site"), (d % 23).cast("string"), F.lit("."), tld)
    port = F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/p/"),
        (d % 7).cast("string"),
        F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    q = (
        F.when(d % 5 == 0, F.lit("?utm_source=feed"))
        .when(d % 5 == 1, F.concat(F.lit("?id="), (d % 11).cast("string")))
        .when(
            d % 5 == 2,
            F.concat(F.lit("?id="), (d % 11).cast("string"), F.lit("&utm_campaign=x")),
        )
        .when(d % 5 == 3, F.lit("?b=2&a=1"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 9 == 0, F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, q, frag)


_SQL_SYNTH_URL = """
(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END || '://'
 || CASE WHEN doc_id % 3 = 1 THEN 'www.'
         WHEN doc_id % 3 = 2 THEN 'blog.' ELSE '' END
 || 'site' || CAST(doc_id % 23 AS VARCHAR) || '.'
 || CASE WHEN doc_id % 4 = 0 THEN 'com'
         WHEN doc_id % 4 = 1 THEN 'co.uk'
         WHEN doc_id % 4 = 2 THEN 'org' ELSE 'io' END
 || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
 || '/p/' || CAST(doc_id % 7 AS VARCHAR)
 || CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END
 || CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed'
         WHEN doc_id % 5 = 1 THEN '?id=' || CAST(doc_id % 11 AS VARCHAR)
         WHEN doc_id % 5 = 2 THEN '?id=' || CAST(doc_id % 11 AS VARCHAR) || '&utm_campaign=x'
         WHEN doc_id % 5 = 3 THEN '?b=2&a=1' ELSE '' END
 || CASE WHEN doc_id % 9 = 0 THEN '#sec' ELSE '' END)
"""


DOMAIN_CAP_K = 3
BOILER_MIN_FRAC = 0.5
BOILER_MIN_DOCS = 2


def _synth_multiline_text() -> "Column":
    """Deterministic multi-line text for the boilerplate operator: a
    universal footer line (100% of every domain -> always boilerplate), a
    cookie banner on every third doc (~33% < the 50% threshold -> kept
    unless a small domain's residues cross it — either way both engines
    compute the same answer), then the doc's own text as its content
    line.  NULL text propagates through concat -> NULL doc (the
    degenerate path).  Mirrored literally by _SQL_SYNTH_MLTEXT."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("copyright notice\n"),
        F.when(d % 3 == 0, F.lit("cookie banner\n")).otherwise(F.lit("")),
        F.col("text"),
    )


_SQL_SYNTH_MLTEXT = """
('copyright notice' || chr(10)
 || CASE WHEN doc_id % 3 = 0 THEN 'cookie banner' || chr(10) ELSE '' END
 || text)
"""


def q_domain_cap(spark, sf_dir):
    """Per-domain quota (dedup.domain_cap): keep the DOMAIN_CAP_K
    lowest-id docs per registered domain — CCNet-style capping of
    over-represented hosts.  Exact two-level top-k: per-(domain, id-hash
    shard) rank first, so a mega-domain never lands in one sorted task;
    phase 2's partitions are bounded by construction."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", _synth_url().alias("url"))
    return dedup.domain_cap(docs, cap=DOMAIN_CAP_K).orderBy("doc_id")


#: Per-domain token budget — sized so the sf fixtures keep roughly half
#: of each domain's ~5-6 docs (mean ~54 ws tokens/doc)
DOMAIN_TOKEN_BUDGET = 150


def q_domain_token_cap(spark, sf_dir):
    """Per-domain TOKEN budget (dedup.domain_token_cap, r15): keep each
    registered domain's lowest-id docs while the running
    greatest(ws_tokens, 1) total stays within DOMAIN_TOKEN_BUDGET — the
    token-level domain_cap, because LLM mixtures budget tokens per
    source, not doc counts.  Exact skew-safe two levels: the >=1 charge
    floor bounds phase 2's cumsum partitions at `budget` rows by
    construction (see the operator docstring's proof)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url"), "text"
    )
    return dedup.domain_token_cap(docs, budget=DOMAIN_TOKEN_BUDGET).orderBy(
        "doc_id"
    )


def q_boilerplate_lines(spark, sf_dir):
    """Domain-level boilerplate-line removal (dedup.boilerplate_lines) —
    the RefinedWeb/CCNet line-wise correction: lines present in >=50% of
    a registered domain's docs (min 2) are stripped from every doc.
    Line-grain equi-keyed shuffles only; corpus-derived join sides
    pin_wide-pinned."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url"), _synth_multiline_text().alias("text")
    )
    return dedup.boilerplate_lines(
        docs, min_frac=BOILER_MIN_FRAC, min_docs=BOILER_MIN_DOCS
    ).orderBy("doc_id")


WEBCUR_CAP = 4


def q_web_curation(spark, sf_dir):
    """End-to-end WEB-corpus curation composition — the URL-family twin
    of corpus_curation's content pipeline, in the order a real crawl
    pipeline runs its stages (cheapest first):

      1. url_dedup         — drop re-crawls by canonical URL
      2. domain_cap        — cap over-represented hosts (lowest ids win)
      3. boilerplate_lines — strip domain-frequent nav/footer lines
      4. keep docs with >= 1 surviving content line
      5. exact dedup on the CLEANED text (boilerplate removal exposes
         content dupes the raw bytes hid) — md5 key, min id survives

    Plan shape at 100 TB: stages 1-2 carry only (doc_id, url) columns;
    the full text is joined in once (semi-joins pinned via pin_wide);
    stage 3 is line-grain equi-keyed shuffles; stage 5 is one
    constant-width-key (md5) aggregate.  Nothing all-pairs, nothing
    driver-side."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url"), _synth_multiline_text().alias("text")
    )
    wide = is_wide_source(docs)
    s1 = dedup.url_dedup(docs).select("doc_id")
    d1 = docs.join(pin_wide(s1, wide), "doc_id", "left_semi")
    s2 = dedup.domain_cap(d1, cap=WEBCUR_CAP).select("doc_id", "reg_domain")
    d2 = d1.join(pin_wide(s2.select("doc_id"), wide), "doc_id", "left_semi")
    bp = dedup.boilerplate_lines(
        d2, min_frac=BOILER_MIN_FRAC, min_docs=BOILER_MIN_DOCS
    )
    enriched = bp.join(pin_wide(s2, wide), "doc_id")
    filt = enriched.filter(
        ((F.col("n_lines") - F.col("n_removed")) >= 1)
        & F.col("clean_text").isNotNull()
    )
    final = (
        filt.groupBy(F.md5("clean_text").alias("_k"))
        .agg(
            F.min(
                F.struct("doc_id", "reg_domain", "clean_text", "n_removed")
            ).alias("m")
        )
        .select(
            F.col("m.doc_id").alias("doc_id"),
            F.col("m.reg_domain").alias("reg_domain"),
            F.length("m.clean_text").alias("n_clean_chars"),
            F.col("m.n_removed").alias("n_removed"),
        )
        .orderBy("doc_id")
    )
    return final


#: BM25 demo query set — terms drawn from the synthetic fixture vocabulary
#: so every query matches a meaningful candidate set at gate scale
BM25_K = 10
BM25_QUERIES = [
    (1, "fast hash join"),
    (2, "window agg stream"),
    (3, "slow table scan"),
    (4, "customer query sort"),
    (5, "vector merge batch"),
]


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 keyword retrieval (text_analysis.bm25_topk): top-10
    documents per query for five fixed keyword queries — integer-exact
    restatement (rational idf surrogate + cleared-denominator tf
    saturation; deviation documented in the operator docstring).  The
    explode is filtered to query terms BEFORE the (doc, term) aggregate
    and the per-query top-k is the two-phase partial/merge reduction, so
    nothing funnels through a per-query window task at 100 TB."""
    return text_analysis.bm25_topk(
        _t(spark, sf_dir, "documents"), BM25_QUERIES, k=BM25_K
    ).orderBy("query_id", "rank")


def q_cluster_representatives(spark, sf_dir):
    """Quality-ranked duplicate-cluster representative selection
    (dedup.cluster_representatives): MinHash-LSH pairs -> connected
    components -> keep the member with the highest classifier score per
    cluster (RefinedWeb/FineWeb keep-the-best-copy policy).  The score is
    the shifted mean milli-weight (weight_sum + 1000*n_features)*1000 div
    n_features — non-negative by construction (every feature weight >=
    -1000), so Spark's truncating `div` and DuckDB's `//` agree, and
    ranking by it equals ranking by the mean.  One id-keyed join + one
    per-cluster sortable-struct min — never a per-cluster window."""
    docs = _t(spark, sf_dir, "documents")
    wide = is_wide_source(docs)
    pairs = dedup.minhash_lsh_pairs(
        docs,
        num_perm=MINHASH_PERM,
        bands=MINHASH_BANDS,
        shingle_n=MINHASH_SHINGLE_N,
        threshold=MINHASH_THRESHOLD,
    )
    labeled = dedup.connected_components(docs, pairs)
    qc = text_analysis.quality_classifier(docs).select(
        "doc_id",
        F.expr(
            "CAST(weight_sum + 1000*n_features AS DECIMAL(38,0)) * 1000"
            " div n_features"
        ).alias("score_milli"),
    )
    return dedup.cluster_representatives(labeled, qc, wide).orderBy("cluster_id")


#: phrase-search demo set: bigrams frequent in the fixture vocabulary plus
#: one trigram and one miss, so sparsity and multi-length paths both run
PHRASES = [
    (1, "table hash"),
    (2, "customer join"),
    (3, "slow key"),
    (4, "merge group big"),
    (5, "no such phrase"),
]


def q_phrase_search(spark, sf_dir):
    """Exact positional phrase search (text_analysis.phrase_matches):
    occurrence counts of five fixed token sequences per document — the
    quoted-query primitive alongside bm25_search's bag-of-words ranking.
    One row-local projection + explode, zero exchanges."""
    return text_analysis.phrase_matches(
        _t(spark, sf_dir, "documents"), PHRASES
    ).orderBy("phrase_id", "doc_id")


def q_bm25_indexed(spark, sf_dir):
    """Index-backed BM25 (operators/search_index.py): build the persisted
    shard-partitioned inverted index once, then answer the SAME five
    queries as bm25_search through shard-pruned posting reads — O(|query
    vocabulary|) files instead of a corpus scan.  Scoring is
    bm25_score_topk, provably shared with the scan path, so the oracle
    is bm25_search's SQL verbatim; the pruned-read file count is pinned
    in tests/test_search_index.py."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    docs = _t(spark, sf_dir, "documents")
    work = _workdir("bm25_index_")
    table = SI.build_term_index(docs, f"{work}/idx", n_shards=64)
    return SI.bm25_lookup(spark, table, BM25_QUERIES, k=BM25_K).orderBy(
        "query_id", "rank"
    )


def q_bigram_rarity(spark, sf_dir):
    """Interpolated bigram-LM surprisal scoring (text_analysis.
    bigram_rarity) — the next LM order up from unigram_rarity, toward
    CCNet's KenLM filter; integer-division reciprocal of the half-and-
    half interpolated probability, exact in both engines.  Vocabulary
    joins pinned; counts attached vocab-side (two unigram joins onto the
    bigram VOCAB, then one occurrence join)."""
    return text_analysis.bigram_rarity(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


DIVERSE_N_PER_CELL = 3


def q_diverse_sample(spark, sf_dir):
    """Cluster-balanced diverse sampling (sampling.diverse_sample): IVF
    cells via the SHARED quantizer (same salt as ann_ivf_topk /
    semantic_dedup, so the oracle reuses the proven quantizer CTE
    verbatim), then an exact per-cell quota through the skew-safe
    two-phase stratified reduction."""
    from apache_kafka_clickhouse_demo_spark.operators import sampling

    return sampling.diverse_sample(
        _t(spark, sf_dir, "embeddings"),
        n_per_cell=DIVERSE_N_PER_CELL,
        ivf_salt=IVF_SALT,
    ).orderBy("cent_id", "strat_rank")


def _synth_pii_text() -> "Column":
    """Deterministic PII-bearing text (the fixture has no contact data;
    same pattern as _synth_url).  Residues vary which types appear per
    doc so counts take several values; mirrored by _SQL_SYNTH_PII."""
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    email = F.when(
        d % 3 != 0,
        F.concat(
            F.lit(" reach user"), d.cast("string"),
            F.lit("@mail"), (d % 5).cast("string"), F.lit(".com"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 4 != 0,
        F.concat(
            F.lit(" from 10."), (d % 200).cast("string"),
            F.lit(".0."), (d % 250).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 5 != 0,
        F.concat(
            F.lit(" tel +1-555-01"), F.lpad((d % 100).cast("string"), 2, "0")
        ),
    ).otherwise(F.lit(""))
    return F.concat(base, email, ip, phone)


TEMP_MIX_TARGET = 150


def _synth_source() -> "Column":
    """Deterministic skewed source labels over doc_id residues
    (50/25/12.5/6.25/6.25) — the head-heavy mixture temperature
    sampling exists to flatten.  Mirrored by _SQL_SYNTH_SOURCE."""
    d = F.col("doc_id") % 16
    return (
        F.when(d < 8, F.lit("web"))
        .when(d < 12, F.lit("books"))
        .when(d < 14, F.lit("code"))
        .when(d < 15, F.lit("wiki"))
        .otherwise(F.lit("ref"))
    )


_SQL_SYNTH_SOURCE = """
CASE WHEN doc_id % 16 < 8 THEN 'web'
     WHEN doc_id % 16 < 12 THEN 'books'
     WHEN doc_id % 16 < 14 THEN 'code'
     WHEN doc_id % 16 < 15 THEN 'wiki'
     ELSE 'ref' END
"""


CMS_WIDTH = 256
CMS_DEPTH = 4


def q_cms_user_counts(spark, sf_dir):
    """Count-min sketch point-frequency estimates (sketches.
    count_min_build/lookup, Cormode & Muthukrishnan 2005): per-user
    event-count estimates from a depth x width counter grid next to the
    exact counts — est >= exact always (one-sided), est - exact is the
    collision overcount the width bounds.  Deterministic h48-seeded
    hash rows, so the oracle mirrors the sketch cell-for-cell."""
    ev = _t(spark, sf_dir, "events")
    sketch = sketches.count_min_build(
        ev, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    keys = ev.select("user_id").filter(F.col("user_id").isNotNull()).distinct()
    est = sketches.count_min_lookup(
        sketch, keys, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).cast("long").alias("overcount"),
        )
        .orderBy("user_id")
    )


def q_score_calibration(spark, sf_dir):
    """Per-source score calibration (sampling.calibrate_scores — r12,
    the FineWeb/CCNet per-dump trick): each document's quality score is
    replaced by its within-source integer permille rank, so a selection
    threshold compares like with like across sources whose score
    distributions drift.  Score = text length (deterministic,
    NULL-coalesced to -1 so engines' NULL orderings never enter);
    sources are the skewed synthetic doc_id-residue split.  Pure
    integer rank/count arithmetic — the oracle mirrors it verbatim."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        _synth_source().alias("source"),
        F.coalesce(F.length("text"), F.lit(-1)).cast("long").alias("score"),
    )
    out = sampling.calibrate_scores(docs, "source", "score", "doc_id")
    return out.select("doc_id", "source", "score", "calib").orderBy("doc_id")


def q_stream_uniq_users(spark, sf_dir):
    """Streaming per-group HLL count-distinct (stateful.uniq_stream —
    r12, the sketch family's third streaming twin beside Misra-Gries
    and count-min): the events feed drains as four blocks of per-group
    `uniqState` rows into a group-sharded state store; HLL union is
    register-exact under any block split (the r4 property test), so
    the drained store's merged estimates equal the batch
    uniq_users_approx verbatim — oracle unchanged (exact
    COUNT(DISTINCT): the sketch is coupon-exact at gate scale)."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _UniqStreamWriter,
        uniq_stream,
    )

    work = _workdir("stream_uniq_")
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    blk = F.pmod(F.coalesce(F.col("user_id"), F.lit(0)), F.lit(4)).cast("int")
    _write_feed_blocks(ev, work, blk)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = uniq_stream(
        spark,
        src,
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        group_col="event_type",
        key_col="user_id",
    )
    q.processAllAvailable()
    q.stop()
    writer = _UniqStreamWriter(
        spark,
        f"{work}/store",
        group_col="event_type",
        key_col="user_id",
        writer_id=f"{work}/ck",
    )
    return (
        writer.merged_estimates()
        .select("event_type", F.col("approx_uniq").alias("approx_uniq_users"))
        .orderBy("event_type")
    )


def q_stream_cms_counts(spark, sf_dir):
    """Streaming count-min sketch (stateful.count_min_stream — r12,
    VERDICT r11 #6): the events feed drains as four blocks into a
    cell-sharded counter store — increments and running estimates in
    ONE atomic commit per block (r13);
    CMS counters are LINEAR, so the drained store's merge-on-read
    sketch equals the batch count_min_build over the whole feed
    cell-for-cell, and the final per-user estimates are
    cms_user_counts' verbatim — the oracle is the batch CMS SQL
    unchanged."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _CountMinStreamWriter,
        count_min_stream,
    )

    work = _workdir("stream_cms_")
    ev = _t(spark, sf_dir, "events").select("user_id")
    blk = F.pmod(F.coalesce(F.col("user_id"), F.lit(0)), F.lit(4)).cast("int")
    _write_feed_blocks(ev, work, blk)
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = count_min_stream(
        spark,
        src,
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        key_col="user_id",
        width=CMS_WIDTH,
        depth=CMS_DEPTH,
    )
    q.processAllAvailable()
    q.stop()
    writer = _CountMinStreamWriter(
        spark,
        f"{work}/store",
        key_col="user_id",
        width=CMS_WIDTH,
        depth=CMS_DEPTH,
        writer_id=f"{work}/ck",
    )
    sketch = writer.merged_sketch()
    keys = ev.select("user_id").filter(F.col("user_id").isNotNull()).distinct()
    est = sketches.count_min_lookup(
        sketch, keys, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).cast("long").alias("overcount"),
        )
        .orderBy("user_id")
    )


def q_temperature_mixture(spark, sf_dir):
    """Temperature-based mixture rebalancing (sampling.temperature_mixture,
    alpha = 1/2 — the XLM-R/mT5 multilingual balancing recipe): rates
    COMPUTED from per-source counts (sqrt-flattened, exact integer
    division chain in DECIMAL(38,0)), then the deterministic h48
    threshold keep.  Sources are a skewed synthetic split of doc_id
    residues (the fixture has no source column)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_source().alias("source")
    )
    out = sampling.temperature_mixture(
        docs, "source", TEMP_MIX_TARGET, "doc_id"
    )
    return out.select("source", "doc_id", "rate_micro").orderBy("doc_id")


def _synth_gopher_text() -> "Column":
    """Deterministic Gopher-rule garnish over the fixture text (which has
    almost no stopwords, bullets, or symbol runs): residue classes vary
    which rules each doc can pass, so `keep` and every per-rule metric
    take several values.  Mirrored by _SQL_SYNTH_GOPHER."""
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    stops = F.when(d % 3 == 0, F.lit(" the of and that have")).otherwise(F.lit(""))
    bullets = F.when(
        d % 4 == 0, F.lit("\n- first point\n- second point\nclosing line...")
    ).otherwise(F.lit(""))
    symbols = F.when(d % 7 == 0, F.lit(" ### tag ... more ...")).otherwise(F.lit(""))
    return F.concat(base, stops, bullets, symbols)


_SQL_SYNTH_GOPHER = """
(coalesce(text, '')
 || CASE WHEN doc_id % 3 = 0 THEN ' the of and that have' ELSE '' END
 || CASE WHEN doc_id % 4 = 0
         THEN chr(10) || '- first point' || chr(10) || '- second point'
              || chr(10) || 'closing line...'
         ELSE '' END
 || CASE WHEN doc_id % 7 = 0 THEN ' ### tag ... more ...' ELSE '' END)
"""


def _synth_c4_text() -> "Column":
    """Deterministic C4-rule garnish: the fixture text is one line of
    token soup (no terminal punctuation, no braces, no 'javascript'), so
    residue classes append lines that exercise each C4 rule — three
    proper sentences (kept), a too-short line, a javascript line, a
    lorem-ipsum line, a brace line, and a badword line.  Mirrored by
    _SQL_SYNTH_C4."""
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    good = F.when(
        d % 2 == 0,
        F.lit(
            "\nFirst proper sentence line with many fine words."
            "\nSecond proper sentence line keeps the page going!"
            '\nIs the "third" proper sentence line long enough?'
        ),
    ).otherwise(F.lit(""))
    short = F.when(d % 3 == 0, F.lit("\nToo short.")).otherwise(F.lit(""))
    js = F.when(
        d % 5 == 0,
        F.lit("\nPlease enable JavaScript to view this content today."),
    ).otherwise(F.lit(""))
    lorem = F.when(
        d % 7 == 0,
        F.lit("\nlorem ipsum dolor sit amet consectetur adipiscing elit."),
    ).otherwise(F.lit(""))
    brace = F.when(d % 11 == 0, F.lit("\nfunction f() { return 42; }")).otherwise(
        F.lit("")
    )
    bad = F.when(
        d % 13 == 0,
        F.lit("\nThis line casually mentions a badword in passing."),
    ).otherwise(F.lit(""))
    return F.concat(base, good, short, js, lorem, brace, bad)


_SQL_SYNTH_C4 = """
(coalesce(text, '')
 || CASE WHEN doc_id % 2 = 0
         THEN chr(10) || 'First proper sentence line with many fine words.'
              || chr(10) || 'Second proper sentence line keeps the page going!'
              || chr(10) || 'Is the "third" proper sentence line long enough?'
         ELSE '' END
 || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Too short.' ELSE '' END
 || CASE WHEN doc_id % 5 = 0
         THEN chr(10) || 'Please enable JavaScript to view this content today.'
         ELSE '' END
 || CASE WHEN doc_id % 7 = 0
         THEN chr(10) || 'lorem ipsum dolor sit amet consectetur adipiscing elit.'
         ELSE '' END
 || CASE WHEN doc_id % 11 = 0
         THEN chr(10) || 'function f() { return 42; }' ELSE '' END
 || CASE WHEN doc_id % 13 = 0
         THEN chr(10) || 'This line casually mentions a badword in passing.'
         ELSE '' END)
"""


def q_c4_filters(spark, sf_dir):
    """C4 line/page cleaning (text_analysis.c4_filters, Raffel et al.
    2020 §2.2): per-line terminal-punctuation / min-words / javascript
    rules with the surviving lines re-joined, plus the page-level
    lorem-ipsum / brace / badword flags and the conjunction `keep` —
    over deterministically garnished fixture text (the raw fixture has
    no line structure to filter).  Row-local; one array filter HOF
    (justified in the operator docstring); zero exchanges."""
    docs = _t(spark, sf_dir, "documents").withColumn("text", _synth_c4_text())
    return text_analysis.c4_filters(docs).orderBy("doc_id")


def _retrieval_arms(spark, sf_dir):
    """The (text_arm, vec_arm) rank frames every hybrid-retrieval query
    shares: BM25 top-k for the five fixed keyword queries + brute
    cosine top-k for the query-id-aligned embeddings (doc_id == vec_id
    in the fixture).  ONE constructor (code-review r12): the hybrid and
    hard-negative oracles compose the same two arm statements, so the
    engine-side arms must be provably identical too — duplicated
    construction could silently drift (k, query set)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    text_arm = text_analysis.bm25_topk(docs, BM25_QUERIES, k=BM25_K).select(
        "query_id", "doc_id", "rank"
    )
    qids = [qid for qid, _ in BM25_QUERIES]
    vec_arm = similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id").isin(qids)), k=BM25_K
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return text_arm, vec_arm


def _synth_unicode_text() -> "Column":
    """Deterministic Unicode garnish: the fixture text is pure ASCII, so
    residue classes append decomposed accents (NFC must compose them),
    NBSP padding, C0/C1 control characters, CRLF/CR line ends, and
    space/tab runs — one class per normalize_text rule.  All escapes
    are explicit (\\uXXXX), never pasted glyphs, so the decomposed
    forms are verifiably decomposed.  Mirrored by the SQL garnish
    inside the text_normalize oracle."""
    d = F.col("doc_id")
    base = F.coalesce(F.col("text"), F.lit(""))
    # DECOMPOSED accents (e + U+0301, e + U+0308): NFC composes them
    deco = F.when(d % 2 == 0, F.lit(" cafe\u0301 naive\u0308")).otherwise(
        F.lit("")
    )
    nbsp = F.when(d % 3 == 0, F.lit("\u00a0padded\u00a0end")).otherwise(
        F.lit("")
    )
    # C0 bell + C0 unit-separator + C1 NEL (U+0085)
    ctrl = F.when(d % 5 == 0, F.lit("\x07bell\x1fctl\u0085one")).otherwise(
        F.lit("")
    )
    crlf = F.when(d % 7 == 0, F.lit("lineA\r\nlineB\rlineC")).otherwise(F.lit(""))
    runs = F.when(d % 11 == 0, F.lit("  multi\t\tspace  ")).otherwise(F.lit(""))
    return F.concat(base, deco, nbsp, ctrl, crlf, runs)


def q_text_normalize(spark, sf_dir):
    """Unicode + whitespace normalization (text_analysis.normalize_text
    — the ftfy-lite first step): NFC (one Arrow pass; Python
    unicodedata, byte-identical to DuckDB's nfc_normalize by the
    standard), then codegen CR/NBSP/control/space-run rules, over
    deterministically garnished fixture text (the raw fixture is pure
    ASCII with nothing to normalize)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", _synth_unicode_text()
    )
    return text_analysis.normalize_text(docs).orderBy("doc_id")


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid keyword+vector retrieval via reciprocal-rank fusion
    (similarity.rrf_fuse, Cormack et al. SIGIR'09 k=60): the BM25 arm
    ranks documents for the five fixed keyword queries, the vector arm
    ranks cosine neighbors of the query-id-aligned embedding, and the
    fused integer score is sum(floor(1e9/(60+rank))) over both arms.
    The fuse input is bounded at |queries| * k * 2 rows — the
    corpus-scale work stays inside the two proven arms."""
    text_arm, vec_arm = _retrieval_arms(spark, sf_dir)
    return similarity.rrf_fuse([text_arm, vec_arm], k=BM25_K).orderBy(
        "query_id", "rank"
    )


def q_hard_negatives(spark, sf_dir):
    """DPR-style hard-negative mining (similarity.hard_negatives,
    Karpukhin et al. 2020): BM25 top-k candidates for the five keyword
    queries, minus the vector arm's top-k for the query-id-aligned
    embedding — the lexical near-misses a dense retriever trains
    against.  Both arms come from the shared `_retrieval_arms`
    constructor — identical to hybrid_rrf's by construction, as the
    composed oracles require; the mining itself is an anti-join +
    window over <= |queries| * k bounded rows."""
    cand, pos = _retrieval_arms(spark, sf_dir)
    return similarity.hard_negatives(cand, pos, k=BM25_K).orderBy(
        "query_id", "rank"
    )


def q_hybrid_indexed(spark, sf_dir):
    """Index-backed hybrid retrieval: the SAME reciprocal-rank fusion as
    hybrid_rrf, but both arms answer from persisted indexes — BM25
    through shard-pruned posting reads (search_index.bm25_lookup,
    scoring provably shared with the scan path) and the vector arm
    through the IVF index's nprobe-pruned cell reads
    (search_index.ann_index_lookup, rerank shared with ivf_topk).  The
    vector arm is therefore the IVF APPROXIMATION, not brute force —
    the oracle fuses the bm25 statement with the IVF mirror, so a
    probe-set drift cannot pass.  At 100 TB this is the shape hybrid
    search actually runs: two pruned index reads + a bounded fuse,
    never a corpus scan per query."""
    from concurrent.futures import ThreadPoolExecutor

    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    work = _workdir("hybrid_index_")
    # the two builds touch DISJOINT paths and share no state — submit
    # them from two threads so their Spark jobs interleave instead of
    # serializing two cluster-wide barriers (cold sf0.01 oracle run:
    # 38.7 -> 27.3 s; a real deployment builds concurrently too)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_term = pool.submit(
            SI.build_term_index, docs, f"{work}/idx", n_shards=64
        )
        f_ann = pool.submit(
            SI.build_ann_index,
            emb,
            f"{work}/ann",
            target_centroids=IVF_TARGET_CENTROIDS,
            salt=IVF_SALT,
        )
        tterm, tann = f_term.result(), f_ann.result()
    text_arm = SI.bm25_lookup(spark, tterm, BM25_QUERIES, k=BM25_K).select(
        "query_id", "doc_id", "rank"
    )
    qids = [qid for qid, _ in BM25_QUERIES]
    vec_arm = SI.ann_index_lookup(
        spark, tann, emb.filter(F.col("vec_id").isin(qids)), k=BM25_K,
        nprobe=IVF_NPROBE,
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return similarity.rrf_fuse([text_arm, vec_arm], k=BM25_K).orderBy(
        "query_id", "rank"
    )


def q_perplexity_buckets(spark, sf_dir):
    """CCNet perplexity bucketing (text_analysis.perplexity_buckets,
    Wenzek et al. 2020): interpolated bigram-LM surprisal, calibrated
    within each fixture language to an integer permille rank, cut into
    head/middle/tail thirds — the per-language quality slices CCNet
    selects training data by."""
    return text_analysis.perplexity_buckets(
        _t(spark, sf_dir, "documents")
    ).orderBy("doc_id")


def q_gopher_rules(spark, sf_dir):
    """Gopher rule-based quality gate (text_analysis.gopher_rules, Rae et
    al. 2021 table A1): per-rule integer milli-signals + the conjunction
    `keep`, over deterministically garnished fixture text (the raw fixture
    has no stopwords/bullets/symbol runs to vary the rules on).  Pure
    codegen row-local projection, zero exchanges."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", _synth_gopher_text()
    )
    return text_analysis.gopher_rules(docs).orderBy("doc_id")


_SQL_SYNTH_PII = """
(coalesce(text, '')
 || CASE WHEN doc_id % 3 <> 0
         THEN ' reach user' || CAST(doc_id AS VARCHAR)
              || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.com'
         ELSE '' END
 || CASE WHEN doc_id % 4 <> 0
         THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.' || CAST(doc_id % 250 AS VARCHAR)
         ELSE '' END
 || CASE WHEN doc_id % 5 <> 0
         THEN ' tel +1-555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
         ELSE '' END)
"""


def q_pii_redact(spark, sf_dir):
    """Typed PII redaction with per-type counts (text_analysis.pii_redact)
    over synthesized contact-bearing text — emails, IPv4s, phone-like
    numbers replaced progressively so counts equal replacements made.
    Row-local regex chain in codegen; zero exchanges."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_pii_text().alias("text")
    )
    return text_analysis.pii_redact(docs).orderBy("doc_id")


def q_stream_index_bm25(spark, sf_dir):
    """Continuously indexed corpus (stateful.term_index_stream): the doc
    feed arrives as four id-ordered blocks, each published as one atomic
    index segment (postings + its own meta row, batch-keyed exactly-once),
    then bm25_lookup answers the SAME five queries over the accumulated
    index.  Each doc appears in exactly one block, so the streamed index
    equals the one-shot build and the oracle is bm25_search's SQL
    verbatim."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI
    from apache_kafka_clickhouse_demo_spark.sources.txlog import TransactionalTable
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        term_index_stream,
    )

    work = _workdir("stream_index_")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).first()[0]
    blk = (
        F.when(F.col("doc_id") <= (hi * 1) // 4, 0)
        .when(F.col("doc_id") <= (hi * 2) // 4, 1)
        .when(F.col("doc_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    _write_feed_blocks(docs, work, blk)
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = term_index_stream(
        spark, src, index_dir=f"{work}/idx", checkpoint=f"{work}/ck", n_shards=64
    )
    q.processAllAvailable()
    q.stop()
    table = TransactionalTable(f"{work}/idx")
    return SI.bm25_lookup(spark, table, BM25_QUERIES, k=BM25_K).orderBy(
        "query_id", "rank"
    )


def q_phrase_indexed(spark, sf_dir):
    """Index-backed positional phrase search (search_index.phrase_lookup):
    the SAME five phrases as phrase_search answered from pruned positional
    posting reads — the classic quoted-query path of a serving index.
    Oracle is phrase_search's SQL verbatim (bit-identity with the scan
    operator is additionally pytest-pinned)."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    docs = _t(spark, sf_dir, "documents")
    work = _workdir("phrase_index_")
    table = SI.build_term_index(docs, f"{work}/idx", n_shards=64)
    return SI.phrase_lookup(spark, table, PHRASES).orderBy("phrase_id", "doc_id")


ANN_GROWN_FOUNDING_PRED = "vec_id % 4 <> 3"  # founding segment: 75%


def q_ann_indexed_grown(spark, sf_dir):
    """GROWN persisted ANN index (search_index.extend_ann_index): build
    on the founding 75% of the corpus, extend with the remaining 25% as
    a second segment (fixed centroids, per-segment meta rows summed at
    read), then answer the standard query batch through pruned probe
    reads.  The oracle mirrors the FIXED-CENTROID semantics exactly:
    centroids hash-sampled from the founding segment only, every vector
    (both segments) assigned against them — extend never re-trains, the
    honest IVF trade stated in the operator docstring."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    founding = emb.filter(F.expr(ANN_GROWN_FOUNDING_PRED))
    growth = emb.filter(~F.expr(ANN_GROWN_FOUNDING_PRED))
    work = _workdir("ann_grown_")
    table = SI.build_ann_index(
        founding,
        f"{work}/ann",
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    SI.extend_ann_index(growth, table, salt=IVF_SALT)
    return SI.ann_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_ann_indexed_reclustered(spark, sf_dir):
    """Re-centroided grown ANN index (search_index.maintain_ann_index
    with recluster=True — r12, VERDICT r11 #3): build on the founding
    75%, extend with the remaining 25% against the FIXED founding
    centroids (the drift regime ann_indexed_grown pins), then found a
    NEW centroid generation from a hash-sampled draw over ALL segments
    and re-assign every vector in one CAS replace-commit.  With the
    same salt and K, the reclustered index must answer EXACTLY like a
    from-scratch build on the full corpus — the oracle is the
    ann_ivf_topk mirror verbatim, which DIFFERS from
    ann_indexed_grown's founding-segment oracle on this fixture, so a
    no-op maintenance pass cannot fake this row green."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    founding = emb.filter(F.expr(ANN_GROWN_FOUNDING_PRED))
    growth = emb.filter(~F.expr(ANN_GROWN_FOUNDING_PRED))
    work = _workdir("ann_reclust_")
    table = SI.build_ann_index(
        founding,
        f"{work}/ann",
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    SI.extend_ann_index(growth, table, salt=IVF_SALT)
    SI.maintain_ann_index(
        spark,
        table,
        recluster=True,
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    return SI.ann_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_stream_index_ann(spark, sf_dir):
    """Continuously indexed embedding corpus (streaming.stateful.
    ann_index_stream): block 0 FOUNDS the index (centroids sampled from
    it), blocks 1-3 extend it as exactly-once segments; the accumulated
    index answers the standard batch verbatim — oracle shared with
    ann_indexed_grown (same founding split, same fixed-centroid
    semantics)."""
    import os

    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI
    from apache_kafka_clickhouse_demo_spark.sources.txlog import TransactionalTable
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _AnnIndexStreamWriter,
    )

    emb = _t(spark, sf_dir, "embeddings")
    work = _workdir("stream_ann_")
    writer = _AnnIndexStreamWriter(
        spark,
        f"{work}/ann",
        writer_id=os.path.join(work, "ck"),
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    # block 0 = the founding segment; blocks 1-3 split the growth rows
    # (driver-side foreachBatch drain, the checkpointed-stream twin is
    # exercised end-to-end by tests/test_streaming_stateful.py)
    writer.process(emb.filter(F.expr(ANN_GROWN_FOUNDING_PRED)), 0)
    growth = emb.filter(~F.expr(ANN_GROWN_FOUNDING_PRED))
    for i in range(3):
        writer.process(growth.filter(F.col("vec_id") % 3 == i), i + 1)
    table = TransactionalTable(f"{work}/ann")
    return SI.ann_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_stream_index_ivfpq(spark, sf_dir):
    """Continuously indexed IVFPQ corpus (streaming.stateful.
    ivfpq_index_stream — r14): block 0 FOUNDS the index (centroids AND
    PQ codebooks sampled from it), blocks 1-3 extend it as exactly-once
    encoded segments; the accumulated index answers the grown-index
    construction verbatim — oracle shared with ann_ivfpq_grown (same
    founding split, same fixed-generation semantics)."""
    import os

    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI
    from apache_kafka_clickhouse_demo_spark.sources.txlog import TransactionalTable
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        _IvfPqIndexStreamWriter,
    )

    emb = _t(spark, sf_dir, "embeddings")
    work = _workdir("stream_ivfpq_")
    writer = _IvfPqIndexStreamWriter(
        spark,
        f"{work}/ix",
        writer_id=os.path.join(work, "ck"),
        dim=EMBED_DIM,
        m=PQ_M,
        target_codes=PQ_TARGET_CODES,
        target_centroids=IVF_TARGET_CENTROIDS,
        ivf_salt=IVF_SALT,
    )
    # block 0 = the founding segment; blocks 1-3 split the growth rows
    # (driver-side foreachBatch drain, the checkpointed-stream twin is
    # exercised end-to-end by tests/test_streaming_stateful.py)
    writer.process(emb.filter(F.expr(ANN_GROWN_FOUNDING_PRED)), 0)
    growth = emb.filter(~F.expr(ANN_GROWN_FOUNDING_PRED))
    for i in range(3):
        writer.process(growth.filter(F.col("vec_id") % 3 == i), i + 1)
    table = TransactionalTable(f"{work}/ix")
    return SI.ivfpq_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_ann_indexed(spark, sf_dir):
    """IVF ANN over the persisted index (search_index.build_ann_index +
    ann_index_lookup): centroids + normalized assignments stored once,
    queries probe nprobe cells through pruned shard reads, rerank via
    the SHARED similarity.ivf_probe_topk — bit-identical to ann_ivf_topk
    (pytest-pinned), so the oracle is the scan path's IVF mirror
    verbatim."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    work = _workdir("ann_index_")
    table = SI.build_ann_index(
        emb,
        f"{work}/ann",
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
    )
    return SI.ann_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


def q_ann_indexed_refined(spark, sf_dir):
    """IVF ANN over an index FOUNDED on the trained quantizer (r15,
    VERDICT r14 #2: search_index.build_ann_index(refine_rounds=...) —
    the shared integer-micro Lloyd rounds of kmeans_refine run before
    anything persists, so the stored generation is bit-identical to the
    gate-attested kmeans_clusters path).  Lookup is ann_index_lookup
    unchanged: the refined generation keeps donor cent_ids, so routing
    and probe pruning are generation-agnostic.  The oracle replays the
    unrolled Lloyd rounds, then the IVF probe/rerank mirror over the
    refined cells — hash-exact, not approximately-close."""
    from apache_kafka_clickhouse_demo_spark.operators import search_index as SI

    emb = _t(spark, sf_dir, "embeddings")
    work = _workdir("ann_index_ref_")
    table = SI.build_ann_index(
        emb,
        f"{work}/ann",
        target_centroids=IVF_TARGET_CENTROIDS,
        salt=IVF_SALT,
        refine_rounds=KMEANS_ROUNDS,
    )
    return SI.ann_index_lookup(
        spark,
        table,
        emb.filter(F.col("vec_id") < ANN_NUM_QUERIES),
        k=ANN_K,
        nprobe=IVF_NPROBE,
    ).orderBy("query_id", "rank")


#: CLIP-score pair-filter threshold — keeps ~11% of the synthetic pairs,
#: the LAION-style selective regime
PAIR_COS_THRESHOLD = 0.2


def q_pair_cosine_filter(spark, sf_dir):
    """CLIP-score pair filtering (multimodal.pair_cosine_filter, the
    LAION recipe): the fixture has one embedding per row, so the second
    modality is synthesized as the REVERSED vector (deterministic,
    mirrored by list_reverse in the oracle) — cosine spans [-0.49, 0.47]
    across the fixture, so the 0.2 threshold does real selection.
    Row-local, zero exchanges; cosine is the shared fixed-order
    V.dot/V.normalize every ANN operator uses."""
    pairs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.col("embedding").alias("emb_a"),
        F.reverse("embedding").alias("emb_b"),
    )
    return multimodal.pair_cosine_filter(
        pairs, "emb_a", "emb_b", threshold=PAIR_COS_THRESHOLD, id_col="vec_id"
    ).orderBy("vec_id")


#: bitext mining batch/threshold — src = first 16 vectors mined against
#: the rest; 1.35 splits the fixture's best-margin range (1.22-1.68)
BITEXT_SRC_N = 16
BITEXT_K = 4
BITEXT_THRESHOLD = 1.35


def q_margin_bitext(spark, sf_dir):
    """Margin-based bitext mining (similarity.margin_bitext, Artetxe &
    Schwenk 2019 — the CCMatrix parallel-corpus rule): best ratio-margin
    target per source over a 16-vector mining batch, k-NN means as
    fixed-order left folds so both engines see bit-identical doubles."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.margin_bitext(
        emb.filter(F.col("vec_id") < BITEXT_SRC_N),
        emb.filter(F.col("vec_id") >= BITEXT_SRC_N),
        k=BITEXT_K,
        threshold=BITEXT_THRESHOLD,
    ).orderBy("src_id")


DSIR_K = 50


def q_dsir_select(spark, sf_dir):
    """DSIR importance-weighted data selection (text_analysis.dsir_select,
    Xie et al. 2023): top-50 documents by hashed-n-gram importance weight
    under the deterministic demo lambda table (the learned-table path is
    pytest-pinned — fit runs driver-side like quality_classifier's trained
    weights).  Row-local scoring + TakeOrderedAndProject top-k: scan-bound
    at 100 TB with zero exchanges before the k-row merge."""
    return text_analysis.dsir_select(
        _t(spark, sf_dir, "documents"), k=DSIR_K
    ).orderBy(F.col("weight_millis").desc(), "doc_id")


#: demo blocklist — registered domains the synthetic URL generator
#: produces, one per TLD class so the public-suffix path is exercised
BLOCKED_DOMAINS = ["site3.com", "site7.co.uk", "site11.org", "site20.io"]


def q_url_blocklist(spark, sf_dir):
    """Registered-domain blocklist filtering (dedup.url_blocklist_filter)
    — the UT1-style pass run before any content work: a blocked
    registered domain drops ALL its subdomain URLs and nothing else
    (substring matching over raw URLs gets both directions wrong).
    Row-local: the list folds into the scan filter as a literal isin."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url")
    )
    return dedup.url_blocklist_filter(docs, BLOCKED_DOMAINS).orderBy("doc_id")


def q_url_dedup(spark, sf_dir):
    """URL-level exact dedup after canonicalization (dedup.url_dedup) —
    the CCNet/RefinedWeb dedupe-by-URL pass that precedes content dedup.
    Row-local normalize + registered-domain extraction (functions/text.py
    URL primitives, pure codegen) then ONE min-aggregate shuffle keyed by
    canonical URL; scan-bound at 100 TB like dedup_exact."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", _synth_url().alias("url"))
    return dedup.url_dedup(docs).orderBy("doc_id")


def q_stream_domain_cap(spark, sf_dir):
    """Streaming per-domain quota (stateful.domain_cap_stream): four
    id-ordered blocks; each keeps a domain's rows only while the
    accumulated per-domain counter (shard-pruned transactional store,
    merge-on-read sums) stays under the cap, emitting the global
    domain_rank.  On the id-ordered feed this equals the batch operator
    exactly, so the oracle is domain_cap's lowest-ids-per-domain SQL
    verbatim."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        domain_cap_stream,
    )

    work = _workdir("stream_domcap_")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url")
    )
    hi = docs.agg(F.max("doc_id")).first()[0]
    blk = (
        F.when(F.col("doc_id") <= (hi * 1) // 4, 0)
        .when(F.col("doc_id") <= (hi * 2) // 4, 1)
        .when(F.col("doc_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    _write_feed_blocks(docs, work, blk)
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = domain_cap_stream(
        spark,
        src,
        out_dir=f"{work}/kept",
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        cap=DOMAIN_CAP_K,
        out_files=4,
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(f"{work}/kept").orderBy("doc_id")


def q_stream_token_cap(spark, sf_dir):
    """Streaming per-domain TOKEN budget (stateful.domain_token_cap_stream,
    r15): four id-ordered blocks; each admits a domain's rows only while
    the accumulated greatest(ws_tokens, 1) charge — EVERY seen row's,
    not just survivors', the batch-cumsum parity argument in the writer
    docstring — stays within DOMAIN_TOKEN_BUDGET, emitting the global
    cum_tokens.  On the id-ordered feed this equals the batch operator
    exactly, so the oracle is domain_token_cap's running-charge SQL
    verbatim."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        domain_token_cap_stream,
    )

    work = _workdir("stream_tokcap_")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url"), "text"
    )
    hi = docs.agg(F.max("doc_id")).first()[0]
    blk = (
        F.when(F.col("doc_id") <= (hi * 1) // 4, 0)
        .when(F.col("doc_id") <= (hi * 2) // 4, 1)
        .when(F.col("doc_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    _write_feed_blocks(docs, work, blk)
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = domain_token_cap_stream(
        spark,
        src,
        out_dir=f"{work}/kept",
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        budget=DOMAIN_TOKEN_BUDGET,
        out_files=4,
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(f"{work}/kept").orderBy("doc_id")


def q_stream_url_dedup(spark, sf_dir):
    """Streaming URL-level dedup (stateful.url_dedup_stream): the doc
    feed arrives as four id-ordered blocks; each block canonicalizes its
    URLs row-locally, min-reduces per canonical key, and drops keys
    already in the accumulating shard-pruned store (first-arrival-wins).
    On the id-ordered feed this equals the batch operator exactly, so the
    oracle is url_dedup's min-id-per-canonical-URL SQL verbatim."""
    from apache_kafka_clickhouse_demo_spark.streaming.stateful import (
        url_dedup_stream,
    )

    work = _workdir("stream_urldedup_")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url")
    )
    hi = docs.agg(F.max("doc_id")).first()[0]
    blk = (
        F.when(F.col("doc_id") <= (hi * 1) // 4, 0)
        .when(F.col("doc_id") <= (hi * 2) // 4, 1)
        .when(F.col("doc_id") <= (hi * 3) // 4, 2)
        .otherwise(3)
    )
    _write_feed_blocks(docs, work, blk)
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/feed")
    )
    q = url_dedup_stream(
        spark,
        src,
        out_dir=f"{work}/kept",
        store_dir=f"{work}/store",
        checkpoint=f"{work}/ck",
        out_files=4,
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(f"{work}/kept").orderBy("doc_id")


def q_domain_doc_counts(spark, sf_dir):
    """Per-registered-domain doc/URL rollup (dedup.domain_doc_counts) —
    the statistics a per-domain quota policy consumes.  Public-suffix
    extraction is an InSet per candidate depth (row-local); two map-side
    combinable aggregate shuffles, the second over DISTINCT URLs only."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", _synth_url().alias("url"))
    return dedup.domain_doc_counts(docs).orderBy("reg_domain")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- rotated into the gate in r15 (VERDICT r14 #1: zero the
    #    new-machinery attestation backlog — the 7 rows that carry
    #    genuinely new machinery and have never had a driver row:
    #    ann_pq_topk the PQ-ADC scan, ann_ivfpq_indexed the persisted
    #    PQ serving shape (stored codes, pruned code-column reads),
    #    ann_ivfpq_grown the fixed-generation extend of centroids AND
    #    codebooks, ann_ivfpq_reclustered the CAS centroid swap with
    #    codes preserved verbatim, stream_index_ivfpq the exactly-once
    #    streaming IVFPQ writer, stream_sketch_quantiles the live
    #    quantiles-at-ingest single atomic commit, kmeans_clusters the
    #    deterministic integer-micro Lloyd refinement — plus 5 of the
    #    judge-nominated legacy extras that never saw a driver row:
    #    web_curation (end-to-end URL/domain/boilerplate curation
    #    chain), diverse_sample (cluster-balanced quota sampling),
    #    margin_bitext (CCMatrix ratio-margin mining),
    #    q18_large_volume_customers (group-HAVING semi-join depth),
    #    value_window_analytics (rank-family windows + time-RANGE
    #    frame).  Displaced rows keep their operator coverage gated
    #    elsewhere and stay oracle-checked extras + benched —
    #    absorption notes live on each displaced row in EXTRA_QUERIES
    #    below.  Front-loaded: --
    "ann_pq_topk": q_ann_pq_topk,
    "ann_ivfpq_indexed": q_ann_ivfpq_indexed,
    "ann_ivfpq_grown": q_ann_ivfpq_grown,
    "ann_ivfpq_reclustered": q_ann_ivfpq_reclustered,
    "stream_index_ivfpq": q_stream_index_ivfpq,
    "stream_sketch_quantiles": q_stream_sketch_quantiles,
    "kmeans_clusters": q_kmeans_clusters,
    "web_curation": q_web_curation,
    "diverse_sample": q_diverse_sample,
    "margin_bitext": q_margin_bitext,
    "q18_large_volume_customers": q18_large_volume_customers,
    "value_window_analytics": q_value_window_analytics,
    # -- rotated into the gate in r14 (VERDICT r13 #1: 12 of the 13
    #    locally-green rows never driver-attested, one per machinery
    #    class per the judge's nomination: sketch_quantiles attests the
    #    dyadic descent walk (+ the weighted form's mass-per-cell
    #    variant), ann_ivfpq_topk both PQ stages + the IVF composition
    #    (ann_pq_topk stays an extra — ADC is load-bearing inside the
    #    gated composition), stream_strat_sample the per-group bottom-k
    #    generational store, media_phash_clusters the CC/representative
    #    composition, sequence_match_time the gap-constrained fold,
    #    stream_cms_counts / stream_uniq_users / stream_top_spenders
    #    the three remaining counter-store streaming twins, hybrid_rrf
    #    the rank-fusion arm math, hard_negatives the anti-join mining,
    #    value_by_type_totals the WITH TOTALS ROLLUP parity.  Displaced
    #    rows keep their operator coverage gated elsewhere and stay
    #    oracle-checked extras + benched — absorption notes live on
    #    each displaced row in EXTRA_QUERIES below.  Front-loaded: --
    "sketch_quantiles_weighted": q_sketch_quantiles_weighted,
    "stream_strat_sample": q_stream_strat_sample,
    "media_phash_clusters": q_media_phash_clusters,
    "stream_cms_counts": q_stream_cms_counts,
    "stream_uniq_users": q_stream_uniq_users,
    "hard_negatives": q_hard_negatives,
    "stream_top_spenders": q_stream_top_spenders,
    # -- rotated into the gate in r13 (VERDICT r12 #1: 12 of the 18
    #    locally-green rows never driver-attested, one per new
    #    machinery class: stream_range_counts attests the dyadic
    #    counter-store drain, dyadic_range_counts the batch dyadic
    #    build, hybrid_indexed both persisted indexes + RRF fusion,
    #    media_phash_dedup the blob/Arrow perceptual-hash path,
    #    ann_indexed_reclustered the CAS replace-commit maintenance,
    #    c4_filters + perplexity_buckets the curation chain,
    #    weighted_percentiles / top_users_weighted the weighted
    #    sketch+quantile family, text_normalize the Arrow NFC pass,
    #    score_calibration the permille-rank calibration,
    #    events_limit_by the LIMIT BY WindowGroupLimit plan shape).
    #    Displaced rows keep their operator coverage gated elsewhere
    #    and stay oracle-checked extras + benched — the absorption
    #    notes live on each displaced row in EXTRA_QUERIES below.
    #    Front-loaded: --
    "hybrid_indexed": q_hybrid_indexed,
    "media_phash_dedup": q_media_phash_dedup,
    "c4_filters": q_c4_filters,
    "perplexity_buckets": q_perplexity_buckets,
    "weighted_percentiles": q_weighted_percentiles,
    "top_users_weighted": q_top_users_weighted,
    "text_normalize": q_text_normalize,
    "score_calibration": q_score_calibration,
    "events_limit_by": q_events_limit_by,
    # -- rotated into the gate in r12 (VERDICT r11 #1: the six r11-new
    #    rows, locally hash-green in EXTRAS_ORACLE_r11 but never
    #    driver-attested).  Displaced rows keep their operator coverage
    #    gated elsewhere and stay oracle-checked extras + benched:
    #    user_set_ops' set-ops stay locally checked (repeat_users /
    #    churned_users / click_purchase_users extras); value_percentiles'
    #    aggregate family keeps type_day_cube + q1 gate rows (exact
    #    percentile + GK sketch stay extras); daily_big_values_filled's
    #    gap-fill is a window/sequence composition whose pieces stay
    #    gated via user_sessions + funnel_levels; customers_no_orders'
    #    anti-join shape stays locally checked via q4/q16/q21/q22
    #    extras; uniq_users_approx (HLL, the one non-hash gate row)
    #    keeps its tested error bound + top_users_sketch extra;
    #    train_test_split's deterministic split is load-bearing INSIDE
    #    gate-green corpus_curation (provably shared h48 path) with
    #    hash_sample as the extra.  Front-loaded: --
    "stream_domain_cap": q_stream_domain_cap,
    # -- rotated into the gate in r11 (VERDICT r10 #1: the persisted-
    #    index subsystem — a whole transactional index family, r10-new,
    #    never driver-attested).  Displaced rows keep their operator
    #    coverage gated elsewhere and stay oracle-checked extras +
    #    benched: q4/q5's TPC-H family keeps q1/q3/q6 +
    #    customers_no_orders + top_orders_per_customer (EXISTS/semi-join
    #    depth stays locally oracle-checked via q18/q20/q21 extras);
    #    user_cumulative_value's window family keeps user_sessions +
    #    top_orders_per_customer + funnel_levels; type_user_stats'
    #    composite-key group-by keeps type_day_cube + mv_cascade_daily +
    #    sql_busy_days.  Front-loaded: --
    "phrase_indexed": q_phrase_indexed,
    # -- rotated into the gate late-r10: four NEW operator families from
    #    this round's build, never driver-attested (all locally
    #    hash-green since they landed).  Displaced rows keep their
    #    operator coverage gated elsewhere and stay oracle-checked
    #    extras + benched: user_event_sequence's sequence/window family
    #    keeps user_sessions + user_cumulative_value + type_user_stats;
    #    q17's TPC-H family keeps q1/q3/q4/q5/q6 + customers_no_orders +
    #    top_orders_per_customer; pii_scrub's redaction family is
    #    SUPERSEDED by the entering pii_redact (typed patterns +
    #    per-type counts; the digit scrub stays an extra);
    #    event_type_matrix's conditional-aggregation family keeps
    #    type_user_stats + type_day_cube's CUBE row.  Front-loaded: --
    "dsir_select": q_dsir_select,
    "pii_redact": q_pii_redact,
    # -- rotated into the gate in r10 (VERDICT r9 #1: the only operator
    #    families never driver-attested — both r9 extras, locally
    #    hash-green since they landed).  Displaced rows keep their
    #    operator coverage gated elsewhere (see EXTRA_QUERIES):
    #    ann_sq8_topk's ANN family keeps the ann_topk gate row plus the
    #    recall-contract pytests (tests/test_ann_recall.py pins SQ8
    #    recall directly) and stays benched in HEADLINE; sequence_count
    #    is a strict subset of the funnel family, which keeps
    #    funnel_levels + stream_funnel gate rows.  Front-loaded: --
    "quality_classifier": q_quality_classifier,
    "bloom_decontaminate": q_bloom_decontaminate,
    # -- rotated into the gate in r09 (VERDICT r8 #1: the three r8
    #    operators judge-re-verified locally but never driver-attested).
    #    Displaced rows keep their operator coverage gated elsewhere (see
    #    EXTRA_QUERIES): winnow_fingerprint's window-hash fingerprint
    #    family keeps substring_dedup (entering, same h48 rolling-window
    #    machinery) + passage_dedup gate rows plus the pytest density
    #    bound; stream_sample's streaming-stateful family keeps
    #    stream_funnel + both near-dup drains, with the reservoir sketch
    #    pytest-pinned and stream_topk oracle-checked as an extra;
    #    click_purchase_users' set-ops family is gated via user_set_ops.
    #    Front-loaded: --
    # -- rotated into the gate in r08 (VERDICT r7 #1: the strongest
    #    never-driver-attested operator families).  Displaced rows keep
    #    their operator coverage gated elsewhere (see EXTRA_QUERIES):
    #    ann_ivf_topk's IVF quantizer is load-bearing inside semantic_dedup
    #    (provably shared code path) with ann_topk/ann_sq8_topk carrying
    #    the ANN family (ann_sq8_topk rotated out in r10, see above);
    #    stream_dedup's dropDuplicatesWithinWatermark is
    #    pytest-pinned and its streaming family keeps 4 gate rows
    #    (stream_funnel + both near-dup drains);
    #    daily_type_rollup's day-grain aggregate is a strict subset of
    #    type_day_cube's grouping-sets family.  Front-loaded: --
    "replacing_deletes": q_replacing_deletes,
    "type_day_cube": q_type_day_cube,
    # -- rotated into the gate in r07 (landed mid-r06 after the 50 slots
    #    filled; never driver-checked): front-loaded.  VERDICT r6 #2. --
    "semantic_dedup": q_semantic_dedup,
    "stream_funnel": q_stream_funnel,
    # -- r07 in-round additions, one per genuinely NEW operator family
    #    (int8-quantized ANN / MOSS winnowing / streaming uniform
    #    sampling): front-loaded --
    # -- rotated into the gate in r06 (landed r05 after slots filled;
    #    never driver-checked): front-loaded --
    "pack_sequences": q_pack_sequences,
    "stream_embed_near_dup": q_stream_embed_near_dup,
    # -- r06 in-round additions, one per new family (MergeTree engines /
    #    behavioral analytics / passage-level dedup): front-loaded --
    "passage_dedup": q_passage_dedup,
    # -- new/changed in r04: front-loaded --
    "mv_cascade_daily": q_mv_cascade_daily,
    # -- never driver-checked in r02 / changed in r03 --
    # -- stable green rows from CORRECTNESS_r02 --
    "latest_event": q_latest_event,
    "entry_house_points": q_entry_house_points,
    "mv_cascade_attendance": q_mv_cascade_attendance,
    "sql_busy_days": q_sql_busy_days,
    "q1_pricing_summary": q1_pricing_summary,
    "asof_last_purchase": q_asof_last_purchase,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "corpus_curation": q_corpus_curation,
}

# Operator variants NOT in the driver gate (the 50-slot budget): duplicates
# of a gate query's operator coverage, trivia, or variants a gate query
# absorbed.  All still runnable, benchable, and oracle-checked locally
# (tools/oracle_check.py verifies QUERIES and EXTRA_QUERIES alike).
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "extract_typed_events": q_extract_typed_events,  # M1 via mv_cascade_attendance
    "user_activity": q_user_activity,  # A4+O3 covered by attendance_granular et al.; slot freed for text_prep (r04)
    "attendance_daily_merged": q_attendance_daily_merged,  # M3/A6/A7 batch form; oracle identical to attendance_daily_compacted, streaming form gated by mv_cascade_daily (r04)
    "count_events": q_count_events,  # A1 via n_events in type_user_stats et al.
    "value_by_type": q_value_by_type,  # absorbed into type_user_stats
    "entry_attendance": q_entry_attendance,  # same oracle as mv_cascade_attendance
    "events_preview": q_events_preview,  # P2/O2 trivia
    "show_tables": q_show_tables,  # S8 trivia (tests/test_catalog_and_extras.py)
    "repeat_users": q_repeat_users,  # absorbed into user_set_ops
    "churned_users": q_churned_users,  # absorbed into user_set_ops
    "purchase_gaps": q_purchase_gaps,  # absorbed into user_cumulative_value
    "hash_sample": q_hash_sample,  # absorbed into train_test_split.in_sample
    "lang_id": q_lang_id,  # absorbed into text_profile
    "text_quality": q_text_quality,  # absorbed into text_profile
    "token_counts": q_token_counts,  # absorbed into text_profile
    "media_resize": q_media_resize,  # absorbed into media_features
    "doc_chunks": q_doc_chunks,  # r03 addition; gate slots were full
    "tfidf_top_terms": q_tfidf_top_terms,  # r03 addition; gate slots were full
    "repetition_stats": q_repetition_stats,  # r03 addition; gate slots were full
    "decontaminate_split": q_decontaminate_split,  # r03 addition; gate slots were full
    "q10_returned_items": q10_returned_items,  # join shape covered by q3
    "brand_revenue": q_brand_revenue,  # join shape covered by q3/q17
    "sample_stratified": q_sample_stratified,  # r06 addition; gate slots full
    "shuffle_export": q_shuffle_export,  # r06 addition; gate slots full
    "mixture_sample": q_mixture_sample,  # r06 addition; gate slots full
    "value_percentiles_approx": q_value_percentiles_approx,  # r06; GK-sketch scale path of value_percentiles
    # rotated OUT of the gate in r06 to make room for the r05 newcomers
    # (VERDICT r5 #2); every §2 operator they carried keeps ≥1 green gate row:
    "attendance_granular": q_attendance_granular,  # M2 via both cascades; A5 via daily_type_rollup
    "events_after": q_events_after,  # P3 pushdown plan-tested + date ranges in q6/sql_busy_days
    "value_histogram": q_value_histogram,  # A-family via value_percentiles
    # r06 late additions (MergeTree engine family + behavioral analytics +
    # sketch top-k + passage dedup); gate slots full — local oracle checks
    "collapsing_balance": q_collapsing_balance,  # S-engine family: gate rows via replacing_latest + attendance_daily_compacted
    "ttl_cleanup": q_ttl_cleanup,  # same engine family; partition-drop path pinned in tests/test_mergetree_engines.py
    "retention_cohort": q_retention_cohort,  # behavioral family: gate row via funnel_levels
    "top_users_sketch": q_top_users_sketch,  # sketch family: gate row via uniq_users_approx (HLL)
    "projection_routing": q_projection_routing,  # PROJECTION analogue round trip (tests/test_projections.py)
    "stream_topk": q_stream_topk,  # streaming Misra-Gries drain vs exact top-k oracle
    "q7_nation_trade": q7_nation_trade,  # TPC-H join-shape depth; gate carries q3/q5 joins
    "q8_market_share": q8_market_share,  # conditional-sum ratio aggregate
    # r7: TPC-H completion — the remaining 13 query shapes, adapted where
    # the reduced fixture lacks partsupp/shipmode/container/comment/phone
    # (each docstring states the adaptation); all oracle-checked locally
    "q2_min_cost_supplier": q2_min_cost_supplier,  # correlated-minimum join
    "q9_profit_by_nation_year": q9_profit_by_nation_year,  # name-LIKE + 4-join chain
    "q11_important_parts": q11_important_parts,  # scalar-subquery HAVING threshold
    "q12_late_shipment_priority": q12_late_shipment_priority,  # conditional-count matrix
    "q13_customer_order_distribution": q13_customer_order_distribution,  # filtered outer join + double aggregate
    "q14_promo_revenue": q14_promo_revenue,  # single-pass conditional ratio
    "q15_top_supplier": q15_top_supplier,  # agg view + scalar-max self-reference
    "q16_supplier_count_by_part": q16_supplier_count_by_part,  # NOT-IN anti-join + count distinct
    "q19_discounted_revenue": q19_discounted_revenue,  # disjunctive join predicate
    "q20_promo_part_suppliers": q20_promo_part_suppliers,  # nested semi-join chain
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,  # EXISTS / NOT-EXISTS quantifiers
    "q22_global_sales_opportunity": q22_global_sales_opportunity,  # scalar avg + anti-join
    # rotated OUT of the gate mid-r06 for the three family representatives
    # above; their operator coverage stays gated elsewhere:
    "asof_next_error": q_asof_next_error,  # forward as-of == backward + direction flip; asof_last_purchase gated, equivalence in tests/test_asof_*
    "latest_value_per_user": q_latest_value_per_user,  # max_by/argMax mechanism now gated THROUGH replacing_latest's FINAL read
    "media_summary": q_media_summary,  # multimodal family keeps media_features + media_frame_sample gate rows
    # rotated OUT of the gate mid-r07 for the three NEW operator families
    # (ann_sq8_topk / winnow_fingerprint / stream_sample); every operator
    # they carried keeps >= 1 green gate row:
    "ann_lsh_topk": q_ann_lsh_topk,  # RP-LSH bucket join gated via stream_embed_near_dup; ANN family keeps ann_topk + ann_ivf_topk + ann_sq8_topk gate rows
    "doc_fingerprint": q_doc_fingerprint,  # fingerprint family's gate row is now the richer winnow_fingerprint; min-shingle form stays locally oracle-checked + degenerate-docs pytest
    "attendance_daily_compacted": q_attendance_daily_compacted,  # S5/S6/A7/A8 batch form: mv_cascade_daily's streaming cascade runs the same write_sorted + summing compaction + merge read; pruning/plan pytests unchanged
    # rotated OUT of the gate in r07 for semantic_dedup / stream_funnel /
    # snapshot_changelog (VERDICT r6 #2); every §2 operator they carried
    # keeps ≥1 green gate row:
    "dedup_simhash": q_dedup_simhash,  # near-dup family keeps dedup_minhash_lsh + dedup_ngram_jaccard gate rows; simhash pinned in tests/test_skew.py + local oracle
    # rotated OUT of the gate in r08 for replacing_deletes / type_day_cube /
    # containment_pairs (VERDICT r7 #1); every operator they carried keeps
    # >= 1 green gate row:
    "ann_ivf_topk": q_ann_ivf_topk,  # IVF family: the shared quantizer is load-bearing inside gate-green semantic_dedup; ANN family keeps ann_topk + ann_sq8_topk gate rows; still benched in HEADLINE
    "stream_dedup": q_stream_dedup,  # dropDuplicatesWithinWatermark pytest-pinned (tests/test_streaming_pipeline.py); streaming family keeps stream_funnel/stream_sample + both near-dup drain gate rows
    "daily_type_rollup": q_daily_type_rollup,  # strict subset of type_day_cube's grouping-sets family (same day-grain aggregate); A5 composite-key also gated via mv_cascade_attendance/sql_busy_days
    "embedding_near_dup": q_embedding_near_dup,  # RP-LSH bucket join gated via ann_lsh_topk + stream_embed_near_dup (same operator + cosine verify)
    "media_frame_sample": q_media_frame_sample,  # mapInPandas multimodal family keeps media_features gate row; frame sampling pinned in tests + local oracle
    # rotated OUT of the gate in r09 for substring_dedup / unigram_rarity /
    # sequence_count (VERDICT r8 #1); every operator they carried keeps
    # >= 1 green gate row:
    # rotated OUT of the gate in r10 for quality_classifier /
    # bloom_decontaminate (VERDICT r9 #1); every operator they carried
    # keeps >= 1 green gate row:
    "ann_sq8_topk": q_ann_sq8_topk,  # ANN family keeps ann_topk gate row; SQ8 recall contract pinned in tests/test_ann_recall.py; still benched in HEADLINE
    "sequence_count": q_sequence_count,  # strict subset of funnel family, which keeps funnel_levels + stream_funnel gate rows; still benched in HEADLINE
    "winnow_fingerprint": q_winnow_fingerprint,  # window-hash fingerprint family keeps substring_dedup (same h48 rolling-window machinery) + passage_dedup gate rows; density bound pytest-pinned (tests/test_sketches.py); still benched in HEADLINE
    "stream_sample": q_stream_sample,  # streaming-stateful family keeps stream_funnel + both near-dup drain gate rows; reservoir k-slot semantics pytest-pinned (tests/test_streaming_stateful.py) + stream_topk extra oracle-checked; still benched in HEADLINE
    "click_purchase_users": q_click_purchase_users,  # set-ops family gated via user_set_ops (union/intersect/except over the same user sets)
    # r10 additions (gate slots full): URL/host-level dedup family —
    # canonicalization + public-suffix registered-domain extraction
    # (CCNet/RefinedWeb dedupe-by-URL before content dedup) and the
    # per-domain rollup a domain-quota policy consumes
    "url_dedup": q_url_dedup,
    "domain_doc_counts": q_domain_doc_counts,
    "domain_cap": q_domain_cap,
    "boilerplate_lines": q_boilerplate_lines,
    # r10: ClickHouse array-function family parity (README.rst:283's
    # linked topic) — groupArray/arrayMap/arrayFilter/arraySum/arraySort/
    # arrayDistinct/arraySlice/has as Spark higher-order builtins
    "array_functions": q_array_functions,
    # r10: streaming twin of url_dedup (first-arrival-wins crawl dedup);
    # oracle identical to url_dedup's on the id-ordered feed
    "stream_url_dedup": q_stream_url_dedup,
    # rotated OUT of the gate late-r10 to make room for the four new
    # families; operator coverage kept by gate rows named in the QUERIES
    # rotation comment, all four still benched in HEADLINE:
    "user_event_sequence": q_user_event_sequence,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "pii_scrub": q_pii_scrub,
    "event_type_matrix": q_event_type_matrix,
    # r10: keep-the-best-copy policy over near-dup clusters (CC labels
    # joined with classifier scores, per-cluster sortable-struct arg-max)
    "cluster_representatives": q_cluster_representatives,
    # r10: interpolated bigram-LM rarity (unigram_rarity's family, one
    # LM order up toward the CCNet KenLM filter)
    "bigram_rarity": q_bigram_rarity,
    # r15 (VERDICT r14 #2): index founded on the TRAINED quantizer —
    # build_ann_index(refine_rounds=KMEANS_ROUNDS) + unchanged lookup
    "ann_indexed_refined": q_ann_indexed_refined,
    # r15: leakage-safe split — near-dup clusters assigned atomically
    # to train/test by h48 on the component label (Lee et al. 2022)
    "cluster_safe_split": q_cluster_safe_split,
    # r15: per-domain TOKEN budget — the token-level domain_cap with
    # the >=1-charge floor bounding the cumsum partitions by budget
    "domain_token_cap": q_domain_token_cap,
    # r15: its streaming twin — token-level mixture enforcement at
    # ingest, all-rows charge accounting for batch-cumsum parity
    "stream_token_cap": q_stream_token_cap,
    # r10: CLIP-score image-text pair filtering (LAION recipe; cosine
    # between two modality embeddings, row-local)
    "pair_cosine_filter": q_pair_cosine_filter,
    # r10: UT1-style registered-domain blocklist filter (URL family)
    "url_blocklist": q_url_blocklist,
    # rotated OUT of the gate in r15 for the twelve r15 rotation rows
    # (VERDICT r14 #1); every operator each row carried keeps >= 1
    # green gate row or a provably-shared gated code path, and all
    # twelve stay oracle-checked extras + benched:
    "ann_indexed_grown": q_ann_indexed_grown,  # persisted-ANN extend family keeps ann_ivfpq_grown (entering: the same fixed-generation extend contract over the same TransactionalTable segment model, plus codebooks) + ann_ivfpq_indexed
    "ann_indexed_reclustered": q_ann_indexed_reclustered,  # CAS replace-commit maintenance keeps ann_ivfpq_reclustered (entering: same optimize(transform=...) swap with the harder codes-survive-verbatim invariant on top)
    "stream_index_ann": q_stream_index_ann,  # streaming index writer family keeps stream_index_ivfpq (entering: same exactly-once found-then-extend block protocol, richer artifacts)
    "stream_index_bm25": q_stream_index_bm25,  # same exactly-once streaming index protocol kept by stream_index_ivfpq (entering); the BM25 index itself stays gate-served inside hybrid_indexed
    "stream_range_counts": q_stream_range_counts,  # dyadic counter-store drain keeps stream_sketch_quantiles (entering: the SAME dyadic_cms_stream drain with ranges= AND ps= — increments + live band histogram + quantiles in one commit)
    "sketch_quantiles": q_sketch_quantiles,  # batch dyadic descent keeps stream_sketch_quantiles (entering: its oracle IS this row's SQL verbatim) + sketch_quantiles_weighted's mass-per-cell variant stays gated
    "dyadic_range_counts": q_dyadic_range_counts,  # batch dyadic build load-bears inside stream_sketch_quantiles (entering: linear counters make the drained store equal the batch build cell-for-cell) + sketch_quantiles_weighted
    "ann_ivfpq_topk": q_ann_ivfpq_topk,  # scan-path IVFPQ keeps ann_pq_topk (entering: the ADC scoring stage) + ann_ivfpq_indexed (entering: the same composition served from the persisted index, bit-identical by test)
    "hybrid_rrf": q_hybrid_rrf,  # rank-fusion arm math keeps hybrid_indexed (same RRF fold over the same arms, served from the persisted indexes)
    "temperature_mixture": q_temperature_mixture,  # sampling family keeps stream_strat_sample + score_calibration gate rows + diverse_sample (entering: cluster-quota sampling)
    "value_by_type_totals": q_value_by_type_totals,  # WITH TOTALS parity keeps type_day_cube (same grouping-sets/ROLLUP machinery, richer lattice)
    "sequence_match_time": q_sequence_match_time,  # gap-constrained sequence fold keeps stream_funnel gate row (same event-sequence machinery); funnel_levels extra stays oracle-checked
    # rotated OUT of the gate in r14 for the twelve never-driver-
    # attested rows (VERDICT r13 #1); every operator each row carried
    # keeps >= 1 green gate row or a provably-shared gated code path,
    # and all twelve stay oracle-checked extras + benched:
    "q3_shipping_priority": q3_shipping_priority,  # TPC-H join+agg+order family keeps q1_pricing_summary; the shape also load-bears in top_users_weighted and score_calibration
    "top_orders_per_customer": q_top_orders_per_customer,  # per-group top-N family keeps events_limit_by (same WindowGroupLimit physical shape); rank machinery load-bearing in score_calibration + hybrid_indexed
    "dedup_exact": q_dedup_exact,  # exact hash-groupBy dedup; family keeps dedup_minhash_lsh + media_phash_dedup, and the groupBy-argmax canonicalization load-bears inside media_phash_clusters (entering)
    "dedup_clusters": q_dedup_clusters,  # CC family keeps media_phash_clusters (entering: same connected_components + representative path, dedup.py) and CC load-bears inside gate-green corpus_curation
    "containment_pairs": q_containment_pairs,  # n-gram set-similarity family keeps dedup_minhash_lsh + passage_dedup
    "text_prep": q_text_prep,  # normalization family keeps text_normalize (Arrow NFC) + c4_filters
    "gopher_rules": q_gopher_rules,  # curation-rules family keeps c4_filters + perplexity_buckets + quality_classifier + corpus_curation
    "bm25_indexed": q_bm25_indexed,  # persisted-BM25 family keeps hybrid_indexed (gate: serves from the same index); stream_index_bm25 (same streaming build) stays an oracle-checked extra with stream_index_ivfpq gated
    "ann_indexed": q_ann_indexed,  # persisted-ANN family keeps hybrid_indexed + the entering IVFPQ gate rows (ann_ivfpq_indexed/grown/reclustered + stream_index_ivfpq — same segment model, maintain/serve machinery superset)
    "cms_user_counts": q_cms_user_counts,  # CMS family keeps stream_cms_counts (gate; its oracle IS this row's batch SQL) + stream_sketch_quantiles (gate: the dyadic drain)
    "funnel_levels": q_funnel_levels,  # funnel family keeps stream_funnel (gate); sequence_match_time's gap-constrained fold stays an oracle-checked extra
    "stream_near_dup": q_stream_near_dup,  # streaming near-dup family keeps stream_embed_near_dup (same exactly-once bucket-pruned drain architecture) + dedup_minhash_lsh (batch banding)
    # rotated OUT of the gate in r13 for the twelve never-driver-
    # attested rows (VERDICT r12 #1); every operator each row carried
    # keeps >= 1 green gate row or a provably-shared gated code path,
    # and all twelve stay oracle-checked extras + benched:
    "replacing_latest": q_replacing_latest,  # engine family keeps replacing_deletes (strictly richer: same FINAL read + tombstones); round trip pinned in tests/test_mergetree_engines.py
    "snapshot_changelog": q_snapshot_changelog,  # CDC family keeps replacing_deletes' versioned-upsert FINAL read; changelog semantics pytest-pinned
    "q6_forecast_revenue": q6_forecast_revenue,  # TPC-H family keeps q1/q3 gate rows; scan+filter shape plan-tested
    "ann_topk": q_ann_topk,  # ANN family keeps the IVFPQ gate rows (ann_pq_topk/ann_ivfpq_indexed/grown/reclustered + stream_index_ivfpq); exact top-k stays the recall oracle in tests/test_ann_recall.py
    "bm25_search": q_bm25_search,  # BM25 family keeps bm25_indexed + entering hybrid_indexed; scan/index bit-identity pinned in tests/test_search_index.py
    "phrase_search": q_phrase_search,  # phrase family keeps phrase_indexed (same positional machinery via the index path)
    "substring_dedup": q_substring_dedup,  # dedup family keeps passage_dedup + containment_pairs + dedup_exact/minhash/clusters gate rows; span-removal semantics pytest-pinned
    "unigram_rarity": q_unigram_rarity,  # rarity family keeps entering perplexity_buckets (bigram surprisal + calibration) with bigram_rarity extra
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,  # PPJoin prefix-filter machinery gated via containment_pairs; minhash-LSH gate row carries near-dup
    "text_profile": q_text_profile,  # text family keeps text_prep + quality_classifier + gopher_rules + entering c4_filters; lang-id/quality/token extras stay locally checked
    "media_features": q_media_features,  # multimodal family keeps entering media_phash_dedup (same Arrow blob-batch mapInPandas path); media_frame_sample extra stays
    "user_sessions": q_user_sessions,  # window family keeps funnel_levels + top_orders_per_customer gate rows; sessionization oracle stays locally checked
    # rotated OUT of the gate in r12 for the six r11-new rows (VERDICT
    # r11 #1); every operator they carried keeps >= 1 green gate row or
    # a provably-shared gated code path (see the QUERIES rotation
    # comment), and all six stay benched in HEADLINE:
    "user_set_ops": q_user_set_ops,  # set-ops family: repeat_users/churned_users/click_purchase_users extras stay locally oracle-checked
    "value_percentiles": q_value_percentiles,  # exact-percentile row; GK-sketch scale path stays extra (value_percentiles_approx)
    "daily_big_values_filled": q_daily_big_values_filled,  # gap-fill/WITH FILL composition; window/sequence pieces gated via user_sessions + funnel_levels
    "customers_no_orders": q_customers_no_orders,  # left-anti join; anti-join depth locally checked via q4/q16/q21/q22 extras
    "uniq_users_approx": q_uniq_users_approx,  # HLL sketch; tested error bound (tests/test_approx_sketches.py) + top_users_sketch extra
    "train_test_split": q_train_test_split,  # h48 split is load-bearing inside gate-green corpus_curation; hash_sample extra
    # rotated OUT of the gate in r11 for the persisted-index family
    # (bm25_indexed / phrase_indexed / ann_indexed / stream_index_bm25 —
    # VERDICT r10 #1); every operator they carried keeps >= 1 green gate
    # row, and all four stay benched in HEADLINE:
    "q4_order_priority": q4_order_priority,  # TPC-H family keeps q1/q3/q6 gate rows; EXISTS semi-join depth locally oracle-checked via q18/q20/q21
    "q5_local_supplier_volume": q5_local_supplier_volume,  # TPC-H 6-table join; join-chain shapes kept by q3 gate row + q7/q9 extras
    "user_cumulative_value": q_user_cumulative_value,  # running-sum window family keeps user_sessions + top_orders_per_customer + funnel_levels gate rows
    "type_user_stats": q_type_user_stats,  # composite-key group-by keeps type_day_cube + mv_cascade_daily + sql_busy_days gate rows
}


# ===========================================================================
# DuckDB oracle SQL (exact mirrors; see module docstring)
# ===========================================================================


def _sql_toks(text_expr: str = "text") -> str:
    return TX.sql_tokens(text_expr)


def _sql_phrase_arms() -> str:
    """One UNION ALL arm per PHRASES entry: sliding-window list compare
    with the same 1-based inclusive window domain as the Spark operator
    (DuckDB's range is exclusive-ascending, so len < m yields no
    candidate windows — no short-doc guard needed on this side)."""
    arms = []
    for pid, p in PHRASES:
        terms = TX.py_tokens(p)
        m = len(terms)
        lit = TX.sql_string_array_literal(terms)
        arms.append(
            f"SELECT doc_id, {pid} AS phrase_id, "
            f"CAST(len(list_filter(range(1, len(t) - {m} + 2), "
            f"i -> t[i : i + {m - 1}] = {lit})) AS INTEGER) AS n_matches FROM toks"
        )
    return "\nUNION ALL\n".join(arms)


def _sql_pii_redact() -> str:
    """Progressive redaction chain generated FROM text_analysis.
    PII_PATTERNS (one CTE per pattern, counting against the previous
    step's text), so pattern order and content cannot drift between the
    Spark operator and this mirror."""
    ctes = [f"p0 AS (SELECT doc_id, {_SQL_SYNTH_PII} AS t0 FROM documents)"]
    names = []
    for i, (name, pat, repl) in enumerate(text_analysis.PII_PATTERNS):
        ctes.append(
            f"p{i + 1} AS (SELECT *,"
            f" CAST(len(regexp_extract_all(t{i}, '{pat}')) AS INTEGER) AS n_{name},"
            f" regexp_replace(t{i}, '{pat}', '{repl}', 'g') AS t{i + 1}"
            f" FROM p{i})"
        )
        names.append(f"n_{name}")
    last = len(text_analysis.PII_PATTERNS)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, t{last} AS redacted, " + ", ".join(names)
        + f"\nFROM p{last} ORDER BY doc_id"
    )


def _sql_bm25_qt() -> str:
    """(query_id, term) VALUES rows — the SAME driver-side tokenize +
    dedup the Spark operator applies to BM25_QUERIES, so both engines
    retrieve over an identical query-term set."""
    rows = sorted({(qid, t) for qid, q in BM25_QUERIES for t in TX.py_tokens(q)})
    return ", ".join(f"({qid}, '{t}')" for qid, t in rows)


def _oracle_minhash_lsh() -> str:
    rows = MINHASH_PERM // MINHASH_BANDS
    band_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, {j} AS band, array_to_string(sig[{j * rows + 1}:{(j + 1) * rows}], '-') AS band_key FROM sigs"
        for j in range(MINHASH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), sh AS (
  SELECT doc_id, list_distinct({TX.sql_word_shingles('toks', MINHASH_SHINGLE_N)}) AS shingles FROM toks
), hs AS (
  SELECT doc_id, shingles, {H.sql_hashed_shingles('shingles')} AS hashed FROM sh
), sigs AS (
  SELECT doc_id, shingles, {H.sql_minhash_signature('hashed', MINHASH_PERM)} AS sig FROM hs
), banded AS (
{band_selects}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
         / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
FROM cand
JOIN sigs sa ON cand.id_a = sa.doc_id
JOIN sigs sb ON cand.id_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= {MINHASH_THRESHOLD}
ORDER BY id_a, id_b
"""


def _oracle_dedup_clusters() -> str:
    """Transitive closure by recursive CTE over the minhash pair oracle —
    exponential-state but exact at oracle scale; the Spark side's label
    propagation is the scalable form."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({_oracle_minhash_lsh()})
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.src AS node, r.label FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


def _oracle_event_type_matrix() -> str:
    per_type = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT user_id,
       {per_type},
       CAST(round(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
         AS purchase_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def _oracle_media_features() -> str:
    """Mirror of multimodal._fake_feature + resize_media, joined on doc_id:
    strided byte sums over the utf-8 blob (== ascii codes — the fixture text
    is pure ASCII, asserted by octet_length == length), floor-rounded
    exactly like the Python side, emitted as '|'-joined micro-units (the
    floor(x*1e6 + 0.5) integers themselves, skipping the /1e6 round-trip)."""
    dim = multimodal.FEATURE_DIM
    # degenerate contract (code-review r6, mirrored by _fake_feature):
    # empty text -> all-zero features; NULL text -> NULL feature_ufp
    feats = ",\n           ".join(
        "CASE WHEN length(text) = 0 THEN 0 ELSE "
        "CAST(floor((CAST(coalesce(list_sum(list_transform("
        f"range({j + 1}, length(text) + 1, {dim}), i -> ascii(substr(text, i, 1))"
        ")), 0) AS DOUBLE) / length(text)) * 1000000.0 + 0.5) AS BIGINT) END"
        for j in range(dim)
    )
    rb = multimodal.RESIZE_BYTES
    return f"""
WITH f AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(length(text) AS BIGINT) AS n_bytes,
         CASE WHEN text IS NULL THEN NULL
              ELSE array_to_string([{feats}], '|') END AS feature_ufp
  FROM documents
), s AS (
  SELECT doc_id, text,
         greatest(1, length(text) // {rb}) AS stride,
         length(text) AS n FROM documents
), r AS (
  -- degenerate contract (mirrors _fake_resize): NULL text -> (NULL, NULL)
  -- (DuckDB's least() IGNORES NULLs, so the bare expression would give
  -- {rb}); empty text -> (0, md5('')) (array_to_string of an empty list
  -- is NULL, so coalesce to '')
  SELECT doc_id,
         CASE WHEN n IS NULL THEN NULL
              ELSE CAST(least({rb}, (n + stride - 1) // stride) AS BIGINT)
         END AS resized_bytes,
         CASE WHEN n IS NULL THEN NULL
              ELSE md5(coalesce(array_to_string(
                list_transform(
                  range(0, least({rb}, (n + stride - 1) // stride)),
                  i -> substr(text, CAST(i * stride + 1 AS INTEGER), 1)),
                ''), ''))
         END AS resized_md5
  FROM s
)
SELECT f.doc_id, media_type, n_bytes, feature_ufp, resized_bytes, resized_md5
FROM f JOIN r ON f.doc_id = r.doc_id
ORDER BY f.doc_id
"""


def _oracle_media_phash() -> str:
    """Mirror of multimodal._fake_phash + media_phash_pairs as the NAIVE
    all-pairs form: per-band ascii sums over the (pure-ASCII, asserted
    by the media_features oracle's convention) text, bit j set iff
    band_j * PHASH_BITS > total (strict, ties -> 0), then every
    (a < b) pair with bit_count(xor) <= PHASH_MAX_HAMMING — the banded
    Spark plan must reproduce this exactly."""
    bits = multimodal.PHASH_BITS
    maxh = multimodal.PHASH_MAX_HAMMING
    band = (
        "coalesce(list_sum(list_transform(range({j1}, length(text) + 1, "
        f"{bits}), i -> ascii(substr(text, i, 1)))), 0)"
    )
    terms = " + ".join(
        f"CASE WHEN {band.format(j1=j + 1)} * {bits} > total "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(bits)
    )
    return f"""
WITH t AS (
  SELECT doc_id, text,
         coalesce(list_sum(list_transform(range(1, length(text) + 1),
                  i -> ascii(substr(text, i, 1)))), 0) AS total
  FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(text) = 0 THEN NULL
              ELSE {terms} END AS phash
  FROM t
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= {maxh}
ORDER BY id_a, id_b
"""


def _oracle_media_phash_clusters() -> str:
    """Transitive closure (recursive CTE) over the naive all-pairs phash
    oracle + keep-the-largest argmax — mirrors the composed Spark
    pipeline stage for stage (pairs -> components -> representative)."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_oracle_media_phash()})
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.src AS node, r.label FROM edges e JOIN reach r ON e.dst = r.node
), cc AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node
), sc AS (
  -- octet_length(encode(..)) = UTF-8 byte count, mirroring the engine's
  -- meta.n_bytes exactly regardless of fixture text encoding (ADVICE
  -- r13: length() counts characters and matched only because the
  -- fixtures happen to be pure ASCII)
  SELECT doc_id,
         CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes
  FROM documents
), j AS (
  SELECT c.cluster_id, c.doc_id, s.n_bytes,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY s.n_bytes DESC, c.doc_id) AS rn
  FROM cc c JOIN sc s USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id,
       CAST(cluster_size AS INTEGER) AS cluster_size,
       n_bytes AS rep_n_bytes
FROM j WHERE rn = 1 ORDER BY cluster_id
"""


def _oracle_corpus_curation() -> str:
    """Composition of the lang-ID, quality, and cluster oracles — mirrors
    q_corpus_curation stage for stage."""
    split_bucket = H.sql_h48(f"'{SPLIT_SALT}' || CAST(d.doc_id AS VARCHAR)")
    return f"""
WITH lang AS (
  SELECT doc_id, pred_lang FROM ({_oracle_lang_id()})
), qual AS (
  SELECT doc_id, quality FROM ({_oracle_text_quality()})
), canon AS (
  SELECT doc_id FROM ({_oracle_dedup_clusters()}) WHERE doc_id = cluster_id
)
SELECT d.doc_id, quality,
       CASE WHEN ({split_bucket} % 100) < {SPLIT_TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split
FROM documents d
JOIN canon USING (doc_id)
JOIN lang USING (doc_id)
JOIN qual USING (doc_id)
WHERE pred_lang = 'en' AND quality >= {CURATION_MIN_QUALITY}
ORDER BY d.doc_id
"""


def _oracle_media_frame_sample() -> str:
    """Mirror of multimodal.sample_frames: video docs (doc_id % 3 = 2), every
    FRAME_SAMPLE_EVERY-th FRAME_STRIDE-byte stripe up to FRAME_MAX, md5 of
    the clamped slice (ASCII text, so substr == byte slice)."""
    stride = multimodal.FRAME_STRIDE
    every = multimodal.FRAME_SAMPLE_EVERY
    return f"""
WITH v AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
), f AS (
  SELECT doc_id, text,
         CAST(i * {every} AS BIGINT) AS frame_idx,
         CAST(i * {every * stride} AS BIGINT) AS frame_offset
  FROM v, UNNEST(range(0, {multimodal.FRAME_MAX})) AS t(i)
  WHERE i * {every * stride} < length(text)
)
SELECT doc_id, frame_idx, frame_offset,
       md5(substr(text, CAST(frame_offset + 1 AS INTEGER), {stride})) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
"""


def _oracle_simhash() -> str:
    bits = dedup.SIMHASH_BITS
    chunk_bits = bits // (SIMHASH_MAX_HAMMING + 1)
    mask = (1 << chunk_bits) - 1
    sim_terms = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hashed, h -> (h >> {i}) & 1)) > len(hashed) "
        f"THEN CAST(2**{i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    chunk_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS chunk_idx, (simhash >> {j * chunk_bits}) & {mask} AS chunk_val FROM sims"
        for j in range(SIMHASH_MAX_HAMMING + 1)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), hs AS (
  SELECT doc_id, list_transform(toks, t -> {H.sql_h48('t')}) AS hashed FROM toks
), sims AS (
  SELECT doc_id, CAST({sim_terms} AS BIGINT) AS simhash FROM hs
), chunked AS (
{chunk_selects}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM chunked a JOIN chunked b
  ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
ORDER BY id_a, id_b
"""


def _sql_rp_bucket(vec: str, planes: list[list[float]]) -> str:
    """DuckDB mirror of similarity.rp_bucket for a fixed hyperplane set."""
    terms = []
    for j, plane in enumerate(planes):
        lits = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {EMBED_DIM + 1}), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lits})[i]))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN CAST(2**{j} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _oracle_ann_topk(use_lsh: bool = False) -> str:
    """Mirrors the prenormalize-then-dot scoring (same op order as Spark):
    buckets (LSH variant) hash the RAW vectors, scores are dots of unit
    vectors."""
    norm = V.sql_normalize("embedding", EMBED_DIM)
    cos = V.sql_dot("q.qnv", "e.nv", EMBED_DIM)
    if not use_lsh:
        nemb = f"SELECT vec_id, {norm} AS nv FROM embeddings"
        joins = "nemb e, q"
        q_sub = f"SELECT vec_id AS query_id, nv AS qnv FROM nemb WHERE vec_id < {ANN_NUM_QUERIES}"
    else:
        planes = similarity.rp_hyperplanes(RP_PLANES, EMBED_DIM, RP_SEED)
        nemb = (
            f"SELECT vec_id, {norm} AS nv, "
            f"{_sql_rp_bucket('embedding', planes)} AS bucket FROM embeddings"
        )
        joins = "nemb e JOIN q ON e.bucket = q.bucket"
        q_sub = (
            f"SELECT vec_id AS query_id, nv AS qnv, bucket "
            f"FROM nemb WHERE vec_id < {ANN_NUM_QUERIES}"
        )
    return f"""
WITH nemb AS ({nemb}),
 q AS ({q_sub}),
 scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM {joins}
  WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rnk <= {ANN_K}
ORDER BY query_id, rank
"""


def _sql_pq_codes(cb_source_pred: str | None = None) -> str:
    """Shared PQ mirror CTE text (sub/pqparams/cb/enc/codes) over an
    in-scope `nemb(vec_id, nv)` CTE — used by the plain PQ-ADC oracle,
    the IVF-PQ oracle AND the persisted-index oracles so the SQL
    mirrors cannot drift (the `_sql_ivf_quantizer` precedent).  Mirrors
    pq_codes exactly: same subvector slices, same per-subspace
    hash-sample (modulus from the corpus count), same integer micro-L2
    and (dmicro, code) tie-break.  `cb_source_pred` restricts BOTH the
    modulus population and the codebook draw to a sub-corpus — the
    grown-index oracle's founding segment (`extend_ivfpq_index`'s
    fixed-codebook semantics: codebooks come only from the segment the
    index was created on)."""
    ds = EMBED_DIM // PQ_M
    h = H.sql_h48(
        "'pq:' || CAST(m AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)"
    )
    dist_sc = (
        f"CAST(floor(list_sum(list_transform(range(1, {ds + 1}), "
        f"i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) "
        f"* 1000000.0 + 0.5) AS BIGINT)"
    )
    src = cb_source_pred or "TRUE"
    return f"""sub AS (
  SELECT vec_id, CAST(j AS INTEGER) AS m,
         nv[j * {ds} + 1 : j * {ds} + {ds}] AS sv
  FROM nemb, range({PQ_M}) t(j)
), pqparams AS (
  SELECT greatest(1, count(*) // {PQ_TARGET_CODES}) AS modulus
  FROM embeddings WHERE {src}
), cb AS (
  SELECT m, vec_id AS code, sv AS cv FROM sub, pqparams
  WHERE {h} % modulus = 0 AND ({src})
), enc AS (
  SELECT s.vec_id AS cvid, s.m, c.code, {dist_sc} AS dmicro
  FROM sub s JOIN cb c ON s.m = c.m
), codes AS (
  SELECT cvid, m, code FROM (
    SELECT cvid, m, code,
           row_number() OVER (PARTITION BY cvid, m
                              ORDER BY dmicro, code) AS rn
    FROM enc) WHERE rn = 1
), dtable AS (
  SELECT s.vec_id AS query_id, s.m, c.code, {dist_sc} AS pdist
  FROM sub s JOIN cb c ON s.m = c.m
  WHERE s.vec_id < {ANN_NUM_QUERIES}
)"""


def _oracle_ann_pq() -> str:
    """Mirror of pq_codes + pq_adc_topk: shared PQ CTEs, full-corpus ADC
    integer sums, (dist asc, id asc) ranking."""
    norm = V.sql_normalize("embedding", EMBED_DIM)
    return f"""
WITH nemb AS (
  SELECT vec_id, {norm} AS nv FROM embeddings
), {_sql_pq_codes()}, scored AS (
  SELECT d.query_id, k.cvid AS neighbor_id,
         CAST(sum(d.pdist) AS BIGINT) AS adc
  FROM codes k JOIN dtable d ON k.m = d.m AND k.code = d.code
  WHERE k.cvid <> d.query_id
  GROUP BY 1, 2
), r AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank,
       adc AS adc_dist_micro
FROM r WHERE rnk <= {ANN_K} ORDER BY query_id, rank
"""


def _oracle_ann_ivfpq() -> str:
    """Mirror of ivfpq_topk: the shared IVF quantizer CTEs (same probe
    decisions as the ann_ivf_topk oracle) pruning the candidates, then
    the shared PQ CTEs scoring them by ADC integer sums."""
    return f"""
WITH {_sql_ivf_quantizer('avid')}, {_sql_pq_codes()}, probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {V.sql_dot('q.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb q, cents c WHERE q.vec_id < {ANN_NUM_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
), cands AS (
  SELECT p.query_id, a.avid AS vid
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
  WHERE a.avid <> p.query_id
), scored AS (
  SELECT cd.query_id, cd.vid AS neighbor_id,
         CAST(sum(d.pdist) AS BIGINT) AS adc
  FROM cands cd
  JOIN codes k ON cd.vid = k.cvid
  JOIN dtable d ON d.query_id = cd.query_id
               AND d.m = k.m AND d.code = k.code
  GROUP BY 1, 2
), r AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank,
       adc AS adc_dist_micro
FROM r WHERE rnk <= {ANN_K} ORDER BY query_id, rank
"""


def _oracle_ann_ivfpq_grown() -> str:
    """Mirror of the grown IVFPQ index: founding-only draws for BOTH
    generations (cent_source_pred on the IVF quantizer, cb_source_pred
    on the PQ codebooks), every vector assigned/encoded against them —
    extend never re-trains."""
    return f"""
WITH {_sql_ivf_quantizer('avid', cent_source_pred=ANN_GROWN_FOUNDING_PRED)},
{_sql_pq_codes(cb_source_pred=ANN_GROWN_FOUNDING_PRED)}, probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {V.sql_dot('q.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb q, cents c WHERE q.vec_id < {ANN_NUM_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
), cands AS (
  SELECT p.query_id, a.avid AS vid
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
  WHERE a.avid <> p.query_id
), scored AS (
  SELECT cd.query_id, cd.vid AS neighbor_id,
         CAST(sum(d.pdist) AS BIGINT) AS adc
  FROM cands cd
  JOIN codes k ON cd.vid = k.cvid
  JOIN dtable d ON d.query_id = cd.query_id
               AND d.m = k.m AND d.code = k.code
  GROUP BY 1, 2
), r AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank,
       adc AS adc_dist_micro
FROM r WHERE rnk <= {ANN_K} ORDER BY query_id, rank
"""


def _oracle_ann_ivfpq_reclustered() -> str:
    """Mirror of the reclustered IVFPQ index: FULL-corpus centroid
    generation (the recluster re-draw equals a fresh full-corpus draw —
    same salt, same K, same modulus rule) composed with the
    FOUNDING-ONLY codebooks (codes survive a recluster verbatim)."""
    return f"""
WITH {_sql_ivf_quantizer('avid')},
{_sql_pq_codes(cb_source_pred=ANN_GROWN_FOUNDING_PRED)}, probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.vec_id AS query_id, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {V.sql_dot('q.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb q, cents c WHERE q.vec_id < {ANN_NUM_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
), cands AS (
  SELECT p.query_id, a.avid AS vid
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
  WHERE a.avid <> p.query_id
), scored AS (
  SELECT cd.query_id, cd.vid AS neighbor_id,
         CAST(sum(d.pdist) AS BIGINT) AS adc
  FROM cands cd
  JOIN codes k ON cd.vid = k.cvid
  JOIN dtable d ON d.query_id = cd.query_id
               AND d.m = k.m AND d.code = k.code
  GROUP BY 1, 2
), r AS (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank,
       adc AS adc_dist_micro
FROM r WHERE rnk <= {ANN_K} ORDER BY query_id, rank
"""


def _sql_kmeans_round_ctes(id_alias: str, rounds: int) -> tuple[str, str, str]:
    """The unrolled Lloyd-round CTE text shared by the kmeans oracle and
    the refined-index oracle (r15): each round computes per-(cent, dim)
    integer-micro sums, truncating BIGINT quotients, list-rebuild
    ordered by dim, the shared renormalize, and the shared argmax
    re-assignment.  Assumes `nemb`/`assign` CTEs from
    `_sql_ivf_quantizer(id_alias)` precede it.  Returns (cte_text,
    final_assign_name, final_cv_name)."""
    norm_raw = V.sql_normalize("raw", EMBED_DIM)
    parts = []
    prev_assign = "assign"
    for r in range(1, rounds + 1):
        parts.append(f""", m{r} AS (
  SELECT cent_id, CAST(t.i AS INTEGER) AS i,
         CAST(sum(CAST(floor(a.nv[t.i] * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS c
  FROM {prev_assign} a, range(1, {EMBED_DIM + 1}) t(i)
  GROUP BY 1, 2
), cv{r} AS (
  SELECT cent_id, {norm_raw} AS cv FROM (
    SELECT cent_id,
           list(CAST(s // c AS DOUBLE) / 1000000.0 ORDER BY i) AS raw
    FROM m{r} GROUP BY cent_id)
), assign{r} AS (
  SELECT vec_id AS {id_alias}, nv, cent_id FROM (
    SELECT e.vec_id, e.nv, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {V.sql_dot('e.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb e, cv{r} c
  ) WHERE rn = 1
)""")
        prev_assign = f"assign{r}"
    return "".join(parts), prev_assign, f"cv{rounds}"


def _oracle_kmeans() -> str:
    """Mirror of kmeans_refine with ROUNDS unrolled: the shared IVF
    quantizer CTEs give round 0's assignment; Lloyd rounds via the
    shared `_sql_kmeans_round_ctes`."""
    rounds, fin_assign, _ = _sql_kmeans_round_ctes("avid", KMEANS_ROUNDS)
    return (
        f"WITH {_sql_ivf_quantizer('avid')}{rounds}\n"
        f"SELECT avid AS vec_id, cent_id FROM {fin_assign} ORDER BY vec_id\n"
    )


def _oracle_ann_refined() -> str:
    """Mirror of build_ann_index(refine_rounds=KMEANS_ROUNDS) +
    ann_index_lookup: the shared quantizer + Lloyd-round CTEs produce
    the REFINED generation (centroids cv{R}, assignment assign{R} —
    byte-for-byte the kmeans oracle's), then the IVF lookup mirror
    probes the refined centroids and reranks within refined cells —
    `_oracle_ann_ivf`'s probe/rerank text over the trained generation."""
    rounds, fin_assign, fin_cv = _sql_kmeans_round_ctes(
        "neighbor_id", KMEANS_ROUNDS
    )
    return f"""
WITH {_sql_ivf_quantizer('neighbor_id')}{rounds}, probes AS (
  SELECT query_id, qn, cent_id FROM (
    SELECT q.vec_id AS query_id, q.nv AS qn, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {V.sql_dot('q.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb q, {fin_cv} c WHERE q.vec_id < {ANN_NUM_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
), scored AS (
  SELECT p.query_id, a.neighbor_id, {V.sql_dot('p.qn', 'a.nv', EMBED_DIM)} AS cos_sim
  FROM probes p JOIN {fin_assign} a ON p.cent_id = a.cent_id
  WHERE a.neighbor_id != p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rnk <= {ANN_K}
ORDER BY query_id, rank
"""


def _oracle_ann_sq8() -> str:
    """Mirror of similarity.sq8_topk: same normalize, same per-vector
    max-abs/127 scale (lateral alias), same round-half-away-from-zero
    int8 components, exact integer dot, double rescale, same tie-break."""
    norm = V.sql_normalize("embedding", EMBED_DIM)
    idot = (
        f"list_sum(list_transform(range(1, {EMBED_DIM + 1}), "
        f"i -> CAST(q.qv[i] AS BIGINT) * CAST(e.qv[i] AS BIGINT)))"
    )
    return f"""
WITH nemb AS (
  SELECT vec_id, {norm} AS nv FROM embeddings
), qz AS (
  SELECT vec_id,
         list_max(list_transform(nv, x -> abs(x))) / 127.0 AS scale,
         CASE WHEN list_max(list_transform(nv, x -> abs(x))) / 127.0 > 0
              THEN list_transform(range(1, {EMBED_DIM + 1}),
                     i -> CAST(round(nv[i] / (list_max(list_transform(nv, x -> abs(x))) / 127.0)) AS INTEGER))
              ELSE list_transform(range(1, {EMBED_DIM + 1}), i -> 0) END AS qv
  FROM nemb
), scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST({idot} AS DOUBLE) * q.scale * e.scale AS cos_sim
  FROM qz e, qz q
  WHERE q.vec_id < {ANN_NUM_QUERIES} AND e.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rnk <= {ANN_K}
ORDER BY query_id, rank
"""


def _sql_ivf_quantizer(
    id_alias: str,
    centroids_sql: str | None = None,
    cent_source_pred: str | None = None,
) -> str:
    """Shared nemb/cents/assign CTE text mirroring `similarity.ivf_quantize`
    (same modulus, sample predicate, and argmax tie-break) — used by BOTH
    the IVF ANN oracle and the SemDeDup oracle so the SQL mirrors cannot
    drift any more than the Spark operators can.  `centroids_sql` defaults
    to the fixed {IVF_TARGET_CENTROIDS} the ANN query passes explicitly;
    the SemDeDup oracle passes the isqrt(n) self-derivation instead
    (floor(sqrt(n)) in doubles == math.isqrt(n) for every n < 2^52).
    `cent_source_pred` restricts BOTH the modulus population and the
    centroid sample to a sub-corpus — the grown-index oracle's founding
    segment (extend_ann_index's fixed-centroid semantics: centroids come
    only from the segment the index was created on)."""
    norm = V.sql_normalize("embedding", EMBED_DIM)
    if centroids_sql is None:
        centroids_sql = str(IVF_TARGET_CENTROIDS)
    src = cent_source_pred or "TRUE"
    modulus = (
        f"greatest(1, CAST((SELECT count(*) FROM embeddings WHERE {src}) AS BIGINT)"
        f" // ({centroids_sql}))"
    )
    cent_pred = (
        f"({H.sql_h48(f'{IVF_SALT!r} || CAST(vec_id AS VARCHAR)')} % {modulus}) = 0"
        f" AND ({src})"
    )
    return f"""nemb AS (
  SELECT vec_id, {norm} AS nv FROM embeddings
), cents AS (
  SELECT vec_id AS cent_id, nv AS cv FROM nemb WHERE {cent_pred}
), assign AS (
  SELECT vec_id AS {id_alias}, nv, cent_id FROM (
    SELECT e.vec_id, e.nv, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {V.sql_dot('e.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb e, cents c
  ) WHERE rn = 1
)"""


def _oracle_semantic_dedup() -> str:
    """Mirror of dedup.semantic_dedup: the shared IVF quantizer CTEs, then
    within-cell (a < b, cos >= threshold) pairs mark b dropped; survivors
    ordered."""
    derived_k = (
        "greatest(1, CAST(floor(sqrt("
        "CAST((SELECT count(*) FROM embeddings) AS DOUBLE))) AS BIGINT))"
    )
    return f"""
WITH {_sql_ivf_quantizer('vec_id', derived_k)}, dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE {V.sql_dot('a.nv', 'b.nv', EMBED_DIM)} >= {NEAR_DUP_COS}
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY vec_id
"""


def _oracle_ann_ivf(cent_source_pred: str | None = None) -> str:
    """Mirror of similarity.ivf_topk: the shared IVF quantizer CTEs
    (`_sql_ivf_quantizer` — same modulus, sample, and tie-break as the
    Spark `ivf_quantize`), then the same nprobe probe and normalized-dot
    rerank.  `cent_source_pred` is the grown-index variant: centroids
    sampled from the founding segment only (extend_ann_index)."""
    return f"""
WITH {_sql_ivf_quantizer('neighbor_id', cent_source_pred=cent_source_pred)}, probes AS (
  SELECT query_id, qn, cent_id FROM (
    SELECT q.vec_id AS query_id, q.nv AS qn, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {V.sql_dot('q.nv', 'c.cv', EMBED_DIM)} DESC,
                                       c.cent_id) AS rn
    FROM nemb q, cents c WHERE q.vec_id < {ANN_NUM_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
), scored AS (
  SELECT p.query_id, a.neighbor_id, {V.sql_dot('p.qn', 'a.nv', EMBED_DIM)} AS cos_sim
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
  WHERE a.neighbor_id != p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rnk AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rnk <= {ANN_K}
ORDER BY query_id, rank
"""


def _oracle_embedding_near_dup() -> str:
    """Mirrors the multi-table RP-LSH candidate generation bit-for-bit
    (same deterministic hyperplanes), then the same normalized-dot verify."""
    table_selects = "\nUNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{_sql_rp_bucket('embedding', similarity.rp_hyperplanes(NEAR_DUP_PLANES, EMBED_DIM, NEAR_DUP_SEED + t))} AS bucket "
        f"FROM embeddings"
        for t in range(NEAR_DUP_TABLES)
    )
    cos = V.sql_dot("va.nv", "vb.nv", EMBED_DIM)
    return f"""
WITH nemb AS (
  SELECT vec_id, {V.sql_normalize('embedding', EMBED_DIM)} AS nv FROM embeddings
), tabled AS (
{table_selects}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM tabled a JOIN tabled b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, {cos} AS cos_sim
FROM cand
JOIN nemb va ON cand.id_a = va.vec_id
JOIN nemb vb ON cand.id_b = vb.vec_id
WHERE {cos} >= {NEAR_DUP_COS}
ORDER BY id_a, id_b
"""


def _oracle_lang_id() -> str:
    langs = sorted(TX.LANG_STOPWORDS)
    score_exprs = {
        lang: f"len(list_intersect(list_distinct(toks), {TX.sql_string_array_literal(TX.LANG_STOPWORDS[lang])}))"
        for lang in langs
    }
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    selects = ", ".join(f"{e} AS s_{lang}" for lang, e in score_exprs.items())
    return f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), scored AS (
  SELECT doc_id, {selects} FROM toks
), best AS (
  SELECT doc_id, {greatest} AS best, * FROM scored
)
SELECT doc_id, {case} AS pred_lang, CAST(best AS INTEGER) AS lang_score
FROM best ORDER BY doc_id
"""


def _oracle_text_quality() -> str:
    stop = TX.sql_string_array_literal(TX.QUALITY_STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, trim(lower(text)) AS t, {_sql_toks()} AS toks FROM documents
), feat AS (
  SELECT doc_id,
         length(t) AS n_chars,
         len(toks) AS n_tokens,
         length(t) - length(regexp_replace(t, '[^\\w\\s]', '', 'g')) AS n_punct,
         len(list_filter(toks, x -> list_contains({stop}, x))) AS n_stop,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars
  FROM base
), ratios AS (
  SELECT doc_id, n_chars, n_tokens,
         round(CAST(tok_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS avg_token_len,
         round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
         round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio
  FROM feat
)
SELECT doc_id, CAST(n_chars AS INTEGER) AS n_chars, CAST(n_tokens AS INTEGER) AS n_tokens,
       avg_token_len, punct_ratio, stopword_ratio,
       round(least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.4
             + stopword_ratio * 0.4
             + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.2, 4) AS quality
FROM ratios ORDER BY doc_id
"""


def _oracle_token_counts() -> str:
    return f"""
SELECT doc_id,
       CAST(len({_sql_toks('text')}) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(trim(lower(text)), '{text_analysis.BPE_TOKEN_RE}')) AS INTEGER) AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def _oracle_repetition_stats() -> str:
    return f"""
WITH t AS (
  -- CASE: a NULL text must yield NULL gram stats like Spark's
  -- size(NULL array); DuckDB's shingle expression over a NULL token list
  -- degenerates to [NULL] and list_distinct drops NULLs, so guard here
  SELECT doc_id, {_sql_toks()} AS toks,
         CASE WHEN text IS NULL THEN NULL
              ELSE {TX.sql_word_shingles(_sql_toks(), 2)} END AS grams
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
       CAST(len(grams) AS INTEGER) AS n_2grams,
       CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct_2grams,
       round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1), 4)
         AS dup_token_ratio,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / greatest(len(grams), 1), 4)
         AS dup_2gram_ratio
FROM t ORDER BY doc_id
"""


def _oracle_text_prep() -> str:
    """Mirror of q_text_prep stage for stage: hash split -> train-side
    13-gram decontamination -> chunking of clean train docs -> top-1
    TF-IDF term over the clean train corpus, LEFT-joined onto the chunks."""
    split_bucket = H.sql_h48(f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN ({split_bucket} % 100) < {SPLIT_TRAIN_PCT}
              THEN 'train' ELSE 'test' END AS split
  FROM documents
), shingled AS (
  SELECT doc_id, split, {H.sql_h48('s.s')} AS h
  FROM (SELECT doc_id, split,
               list_distinct({TX.sql_word_shingles(_sql_toks(), DECON_SHINGLE_N)}) AS sh
        FROM base) b, UNNEST(sh) AS s(s)
), test_h AS (
  SELECT DISTINCT h FROM shingled WHERE split = 'test'
), contaminated AS (
  SELECT DISTINCT doc_id FROM shingled JOIN test_h USING (h) WHERE split = 'train'
), clean AS (
  SELECT doc_id, text FROM base
  WHERE split = 'train' AND doc_id NOT IN (SELECT doc_id FROM contaminated)
), toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM clean
), chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         array_to_string(toks[CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT)
                              : CAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS BIGINT)],
                         ' ') AS chunk_text,
         CAST(len(toks[CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT)
                       : CAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS BIGINT)]) AS INTEGER)
           AS n_tokens
  FROM toks, UNNEST(range(0, greatest(len(toks) - 1, 0) // {CHUNK_STRIDE} + 1)) AS t(i)
), terms AS (
  SELECT doc_id, unnest({_sql_toks()}) AS term FROM clean
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM clean
), top1 AS (
  SELECT doc_id, term AS top_term, score_micro AS top_score_micro FROM (
    SELECT tf.doc_id, tf.term,
           CAST(tf.tf * 1000000 * (n.n_docs + 1) // (dfreq.df + 1) AS BIGINT)
             AS score_micro,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY tf.tf * 1000000 * (n.n_docs + 1) // (dfreq.df + 1) DESC,
                                       tf.term) AS rnk
    FROM tf JOIN dfreq USING (term), n
  ) WHERE rnk = 1
)
SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens,
       t.top_term, t.top_score_micro
FROM chunks c LEFT JOIN top1 t USING (doc_id)
ORDER BY c.doc_id, c.chunk_idx
"""


def _oracle_text_profile() -> str:
    """Join of the quality / token-count / repetition / lang-ID oracles on
    doc_id — mirrors the one-pass Spark text_profile column for column.
    (The Spark side is a single projection; the oracle's joins are fine at
    oracle scale.)"""
    return f"""
SELECT q.doc_id, q.n_chars, q.n_tokens, q.avg_token_len, q.punct_ratio,
       q.stopword_ratio, q.quality, t.ws_tokens, t.bpe_tokens,
       r.n_distinct_tokens, r.n_2grams, r.n_distinct_2grams,
       r.dup_token_ratio, r.dup_2gram_ratio,
       l.pred_lang, l.lang_score
FROM ({_oracle_text_quality()}) q
JOIN ({_oracle_token_counts()}) t USING (doc_id)
JOIN ({_oracle_repetition_stats()}) r USING (doc_id)
JOIN ({_oracle_lang_id()}) l USING (doc_id)
ORDER BY q.doc_id
"""


def _funnel_oracle() -> str:
    """Window-function mirror of the funnel fold: v_start / c_start are the
    DP's acc[0] / acc[1] (max chain-start among already-processed rows —
    the ROWS ... 1 PRECEDING frame over the same tick order), so the flags
    are exactly the fold's firing conditions.  No joins: one sort per user
    inside DuckDB's window executor."""
    w_us = FUNNEL_WINDOW_S * 1_000_000
    step_case = (
        "CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END"
    )
    return f"""
WITH ev AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) * 8 + {step_case} AS tick
  FROM events WHERE event_type IN ('view','click','purchase')
), w1 AS (
  SELECT u, tick, tick % 8 AS step, tick // 8 AS us,
         max(CASE WHEN tick % 8 = 0 THEN tick // 8 END)
           OVER (PARTITION BY u ORDER BY tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_start
  FROM ev
), w2 AS (
  SELECT u, step, us, v_start,
         max(CASE WHEN step = 1 AND v_start IS NOT NULL
                       AND us - v_start <= {w_us} THEN v_start END)
           OVER (PARTITION BY u ORDER BY tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_start
  FROM w1
), per_user AS (
  SELECT u,
         max(CASE WHEN step = 0 THEN 1 ELSE 0 END) AS l1,
         max(CASE WHEN step = 1 AND v_start IS NOT NULL
                       AND us - v_start <= {w_us} THEN 1 ELSE 0 END) AS l2,
         max(CASE WHEN step = 2 AND c_start IS NOT NULL
                       AND us - c_start <= {w_us} THEN 1 ELSE 0 END) AS l3
  FROM w2 GROUP BY u
)
SELECT funnel_level, n_reached FROM (
  SELECT 1 AS funnel_level, CAST(coalesce(sum(l1), 0) AS BIGINT) AS n_reached FROM per_user
  UNION ALL
  SELECT 2, CAST(coalesce(sum(l2), 0) AS BIGINT) FROM per_user
  UNION ALL
  SELECT 3, CAST(coalesce(sum(l3), 0) AS BIGINT) FROM per_user
) ORDER BY funnel_level
"""


def _retention_oracle() -> str:
    flags = ",\n         ".join(
        f"max(CASE WHEN CAST(ts AS DATE) = DATE '{RETENTION_DAY0}' + {o} "
        f"THEN 1 ELSE 0 END) AS a{i}"
        for i, o in enumerate(RETENTION_OFFSETS)
    )
    rows = "\n  UNION ALL ".join(
        f"SELECT {o} AS day_offset, CAST(coalesce(sum(a{i}), 0) AS BIGINT) AS retained,"
        f" CAST(count(*) AS BIGINT) AS cohort_size FROM cohort"
        for i, o in enumerate(RETENTION_OFFSETS)
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         {flags}
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), cohort AS (
  SELECT * FROM per_user WHERE a0 = 1
)
SELECT day_offset, retained, cohort_size FROM (
  {rows}
) ORDER BY day_offset
"""


def _passage_dedup_oracle() -> str:
    n = PASSAGE_WORDS
    return f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), occ AS (
  SELECT doc_id, CAST(i AS INTEGER) AS cpos,
         array_to_string(toks[CAST(i * {n} + 1 AS BIGINT)
                              : CAST(i * {n} + {n} AS BIGINT)], ' ') AS ctext
  FROM toks, UNNEST(range(0, greatest(len(toks) - 1, 0) // {n} + 1)) AS t(i)
), h AS (
  SELECT doc_id, cpos, ctext,
         {H.sql_h48("ctext")} AS chash,
         doc_id * 1048576 + cpos AS occ_key
  FROM occ
), firsts AS (
  -- first_text mirrors the engine's h48-collision guard: a distinct
  -- passage colliding with an earlier hash is kept, never dropped
  SELECT chash, min(occ_key) AS first_key,
         arg_min(ctext, occ_key) AS first_text
  FROM h GROUP BY chash
), kept AS (
  SELECT h.* FROM h JOIN firsts USING (chash)
  WHERE occ_key = first_key OR ctext <> first_text
), nch AS (
  SELECT doc_id, count(*) AS n_chunks FROM occ GROUP BY doc_id
)
SELECT k.doc_id, CAST(n.n_chunks AS INTEGER) AS n_chunks,
       CAST(count(*) AS INTEGER) AS n_kept,
       string_agg(ctext, ' ' ORDER BY cpos) AS kept_text
FROM kept k JOIN nch n USING (doc_id)
GROUP BY k.doc_id, n.n_chunks ORDER BY doc_id
"""


def _substring_dedup_oracle() -> str:
    w = SUBSTR_WINDOW
    return f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), occ AS (
  SELECT doc_id, CAST(i AS INTEGER) AS wpos,
         array_to_string(toks[CAST(i + 1 AS BIGINT) : CAST(i + {w} AS BIGINT)], ' ') AS wtext
  FROM toks, UNNEST(range(0, greatest(len(toks) - {w} + 1, 0))) AS t(i)
), h AS (
  SELECT doc_id, wpos, wtext, {H.sql_h48("wtext")} AS whash,
         doc_id * 1048576 + wpos AS occ_key
  FROM occ
), firsts AS (
  -- first_text mirrors the engine's h48-collision guard: a later window is
  -- removed only when its text EQUALS the first occurrence's, so a distinct
  -- window colliding with an earlier hash is kept, never destroyed
  SELECT whash, min(occ_key) AS first_key, arg_min(wtext, occ_key) AS first_text
  FROM h GROUP BY whash
), dupw AS (
  SELECT h.doc_id, h.wpos FROM h JOIN firsts USING (whash)
  WHERE occ_key <> first_key AND wtext = first_text
), tok AS (
  SELECT doc_id, CAST(i AS INTEGER) AS ti, toks[CAST(i + 1 AS BIGINT)] AS tok,
         len(toks) AS n_tokens
  FROM toks, UNNEST(range(0, len(toks))) AS t(i)
), removed AS (
  -- the engine merges duplicated windows into disjoint spans and folds a
  -- cursor over them; covered-token identity is the same either way
  SELECT DISTINCT t.doc_id, t.ti
  FROM tok t JOIN dupw d
    ON t.doc_id = d.doc_id AND t.ti >= d.wpos AND t.ti < d.wpos + {w}
)
SELECT t.doc_id,
       CAST(max(t.n_tokens) AS INTEGER) AS n_tokens,
       CAST(count(r.ti) AS INTEGER) AS n_dup_tokens,
       coalesce(string_agg(CASE WHEN r.ti IS NULL THEN t.tok END, ' ' ORDER BY t.ti), '') AS kept_text
FROM tok t LEFT JOIN removed r ON t.doc_id = r.doc_id AND t.ti = r.ti
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def _all_oracles() -> dict[str, str]:
    minhash_sql = _oracle_minhash_lsh()
    sqls = {
        "replacing_latest": """
SELECT user_id, event_id AS last_event_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
""",
        "replacing_deletes": """
SELECT user_id, event_id AS last_event_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id
""",
        "collapsing_balance": """
SELECT user_id, CAST(count(*) AS INTEGER) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS balance_cents
FROM events GROUP BY user_id ORDER BY user_id
""",
        "ttl_cleanup": f"""
SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events WHERE ts >= TIMESTAMP '{TTL_CUTOFF}'
GROUP BY day ORDER BY day
""",
        "funnel_levels": _funnel_oracle(),
        # greedy earliest-match fold mirrored with DuckDB's list_reduce
        # (init element prepended; acc = [pointer, count] BIGINT pair)
        "sequence_match_time": """
WITH ev AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) AS us,
         CASE event_type WHEN 'view' THEN 0
                         WHEN 'click' THEN 1 ELSE 2 END AS step
  FROM events WHERE event_type IN ('view','click','purchase')
), c1 AS (
  SELECT DISTINCT u FROM ev WHERE step = 0
), c2 AS (
  -- tick order: step 0 < step 1 at equal ts, so a.us <= b.us suffices
  SELECT DISTINCT a.u
  FROM ev a JOIN ev b ON a.u = b.u
  WHERE a.step = 0 AND b.step = 1
    AND a.us <= b.us AND b.us - a.us <= 3600000000
), c3 AS (
  SELECT DISTINCT a.u
  FROM ev a JOIN ev b ON a.u = b.u JOIN ev c ON b.u = c.u
  WHERE a.step = 0 AND b.step = 1 AND c.step = 2
    AND a.us <= b.us AND b.us - a.us <= 3600000000
    AND b.us <= c.us AND c.us - b.us <= 7200000000
)
SELECT u AS user_id,
       CAST(CASE WHEN u IN (SELECT u FROM c3) THEN 3
                 WHEN u IN (SELECT u FROM c2) THEN 2
                 ELSE 1 END AS INTEGER) AS seq_level
FROM c1 ORDER BY user_id
""",
        "sequence_count": f"""
WITH ev AS (
  SELECT DISTINCT user_id AS u,
         epoch_us(ts) * 8 + CASE event_type WHEN 'view' THEN 0
                                            WHEN 'click' THEN 1 ELSE 2 END AS tick
  FROM events WHERE event_type IN ('view','click','purchase')
), seqs AS (
  SELECT u, list(tick ORDER BY tick) AS ticks FROM ev GROUP BY u
), folded AS (
  SELECT u, list_reduce(
    list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                 list_transform(ticks, t -> [t % 8, CAST(0 AS BIGINT)])),
    (acc, x) -> CASE
        WHEN (CASE WHEN x[1] = acc[1] THEN acc[1] + 1 ELSE acc[1] END) = 3
        THEN [CAST(0 AS BIGINT), acc[2] + 1]
        ELSE [CASE WHEN x[1] = acc[1] THEN acc[1] + 1 ELSE acc[1] END, acc[2]]
      END) AS r
  FROM seqs
)
SELECT u AS user_id, r[2] AS n_matches FROM folded
WHERE r[2] >= 1 ORDER BY user_id
""",
        "retention_cohort": _retention_oracle(),
        "top_users_sketch": f"""
SELECT CAST(user_id AS VARCHAR) AS value,
       count(*) AS count_lb, count(*) AS count_ub
FROM events GROUP BY user_id
ORDER BY count_lb DESC, value ASC LIMIT {TOPK_K}
""",
        "top_users_weighted": f"""
WITH w AS (
  -- uval, not "value": the events table has its own value column and a
  -- same-named lateral alias would be ambiguous
  SELECT CAST(user_id AS VARCHAR) AS uval,
         CAST(round(value * 100) AS BIGINT) AS w
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
)
SELECT uval AS value,
       CAST(sum(w) AS BIGINT) AS count_lb, CAST(sum(w) AS BIGINT) AS count_ub
FROM w WHERE w > 0 GROUP BY uval
ORDER BY count_lb DESC, value ASC LIMIT {TOPK_K}
""",
        "passage_dedup": _passage_dedup_oracle(),
        "substring_dedup": _substring_dedup_oracle(),
        "unigram_rarity": f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), occ AS (
  SELECT doc_id, toks[CAST(i + 1 AS BIGINT)] AS tok
  FROM toks, UNNEST(range(0, len(toks))) AS t(i)
), vocab AS (
  SELECT tok, count(*) AS df FROM occ GROUP BY tok
), tot AS (
  SELECT sum(df) AS total FROM vocab
), mass AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
         CAST(sum(CAST(floor(CAST(total AS DOUBLE) / df) AS BIGINT))
              AS BIGINT) AS rarity_mass
  FROM occ JOIN vocab USING (tok) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, rarity_mass,
       round(CAST(rarity_mass AS DOUBLE) / n_tokens, 4) AS avg_rarity
FROM mass ORDER BY doc_id
""",
        "quality_classifier": f"""
WITH base AS (
  SELECT doc_id, {_sql_toks("coalesce(text, '')")} AS toks FROM documents
), f AS (
  SELECT doc_id, list_concat(toks, {TX.sql_word_shingles("toks", 2)}) AS feats
  FROM base
), scored AS (
  SELECT doc_id, CAST(len(feats) AS INTEGER) AS n_features,
         CAST(coalesce(list_sum(list_transform(feats, x ->
           {H.sql_h48(f"'qw:' || CAST(({H.sql_h48('x')} % {text_analysis.QC_BUCKETS}) AS VARCHAR)")}
             % {2 * text_analysis.QC_WEIGHT_SPAN + 1} - {text_analysis.QC_WEIGHT_SPAN}
         )), 0) AS BIGINT) AS weight_sum
  FROM f
)
SELECT doc_id, n_features, weight_sum,
       round(CAST(weight_sum AS DOUBLE) / n_features, 4) AS avg_weight,
       (weight_sum * 1000 >= {text_analysis.QC_TAU_MILLIS} * n_features) AS keep
FROM scored ORDER BY doc_id
""",
        "cluster_representatives": f"""
WITH clusters AS (
  SELECT * FROM ({_oracle_dedup_clusters()})
), qc AS (
  SELECT doc_id, ((ws + 1000*nf) * 1000 // nf) AS score_milli
  FROM (
    SELECT doc_id, CAST(len(feats) AS INTEGER) AS nf,
           CAST(coalesce(list_sum(list_transform(feats, x ->
             {H.sql_h48(f"'qw:' || CAST(({H.sql_h48('x')} % {text_analysis.QC_BUCKETS}) AS VARCHAR)")}
               % {2 * text_analysis.QC_WEIGHT_SPAN + 1} - {text_analysis.QC_WEIGHT_SPAN}
           )), 0) AS BIGINT) AS ws
    FROM (
      SELECT doc_id, list_concat(toks, {TX.sql_word_shingles("toks", 2)}) AS feats
      FROM (SELECT doc_id, {_sql_toks("coalesce(text, '')")} AS toks FROM documents)
    )
  )
), j AS (
  SELECT c.cluster_id, c.doc_id, q.score_milli,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.score_milli DESC, c.doc_id) AS rn
  FROM clusters c JOIN qc q USING (doc_id)
)
SELECT cluster_id, doc_id AS rep_doc_id,
       CAST(cluster_size AS INTEGER) AS cluster_size,
       score_milli AS rep_score_milli
FROM j WHERE rn = 1 ORDER BY cluster_id
""",
        "phrase_search": f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks("coalesce(text, '')")} AS t FROM documents
), arms AS (
  {_sql_phrase_arms()}
)
SELECT CAST(phrase_id AS INTEGER) AS phrase_id, doc_id, n_matches
FROM arms WHERE n_matches > 0 ORDER BY phrase_id, doc_id
""",
        "pii_redact": _sql_pii_redact(),
        "margin_bitext": f"""
WITH q AS (
  SELECT vec_id AS src_id, {V.sql_normalize("embedding", EMBED_DIM)} AS qn
  FROM embeddings WHERE vec_id < {BITEXT_SRC_N}
), c AS (
  SELECT vec_id AS tgt_id, {V.sql_normalize("embedding", EMBED_DIM)} AS cn
  FROM embeddings WHERE vec_id >= {BITEXT_SRC_N}
), scored AS (
  SELECT src_id, tgt_id, {V.sql_dot('qn', 'cn', EMBED_DIM)} AS cos FROM c, q
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY src_id
                               ORDER BY cos DESC, tgt_id) AS rn FROM scored
), means AS (
  SELECT src_id, list_sum(list(cos ORDER BY rn)) / count(*) AS mean_src
  FROM ranked WHERE rn <= {BITEXT_K} GROUP BY src_id
), src_side AS (
  SELECT r.src_id, r.tgt_id, r.cos, m.mean_src
  FROM ranked r JOIN means m USING (src_id) WHERE r.rn <= {BITEXT_K}
), cand AS (
  SELECT DISTINCT tgt_id FROM src_side
), tscored AS (
  SELECT c.tgt_id, q.src_id, {V.sql_dot('qn', 'cn', EMBED_DIM)} AS cos
  FROM c JOIN cand USING (tgt_id), q
), tranked AS (
  SELECT *, row_number() OVER (PARTITION BY tgt_id
                               ORDER BY cos DESC, src_id) AS rn FROM tscored
), tmeans AS (
  SELECT tgt_id, list_sum(list(cos ORDER BY rn)) / count(*) AS mean_tgt
  FROM tranked WHERE rn <= {BITEXT_K} GROUP BY tgt_id
), margins AS (
  SELECT s.src_id, s.tgt_id, s.cos,
         s.cos / ((s.mean_src + t.mean_tgt) / 2) AS margin
  FROM src_side s JOIN tmeans t USING (tgt_id)
), best AS (
  SELECT *, row_number() OVER (PARTITION BY src_id
                               ORDER BY margin DESC, tgt_id) AS rn2
  FROM margins
)
SELECT src_id, tgt_id, cos AS cos_sim, margin,
       margin >= {BITEXT_THRESHOLD} AS mined
FROM best WHERE rn2 = 1 ORDER BY src_id
""",
        "pair_cosine_filter": f"""
WITH n AS (
  SELECT vec_id,
         {V.sql_normalize("embedding", EMBED_DIM)} AS na,
         {V.sql_normalize("list_reverse(embedding)", EMBED_DIM)} AS nb
  FROM embeddings
)
SELECT vec_id, {V.sql_dot("na", "nb", EMBED_DIM)} AS pair_cos,
       coalesce({V.sql_dot("na", "nb", EMBED_DIM)} >= {PAIR_COS_THRESHOLD}, false) AS keep
FROM n ORDER BY vec_id
""",
        "diverse_sample": f"""
WITH {_sql_ivf_quantizer('vec_id', "greatest(1, CAST(floor(sqrt(CAST((SELECT count(*) FROM embeddings) AS DOUBLE))) AS BIGINT))")},
ranked AS (
  SELECT cent_id, vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY cent_id
           ORDER BY {H.sql_h48("'divs:' || CAST(vec_id AS VARCHAR)")}, vec_id
         ) AS strat_rank
  FROM assign
)
SELECT cent_id, vec_id, strat_rank FROM ranked
WHERE strat_rank <= {DIVERSE_N_PER_CELL}
ORDER BY cent_id, strat_rank
""",
        "bigram_rarity": f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS t FROM documents
), occ AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
), uni AS (
  SELECT tok, count(*) AS c_uni FROM occ GROUP BY tok
), total AS (
  SELECT CAST(sum(c_uni) AS BIGINT) AS tt FROM uni
), pairs AS (
  SELECT doc_id, t[i] AS prev, t[i+1] AS cur
  FROM toks, unnest(range(1, len(t))) AS u(i)
), bg AS (
  SELECT prev, cur, count(*) AS c_bg FROM pairs GROUP BY prev, cur
), enr AS (
  SELECT bg.prev, bg.cur, bg.c_bg, up.c_uni AS c_prev, uc.c_uni AS c_cur
  FROM bg JOIN uni up ON bg.prev = up.tok JOIN uni uc ON bg.cur = uc.tok
), scored AS (
  SELECT p.doc_id,
         (2 * CAST(e.c_prev AS HUGEINT) * t.tt)
           // (CAST(e.c_bg AS HUGEINT) * t.tt + CAST(e.c_cur AS HUGEINT) * e.c_prev)
           AS contrib
  FROM pairs p JOIN enr e USING (prev, cur), total t
)
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
       CAST(sum(contrib) AS BIGINT) AS bigram_mass,
       round(CAST(sum(contrib) AS DOUBLE) / count(*), 4) AS avg_rarity
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
        "dsir_select": f"""
WITH base AS (
  SELECT doc_id, {_sql_toks("coalesce(text, '')")} AS toks FROM documents
), f AS (
  SELECT doc_id, list_concat(toks, {TX.sql_word_shingles("toks", 2)}) AS feats
  FROM base
), scored AS (
  SELECT doc_id, CAST(len(feats) AS INTEGER) AS n_features,
         CAST(coalesce(list_sum(list_transform(feats, x ->
           {H.sql_h48(f"'dw:' || CAST(({H.sql_h48('x')} % {text_analysis.QC_BUCKETS}) AS VARCHAR)")}
             % {2 * text_analysis.DSIR_WEIGHT_SPAN + 1} - {text_analysis.DSIR_WEIGHT_SPAN}
         )), 0) AS BIGINT) AS weight_millis
  FROM f
)
SELECT doc_id, n_features, weight_millis
FROM scored ORDER BY weight_millis DESC, doc_id LIMIT {DSIR_K}
""",
        "semantic_dedup": _oracle_semantic_dedup(),
        # same answer shape and semantics as the gated batch funnel — the
        # stream must land on the identical cumulative report
        "stream_funnel": _funnel_oracle(),
        "stream_topk": f"""
SELECT CAST(user_id AS VARCHAR) AS value,
       count(*) AS count_lb, count(*) AS count_ub
FROM events GROUP BY user_id
ORDER BY count_lb DESC, value ASC LIMIT {TOPK_K}
""",
        # the drained sample must equal the batch statement of the same
        # bottom-k-by-hash sketch over the whole feed
        "stream_sample": f"""
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         {H.sql_h48("'sample:' || CAST(event_id AS VARCHAR)")} AS rank
  FROM events ORDER BY rank, event_id LIMIT {SAMPLE_K}
) ORDER BY event_id
""",
        "snapshot_changelog": f"""
WITH old AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events WHERE ts < TIMESTAMP '{EVENTS_CUTOFF}' GROUP BY user_id
), new AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, value_cents, sign FROM (
  SELECT *, 1 AS sign FROM (SELECT * FROM new EXCEPT ALL SELECT * FROM old)
  UNION ALL
  SELECT *, -1 AS sign FROM (SELECT * FROM old EXCEPT ALL SELECT * FROM new)
) ORDER BY user_id, sign
""",
        "q7_nation_trade": """
SELECT supp_nation, cust_nation, l_year,
       CAST(CAST(sum(vol_u4) AS DOUBLE) / 10000.0 AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol_u4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
        "q8_market_share": """
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol_u4 ELSE 0 END) AS DOUBLE)
             / CAST(sum(vol_u4) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year, n2.n_name AS supp_nation,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol_u4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
)
GROUP BY o_year ORDER BY o_year
""",
        "q2_min_cost_supplier": """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), costs AS (
  SELECT p.p_partkey, p.p_name, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name,
         min(CAST(floor((CAST(round(l.l_extendedprice * 100) AS BIGINT) * 100)
                        / CAST(l.l_quantity AS BIGINT)) AS BIGINT)) AS cost_c4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
   AND p.p_size IN (5, 15, 25, 35, 45)
  JOIN eu_supp e ON l.l_suppkey = e.s_suppkey
  GROUP BY ALL
), best AS (
  SELECT p_partkey AS bp, min(cost_c4) AS best_c4 FROM costs GROUP BY p_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(cost_c4 AS DOUBLE) / 10000.0 AS unit_cost
FROM costs JOIN best ON p_partkey = bp AND cost_c4 = best_c4
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
""",
        "q9_profit_by_nation_year": """
SELECT nation, o_year,
       CAST(CAST(sum(vol_u4) AS DOUBLE) / 10000.0 AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol_u4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
)
GROUP BY nation, o_year ORDER BY nation, o_year DESC
""",
        "q11_important_parts": """
WITH scoped AS (
  SELECT l.l_partkey,
         CAST(l.l_quantity AS BIGINT)
           * CAST(round(l.l_extendedprice * 100) AS BIGINT) AS val_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_1'
), per_part AS (
  SELECT l_partkey, sum(val_c) AS value_c FROM scoped GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(CAST(value_c AS DOUBLE) / 100.0 AS DOUBLE) AS value
FROM per_part
WHERE value_c * 500 > (SELECT sum(val_c) FROM scoped)
ORDER BY value DESC, p_partkey
""",
        "q12_late_shipment_priority": """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY l.l_linestatus ORDER BY l.l_linestatus
""",
        "q13_customer_order_distribution": """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, o_orderkey FROM orders
    WHERE o_orderpriority <> '4-NOT SPECIFIED'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
""",
        "q14_promo_revenue": """
SELECT round(100.0
         * CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol_u4 ELSE 0 END) AS DOUBLE)
         / CAST(sum(vol_u4) AS DOUBLE), 6) AS promo_revenue_pct
FROM (
  SELECT p.p_type,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol_u4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
    AND l.l_shipdate < TIMESTAMP '1996-04-01'
)
""",
        "q15_top_supplier": """
WITH revenue AS (
  SELECT l_suppkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_u4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(CAST(rev_u4 AS DOUBLE) / 10000.0 AS DOUBLE) AS total_revenue
FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE rev_u4 = (SELECT max(rev_u4) FROM revenue)
ORDER BY s.s_suppkey
""",
        "q16_supplier_count_by_part": """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
 AND p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
        "q18_large_volume_customers": """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(big.order_qty AS DOUBLE) AS total_qty
FROM orders o
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS order_qty FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
""",
        "q19_discounted_revenue": """
SELECT CAST(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
            / 10000.0 AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30 AND l.l_quantity BETWEEN 20 AND 30)
""",
        "q20_promo_part_suppliers": """
SELECT s.s_name, s.s_suppkey
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey HAVING sum(l.l_quantity) > 400
)
AND s.s_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
)
ORDER BY s.s_name
""",
        "q21_suppliers_kept_waiting": """
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY l_orderkey
)
SELECT s.s_name, count(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late) w
JOIN per_order ON w.l_orderkey = ok AND n_supp > 1 AND n_late_supp = 1
JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
        "q22_global_sales_opportunity": """
WITH stats AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c, count(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name AS cntrycode, count(*) AS numcust,
       CAST(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS DOUBLE)
         AS totacctbal
FROM customer c, stats
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * cnt > sum_c
  AND c.c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY n.n_name ORDER BY cntrycode
""",
        "projection_routing": """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events WHERE user_id < 30
GROUP BY user_id ORDER BY user_id
""",
        "extract_typed_events": """
SELECT event_id, ts, user_id, event_type, value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
        "count_events": "SELECT count(*) AS n_events FROM events",
        "value_by_type": """
SELECT event_type, CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value, count(*) AS n_events
FROM events GROUP BY event_type ORDER BY total_value DESC
""",
        "events_limit_by": """
WITH r AS (
  SELECT event_type, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY ts DESC, event_id DESC)
              AS INTEGER) AS rn
  FROM events
)
SELECT event_type, event_id, ts, value_cents, rn
FROM r WHERE rn <= 2 ORDER BY event_type, rn
""",
        "value_by_type_totals": """
SELECT event_type, CAST(grouping(event_type) AS INTEGER) AS is_total,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events GROUP BY ROLLUP (event_type)
ORDER BY is_total, total_value DESC, event_type
""",
        "latest_event": """
SELECT event_id, ts, event_type, value FROM events
ORDER BY ts DESC, event_id DESC LIMIT 1
""",
        "events_after": f"""
SELECT event_id, ts, event_type, value FROM events
WHERE ts >= TIMESTAMP '{EVENTS_CUTOFF}'
""",
        "attendance_granular": """
SELECT date_trunc('hour', ts) AS ts_hour, event_type, count(*) AS student_count
FROM events GROUP BY 1, 2
""",
        "attendance_daily_merged": """
WITH g AS (
  SELECT date_trunc('hour', ts) AS ts_hour, event_type, count(*) AS student_count
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('day', ts_hour) AS TIMESTAMP) AS day, event_type,
       max(student_count) AS max_students,
       min(student_count) AS min_students,
       round(avg(student_count), 4) AS avg_students
FROM g GROUP BY 1, 2 ORDER BY day, event_type
""",
        "user_activity": """
SELECT user_id, count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY user_id ORDER BY user_id
""",
        "type_user_stats": """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY event_type ORDER BY event_type
""",
        # Exact oracle is VALID at gate scale (VERDICT r4 #7): DataSketches
        # HLL stays in exact coupon (LIST/SET) mode until ~512 distinct
        # values per sketch, and sf0.01 has 150 users per type, so
        # uniqMerge's estimate IS the true distinct count there — verified
        # bit-exact locally.  At production cardinalities the operator is
        # approximate by design; that contract (error bound vs exact) is
        # what tests/test_approx_sketches.py asserts.
        "uniq_users_approx": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS approx_uniq_users
FROM events GROUP BY event_type ORDER BY event_type
""",
        "entry_house_points": """
WITH e AS (
  -- pmod mirror of the synth producer (total on negative inputs too)
  SELECT CASE ((user_id % 4) + 4) % 4
              WHEN 0 THEN 'Gryffindor' WHEN 1 THEN 'Hufflepuff'
              WHEN 2 THEN 'Ravenclaw' ELSE 'Slytherin' END AS house,
         ((CAST(floor(value) AS BIGINT) % 11) + 11) % 11 - 5 AS points
  FROM events
)
SELECT house, CAST(sum(points) AS BIGINT) AS house_points, count(*) AS n_entries
FROM e GROUP BY house ORDER BY house_points DESC, house
""",
        "entry_attendance": """
SELECT make_timestamp(epoch_ms(ts) * 1000) AS timestamp, event_type AS subject,
       count(*) AS n_students
FROM events GROUP BY 1, 2 ORDER BY timestamp, subject
""",
        "events_preview": """
SELECT * FROM events ORDER BY event_id LIMIT 20
""",
        "mv_cascade_attendance": """
SELECT make_timestamp(epoch_ms(ts) * 1000) AS timestamp, event_type AS subject,
       count(*) AS n_students
FROM events GROUP BY 1, 2 ORDER BY timestamp, subject
""",
        "stream_dedup": """
SELECT * FROM events ORDER BY event_id
""",
        "sql_busy_days": """
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n_events
FROM events
GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
HAVING count(*) >= 50
ORDER BY event_type, day
""",
        "attendance_daily_compacted": """
WITH g AS (
  SELECT date_trunc('hour', ts) AS ts_hour, event_type, count(*) AS student_count
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('day', ts_hour) AS TIMESTAMP) AS day, event_type,
       max(student_count) AS max_students,
       min(student_count) AS min_students,
       round(avg(student_count), 4) AS avg_students
FROM g GROUP BY 1, 2 ORDER BY day, event_type
""",
        "mv_cascade_daily": """
WITH g AS (
  SELECT date_trunc('hour', ts) AS ts_hour, event_type, count(*) AS student_count
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('day', ts_hour) AS TIMESTAMP) AS day, event_type,
       max(student_count) AS max_students,
       min(student_count) AS min_students,
       round(avg(student_count), 4) AS avg_students
FROM g GROUP BY 1, 2 ORDER BY day, event_type
""",
        "show_tables": "SELECT name FROM (VALUES "
        + ", ".join(f"('{t}')" for t in sorted(TESTDATA_TABLES))
        + ") AS t(name) ORDER BY name",
        "q1_pricing_summary": f"""
-- integer-cents mirror of the Spark side: exact scaled-integer products,
-- BIGINT sums widen to HUGEINT (exact), nearest-double of the same exact
-- integer on both engines
WITH c AS (
  SELECT l_returnflag, l_linestatus, l_quantity,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_c
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
)
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sum(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0 AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(CAST(sum(price_c) AS DOUBLE) / 100.0 / count(*), 4) AS avg_price,
       round(CAST(sum(disc_c) AS DOUBLE) / 100.0 / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM c GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
        "q3_shipping_priority": f"""
SELECT l_orderkey, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
        "q5_local_supplier_volume": f"""
SELECT n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{Q5_START}' AND o_orderdate < TIMESTAMP '{Q5_END}'
GROUP BY n_name ORDER BY revenue DESC, n_name
""",
        "q6_forecast_revenue": f"""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q5_START}' AND l_shipdate < TIMESTAMP '{Q5_END}'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
        "user_sessions": """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 30 * 60 * 1000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  -- CAST: DuckDB types this windowed sum HUGEINT (int128), which pandas
  -- degrades to float64 — the exact r02 hash-mismatch; BIGINT matches
  -- Spark's long bit-for-bit through any canonicalization
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS session_idx
  FROM marked
)
SELECT user_id, session_idx, count(*) AS n_events,
       epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx
""",
        "q4_order_priority": f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q5_START}'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        "customers_no_orders": f"""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '{Q5_START}' AND o_orderdate < TIMESTAMP '{Q5_END}'
)
ORDER BY c_custkey
""",
        "value_percentiles": """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75
FROM events GROUP BY event_type ORDER BY event_type
""",
        "daily_big_values_filled": f"""
WITH bounds AS (
  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
), days AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events WHERE value > {FILL_MIN_VALUE} GROUP BY 1
)
SELECT days.day AS day, CAST(coalesce(n_events, 0) AS BIGINT) AS n_events
FROM days LEFT JOIN daily ON days.day = daily.day
ORDER BY days.day
""",
        "click_purchase_users": """
WITH c AS (
  SELECT user_id AS c_user, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
), p AS (
  SELECT user_id AS p_user, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT coalesce(c_user, p_user) AS user_id,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_purchases, 0) AS n_purchases
FROM c FULL OUTER JOIN p ON c_user = p_user
ORDER BY user_id
""",
        "q17_small_quantity_revenue": """
WITH brand_items AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), t AS (
  SELECT l_partkey AS t_partkey, avg(l_quantity) * 0.2 AS qty_threshold
  FROM brand_items GROUP BY 1
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM brand_items JOIN t ON l_partkey = t_partkey
WHERE l_quantity < qty_threshold
""",
        "purchase_gaps": """
SELECT event_id, user_id,
       epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS ms_since_prev,
       lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS ms_to_next
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
        "user_cumulative_value": """
SELECT event_id, user_id, ts,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS cum_value,
       epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS ms_since_prev,
       lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS ms_to_next
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""",
        "value_histogram": """
SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
FROM events GROUP BY bucket ORDER BY bucket
""",
        "user_event_sequence": """
SELECT user_id,
       array_to_string(list(event_type ORDER BY ts, event_id), '|') AS seq_types,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
""",
        "user_set_ops": """
SELECT 'repeat' AS set_op, user_id FROM (
  SELECT user_id FROM events WHERE date_part('day', ts) <= 7
  INTERSECT
  SELECT user_id FROM events WHERE date_part('day', ts) >= 22
)
UNION ALL
SELECT 'churned' AS set_op, user_id FROM (
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND date_part('day', ts) <= 7
  EXCEPT
  SELECT user_id FROM events
  WHERE event_type = 'purchase' AND date_part('day', ts) >= 22
)
ORDER BY set_op, user_id
""",
        "daily_type_rollup": """
SELECT CAST(ts AS DATE) AS day, event_type,
       count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (CAST(ts AS DATE), event_type)
ORDER BY day ASC NULLS FIRST, event_type ASC NULLS FIRST
""",
        "type_day_cube": """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(GROUPING(CAST(ts AS DATE), event_type) AS BIGINT) AS gid,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (CAST(ts AS DATE), event_type)
ORDER BY gid, day ASC NULLS FIRST, event_type ASC NULLS FIRST
""",
        "value_window_analytics": """
SELECT event_id, user_id, value_cents,
       round(percent_rank() OVER wv, 6) AS value_pct_rank,
       round(cume_dist() OVER wv, 6) AS value_cume_dist,
       CAST(ntile(4) OVER wv AS INTEGER) AS value_quartile,
       count(*) OVER wt AS n_events_1h,
       CAST(sum(value_cents) OVER wt AS BIGINT) AS sum_cents_1h
FROM (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         epoch_ms(ts) AS ts_ms
  FROM events
)
WINDOW wv AS (PARTITION BY user_id ORDER BY value_cents, event_id),
       wt AS (PARTITION BY user_id ORDER BY ts_ms
              RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
        "repeat_users": """
SELECT user_id FROM events WHERE date_part('day', ts) <= 7
INTERSECT
SELECT user_id FROM events WHERE date_part('day', ts) >= 22
ORDER BY user_id
""",
        "churned_users": """
SELECT user_id FROM events
WHERE event_type = 'purchase' AND date_part('day', ts) <= 7
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND date_part('day', ts) >= 22
ORDER BY user_id
""",
        "asof_last_purchase": """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
""",
        "asof_next_error": """
WITH signups AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
), err AS (
  SELECT user_id, ts, max(value) AS error_value
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT s.event_id, s.user_id, s.ts, e.ts AS error_ts, e.error_value
FROM signups s ASOF JOIN err e
  ON s.user_id = e.user_id AND s.ts <= e.ts
ORDER BY s.event_id
""",
        "latest_value_per_user": """
WITH ranked AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_last,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS rn_first
  FROM events
)
SELECT user_id, max(ts) AS last_ts,
       max(CASE WHEN rn_last = 1 THEN value END) AS last_value,
       max(CASE WHEN rn_first = 1 THEN value END) AS first_value
FROM ranked GROUP BY user_id ORDER BY user_id
""",
        "corpus_curation": _oracle_corpus_curation(),
        "hash_sample": f"""
SELECT event_id, event_type, user_id FROM events
WHERE ({H.sql_h48(f"'{SAMPLE_SALT}' || CAST(event_id AS VARCHAR)")} % 100)
      < {SAMPLE_PCT}
ORDER BY event_id
""",
        "train_test_split": f"""
SELECT doc_id,
       CASE WHEN ({H.sql_h48(f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100)
                 < {SPLIT_TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split,
       ({H.sql_h48(f"'{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)")} % 100)
         < {SAMPLE_PCT} AS in_sample
FROM documents ORDER BY doc_id
""",
        "q10_returned_items": f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))),
                  2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q5_START}'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
        "brand_revenue": """
SELECT p_brand, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY revenue DESC, p_brand LIMIT 10
""",
        "top_orders_per_customer": """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3 ORDER BY o_custkey, rn
""",
        "dedup_exact": """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents
GROUP BY COALESCE(md5(lower(trim(text))), 'null:' || CAST(doc_id AS VARCHAR))
ORDER BY keep_id
""",
        "dedup_minhash_lsh": minhash_sql,
        "dedup_clusters": _oracle_dedup_clusters(),
        "event_type_matrix": _oracle_event_type_matrix(),
        "pii_scrub": """
SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS props_scrubbed
FROM events ORDER BY event_id
""",
        "dedup_simhash": _oracle_simhash(),
        "dedup_ngram_jaccard": f"""
WITH sets AS (
  SELECT doc_id, list_distinct({TX.sql_word_shingles(_sql_toks(), NGRAM_N)}) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        / len(list_distinct(list_concat(a.grams, b.grams))) >= {NGRAM_THRESHOLD}
ORDER BY id_a, id_b
""",
        "containment_pairs": f"""
WITH sets AS (
  SELECT doc_id, list_distinct({TX.sql_word_shingles(_sql_toks(), NGRAM_N)}) AS grams
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / len(a.grams)
         AS containment
FROM sets a JOIN sets b ON a.doc_id != b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / len(a.grams) >= 0.8
ORDER BY id_a, id_b
""",
        "embedding_near_dup": _oracle_embedding_near_dup(),
        "ann_topk": _oracle_ann_topk(use_lsh=False),
        "ann_lsh_topk": _oracle_ann_topk(use_lsh=True),
        "ann_ivf_topk": _oracle_ann_ivf(),
        "ann_sq8_topk": _oracle_ann_sq8(),
        "ann_pq_topk": _oracle_ann_pq(),
        "ann_ivfpq_topk": _oracle_ann_ivfpq(),
        # the persisted index answers bit-identically to the scan path
        # on the same corpus (shared quantizer + encoder by import), so
        # its oracle is the ivfpq mirror verbatim — probe drift or a
        # stale/torn index read cannot pass
        "ann_ivfpq_indexed": _oracle_ann_ivfpq(),
        "ann_ivfpq_grown": _oracle_ann_ivfpq_grown(),
        # streamed founding/extend == the grown construction verbatim
        "stream_index_ivfpq": _oracle_ann_ivfpq_grown(),
        "kmeans_clusters": _oracle_kmeans(),
        "ann_indexed_refined": _oracle_ann_refined(),
        # r15: the transitive-closure CC labels + the same h48 bucket
        # keyed on cluster_id — every member follows its label
        "cluster_safe_split": f"""
WITH cc AS ({_oracle_dedup_clusters()})
SELECT doc_id, cluster_id,
       CASE WHEN ({H.sql_h48(f"'{CSPLIT_SALT}' || CAST(cluster_id AS VARCHAR)")} % 100)
                 < {SPLIT_TRAIN_PCT}
            THEN 'train' ELSE 'test' END AS split
FROM cc ORDER BY doc_id
""",
        # r15: running greatest(ws_tokens, 1) per registered domain in
        # doc_id order, kept while the cumulative charge fits the budget
        "domain_token_cap": f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url, text FROM documents),
n AS (SELECT doc_id,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain,
             CAST(greatest(len({_sql_toks('text')}), 1) AS BIGINT) AS doc_tokens
      FROM u),
c AS (SELECT doc_id, reg_domain, doc_tokens,
             CAST(sum(doc_tokens) OVER (
               PARTITION BY reg_domain ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM n)
SELECT doc_id, reg_domain, doc_tokens, cum_tokens
FROM c WHERE cum_tokens <= {DOMAIN_TOKEN_BUDGET} ORDER BY doc_id
""",
        "ann_ivfpq_reclustered": _oracle_ann_ivfpq_reclustered(),
        "url_blocklist": f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url FROM documents),
n AS (SELECT doc_id,
             {TX.sql_url_normalize('url')} AS url_norm,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain
      FROM u)
SELECT doc_id, url_norm, reg_domain FROM n
WHERE reg_domain IS NULL
   OR reg_domain NOT IN ({', '.join(repr(d) for d in sorted(BLOCKED_DOMAINS))})
ORDER BY doc_id
""",
        "url_dedup": f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url FROM documents),
n AS (SELECT doc_id,
             {TX.sql_url_normalize('url')} AS url_norm,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain
      FROM u)
SELECT min(doc_id) AS doc_id, url_norm, reg_domain
FROM n GROUP BY url_norm, reg_domain ORDER BY doc_id
""",
        "web_curation": f"""
WITH u AS (
  SELECT doc_id, {_SQL_SYNTH_URL} AS url, {_SQL_SYNTH_MLTEXT} AS text
  FROM documents
),
n AS (SELECT doc_id,
             {TX.sql_url_normalize('url')} AS url_norm,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain,
             text
      FROM u),
s1 AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY url_norm),
n1 AS (SELECT n.* FROM n JOIN s1 USING (doc_id)),
s2 AS (
  SELECT doc_id, reg_domain FROM (
    SELECT doc_id, reg_domain,
           row_number() OVER (PARTITION BY reg_domain ORDER BY doc_id) AS rk
    FROM n1
  ) WHERE rk <= {WEBCUR_CAP}
),
n2 AS (SELECT n1.* FROM n1 JOIN s2 USING (doc_id)),
l AS (
  SELECT doc_id, reg_domain,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM n2
),
per_line AS (
  SELECT reg_domain, line, count(DISTINCT doc_id) AS n_docs_with
  FROM l GROUP BY 1, 2
),
per_dom AS (SELECT reg_domain, count(*) AS n_domain_docs FROM n2 GROUP BY 1),
boiler AS (
  SELECT reg_domain, line
  FROM per_line JOIN per_dom USING (reg_domain)
  WHERE n_docs_with >= {BOILER_MIN_DOCS}
    AND CAST(n_docs_with AS DOUBLE)
        >= {BOILER_MIN_FRAC} * CAST(n_domain_docs AS DOUBLE)
),
kept AS (SELECT l.* FROM l ANTI JOIN boiler USING (reg_domain, line)),
kept_agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY 1
),
lines_cnt AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY 1),
bp AS (
  SELECT n2.doc_id, n2.reg_domain,
         CASE WHEN n2.text IS NULL THEN NULL
              ELSE coalesce(k.clean_text, '') END AS clean_text,
         coalesce(c.n_lines, 0) AS n_lines,
         coalesce(c.n_lines, 0) - coalesce(k.n_kept, 0) AS n_removed
  FROM n2
  LEFT JOIN kept_agg k USING (doc_id)
  LEFT JOIN lines_cnt c USING (doc_id)
),
filt AS (
  SELECT * FROM bp
  WHERE n_lines - n_removed >= 1 AND clean_text IS NOT NULL
)
SELECT min(doc_id) AS doc_id,
       arg_min(reg_domain, doc_id) AS reg_domain,
       CAST(length(arg_min(clean_text, doc_id)) AS INTEGER) AS n_clean_chars,
       arg_min(n_removed, doc_id) AS n_removed
FROM filt GROUP BY md5(clean_text) ORDER BY doc_id
""",
        "stream_url_dedup": f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url FROM documents),
n AS (SELECT doc_id,
             {TX.sql_url_normalize('url')} AS url_norm,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain
      FROM u)
SELECT min(doc_id) AS doc_id, url_norm, reg_domain
FROM n GROUP BY url_norm, reg_domain ORDER BY doc_id
""",
        "domain_doc_counts": f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url FROM documents),
n AS (SELECT doc_id,
             {TX.sql_url_normalize('url')} AS url_norm,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain
      FROM u),
per_url AS (
  SELECT reg_domain, url_norm, count(*) AS n_dup FROM n GROUP BY 1, 2
)
SELECT reg_domain, CAST(sum(n_dup) AS BIGINT) AS n_docs, count(*) AS n_urls
FROM per_url GROUP BY reg_domain ORDER BY reg_domain
""",
        "array_functions": f"""
WITH per_user AS (
  SELECT user_id,
         list(CAST(round(value * 100) AS BIGINT) ORDER BY ts, event_id)
           AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       len(vals) AS n_vals,
       CAST(coalesce(
         list_sum(list_filter(list_transform(vals, x -> x * 2),
                              x -> x > {ARRAYF_T_CENTS})), 0) AS BIGINT)
         AS big_doubled_sum_c,
       array_to_string(
         list_transform(list_reverse_sort(list_distinct(vals))[1:3],
                        x -> CAST(x AS VARCHAR)), '|') AS top3_c,
       list_contains(vals, 0) AS has_zero
FROM per_user ORDER BY user_id
""",
        "domain_cap": f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url FROM documents),
n AS (SELECT doc_id,
             {TX.sql_url_normalize('url')} AS url_norm,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain
      FROM u),
r AS (SELECT doc_id, url_norm, reg_domain,
             row_number() OVER (PARTITION BY reg_domain ORDER BY doc_id)
               AS domain_rank
      FROM n)
SELECT doc_id, url_norm, reg_domain, domain_rank
FROM r WHERE domain_rank <= {DOMAIN_CAP_K} ORDER BY doc_id
""",
        "boilerplate_lines": f"""
WITH u AS (
  SELECT doc_id, {_SQL_SYNTH_URL} AS url, {_SQL_SYNTH_MLTEXT} AS text
  FROM documents
),
n AS (SELECT doc_id,
             {TX.sql_registered_domain(TX.sql_url_host('url'))} AS reg_domain,
             text
      FROM u),
l AS (
  SELECT doc_id, reg_domain,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM n
),
per_line AS (
  SELECT reg_domain, line, count(DISTINCT doc_id) AS n_docs_with
  FROM l GROUP BY 1, 2
),
per_dom AS (SELECT reg_domain, count(*) AS n_domain_docs FROM n GROUP BY 1),
boiler AS (
  SELECT reg_domain, line
  FROM per_line JOIN per_dom USING (reg_domain)
  WHERE n_docs_with >= {BOILER_MIN_DOCS}
    AND CAST(n_docs_with AS DOUBLE)
        >= {BOILER_MIN_FRAC} * CAST(n_domain_docs AS DOUBLE)
),
kept AS (SELECT l.* FROM l ANTI JOIN boiler USING (reg_domain, line)),
kept_agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY 1
),
lines_cnt AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY 1)
SELECT n.doc_id,
       CASE WHEN n.text IS NULL THEN NULL
            ELSE coalesce(k.clean_text, '') END AS clean_text,
       coalesce(c.n_lines, 0) AS n_lines,
       coalesce(c.n_lines, 0) - coalesce(k.n_kept, 0) AS n_removed
FROM n
LEFT JOIN kept_agg k USING (doc_id)
LEFT JOIN lines_cnt c USING (doc_id)
ORDER BY n.doc_id
""",
        "lang_id": _oracle_lang_id(),
        "text_quality": _oracle_text_quality(),
        "token_counts": _oracle_token_counts(),
        "text_profile": _oracle_text_profile(),
        "text_prep": _oracle_text_prep(),
        "repetition_stats": _oracle_repetition_stats(),
        "decontaminate_split": f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN ({H.sql_h48(f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100)
                   < {SPLIT_TRAIN_PCT}
              THEN 'train' ELSE 'test' END AS split,
         list_distinct({TX.sql_word_shingles(_sql_toks(), DECON_SHINGLE_N)}) AS sh
  FROM documents
), shingled AS (
  SELECT doc_id, split, {H.sql_h48('s.s')} AS h
  FROM base, UNNEST(sh) AS s(s)
), tr AS (
  SELECT DISTINCT h FROM shingled WHERE split = 'train'
)
SELECT doc_id, CAST(count(DISTINCT h) AS BIGINT) AS n_shared_shingles
FROM shingled JOIN tr USING (h)
WHERE split = 'test'
GROUP BY doc_id ORDER BY doc_id
""",
        # the Bloom prefilter is invisible in the output (no false
        # negatives; hits exact-verified), so the oracle is the DIRECT
        # join with the report/against roles of the corpus-prep direction
        "bloom_decontaminate": f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN ({H.sql_h48(f"'{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100)
                   < {SPLIT_TRAIN_PCT}
              THEN 'train' ELSE 'test' END AS split,
         list_distinct({TX.sql_word_shingles(_sql_toks(), DECON_SHINGLE_N)}) AS sh
  FROM documents
), shingled AS (
  SELECT doc_id, split, {H.sql_h48('s.s')} AS h
  FROM base, UNNEST(sh) AS s(s)
), te AS (
  SELECT DISTINCT h FROM shingled WHERE split = 'test'
)
SELECT doc_id, CAST(count(DISTINCT h) AS BIGINT) AS n_shared_shingles
FROM shingled JOIN te USING (h)
WHERE split = 'train'
GROUP BY doc_id ORDER BY doc_id
""",
        "tfidf_top_terms": f"""
WITH terms AS (
  SELECT doc_id, unnest({_sql_toks()}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf * 1000000 * (n.n_docs + 1) // (dfreq.df + 1) AS BIGINT)
           AS score_micro
  FROM tf JOIN dfreq USING (term), n
), ranked AS (
  SELECT doc_id, term, tf, df, score_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, term) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df, score_micro
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
""",
        "bm25_search": f"""
WITH qt(query_id, term) AS (VALUES {_sql_bm25_qt()}),
toks AS (
  SELECT doc_id, {_sql_toks("coalesce(text, '')")} AS toks FROM documents
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS tot
  FROM toks
), occ AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
  FROM toks
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM occ
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, dl, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT qt.query_id, tf.doc_id,
         ((2*s.n_docs - 2*d.df + 1) * {text_analysis.BM25_IDF_SCALE} // (2*d.df + 1))
         * (44 * tf.tf * s.tot * {text_analysis.BM25_TF_SCALE}
            // (20*tf.tf*s.tot + 6*s.tot + 18*tf.dl*s.n_docs)) AS w
  FROM tf JOIN dfreq d USING (term) JOIN qt USING (term), stats s
), per AS (
  SELECT query_id, doc_id, sum(w) AS score FROM scored GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM per
)
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rnk AS INTEGER) AS rank,
       doc_id, CAST(score AS BIGINT) AS bm25_score_micro
FROM ranked WHERE rnk <= {BM25_K} ORDER BY query_id, rank
""",
        "doc_chunks": f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       array_to_string(toks[CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT)
                            : CAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS BIGINT)],
                       ' ') AS chunk_text,
       CAST(len(toks[CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT)
                     : CAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS BIGINT)]) AS INTEGER)
         AS n_tokens
FROM toks, UNNEST(range(0, greatest(len(toks) - 1, 0) // {CHUNK_STRIDE} + 1)) AS t(i)
ORDER BY doc_id, chunk_idx
""",
        "stream_embed_near_dup": f"""
WITH pairs AS ({_oracle_embedding_near_dup()})
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT id_b FROM pairs)
ORDER BY vec_id
""",
        "stream_near_dup": f"""
WITH pairs AS ({_oracle_minhash_lsh()})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM pairs)
ORDER BY doc_id
""",
        "pack_sequences": f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         CAST(len(toks[CAST(i * {CHUNK_STRIDE} + 1 AS BIGINT)
                       : CAST(i * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS BIGINT)])
              AS INTEGER) AS n_tokens
  FROM toks,
       UNNEST(range(0, greatest(len(toks) - 1, 0) // {CHUNK_STRIDE} + 1)) AS t(i)
), b AS (
  SELECT CAST({H.sql_h48(f"'{PACK_SALT}' || CAST(doc_id AS VARCHAR)")}
              % {PACK_BUCKETS} AS BIGINT) AS bucket,
         doc_id, chunk_idx, n_tokens
  FROM chunks
), s AS (
  SELECT bucket, doc_id, chunk_idx, n_tokens,
         CAST(sum(CAST(n_tokens AS BIGINT))
                OVER (PARTITION BY bucket ORDER BY doc_id, chunk_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS start_tok
  FROM b
)
SELECT bucket, doc_id, chunk_idx, n_tokens, start_tok,
       CAST(start_tok // {PACK_MAX_TOKENS} AS BIGINT) AS pack_id,
       CAST(start_tok % {PACK_MAX_TOKENS} AS BIGINT) AS pack_pos
FROM s ORDER BY bucket, doc_id, chunk_idx
""",
        "sample_stratified": f"""
SELECT source, doc_id, strat_rank FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {H.sql_h48(f"'{STRAT_SALT}' || CAST(doc_id AS VARCHAR)")},
                    doc_id
         ) AS strat_rank
  FROM documents) t
WHERE strat_rank <= {STRAT_N}
ORDER BY source, strat_rank
""",
        "value_percentiles_approx": """
SELECT event_type,
       round(quantile_disc(value, 0.25), 6) AS p25,
       round(quantile_disc(value, 0.50), 6) AS p50,
       round(quantile_disc(value, 0.75), 6) AS p75
FROM events GROUP BY event_type ORDER BY event_type
""",
        "mixture_sample": f"""
SELECT doc_id, source FROM documents
WHERE ({H.sql_h48(f"'{MIX_SALT}' || CAST(doc_id AS VARCHAR)")} % 1000000)
      < (CASE source
           {" ".join(f"WHEN '{k}' THEN {int(round(v * 1_000_000))}" for k, v in sorted(MIX_RATES.items()))}
           ELSE {int(round(MIX_DEFAULT_RATE * 1_000_000))} END)
ORDER BY doc_id
""",
        "shuffle_export": f"""
WITH pos AS (
  SELECT doc_id,
         {H.sql_h48(f"'{SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)")} AS p
  FROM documents
)
SELECT doc_id, p % {SHUFFLE_SHARDS} AS shard,
       ROW_NUMBER() OVER (PARTITION BY p % {SHUFFLE_SHARDS}
                          ORDER BY p, doc_id) AS seq
FROM pos ORDER BY shard, seq
""",
        "doc_fingerprint": f"""
WITH toks AS (
  SELECT doc_id, lower(trim(text)) AS t, {_sql_toks()} AS toks FROM documents
), sh AS (
  SELECT doc_id, t, {TX.sql_word_shingles('toks', 3)} AS sh FROM toks
)
SELECT doc_id, {H.sql_h48('t')} AS text_fp,
       CAST(list_min(list_transform(sh, s -> {H.sql_h48('s')})) AS BIGINT) AS min_shingle_fp
FROM sh ORDER BY doc_id
""",
        "winnow_fingerprint": f"""
WITH toks AS (
  SELECT doc_id, {_sql_toks()} AS toks FROM documents
), h AS (
  SELECT doc_id,
         list_transform({TX.sql_word_shingles('toks', WINNOW_K)},
                        g -> {H.sql_h48('g')}) AS hashes
  FROM toks
)
SELECT doc_id, CAST(len(hashes) AS INTEGER) AS n_grams,
       array_to_string(
         list_sort(list_distinct(list_transform(
           range(0, greatest(len(hashes) - {WINNOW_WINDOW}, 0) + 1),
           i -> list_min(hashes[CAST(i + 1 AS BIGINT)
                                : CAST(i + {WINNOW_WINDOW} AS BIGINT)])))),
         '-') AS fingerprint
FROM h ORDER BY doc_id
""",
        "media_summary": """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT media_type, count(*) AS n_files,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       max(n_bytes) AS max_bytes
FROM m GROUP BY media_type ORDER BY media_type
""",
        "temperature_mixture": f"""
WITH s AS (
  SELECT doc_id, {_SQL_SYNTH_SOURCE} AS source FROM documents
), c AS (
  SELECT source, count(*) AS n FROM s GROUP BY source
), w AS (
  SELECT source, n, CAST(floor(sqrt(n * 1000000.0)) AS BIGINT) AS w FROM c
), t AS (
  SELECT sum(w) AS tw FROM w
), r AS (
  SELECT source,
         least(CAST(1000000 AS BIGINT),
               CAST(CAST({TEMP_MIX_TARGET} AS HUGEINT) * w * 1000000
                    // (CAST(tw AS HUGEINT) * n) AS BIGINT)) AS rate_micro
  FROM w, t
)
SELECT s.source, s.doc_id, r.rate_micro
FROM s JOIN r USING (source)
WHERE {H.sql_h48("'temp:' || CAST(s.doc_id AS VARCHAR)")} % 1000000 < r.rate_micro
ORDER BY s.doc_id
""",
        "gopher_rules": f"""
WITH g AS (
  SELECT doc_id, {_SQL_SYNTH_GOPHER} AS gt FROM documents
), n AS (
  SELECT doc_id, gt, trim(lower(gt)) AS t,
         regexp_split_to_array(trim(lower(gt)), '\\s+') AS toks
  FROM g
), m AS (
  SELECT doc_id,
    CASE WHEN length(t) = 0 THEN 0 ELSE len(toks) END AS n_words,
    length(regexp_replace(t, '\\s+', '', 'g')) * 1000 AS wc,
    (length(t) - length(replace(t, '#', ''))
     + len(string_split(t, '...')) - 1) * 1000 AS sym,
    len(regexp_extract_all(gt, '(?m)^[ \t]*[-*\u2022]')) * 1000 AS bul,
    len(regexp_extract_all(gt, '(?m)\\.\\.\\.[ \t]*$')) * 1000 AS ell,
    len(regexp_extract_all(t, '(^|\\s)[^\\s]*[a-z]')) * 1000 AS alpha,
    len(string_split(gt, chr(10))) AS nl,
    len(list_intersect(list_distinct(toks),
        {TX.sql_string_array_literal(list(text_analysis.GOPHER_STOPWORDS))}))
      AS n_stop_hits
  FROM n
), r AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
    CASE WHEN n_words > 0 THEN wc // n_words END AS mean_word_len_milli,
    CASE WHEN n_words > 0 THEN sym // n_words END AS symbol_ratio_milli,
    CASE WHEN nl > 0 THEN bul // nl END AS bullet_line_milli,
    CASE WHEN nl > 0 THEN ell // nl END AS ellipsis_line_milli,
    CASE WHEN n_words > 0 THEN alpha // n_words END AS alpha_word_milli,
    CAST(n_stop_hits AS INTEGER) AS n_stop_hits
  FROM m
)
SELECT doc_id, n_words,
  CAST(mean_word_len_milli AS BIGINT) AS mean_word_len_milli,
  CAST(symbol_ratio_milli AS BIGINT) AS symbol_ratio_milli,
  CAST(bullet_line_milli AS BIGINT) AS bullet_line_milli,
  CAST(ellipsis_line_milli AS BIGINT) AS ellipsis_line_milli,
  CAST(alpha_word_milli AS BIGINT) AS alpha_word_milli,
  n_stop_hits,
  coalesce(n_words BETWEEN {text_analysis.GOPHER_MIN_WORDS}
                       AND {text_analysis.GOPHER_MAX_WORDS}
    AND mean_word_len_milli BETWEEN {text_analysis.GOPHER_MIN_MEAN_WORD_LEN_MILLI}
                                AND {text_analysis.GOPHER_MAX_MEAN_WORD_LEN_MILLI}
    AND symbol_ratio_milli <= {text_analysis.GOPHER_MAX_SYMBOL_RATIO_MILLI}
    AND bullet_line_milli <= {text_analysis.GOPHER_MAX_BULLET_LINE_MILLI}
    AND ellipsis_line_milli <= {text_analysis.GOPHER_MAX_ELLIPSIS_LINE_MILLI}
    AND alpha_word_milli >= {text_analysis.GOPHER_MIN_ALPHA_WORD_MILLI}
    AND n_stop_hits >= {text_analysis.GOPHER_MIN_STOP_HITS}, FALSE) AS keep
FROM r ORDER BY doc_id
""",
        "media_features": _oracle_media_features(),
        "media_phash_dedup": _oracle_media_phash(),
        "media_phash_clusters": _oracle_media_phash_clusters(),
        "score_calibration": f"""
WITH s AS (
  SELECT doc_id, {_SQL_SYNTH_SOURCE} AS source,
         CAST(coalesce(length(text), -1) AS BIGINT) AS score
  FROM documents
), r AS (
  SELECT doc_id, source, score,
         CAST(rank() OVER (PARTITION BY source ORDER BY score) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM s
)
SELECT doc_id, source, score,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE (rk - 1) * 1000 // (n - 1) END AS BIGINT) AS calib
FROM r ORDER BY doc_id
""",
        "media_frame_sample": _oracle_media_frame_sample(),
        "media_resize": f"""
WITH s AS (
  SELECT doc_id, text,
         greatest(1, length(text) // {multimodal.RESIZE_BYTES}) AS stride,
         length(text) AS n FROM documents
)
SELECT doc_id,
       CAST(least({multimodal.RESIZE_BYTES}, (n + stride - 1) // stride) AS BIGINT)
         AS resized_bytes,
       md5(array_to_string(
         list_transform(
           range(0, least({multimodal.RESIZE_BYTES}, (n + stride - 1) // stride)),
           i -> substr(text, CAST(i * stride + 1 AS INTEGER), 1)),
         '')) AS resized_md5
FROM s ORDER BY doc_id
""",
    }
    # the index-backed path must return bm25_search's rows verbatim (both
    # feed bm25_score_topk) — one oracle, two engine-side plans; the
    # streamed-segments index must also equal the one-shot build
    sqls["bm25_indexed"] = sqls["bm25_search"]
    sqls["stream_index_bm25"] = sqls["bm25_search"]
    # positional-index phrase query must return the scan answer verbatim
    sqls["phrase_indexed"] = sqls["phrase_search"]
    # the persisted-IVF path shares quantizer + probe/rerank with the
    # scan-based ivf_topk — one oracle for both
    sqls["ann_indexed"] = sqls["ann_ivf_topk"]
    # grown/streamed index: fixed-centroid semantics — centroids sampled
    # from the founding segment only, all vectors assigned against them
    sqls["ann_indexed_grown"] = _oracle_ann_ivf(
        cent_source_pred=ANN_GROWN_FOUNDING_PRED
    )
    sqls["stream_index_ann"] = sqls["ann_indexed_grown"]
    # reclustered grown index (r12): founding a new centroid generation
    # over ALL segments with the same salt/K restores from-scratch-build
    # semantics exactly — the oracle is the full-corpus IVF mirror, NOT
    # the founding-segment one, so a no-op maintenance can't pass
    sqls["ann_indexed_reclustered"] = sqls["ann_ivf_topk"]
    # id-ordered feed: first-cap-arrivals == lowest cap ids per domain
    sqls["stream_domain_cap"] = sqls["domain_cap"]
    # id-ordered feed + all-rows charge accounting: the streamed token
    # budget's admissions == the batch running-charge prefix verbatim
    sqls["stream_token_cap"] = sqls["domain_token_cap"]
    h = lambda d, e: H.sql_h48(f"'cms:' || CAST({d} AS VARCHAR) || ':' || CAST({e} AS VARCHAR)")  # noqa: E731
    sqls["cms_user_counts"] = f"""
WITH ev AS (
  SELECT user_id FROM events WHERE user_id IS NOT NULL
), cnt AS (
  SELECT d, {h('d', 'user_id')} % {CMS_WIDTH} AS bucket, count(*) AS n
  FROM ev, range({CMS_DEPTH}) t(d) GROUP BY 1, 2
), keys AS (
  SELECT DISTINCT user_id FROM ev
), probe AS (
  SELECT k.user_id, t.d, {h('t.d', 'k.user_id')} % {CMS_WIDTH} AS bucket
  FROM keys k, range({CMS_DEPTH}) t(d)
), est AS (
  SELECT p.user_id, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS est
  FROM probe p LEFT JOIN cnt c ON p.d = c.d AND p.bucket = c.bucket
  GROUP BY p.user_id
), exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact FROM ev GROUP BY user_id
)
SELECT e.user_id, e.est, x.exact, CAST(e.est - x.exact AS BIGINT) AS overcount
FROM est e JOIN exact x USING (user_id)
ORDER BY e.user_id
"""
    # streaming CMS (r12): counters are linear, blocks partition the
    # feed -> drained store == batch sketch; the oracle is unchanged
    sqls["stream_cms_counts"] = sqls["cms_user_counts"]
    # streaming HLL (r12): union is register-exact under any block
    # split -> drained estimates == the batch uniqMerge path verbatim
    sqls["stream_uniq_users"] = sqls["uniq_users_approx"]
    # streaming weighted topK (r12): weighted MG summaries merge by the
    # same mergeable-summaries argument -> drained store == batch sketch
    # in the exact regime; the oracle is unchanged
    sqls["stream_top_spenders"] = sqls["top_users_weighted"]
    # C4 line/page cleaning (r12): list_filter mirrors the Spark array
    # filter conjunct-for-conjunct; page flags are plain contains/token
    # intersection (the gopher stopword pattern)
    sqls["c4_filters"] = f"""
WITH g AS (
  SELECT doc_id, {_SQL_SYNTH_C4} AS raw FROM documents
), l AS (
  SELECT doc_id, raw, string_split(raw, chr(10)) AS lines FROM g
), k AS (
  SELECT doc_id, raw, lines,
         list_filter(lines, x ->
           regexp_matches(trim(x), '[.!?"]$')
           AND len(regexp_split_to_array(trim(x), '\\s+'))
               >= {text_analysis.C4_MIN_LINE_WORDS}
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM l
), m AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(kept) AS BIGINT) AS n_kept_lines,
         contains(lower(raw), 'lorem ipsum') AS has_lorem,
         contains(raw, '{{') AS has_brace,
         len(list_intersect(
               list_distinct(regexp_split_to_array(trim(lower(raw)), '\\s+')),
               {TX.sql_string_array_literal(list(text_analysis.C4_BADWORDS))}))
           > 0 AS has_badword,
         -- DuckDB's array_to_string is NULL on the empty list where
         -- Spark's array_join is '' — coalesce to the Spark semantics
         coalesce(array_to_string(kept, chr(10)), '') AS clean_text
  FROM k
)
SELECT doc_id, n_lines, n_kept_lines, has_lorem, has_brace, has_badword,
       clean_text,
       coalesce(n_kept_lines >= {text_analysis.C4_MIN_KEPT_LINES}
                AND NOT has_lorem AND NOT has_brace AND NOT has_badword,
                FALSE) AS keep
FROM m ORDER BY doc_id
"""
    # hybrid RRF (r12): fuse the two PROVEN arm oracles — bm25_search's
    # statement verbatim and the brute-force ANN mirror filtered to the
    # query-id-aligned vectors; contributions are integer floor
    # divisions, so the fused score hashes exactly
    _rrf_qids = ", ".join(str(qid) for qid, _ in BM25_QUERIES)
    sqls["hybrid_rrf"] = f"""
WITH u AS (
  SELECT query_id, doc_id,
         {similarity.RRF_SCALE} // ({similarity.RRF_K} + rank) AS c
  FROM ({sqls["bm25_search"]})
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id,
         {similarity.RRF_SCALE} // ({similarity.RRF_K} + rank) AS c
  FROM ({_oracle_ann_topk(use_lsh=False)})
  WHERE query_id IN ({_rrf_qids})
), f AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_score_nano,
         CAST(count(*) AS INTEGER) AS n_arms
  FROM u GROUP BY query_id, doc_id
), r AS (
  SELECT query_id, doc_id, rrf_score_nano, n_arms,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score_nano DESC, doc_id) AS rnk
  FROM f
)
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rnk AS INTEGER) AS rank,
       doc_id, rrf_score_nano, n_arms
FROM r WHERE rnk <= {BM25_K} ORDER BY query_id, rank
"""
    # index-backed hybrid (r12): the bm25 arm equals the scan arm by the
    # shared-scoring contract, but the vector arm is the IVF
    # APPROXIMATION — fuse the IVF mirror, not brute force, so a probe
    # drift cannot pass
    sqls["hybrid_indexed"] = f"""
WITH u AS (
  SELECT query_id, doc_id,
         {similarity.RRF_SCALE} // ({similarity.RRF_K} + rank) AS c
  FROM ({sqls["bm25_search"]})
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id,
         {similarity.RRF_SCALE} // ({similarity.RRF_K} + rank) AS c
  FROM ({sqls["ann_ivf_topk"]})
  WHERE query_id IN ({_rrf_qids})
), f AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_score_nano,
         CAST(count(*) AS INTEGER) AS n_arms
  FROM u GROUP BY query_id, doc_id
), r AS (
  SELECT query_id, doc_id, rrf_score_nano, n_arms,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score_nano DESC, doc_id) AS rnk
  FROM f
)
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rnk AS INTEGER) AS rank,
       doc_id, rrf_score_nano, n_arms
FROM r WHERE rnk <= {BM25_K} ORDER BY query_id, rank
"""
    # dyadic CMS range counts (r12): the count_min_build oracle pattern
    # over the (level, d, bucket) grid
    sqls["dyadic_range_counts"] = _oracle_dyadic_range_counts()
    # streaming dyadic CMS (r12): counters linear, blocks partition the
    # feed -> drained store == batch structure; oracle unchanged
    sqls["stream_range_counts"] = sqls["dyadic_range_counts"]
    # sketch quantiles (r13): recursive-CTE replay of the same descent
    sqls["sketch_quantiles"] = _oracle_sketch_quantiles()
    # live-quantile drain: drained store == batch structure
    # cell-for-cell (linearity), so the batch descent SQL is the mirror
    sqls["stream_sketch_quantiles"] = sqls["sketch_quantiles"]
    sqls["sketch_quantiles_weighted"] = _oracle_sketch_quantiles(weighted=True)
    # r13 streaming stratified sample: per-group bottom-k is mergeable
    # and blocks partition the feed -> drained == the batch statement
    sqls["stream_strat_sample"] = sqls["sample_stratified"]
    # quantileExactWeighted (r12): same integer rule both sides —
    # smallest v whose running weight reaches ceil(tot * p / 1000);
    # NULL/non-positive weights dropped (the topKWeighted convention)
    sqls["weighted_percentiles"] = """
WITH w AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS wt
  FROM events
), s AS (
  SELECT event_type, v,
         sum(wt) OVER (PARTITION BY event_type ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(wt) OVER (PARTITION BY event_type) AS tot
  FROM w WHERE v IS NOT NULL AND wt IS NOT NULL AND wt > 0
)
SELECT event_type,
       CAST(min(CASE WHEN cum >= (tot * 250 + 999) // 1000 THEN v END) AS BIGINT) AS q250,
       CAST(min(CASE WHEN cum >= (tot * 500 + 999) // 1000 THEN v END) AS BIGINT) AS q500,
       CAST(min(CASE WHEN cum >= (tot * 750 + 999) // 1000 THEN v END) AS BIGINT) AS q750,
       CAST(max(tot) AS BIGINT) AS total_weight
FROM s GROUP BY event_type ORDER BY event_type
"""
    # Unicode normalization (r12): DuckDB nfc_normalize is the
    # standard-defined NFC, byte-identical to Python unicodedata; the
    # remaining rules are the same RE2/Java-portable \x{..} regexes the
    # engine applies (plain string on purpose — no f-string braces)
    sqls["text_normalize"] = r"""
WITH g AS (
  SELECT doc_id,
         (coalesce(text, '')
          || CASE WHEN doc_id % 2 = 0
                  THEN ' cafe' || chr(769) || ' naive' || chr(776)
                  ELSE '' END
          || CASE WHEN doc_id % 3 = 0
                  THEN chr(160) || 'padded' || chr(160) || 'end'
                  ELSE '' END
          || CASE WHEN doc_id % 5 = 0
                  THEN chr(7) || 'bell' || chr(31) || 'ctl' || chr(133) || 'one'
                  ELSE '' END
          || CASE WHEN doc_id % 7 = 0
                  THEN 'lineA' || chr(13) || chr(10) || 'lineB' || chr(13) || 'lineC'
                  ELSE '' END
          || CASE WHEN doc_id % 11 = 0
                  THEN '  multi' || chr(9) || chr(9) || 'space  '
                  ELSE '' END) AS raw
  FROM documents
), n AS (
  SELECT doc_id, raw,
         trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(raw),
             '\r\n?', chr(10), 'g'),
             '\x{00A0}', ' ', 'g'),
             '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}-\x{9F}]', '', 'g'),
             '[ \t]+', ' ', 'g')) AS norm_text
  FROM g
)
SELECT doc_id, norm_text, coalesce(norm_text != raw, FALSE) AS changed
FROM n ORDER BY doc_id
"""
    # DPR hard negatives (r12): the same two proven arms, anti-joined —
    # BM25 candidates whose doc is absent from the vector arm's top-k
    sqls["hard_negatives"] = f"""
WITH cand AS (
  SELECT CAST(query_id AS INTEGER) AS query_id, doc_id,
         CAST(rank AS INTEGER) AS cand_rank
  FROM ({sqls["bm25_search"]})
), pos AS (
  SELECT CAST(query_id AS INTEGER) AS query_id, neighbor_id AS doc_id
  FROM ({_oracle_ann_topk(use_lsh=False)})
  WHERE query_id IN ({_rrf_qids})
), neg AS (
  SELECT c.query_id, c.doc_id, c.cand_rank
  FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.query_id = c.query_id AND p.doc_id = c.doc_id)
), r AS (
  SELECT query_id, doc_id, cand_rank,
         row_number() OVER (PARTITION BY query_id ORDER BY cand_rank) AS rnk
  FROM neg
)
SELECT query_id, CAST(rnk AS INTEGER) AS rank, doc_id, cand_rank
FROM r WHERE rnk <= {BM25_K} ORDER BY query_id, rank
"""
    # CCNet perplexity buckets (r12): the proven bigram_rarity statement
    # + one lang join + calibrate_scores' RANK/COUNT integer formula +
    # the thirds cut (all-integer comparisons)
    sqls["perplexity_buckets"] = f"""
WITH r AS ({sqls["bigram_rarity"]}),
 j AS (
  SELECT r.doc_id, d.lang, r.avg_rarity
  FROM r JOIN documents d ON r.doc_id = d.doc_id
), c AS (
  SELECT doc_id, lang, avg_rarity,
         CASE WHEN count(*) OVER (PARTITION BY lang) = 1
              THEN CAST(0 AS BIGINT)
              ELSE CAST((rank() OVER (PARTITION BY lang ORDER BY avg_rarity)
                         - 1) * 1000
                        // (count(*) OVER (PARTITION BY lang) - 1) AS BIGINT)
         END AS calib
  FROM j
)
SELECT doc_id, lang, avg_rarity, calib,
       CASE WHEN calib * 3 < 1000 THEN 'head'
            WHEN calib * 3 < 2000 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM c ORDER BY doc_id
"""
    return sqls


def oracles() -> dict[str, str]:
    """DuckDB oracle for every GATE query (keys of QUERIES) — since r05
    including `uniq_users_approx`, whose HLL sketch is exact at gate-scale
    cardinalities (coupon mode; see its docstring)."""
    alls = _all_oracles()
    return {k: alls[k] for k in QUERIES if k in alls}


def extra_oracles() -> dict[str, str]:
    """Oracles for the non-gate EXTRA_QUERIES (verified by
    tools/oracle_check.py, not by the driver's 50-row gate)."""
    alls = _all_oracles()
    return {k: alls[k] for k in EXTRA_QUERIES if k in alls}
