"""Columnar table scans over the driver testdata (S5 scan side).

Plain `spark.read.parquet` — Catalyst provides predicate pushdown, column
pruning and (for partitioned layouts written by storage.write_sorted)
partition pruning, which is the engine's analogue of the MergeTree sparse
primary index (/root/reference/README.rst:88-89; SURVEY.md §4).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Engine-normalized copies of fixture tables that Spark cannot scan
#: efficiently as-is (events: TIMESTAMP(NANOS) column).  Normalizing once
#: into engine storage (sorted parquet, write_sorted) is the ingest-MV
#: pattern the reference itself uses (Kafka JSON -> typed MergeTree before
#: any query, README.rst:95-103) — and it restores predicate pushdown,
#: which a `timestamp_micros(ts div 1000)` computed column would break.
_NORM_CACHE = os.environ.get("SPARK_GRAFT_NORM_CACHE", "/tmp/spark_graft_norm")


def _normalized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_kafka_clickhouse_demo_spark.sources.storage import write_sorted

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") != "bigint":  # clean fixture: scan as-is
        return raw
    converted = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # cache key includes source mtime+size: a regenerated fixture (or a
    # stale /tmp surviving a fixture rebuild) self-invalidates
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = f"{sf_dir.strip('/').replace('/', '_')}_{int(st.st_mtime)}_{st.st_size}"
    dest = os.path.join(_NORM_CACHE, key, "events.parquet")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        # Fill the shared cache via a process-unique staging dir + atomic
        # rename: two concurrent sessions (pytest + bench) that both miss
        # would otherwise write the same parquet destination and delete each
        # other's in-flight `_temporary/` task files.  rename() fails if a
        # rival already renamed — then just read the winner's copy.
        import shutil

        tmp = f"{dest}.tmp.{os.getpid()}"
        try:
            # MergeTree ORDER BY timestamp analogue: sorted write -> tight
            # row-group stats -> range predicates prune like a sparse index
            write_sorted(converted, tmp, sort_cols=["ts"])
            try:
                os.rename(tmp, dest)
            except OSError:
                # EITHER a rival won the race (its complete copy carries
                # _SUCCESS) OR the dest is POISONED debris — e.g. a /tmp
                # aging cleaner deleted _SUCCESS/data files but left the
                # dir.  The old assume-rival handling read the mutilated
                # copy forever (code-review r6); repair it instead.
                if os.path.exists(os.path.join(dest, "_SUCCESS")):
                    shutil.rmtree(tmp, ignore_errors=True)
                else:
                    shutil.rmtree(dest, ignore_errors=True)
                    try:
                        os.rename(tmp, dest)
                    except OSError:  # rival repaired it concurrently
                        shutil.rmtree(tmp, ignore_errors=True)
            # evict superseded cache keys for this fixture (old
            # mtime/size generations) — without it every fixture rebuild
            # leaks one full normalized events copy in /tmp
            prefix = f"{sf_dir.strip('/').replace('/', '_')}_"
            try:
                for name in os.listdir(_NORM_CACHE):
                    if name.startswith(prefix) and name != key:
                        shutil.rmtree(
                            os.path.join(_NORM_CACHE, name), ignore_errors=True
                        )
            except OSError:
                pass
        except Exception:  # read-only tmp etc. — correctness over plan shape
            shutil.rmtree(tmp, ignore_errors=True)
            return converted
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        return converted  # cache unusable this round; stay correct
    return spark.read.parquet(dest)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # Fixture timestamps are parquet timestamp[us] with isAdjustedToUTC=
    # false; read them as TIMESTAMP_LTZ, not NTZ — the engine's time
    # functions (unix_millis, timestamp literals) and the UTC session make
    # LTZ the canonical type, the stored micros denote identical instants
    # either way, and the native column keeps predicate pushdown.  Runtime
    # conf set HERE rather than in session.py so it also holds under the
    # DRIVER's own SparkSession, which this module does not construct.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        return _normalized_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


#: Above this many bytes of SOURCE SCAN, corpus-derived join sides are
#: pinned to shuffle joins (`pin_wide`).  Calibrated by the r9 100x
#: rehearsal: a 5.9 MB documents scan (10x) still broadcasts its distinct-
#: window aggregate safely, a 58 MB scan (100x) aborted the driver with a
#: >1 GiB estimate-based broadcast collect — 16 MB sits under the failing
#: point with ~3x margin over the largest measured-safe scan.
WIDE_SOURCE_BYTES = 16 * 1024 * 1024


def is_wide_source(df: DataFrame, bound_bytes: int = WIDE_SOURCE_BYTES) -> bool:
    """True when `df`'s optimized-plan size statistic exceeds the bound.

    For scan-rooted inputs — every operator's entry contract — the
    statistic is the actual on-disk byte count, the ONE size Catalyst gets
    right.  Estimates DERIVED from it (through aggregates, joins,
    explodes) are unreliable in both directions, which is exactly why
    corpus-sized aggregates slip under any broadcast threshold: the
    size-only estimator shrinks a distinct-window or vocabulary aggregate
    below 64 MB while its true materialized size is GBs.  Operators
    therefore consult the SOURCE and pin their corpus-derived join sides
    with `pin_wide` when it is large; a small source keeps Catalyst's
    broadcast plans (measured ~2x faster at test scale).  Unknown size
    (non-JVM-backed frames) fails toward the scale-safe answer."""
    try:
        return (
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            > bound_bytes
        )
    except Exception:
        return True


def pin_wide(side: DataFrame, wide: bool) -> DataFrame:
    """Pin a corpus-derived join side to a spill-safe shuffle join when the
    operator's source is wide (`wide = is_wide_source(source)`, computed
    once per operator).  The merge hint survives AQE re-optimization, so
    the side can never be broadcast off a wrong static estimate; at small
    scale the un-hinted plan keeps its (measured-faster) broadcasts."""
    return side.hint("merge") if wide else side


def bcast_small(side: DataFrame, wide: bool | None = None) -> DataFrame:
    """Broadcast-hint a join side ONLY while its source scan is small —
    the dual of `pin_wide`, for sides that are explicitly hinted rather
    than estimate-planned (r10 plan-sweep finding).

    An unconditional `F.broadcast(dim)` on a dimension that SCALES with
    the dataset (TPC-H customer/part/supplier all grow linearly in SF) is
    the hint-driven twin of the r9 estimate-based misplan: correct and
    ~2x faster at test scale, a guaranteed driver OOM at 100 TB, and
    invisible to Catalyst because hints override its size checks.  This
    helper keeps the measured-fast broadcast below `WIDE_SOURCE_BYTES` of
    source scan and silently degrades to an estimate-planned (shuffle)
    join above it.

    `wide` defaults to `is_wide_source(side)`, which is reliable when
    `side` is a filter/projection of a scan (size-only estimation never
    shrinks filters, so the stat stays scan-proportional).  For a side
    DERIVED through aggregates or joins — where the estimate is exactly
    what cannot be trusted — pass `wide=is_wide_source(<source>)`
    explicitly, the same contract as `pin_wide`.  Genuinely
    bounded-by-construction sides (fixed centroid tables, <=m/64-row
    bitmap words, scalar aggregates, LIMIT-bounded frames) should keep
    their unconditional `F.broadcast`.

    The wide branch PINS (merge hint) rather than merely withholding the
    broadcast hint: an un-hinted side is still at the mercy of Catalyst's
    derived estimate, which can shrink a projection/aggregate of the wide
    scan back under the auto-broadcast threshold — the same untrusted
    estimate `pin_wide` exists to override."""
    from pyspark.sql import functions as F

    if wide is None:
        wide = is_wide_source(side)
    return side.hint("merge") if wide else F.broadcast(side)


def spread_small(df: DataFrame) -> DataFrame:
    """Round-robin repartition a small-but-CPU-heavy input up to the
    session's default parallelism.

    The local fixtures are single-row-group parquet files, so their scans
    are ONE task no matter how small `files.maxPartitionBytes` is — and a
    CPU-bound operator downstream (per-shingle md5, per-vector dot
    products) then runs on one core.  Shuffling a few MB to unlock every
    core is always worth it.  On a real cluster inputs carry far more
    files than cores, the guard makes this a no-op, and no shuffle is
    added.

    Contract (VERDICT r4 #4): `spread_small` is for SCAN-STAGE inputs —
    every in-repo call site wraps a freshly-loaded table.  Two guards
    enforce that contract without running a job:

    1. Plan guard: if the analyzed logical plan already contains a
       shuffle-producing node (Repartition/Aggregate/Join/Window/Sort/
       Deduplicate), the frame's parallelism is already set by
       `spark.sql.shuffle.partitions` (or an explicit repartition) — for a
       DataFrame downstream of a shuffle, `inputFiles()` still reports the
       LEAF file count, so without this check a wide, already-parallel
       input would eat a redundant full shuffle.  Such frames pass through
       untouched.
    2. File guard: count source FILES (`inputFiles`, a logical-plan
       lookup) rather than materializing an RDD just to read its partition
       count (VERDICT r3 #7: `df.rdd` forced a conversion job per query
       build).  File count under-estimates scan splits when single files
       exceed `maxPartitionBytes`, but any input large enough for that to
       matter has long since cleared the cores threshold at cluster scale;
       non-file inputs (in-memory test frames) count 0 and simply get
       spread.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if _plan_already_shuffled(df):
        return df
    try:
        n_files = len(df.inputFiles())
    except Exception:  # exotic plans without a file source: just spread
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


#: Logical-plan node names that imply the frame's partitioning was already
#: set by a shuffle (exchange) rather than by the file scan, matched at
#: TREE-PREFIX boundaries (ADVICE r5): each plan line is `<indent/branch
#: chars>NodeName args...`, so anchoring at line start + tree-drawing
#: characters means a column alias, view name, or string literal containing
#: "Sort"/"Join"/... in the args can no longer false-positive and silently
#: skip the spread.
#: `Sort [...], true` is a GLOBAL sort (range exchange); `..., false` is
#: sortWithinPartitions, which adds no exchange and must not suppress the
#: spread.  SQL-path set ops (Distinct/Intersect/Except) shuffle like
#: their DataFrame twins (code-review r6).  Known conservative skip: a
#: `Join` that later plans as broadcast-only keeps the probe side's scan
#: partitioning, but join strategy is unknowable from the ANALYZED plan —
#: the guard stays job-free by design and errs toward not re-shuffling.
_SHUFFLE_NODE_RE = re.compile(
    r"(?m)(?:^[\s+:\-]*(?:Repartition|RepartitionByExpression|Aggregate|Join"
    r"|Window|Deduplicate|Distinct|Intersect|Except)\b"
    r"|^[\s+:\-]*Sort\b.*, true$)"
)


def _plan_already_shuffled(df: DataFrame) -> bool:
    """True when the analyzed logical plan contains a shuffle-producing
    node.  Plan-string inspection only — no job, no physical planning."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    return _SHUFFLE_NODE_RE.search(plan) is not None
