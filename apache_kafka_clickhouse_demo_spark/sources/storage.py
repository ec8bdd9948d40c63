"""Sorted/partitioned columnar storage — the MergeTree-family write path.

The reference's storage tables are columnar with an explicit sort key and
background merges (`ENGINE = MergeTree ORDER BY ...`,
/root/reference/README.rst:88-89, 135-136, 214-216).  The Spark-first
analogue (SURVEY.md §2.1 S5/S6, §2.6 O4):

- `write_sorted`   : partitioned parquet, rows sorted *within* each task
                     before write.  Parquet row-group min/max stats on the
                     sort column then give the same range-scan pruning as the
                     MergeTree sparse primary index; `partition_cols` adds
                     coarse partition pruning on top.
- `insert_into`    : `INSERT INTO ... SELECT` batch backfill (S7,
                     README.rst:178-185, 242-252) — append of an arbitrary
                     transformed DataFrame into a live table directory.
- `compact_summing`: SummingMergeTree background-merge analogue (S6/A8,
                     README.rst:214-216) — collapse same-key partial rows
                     into one combined row and atomically rewrite the table.

At 100 TB the write pattern is the same: `repartition(partition_cols)` keeps
one shuffle whose output is aligned with the directory layout, and each task
writes one sorted file per directory instead of #tasks x #partitions
fragments.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low `bits` bits of each column.

    A single-column sort (`write_sorted`) gives perfect row-group pruning
    on that column and none on any other; Z-ordering the sort key over k
    columns makes every row group a small hyper-rectangle in all k
    dimensions, so min/max stats prune selective predicates on ANY of them
    — the multi-dimensional generalization of the MergeTree `ORDER BY`
    analogue (what Delta's OPTIMIZE ZORDER BY does).

    Inputs must be NON-NEGATIVE integers already normalized into
    [0, 2^bits) — rank/bucket/scale upstream (day numbers, hash buckets,
    quantized measures); values are masked to `bits` bits, so out-of-range
    inputs wrap rather than error.  The key is k*bits bits and must fit a
    long: k * bits <= 63.  Pure bit arithmetic — whole-stage codegen, no
    shuffle beyond the write's own repartition.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cs) * bits > 63:
        raise ValueError(f"{len(cs)} cols x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            src_bit = c.cast("long").bitwiseAND(F.lit(1 << b).cast("long"))
            # bit b of column i lands at position b*k + i
            shift = b * (len(cs) - 1) + i
            z = z + F.shiftleft(src_bit, shift)
    return z


def zorder_cluster_key(df: DataFrame, cluster_cols: list[str], bits: int = 8) -> Column:
    """Morton clustering key over ARBITRARY columns — the normalization
    front-end `zorder_value` deliberately leaves to the caller, packaged
    for the compaction hooks (VERDICT r5 #7).

    Per-column mapping into the required non-negative [0, 2^bits) domain:

    - numeric / timestamp / date: min/max-scaled onto the grid.  The
      min/max pairs come from ONE aggregate over `df` — a bounded driver
      action (2k scalars), the same class as the IVF memoized count.
      Min/max scaling is skew-sensitive (a single outlier compresses the
      rest of the range onto few grid cells); for heavily skewed measures
      pre-bucket upstream and pass the bucket column instead.
    - string / binary / anything else: `xxhash64` masked to `bits` bits.
      Equal values land in the same cell (file stats still prune equality
      predicates); range locality is not preserved, which string
      predicates rarely want.

    Compaction runs offline, so the extra scan for min/max is paid once
    per OPTIMIZE, not per query.
    """
    scaled: list[Column] = []
    need_stats: list[tuple[int, Column]] = []  # (slot, raw double expr)
    for c in cluster_cols:
        dt = df.schema[c].dataType.simpleString()
        if dt == "date":
            raw = F.col(c).cast("timestamp").cast("double")
        elif dt in ("int", "bigint", "smallint", "tinyint", "float", "double") or dt.startswith(("decimal", "timestamp")):
            # exact names, not startswith("int") — that would also match
            # interval types, which cannot cast to double
            raw = F.col(c).cast("double")
        else:
            scaled.append(F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits)))
            continue
        need_stats.append((len(scaled), raw))
        scaled.append(raw)  # placeholder, replaced below
    if need_stats:
        stats = df.agg(
            *[F.min(raw).alias(f"lo{i}") for i, (_, raw) in enumerate(need_stats)],
            *[F.max(raw).alias(f"hi{i}") for i, (_, raw) in enumerate(need_stats)],
        ).first()
        for i, (slot, raw) in enumerate(need_stats):
            lo, hi = stats[f"lo{i}"], stats[f"hi{i}"]
            if lo is None or hi is None or hi <= lo:
                scaled[slot] = F.lit(0)
            else:
                grid = float((1 << bits) - 1)
                scaled[slot] = F.floor(
                    (F.coalesce(raw, F.lit(lo)) - F.lit(lo)) / F.lit(hi - lo) * F.lit(grid)
                )
    return zorder_value(scaled, bits=bits)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    bloom_cols: list[str] | None = None,
    bloom_ndv: int = 100_000,
) -> None:
    """MergeTree `ORDER BY` analogue: sorted, optionally partitioned parquet.

    Rows are shuffled once onto the partition columns (so each output
    directory is produced by few tasks), then sorted within each task on the
    sort key before writing — every parquet file is internally sorted and
    its row-group stats are tight, which is what makes P3-style timestamp
    range predicates prune like a sparse primary index.

    `bloom_cols` is the skip-index analogue (`INDEX ... TYPE bloom_filter`):
    per-column parquet split-block bloom filters for columns the sort key
    gives NO min/max locality on (ids, hashes, tags).  A point predicate on
    a bloomed column skips whole row groups at scan time inside the parquet
    reader — the same "skip granules without reading them" contract as the
    MergeTree secondary index, paid for with ~1.2 bytes/distinct-value of
    file space (`bloom_ndv` sizes the filter; overshooting wastes bytes,
    undershooting inflates the false-positive rate toward useless).
    """
    out = df
    if partition_cols:
        out = out.repartition(*[F.col(c) for c in partition_cols])
        out = out.sortWithinPartitions(*[*partition_cols, *sort_cols])
    else:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer = writer.option(f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def insert_into(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """S7 — `INSERT INTO <table> SELECT ...` (README.rst:178-185): append a
    (transformed) DataFrame into an existing table directory."""
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """S5 scan side for engine-written tables (plain columnar scan; Catalyst
    provides pushdown + partition pruning)."""
    return spark.read.parquet(path)


def _atomic_swap(path: str, write_fn) -> None:
    """Shared swap for the compaction rewrites (code-review r6: the two
    inline copies had drifted AND shared a crash hole): write the new
    table via `write_fn(tmp)`, then path -> _old, tmp -> path, drop _old.

    Failure handling the inline copies lacked:
    - a stale `<path>_old` left by an earlier failed/interrupted swap is
      cleared first, instead of making every later compaction die with
      ENOTEMPTY at the first rename;
    - if the second rename fails after the first succeeded, the ORIGINAL
      table is restored from `_old` before re-raising — previously the
      handler deleted the newly written data while `path` no longer
      existed, leaving NO table at all;
    - a failed cleanup of `_old` is non-fatal (the next swap clears it).

    The single-writer/no-concurrent-reader window between the two renames
    remains (see compact_files' concurrency contract)."""
    p = path.rstrip("/")
    old = p + "_old"
    tmp = tempfile.mkdtemp(dir=os.path.dirname(p) or ".", prefix="_compact_")
    try:
        write_fn(tmp)
        shutil.rmtree(old, ignore_errors=True)  # stale debris from a crash
        os.rename(p, old)
        try:
            os.rename(tmp, p)
        except BaseException:
            os.rename(old, p)  # restore the live table before surfacing
            raise
        shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def compact_files(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    cluster_cols: list[str] | None = None,
    zorder_bits: int = 8,
) -> int:
    """Small-file compaction for a plain-parquet table directory (VERDICT
    r4 #6): rewrite the table into `target_files` files (optionally
    re-sorted, restoring tight row-group stats) and atomically swap it in.

    A streaming MV's destination accumulates one file per micro-batch per
    partition (`streaming/pipeline.py`); at 100 TB the FILE COUNT — driver
    listing, footer reads, one task per tiny file — kills the downstream
    scan long before the bytes do.  This is the background-merge half of
    MergeTree the reference gets for free (README.rst:88 "background
    merges"), applied to row-preserving tables; `compact_summing` below is
    the same swap for same-key-collapsing tables.

    Concurrency contract (ADVICE r5): readers never see a HALF table — each
    rename is atomic — but the swap is TWO renames (path -> _old, tmp ->
    path), so a reader listing the directory in the window between them
    sees NO table; like `compact_summing`, this requires a single writer
    and no concurrent readers (the sequential `run_cascade` usage;
    `run_cascade_live` rejects post_compact for exactly this reason).
    Concurrent-reader compaction belongs to the transactional table
    (`txlog.TransactionalTable.optimize`), whose commit-log swap is one
    atomic publish.

    Pass `partition_cols` for a Hive-partitioned layout: the rewrite then
    shuffles onto the partition columns (each output directory produced by
    one task -> one file per directory, the write_sorted shape) and keeps
    the directory structure — without it a partitioned table would compact
    into a flat layout and lose partition pruning.

    Pass `cluster_cols` (VERDICT r5 #7; mutually exclusive with
    `sort_cols`) to lay the rewrite out along the Morton key over those
    columns (`zorder_cluster_key`): files become small hyper-rectangles in
    EVERY cluster dimension, so min/max stats prune selective predicates
    on any of them — multi-dimensional pruning that survives compaction
    instead of collapsing back to one sort column.  With `partition_cols`
    the clustering applies within each directory.  Returns the resulting
    data-file count (recursive when partitioned)."""
    if sort_cols and cluster_cols:
        raise ValueError("sort_cols and cluster_cols are mutually exclusive")
    df = spark.read.parquet(path)
    zc = "_zcluster"
    if cluster_cols:
        df = df.withColumn(zc, zorder_cluster_key(df, cluster_cols, bits=zorder_bits))
        sort_cols = [zc]
    if partition_cols:
        out = df.repartition(*[F.col(c) for c in partition_cols])
        if sort_cols:
            out = out.sortWithinPartitions(*[*partition_cols, *sort_cols])
    elif cluster_cols:
        # range-partition on the Morton key: each task owns one contiguous
        # z-range -> each FILE is a bounded hyper-rectangle, not just each
        # row group
        out = df.repartitionByRange(max(1, target_files), zc).sortWithinPartitions(zc)
    else:
        out = df.coalesce(max(1, target_files))
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
    if cluster_cols:
        out = out.drop(zc)
    def _write(tmp: str) -> None:
        writer = out.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)

    _atomic_swap(path, _write)
    root = path.rstrip("/")
    return sum(
        1
        for dirpath, _d, names in os.walk(root)
        for n in names
        if n.endswith(".parquet")
    )


def compact_summing(
    spark: SparkSession,
    path: str,
    keys: list[str],
    agg_exprs: dict[str, Column],
    partition_cols: list[str] | None = None,
) -> None:
    """S6/A8 — SummingMergeTree same-key collapse (README.rst:214-216).

    Reads the table, combines all partial rows per key with the given
    aggregate expressions (e.g. `agg_state.sum_states` for avg states,
    max/min for max/min states), and atomically replaces the table with the
    compacted form (`_atomic_swap`).  The read-path result is identical
    before and after — compaction only reduces stored row count, exactly
    like a background merge.

    This one function covers BOTH summing-family engines: plain numeric
    `agg_exprs` give SummingMergeTree; state-merge expressions from
    `functions/agg_state.py` (as `attendance_daily_compacted` uses) give
    AggregatingMergeTree — ClickHouse separates the two engines only
    because its merge step must know each column's combine function, which
    here IS the `agg_exprs` argument.

    For a Hive-partitioned destination pass `partition_cols` (they must
    be part of `keys` — a column absent from the grouping would be
    DROPPED from the data): the rewrite then keeps the directory layout
    and its partition pruning, like compact_files (code-review r6: the
    bare groupBy silently flattened partitioned tables).
    """
    if partition_cols and not set(partition_cols) <= set(keys):
        raise ValueError(
            f"partition_cols {partition_cols} must be a subset of keys {keys}"
        )
    df = spark.read.parquet(path)
    compacted = df.groupBy(*keys).agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
    if partition_cols:
        compacted = compacted.repartition(*[F.col(c) for c in partition_cols])

    def _write(tmp: str) -> None:
        writer = compacted.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)

    _atomic_swap(path, _write)


def final_rows(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """One row per `keys` — the row with the LEXICOGRAPHICALLY LARGEST
    `order_cols` tuple (the ReplacingMergeTree `FINAL` read semantics,
    shared by `read_replacing_final` and `compact_replacing`).

    Spark-first shape: ONE hash aggregate with `max_by` over a struct
    ordering key — map-side partials reduce each task's rows to one
    candidate per key before the shuffle, so the exchange carries
    O(distinct keys), not O(rows).  A window `row_number` would instead
    shuffle every row and sort each key group; at 100 TB of upsert
    history that is the difference between a merge and a global sort.

    Determinism contract: `order_cols` must totally order the rows within
    a key (ClickHouse's "keeps the last inserted" is not reproducible on
    a distributed table, which is why callers pass an explicit version +
    tiebreak instead).
    """
    payload = [c for c in df.columns if c not in keys]
    return (
        df.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*payload), F.struct(*[F.col(c) for c in order_cols])
            ).alias("_r")
        )
        .select(*keys, "_r.*")
    )


def read_replacing_final(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak: list[str] | None = None,
    deleted_col: str | None = None,
) -> DataFrame:
    """ReplacingMergeTree read path — `SELECT ... FINAL`: collapse the
    upsert history to the max-version row per key at READ time, before (or
    without) any background merge.  `tiebreak` breaks version ties
    deterministically; (version, *tiebreak) must totally order each key's
    rows (see `final_rows`).

    `deleted_col` is ClickHouse's `ReplacingMergeTree(ver, is_deleted)`
    tombstone: when the WINNING version of a key carries
    `deleted_col != 0`, the key is absent from the FINAL read — a delete
    is just an upsert whose payload says "gone", which is how a CDC feed
    expresses deletes without a second table.  Older live versions do NOT
    resurrect the row (the filter applies after the max-version pick,
    exactly ClickHouse's rule)."""
    out = final_rows(df, keys, [version_col, *(tiebreak or [])])
    if deleted_col is not None:
        # NULL tombstone flag = LIVE (review r7): ClickHouse's is_deleted
        # is a non-nullable UInt8, but a CDC feed missing the flag on some
        # rows must not silently LOSE those keys — a bare `== 0` filters
        # NULL out, which is neither live nor deleted semantics
        out = out.filter(F.coalesce(F.col(deleted_col), F.lit(0)) == 0).drop(
            deleted_col
        )
    return out


def compact_replacing(
    spark: SparkSession,
    path: str,
    keys: list[str],
    version_col: str,
    tiebreak: list[str] | None = None,
    partition_cols: list[str] | None = None,
    deleted_col: str | None = None,
    cleanup: bool = False,
) -> None:
    """ReplacingMergeTree background merge (the upsert/CDC storage engine:
    `ENGINE = ReplacingMergeTree(ver) ORDER BY key`): atomically rewrite
    the table keeping only the max-(version, tiebreak) row per key.  The
    read answer through `read_replacing_final` is identical before and
    after — compaction only discards superseded versions, exactly like
    ClickHouse's merge-time collapse.

    `deleted_col` + `cleanup` mirror `ReplacingMergeTree(ver, is_deleted)`
    and `OPTIMIZE ... FINAL CLEANUP`: by default the merge KEEPS each
    key's winning tombstone row — later inserts replaying an OLDER
    version of the key must still lose to it, so dropping tombstones at
    every merge would resurrect deleted keys.  `cleanup=True` physically
    removes won tombstones (the terminal reclamation pass a CDC pipeline
    runs once upstream replay of older versions is impossible).

    Like `compact_summing`, `partition_cols` (subset of `keys`) preserves
    a Hive-partitioned layout and its pruning.  Same single-writer /
    no-concurrent-reader swap contract as `compact_files`.
    """
    if partition_cols and not set(partition_cols) <= set(keys):
        raise ValueError(
            f"partition_cols {partition_cols} must be a subset of keys {keys}"
        )
    if cleanup and deleted_col is None:
        raise ValueError("cleanup=True requires deleted_col")
    df = spark.read.parquet(path)
    compacted = final_rows(df, keys, [version_col, *(tiebreak or [])])
    if cleanup:
        compacted = compacted.filter(F.col(deleted_col) == 0)
    if partition_cols:
        compacted = compacted.repartition(*[F.col(c) for c in partition_cols])

    def _write(tmp: str) -> None:
        writer = compacted.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)

    _atomic_swap(path, _write)


def collapse_versioned(
    df: DataFrame,
    keys: list[str],
    sign_col: str,
    version_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """VersionedCollapsingMergeTree merge semantics, as a transformation:
    within each (`keys`, `version_col`) group, +1 "state" rows and -1
    "cancel" rows annihilate pairwise; a group whose signs sum to zero
    vanishes, otherwise ONE representative row of the majority sign
    survives, carrying `multiplicity = |net|` (unmatched identical rows
    collapse into a counted representative rather than being replayed).

    We implement the VERSIONED engine deliberately: plain
    CollapsingMergeTree resolves odd groups by insertion order, which a
    distributed table cannot reproduce; keying the cancellation on an
    explicit version makes the collapse order-independent — ClickHouse's
    own rationale for the versioned variant.  The representative is the
    max-`tiebreak` row of the winning sign (deterministic under the same
    total-order contract as `final_rows`).

    One hash aggregate, map-side combinable: the shuffle carries one
    candidate pair per (key, version) per task, never the raw change log.

    Re-entrant: an input `multiplicity` column (a previous collapse's
    output) is treated as a ROW WEIGHT — each collapsed row stands for
    `multiplicity` identical rows — so collapsing a collapsed table is a
    no-op rather than a column collision or a double count.
    """
    tb = [F.col(c) for c in (tiebreak or [])]
    payload = [
        c
        for c in df.columns
        if c not in (*keys, version_col, sign_col, "multiplicity")
    ]
    sign = F.col(sign_col)
    weight = (
        F.col("multiplicity").cast("long")
        if "multiplicity" in df.columns
        else F.lit(1).cast("long")
    )
    g = (
        df.groupBy(*keys, version_col)
        .agg(
            F.sum(sign.cast("long") * weight).alias("_net"),
            F.max_by(
                F.struct(*payload), F.when(sign > 0, F.struct(*tb, F.lit(0)))
            ).alias("_pos"),
            F.max_by(
                F.struct(*payload), F.when(sign < 0, F.struct(*tb, F.lit(0)))
            ).alias("_neg"),
        )
        .filter(F.col("_net") != 0)
    )
    win = F.when(F.col("_net") > 0, F.col("_pos")).otherwise(F.col("_neg"))
    return g.select(
        *keys,
        version_col,
        F.signum("_net").cast("int").alias(sign_col),
        F.abs("_net").alias("multiplicity"),
        *[win[c].alias(c) for c in payload],
    )


def compact_collapsing(
    spark: SparkSession,
    path: str,
    keys: list[str],
    sign_col: str,
    version_col: str,
    tiebreak: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """VersionedCollapsingMergeTree background merge: atomically rewrite
    the change-log table in its collapsed form (`collapse_versioned`).
    Sign-weighted reads (`sum(sign * metric)` style) are identical before
    and after — the merge only removes annihilated pairs.  The rewritten
    table gains the `multiplicity` column; re-compaction treats it as a
    row WEIGHT (see `collapse_versioned`), so running the merge again —
    or merging freshly appended change-log rows into an already-collapsed
    table — stays exact instead of double-counting.

    `partition_cols` / swap contract: as `compact_replacing`."""
    if partition_cols and not set(partition_cols) <= set(keys):
        raise ValueError(
            f"partition_cols {partition_cols} must be a subset of keys {keys}"
        )
    df = spark.read.parquet(path)
    collapsed = collapse_versioned(df, keys, sign_col, version_col, tiebreak)
    if partition_cols:
        collapsed = collapsed.repartition(*[F.col(c) for c in partition_cols])

    def _write(tmp: str) -> None:
        writer = collapsed.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)

    _atomic_swap(path, _write)


def apply_ttl(
    spark: SparkSession,
    path: str,
    ts_col: str,
    expire_before: str,
    partition_day_col: str | None = None,
) -> dict:
    """Row TTL on compaction (`TTL ts + INTERVAL n DAY` analogue): delete
    every row with `ts_col` < `expire_before` (an explicit cutoff, not
    wall-clock — deterministic and replayable by construction).

    The 100 TB path is the PARTITION-DROP fast path: when the table is
    Hive-partitioned by the day of `ts_col` (pass `partition_day_col`),
    directories are classified driver-side from their partition VALUES
    alone — a directory whose whole day range [d, d+1) lies before the
    cutoff is unlinked without reading a byte, fully-live days are never
    touched, and only the single boundary day (a mid-day cutoff) is
    rewritten with a row filter.  TTL on a day-partitioned 100 TB table
    is then metadata work + one day's rewrite, not a full-table scan —
    which is exactly how MergeTree drops whole expired parts.

    Without `partition_day_col` the whole table is rewritten filtered
    (`_atomic_swap`).  Returns counts: `{"dropped_dirs": n, "rewritten":
    m}` (rewritten = 1 for the unpartitioned full rewrite).

    Swap contract: single writer, no concurrent readers (`compact_files`).
    """
    import datetime as _dt

    cutoff = _dt.datetime.fromisoformat(expire_before)
    if partition_day_col is None:
        df = spark.read.parquet(path).filter(
            F.col(ts_col) >= F.lit(expire_before).cast("timestamp")
        )

        def _write(tmp: str) -> None:
            df.write.mode("overwrite").parquet(tmp)

        _atomic_swap(path, _write)
        return {"dropped_dirs": 0, "rewritten": 1}

    root = path.rstrip("/")
    prefix = partition_day_col + "="
    dropped, rewritten = 0, 0
    for entry in sorted(os.listdir(root)):
        if not entry.startswith(prefix):
            continue
        try:
            day = _dt.datetime.fromisoformat(entry[len(prefix):])
        except ValueError:
            # non-date partition values: NULL-ts rows land in
            # `day=__HIVE_DEFAULT_PARTITION__` (a NULL timestamp has no
            # age, so it never expires), and a crashed boundary-day swap
            # can leave `day=<d>_old` debris (cleared by that day's next
            # swap).  Skip instead of failing the whole TTL pass.
            continue
        sub = os.path.join(root, entry)
        if day + _dt.timedelta(days=1) <= cutoff:  # whole day expired
            shutil.rmtree(sub)
            dropped += 1
        elif day < cutoff:  # boundary day: filter-rewrite this dir only
            df = spark.read.parquet(sub).filter(
                F.col(ts_col) >= F.lit(expire_before).cast("timestamp")
            )

            def _write(tmp: str) -> None:
                df.write.mode("overwrite").parquet(tmp)

            _atomic_swap(sub, _write)
            rewritten += 1
    return {"dropped_dirs": dropped, "rewritten": rewritten}


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Change-data feed between two table snapshots: every row of `new`
    absent from `old` emits sign +1, every row of `old` absent from `new`
    emits sign -1 — exactly the change log `compact_collapsing` consumes,
    so `old + diff` collapses to `new`.  This is how a MergeTree-family
    deployment turns periodic snapshots (a replaced dimension table, a
    re-extracted upstream) into an INCREMENTAL feed for the downstream
    cascade instead of a full reload.

    Multiset semantics (`exceptAll`): a row appearing twice in `new` and
    once in `old` diffs to ONE +1 — duplicates are preserved exactly, not
    set-collapsed.  Plan shape: each direction is one hash aggregate over
    full-row keys (map-side combinable, one shuffle each, no join); the
    diff's size is O(changed rows) however large the snapshots are, which
    is the entire point of feeding the cascade a diff.

    Schemas must match (column order included).  Output: the common
    schema + `sign` int.
    """
    if [f.simpleString() for f in old.schema] != [
        f.simpleString() for f in new.schema
    ]:
        raise ValueError(
            f"snapshot schemas differ: {old.schema.simpleString()} vs "
            f"{new.schema.simpleString()}"
        )
    if "sign" in old.columns:
        # diffing sign-carrying snapshots (e.g. two collapsed change logs)
        # would silently OVERWRITE their sign with the diff's — a cancel
        # row re-emitted as a state row.  Rename upstream.
        raise ValueError("inputs already carry a 'sign' column; rename it")
    plus = new.exceptAll(old).withColumn("sign", F.lit(1))
    minus = old.exceptAll(new).withColumn("sign", F.lit(-1))
    return plus.unionByName(minus)
