"""As-of (temporal closest-match) join — `ASOF JOIN` re-expressed for Spark.

The reference engine family exposes `ASOF JOIN` natively (nearest
`right.ts <= left.ts` per join key); Spark has no built-in equivalent and
the naive encodings are scale-killers: a range join explodes to
O(|left| x |right| per key) compares, and a per-row correlated top-1
subquery is not expressible as one pass.

Spark-first design — union + ordered window, ZERO joins:

1. tag each input (`_side` = 0 for right, 1 for left) and union them by
   name (payload columns null on the other side);
2. one window per join key, ordered by (ts, _side), frame
   UNBOUNDED PRECEDING..CURRENT ROW, carrying the most recent right row's
   payload forward as ONE struct with `last(..., ignorenulls=True)` — a
   running frame Spark evaluates incrementally in O(1) per row, and the
   struct keeps all payload columns from the SAME matched row (and doubles
   as the inner-mode match marker);
3. keep the left rows.

At equal timestamps the right row sorts first (`_side` 0 < 1), giving
`left.ts >= right.ts` (backward) semantics; `direction="forward"` flips
the sort to match the next right row at-or-after instead.

Scale notes (100 TB): exactly ONE shuffle, on the join keys — the same
exchange a sort-merge join would need — but no probe phase, no range
explosion, and O(1) state beyond the partition sort regardless of how
far back the match lies.  All expressions are codegen builtins.  A
single hot key degrades to one sorted partition, the same failure mode
as any keyed window; pre-bucket hot keys upstream if that matters.

Ties among right rows at the same (key, ts) are resolved by `tiebreak`
columns if given; pre-aggregate the right side to one row per (key, ts)
when exact cross-engine determinism is required (the gate queries do).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_PAY = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    *,
    direction: str = "backward",
    how: str = "left",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Attach to each left row the payload of the closest right row.

    `right` must carry exactly `on + [ts_col] + payload_cols` (+ optional
    `tiebreak`); payload names must not collide with left columns.
    direction="backward": latest right row with right.ts <= left.ts;
    "forward": earliest right row with right.ts >= left.ts.
    how="left" keeps unmatched left rows (null payload); "inner" drops them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")

    keep = list(on) + [ts_col] + list(payload_cols) + list(tiebreak)
    l_tag = left.withColumn(_SIDE, F.lit(1))
    # a NULL-ts right row has no defined as-of relation to anything —
    # unfiltered it sorts to an end of the window and becomes a spurious
    # match (code-review r6)
    r_tag = (
        right.select(*keep)
        .filter(F.col(ts_col).isNotNull())
        .withColumn(_SIDE, F.lit(0))
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    asc = direction == "backward"
    # NULLS FIRST in BOTH directions: a NULL-ts LEFT row then always
    # precedes every right row, so its running `last` sees nothing ->
    # NULL payload (unmatched), symmetrically for backward and forward
    order = [
        F.col(ts_col).asc_nulls_first() if asc else F.col(ts_col).desc_nulls_first()
    ]
    # right rows at the boundary timestamp must precede left rows so the
    # running `last` sees them (<= / >= inclusive semantics)
    order.append(F.col(_SIDE).asc())
    for t in tiebreak:
        order.append(F.col(t).asc() if asc else F.col(t).desc())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct holding ALL payload columns of the most recent right
    # row.  Carrying each column independently (last(when(...), ignorenulls)
    # per column) is wrong twice over: a NULL payload value in the matched
    # row would be skipped and silently replaced by a STALE value from an
    # older right row (found by tests/test_asof_property.py), and inner-mode
    # filtering would need a separate marker.  The struct is non-null for
    # every right row — even one whose payload values are all NULL — so its
    # fields are exactly the matched row's values, and its own nullness IS
    # the match marker.  One window function instead of len(payload_cols).
    pay = F.last(
        F.when(F.col(_SIDE) == 0, F.struct(*[F.col(c) for c in payload_cols])),
        ignorenulls=True,
    ).over(w)
    u = u.withColumn(_PAY, pay)
    for c in payload_cols:
        u = u.withColumn(c, F.col(_PAY)[c])
    out = u.filter(F.col(_SIDE) == 1)
    if how == "inner":
        out = out.filter(F.col(_PAY).isNotNull())
    return out.drop(_SIDE, _PAY, *[t for t in tiebreak if t not in left.columns])


_BKT = "_asof_bucket"
_PREF = "_asof_pref"

#: (app id, plan semantic hash, input-file fingerprint, ts col) -> derived
#: bucket width.  Same bounded memo design as similarity._memoized_count:
#: repeated builds of the same query don't re-scan the right table just to
#: re-derive the bucket width, and appended data self-invalidates.
_SPAN_CACHE: dict[tuple, int] = {}


def _derived_bucket_seconds(right: DataFrame, ts_col: str) -> int:
    """Default bucket width for `asof_join_bucketed` (VERDICT r5 #6): the
    right table's observed time span divided by (cores x 4) — enough
    (key, bucket) sort units to spread even ONE key's timeline across
    every core with headroom, while keeping the per-bucket extremes table
    small.  One 1-row min/max aggregate, memoized per (session, semantic
    plan, data version); degenerate spans (empty table, single instant)
    fall back to a day."""
    spark = right.sparkSession
    cores = max(1, spark.sparkContext.defaultParallelism)
    try:
        key = (
            spark.conf.get("spark.app.id"),
            right.semanticHash(),
            hash(tuple(sorted(right.inputFiles()))),
            ts_col,
        )
    except Exception:
        key = None
    if key is not None and key in _SPAN_CACHE:
        return _SPAN_CACHE[key]
    row = right.agg(
        F.unix_micros(F.min(ts_col)).alias("lo"),
        F.unix_micros(F.max(ts_col)).alias("hi"),
    ).first()
    span_sec = 0 if row["lo"] is None else (row["hi"] - row["lo"]) // 1_000_000
    val = max(1, int(span_sec // (cores * 4))) if span_sec > 0 else 86_400
    if key is not None:
        if len(_SPAN_CACHE) > 64:
            _SPAN_CACHE.clear()
        _SPAN_CACHE[key] = val
    return val


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    *,
    bucket_seconds: int | None = None,
    direction: str = "backward",
    how: str = "left",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Hot-key-scalable as-of join: identical semantics to `asof_join`, but
    each key's timeline is split into fixed `bucket_seconds` ranges so the
    sort unit is (key, time-bucket) instead of (key) — a key owning a year
    of 100 TB traffic becomes 365 independent daily sorts instead of one
    giant partition (the one failure mode the plain operator documents).

    Matches crossing a bucket boundary are preserved by CARRY-OVER rows:
    per (key, bucket) the extreme right row (latest for backward, earliest
    for forward) is reduced out — a tiny table, one row per non-empty
    (key, bucket) — and for every left bucket the nearest such row from
    earlier (backward) / later (forward) buckets is re-inserted as a
    synthetic right row pinned to the bucket's boundary instant.  Synthetic
    rows lose timestamp ties to real in-bucket rows via a hidden tiebreak,
    so the carried match applies exactly when no in-bucket right row
    precedes (backward) / follows (forward) the probe.  Equivalence with
    the unbucketed operator is pinned in tests/test_asof_join.py.

    Cost: two extra small shuffles over the per-bucket extremes (rows =
    non-empty (key, bucket) pairs, independent of row counts) plus the
    carry resolution — itself the union+window trick on that small table.

    `bucket_seconds=None` (the default) derives the width from the right
    table's observed span and the session's core count — see
    `_derived_bucket_seconds`; pass an explicit width to override.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if bucket_seconds is None:
        bucket_seconds = _derived_bucket_seconds(right, ts_col)
    if bucket_seconds <= 0:
        # non-ANSI division by zero yields NULL buckets, which would pin
        # every key to one carried extreme — silently wrong output, not an
        # error (code-review r6)
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    width_us = bucket_seconds * 1_000_000
    backward = direction == "backward"

    lb = left.withColumn(_BKT, F.floor(F.unix_micros(F.col(ts_col)) / width_us))
    # NULL-ts right rows: same no-defined-relation contract as asof_join
    # (they would otherwise form a NULL bucket feeding the carry pass)
    rb = right.filter(F.col(ts_col).isNotNull()).withColumn(
        _BKT, F.floor(F.unix_micros(F.col(ts_col)) / width_us)
    )

    # per (key, bucket) extreme right row — latest for backward (the only
    # row earlier buckets can ever need), earliest for forward
    row_struct = F.struct(
        F.col(ts_col), *[F.col(c) for c in payload_cols], *[F.col(c) for c in tiebreak]
    )
    rank = F.struct(
        F.unix_micros(F.col(ts_col)), *[F.col(c) for c in tiebreak]
    )
    pick = F.max_by(row_struct, rank) if backward else F.min_by(row_struct, rank)
    extremes = rb.groupBy(*on, _BKT).agg(pick.alias("_row"))

    # carry resolution: for every LEFT bucket, the nearest extreme from a
    # strictly earlier (backward) / later (forward) bucket — the classic
    # union+window asof applied to the tiny extremes table, keyed by the
    # bucket index itself
    left_buckets = lb.select(*on, _BKT).distinct().withColumn(_SIDE, F.lit(1))
    ext_tagged = extremes.withColumn(_SIDE, F.lit(0))
    u = left_buckets.unionByName(ext_tagged, allowMissingColumns=True)
    order = [F.col(_BKT).asc() if backward else F.col(_BKT).desc(), F.col(_SIDE).desc()]
    # _SIDE desc: an extreme IN bucket b must NOT serve bucket b itself
    # (strictly-earlier contract) — left marker rows sort before same-bucket
    # extremes, so the running last sees only prior buckets' extremes
    wc = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        u.withColumn("_carry", F.last(F.when(F.col(_SIDE) == 0, F.col("_row")), ignorenulls=True).over(wc))
        .filter((F.col(_SIDE) == 1) & F.col("_carry").isNotNull())
    )
    boundary_us = (
        F.col(_BKT) * width_us if backward else (F.col(_BKT) + 1) * width_us - 1
    )
    synth = carried.select(
        *on,
        F.col(_BKT),
        F.timestamp_micros(boundary_us.cast("long")).alias(ts_col),
        *[F.col("_carry")[c].alias(c) for c in payload_cols],
        *[F.col("_carry")[c].alias(c) for c in tiebreak],
        F.lit(0 if backward else 1).alias(_PREF),
    )
    # real rows win timestamp ties against synthetic carries in BOTH
    # directions: backward tiebreaks sort asc (bigger _PREF last -> wins),
    # forward sorts desc (smaller _PREF last -> wins)
    rb2 = rb.select(
        *on, _BKT, ts_col, *payload_cols, *tiebreak
    ).withColumn(_PREF, F.lit(1 if backward else 0))

    # _PREF FIRST (ADVICE r5): real-vs-synthetic must be decided before any
    # user tiebreak — a carried row pinned to the boundary instant has a
    # strictly EARLIER true timestamp than a real row sharing the pinned
    # timestamp, so the unbucketed operator would always prefer the real
    # row regardless of tiebreak values.  Real rows all share one _PREF, so
    # their relative (user-tiebreak) ordering is unchanged.
    out = asof_join(
        lb,
        rb2.unionByName(synth),
        on=[*on, _BKT],
        ts_col=ts_col,
        payload_cols=payload_cols,
        direction=direction,
        how=how,
        tiebreak=[_PREF, *tiebreak],
    )
    return out.drop(_BKT)
