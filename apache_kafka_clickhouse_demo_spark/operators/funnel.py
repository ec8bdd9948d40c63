"""Behavioral-sequence analytics: windowFunnel and retention.

ClickHouse ships funnel/cohort analysis as first-class aggregate functions
(`windowFunnel(window)(ts, cond1, ..., condN)`, `retention(cond1, ...,
condN)`) — the canonical event-analytics workload the reference's events
pipeline feeds.  Spark has no built-in; the re-expression here keeps the
whole computation JVM-side:

- `window_funnel`: per-key max funnel depth via ONE hash aggregate
  (`collect_list` of compact encoded ticks) followed by a codegen
  `aggregate` (fold) over the sorted array — no joins, no window sorts,
  no Python.  The shuffle carries one array per key whose length is the
  key's MATCHING event count (funnel steps only, not all events) — the
  same per-group memory contract as ClickHouse's own windowFunnel, which
  also buffers each key's (ts, step) pairs in the aggregate state.

- `retention`: cohort day-N retention as pure conditional aggregation —
  two hash aggregates (per-user flags, then one global roll-up), both
  map-side combinable; nothing per-row leaves codegen.

Semantics (deterministic, cross-engine reproducible — the design
constraint ClickHouse's "non-strict by insertion order" form cannot
satisfy on a distributed table):

Each event is assigned its FIRST matching funnel step (steps are usually
disjoint predicates anyway).  Events are totally ordered per key by the
encoded tick `unix_micros(ts) * 8 + step` and de-duplicated on it, so two
events with equal (ts, step) count once and equal-ts events at different
steps chain in step order (the non-strict ClickHouse mode).  The funnel
fires on a chain e1 < e2 < ... < ek (tick order) with
`ts(ek) - ts(e1) <= window` — the window anchored at the chain's FIRST
event, as in ClickHouse.  The fold keeps, per reached depth, the MAXIMAL
chain-start time; a later start dominates an earlier one for every
possible extension (any event within window of the older start is within
window of the fresher), so the greedy fold decides exactly the
exists-a-chain predicate the SQL oracle states with joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tick = unix_micros * _TICK_BASE + step — step lives in the low bits so
#: equal-timestamp events order by funnel step; supports up to 8 steps.
#: Power of two so the fold un-encodes with an EXACT shift (see `fold`).
_TICK_BASE = 8
_TICK_SHIFT = 3
assert 1 << _TICK_SHIFT == _TICK_BASE


def tick_expr(ts_col: str, steps: Sequence[Column]) -> Column:
    """Encoded funnel tick `unix_micros(ts) * 8 + first-matching-step`
    (NULL when no step matches) — shared by the batch fold and the
    streaming state handler so both make identical chain decisions.

    Pre-epoch guard (ADVICE r6): the fold's exact un-encode (`t % 8`,
    `shiftright(t, 3)`) is only correct for non-negative ticks — Java-style
    remainders would silently decode a pre-1970 timestamp into a wrong
    step AND a wrong microsecond.  A step-matching event with negative
    `unix_micros` therefore FAILS the query loudly via `assert_true`
    instead of folding a wrong chain decision; no-step rows stay NULL and
    are filtered as before."""
    step_of = F.coalesce(
        *[F.when(cond, F.lit(i).cast("long")) for i, cond in enumerate(steps)]
    )
    tick = F.unix_micros(F.col(ts_col)) * _TICK_BASE + step_of
    guard = F.assert_true(
        tick.isNull() | (tick >= 0),
        F.lit(
            "funnel: pre-epoch timestamp (negative unix_micros) — "
            "the exact shift/mod tick decode is undefined before 1970"
        ),
    )
    return F.when(guard.isNull(), tick)


def window_funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """Max funnel depth per key: (key, funnel_level) with funnel_level in
    [1, len(steps)] — keys that never complete step 1 (no matching events
    at all, or only non-initial steps) are absent: level-0 rows carry no
    information and at 100 TB would be most keys.

    `steps[i]` is the boolean predicate for funnel step i (ordered).
    See the module docstring for the exact chain semantics.
    """
    n = len(steps)
    if not 1 <= n <= _TICK_BASE:
        raise ValueError(f"1..{_TICK_BASE} steps supported, got {n}")
    window_us = int(window_seconds) * 1_000_000

    ticks = (
        df.select(
            F.col(key_col).alias("k"),
            tick_expr(ts_col, steps).alias("tick"),
        )
        .filter(F.col("tick").isNotNull())
        # one vote per (key, ts, step) AND one exchange total: collect_set
        # dedups the encoded ticks inside the aggregate (map-side partial
        # sets shrink before the shuffle), where a separate distinct would
        # cost a second exchange; sorting restores the fold's total order
        .groupBy("k")
        .agg(F.sort_array(F.collect_set("tick")).alias("ticks"))
    )

    def fold(acc: Column, t: Column) -> Column:
        step = t % _TICK_BASE
        # exact integer un-encode: a double division (t / 8) loses ulp=2
        # precision at epoch-microsecond tick magnitudes (~1.4e16) and can
        # round high step indices into the NEXT microsecond, diverging
        # from the oracle's integer `tick // 8`; ticks are non-negative
        # (tick_expr's assert_true rejects pre-epoch rows loudly), so the
        # shift is the exact quotient
        t_us = F.shiftright(t, _TICK_SHIFT)
        slots = []
        for j in range(n):
            if j == 0:
                upd = F.when(step == 0, F.greatest(acc[0], t_us)).otherwise(acc[0])
            else:
                ok = (
                    (step == j)
                    & (acc[j - 1] >= 0)
                    & (t_us - acc[j - 1] <= F.lit(window_us))
                )
                upd = F.when(ok, F.greatest(acc[j], acc[j - 1])).otherwise(acc[j])
            slots.append(upd)
        return F.array(*slots)

    def deepest(a: Column) -> Column:
        # deepest slot with a live chain start; F.greatest needs >= 2
        # columns, so the single-step funnel reads slot 0 directly
        slots = [
            F.when(a[j] >= 0, F.lit(j + 1)).otherwise(F.lit(0)) for j in range(n)
        ]
        return (slots[0] if n == 1 else F.greatest(*slots)).cast("int")

    init = F.array_repeat(F.lit(-1).cast("long"), n)
    depth = F.aggregate("ticks", init, fold, deepest)
    return (
        ticks.select(F.col("k"), depth.alias("funnel_level"))
        # contract: levels are [1, n] and level-0 keys are ABSENT — a key
        # whose events match only non-initial steps folds to 0 and at
        # scale those are most keys
        .filter(F.col("funnel_level") >= 1)
    )


def sequence_count(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: Sequence[Column],
) -> DataFrame:
    """ClickHouse `sequenceCount('(?1).*(?2)...(?N)')(ts, cond1..condN)`:
    per key, how many NON-OVERLAPPING complete chains cond1 < cond2 < ...
    < condN occur in time order, gaps allowed (the `.*` pattern form — the
    one a distributed engine can make deterministic; see window_funnel's
    module docstring for why insertion-order forms cannot be).
    `sequenceMatch` of the same pattern is `n_matches >= 1`.

    Greedy earliest-match counting: a single pointer advances on the next
    wanted step and resets after each complete chain — the classic greedy
    argument makes this the MAXIMUM number of disjoint chains, matching
    ClickHouse's non-overlapping count.  Same event total order and
    one-vote-per-(key, ts, step) contract as `window_funnel` (shared
    `tick_expr`); same single-exchange plan shape: one hash aggregate
    collecting each key's matching-event ticks, then a codegen fold.
    Keys with zero complete chains are absent (the level-0 rule).

    Output: (k, n_matches), n_matches >= 1.
    """
    n = len(steps)
    if not 1 <= n <= _TICK_BASE:
        raise ValueError(f"1..{_TICK_BASE} steps supported, got {n}")

    ticks = (
        df.select(
            F.col(key_col).alias("k"),
            tick_expr(ts_col, steps).alias("tick"),
        )
        .filter(F.col("tick").isNotNull())
        .groupBy("k")
        .agg(F.sort_array(F.collect_set("tick")).alias("ticks"))
    )

    def fold(acc: Column, t: Column) -> Column:
        step = t % _TICK_BASE
        p2 = F.when(step == acc[0], acc[0] + 1).otherwise(acc[0])
        return F.when(
            p2 == n, F.array(F.lit(0).cast("long"), acc[1] + 1)
        ).otherwise(F.array(p2, acc[1]))

    init = F.array(F.lit(0).cast("long"), F.lit(0).cast("long"))
    cnt = F.aggregate("ticks", init, fold, lambda a: a[1])
    return ticks.select(F.col("k"), cnt.alias("n_matches")).filter(
        F.col("n_matches") >= 1
    )


def sequence_match_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: Sequence[Column],
    max_gap_seconds: Sequence[int | None],
) -> DataFrame:
    """ClickHouse `sequenceMatch('(?1)(?t<=g1)(?2)(?t<=g2)(?3)')` parity
    — the time-CONDITION pattern form, where each ADJACENT pair of
    matched steps must occur within its own gap, as opposed to
    `windowFunnel`'s single window anchored at the chain's first event.
    `max_gap_seconds[i]` bounds ts(step i+2) - ts(step i+1); None means
    unconstrained (the `.*` form between those steps).

    Output: (k, seq_level) — the longest PREFIX of `steps` some
    gap-valid chain completes, in [1, len(steps)]; `sequenceMatch` of
    the full pattern is `seq_level = len(steps)`.  Keys with no step-1
    event are absent (the level-0 rule).

    Semantics and determinism: the shared `tick_expr` total order and
    one-vote-per-(key, ts, step) contract (module docstring).  The fold
    keeps, per depth, the MAXIMAL chain-END time: an upper-bounded gap
    can only get easier as the previous end moves later, so a fresher
    end dominates an earlier one for every possible extension and the
    greedy fold decides exactly the exists-a-chain predicate the SQL
    oracle states with joins.  (Lower-bound `(?t>g)` forms break that
    dominance and are deliberately NOT supported — a stated contract,
    not an oversight.)

    Plan shape: window_funnel's verbatim — one hash aggregate collecting
    each key's matching-event ticks (map-side combinable sets), then a
    codegen `aggregate` fold; no join, no window sort, no Python.
    """
    n = len(steps)
    if not 1 <= n <= _TICK_BASE:
        raise ValueError(f"1..{_TICK_BASE} steps supported, got {n}")
    if len(max_gap_seconds) != n - 1:
        raise ValueError("need exactly len(steps) - 1 gap bounds")
    gaps_us = [
        None if g is None else int(g) * 1_000_000 for g in max_gap_seconds
    ]

    ticks = (
        df.select(
            F.col(key_col).alias("k"),
            tick_expr(ts_col, steps).alias("tick"),
        )
        .filter(F.col("tick").isNotNull())
        .groupBy("k")
        .agg(F.sort_array(F.collect_set("tick")).alias("ticks"))
    )

    def fold(acc: Column, t: Column) -> Column:
        step = t % _TICK_BASE
        t_us = F.shiftright(t, _TICK_SHIFT)  # exact un-encode (see above)
        slots = []
        for j in range(n):
            if j == 0:
                upd = F.when(step == 0, F.greatest(acc[0], t_us)).otherwise(acc[0])
            else:
                ok = (step == j) & (acc[j - 1] >= 0)
                if gaps_us[j - 1] is not None:
                    ok = ok & (t_us - acc[j - 1] <= F.lit(gaps_us[j - 1]))
                # chain END time: sorted ticks make t_us >= any prior slot
                upd = F.when(ok, F.greatest(acc[j], t_us)).otherwise(acc[j])
            slots.append(upd)
        return F.array(*slots)

    def deepest(a: Column) -> Column:
        slots = [
            F.when(a[j] >= 0, F.lit(j + 1)).otherwise(F.lit(0)) for j in range(n)
        ]
        return (slots[0] if n == 1 else F.greatest(*slots)).cast("int")

    init = F.array_repeat(F.lit(-1).cast("long"), n)
    depth = F.aggregate("ticks", init, fold, deepest)
    return (
        ticks.select(F.col("k"), depth.alias("seq_level"))
        .filter(F.col("seq_level") >= 1)
    )


def funnel_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: Sequence[Column],
    window_seconds: int,
) -> DataFrame:
    """The funnel report: for each level L in [1, len(steps)], how many
    keys reached level >= L (the cumulative form dashboards plot).

    One conditional global aggregate over `window_funnel`'s per-key rows —
    the cumulative counts come out of a single reduce as a constant-width
    row, then a row-local `inline` turns them into (funnel_level,
    n_reached) rows; no window, no self-join, no second shuffle."""
    per_key = window_funnel(df, key_col, ts_col, steps, window_seconds)
    return cumulative_report(per_key, len(steps))


def cumulative_report(per_key: DataFrame, n: int) -> DataFrame:
    """(funnel_level, n_reached) cumulative roll-up of per-key depth rows
    (a `funnel_level` column, levels >= 1) — ONE conditional global
    aggregate + a row-local inline.  Shared by `funnel_counts` and the
    streaming drain's report so the batch gate and the stream attest the
    SAME shape from the same code."""
    totals = per_key.agg(
        *[
            F.sum(
                F.when(F.col("funnel_level") >= j, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"n{j}")
            for j in range(1, n + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("funnel_level"),
                F.coalesce(F.col(f"n{j}"), F.lit(0)).cast("long").alias("n_reached"),
            )
            for j in range(1, n + 1)
        ]
    )
    return totals.select(F.inline(rows)).orderBy("funnel_level")


def retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    cohort_day: str,
    offsets: Sequence[int],
) -> DataFrame:
    """Cohort retention (ClickHouse `retention`): among keys active on
    `cohort_day` (the cohort), how many were also active on
    cohort_day + offset, for each offset.

    Output: (day_offset int, retained bigint, cohort_size bigint), one row
    per offset, ordered.  Offset 0 rows report the cohort against itself.

    Shape: per-key boolean flags via conditional aggregation (hash agg,
    map-side combinable), then ONE global roll-up and a row-local explode
    of the constant-width result — no joins, no windows, no second scan.
    """
    day = F.to_date(F.col(ts_col))
    d0 = F.lit(cohort_day).cast("date")
    flags = df.groupBy(F.col(key_col).alias("k")).agg(
        *[
            F.max(
                F.when(day == F.date_add(d0, int(o)), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"a{i}")
            for i, o in enumerate(offsets)
        ]
    )
    in_cohort = None
    for i, o in enumerate(offsets):
        if int(o) == 0:
            in_cohort = F.col(f"a{i}") == 1
    if in_cohort is None:
        raise ValueError("offsets must include 0 (the cohort day itself)")
    totals = flags.filter(in_cohort).agg(
        F.count(F.lit(1)).alias("cohort_size"),
        # coalesce: an EMPTY cohort must report 0 retained, not NULL
        # (sum over zero rows) — the oracle coalesces identically
        *[
            F.coalesce(F.sum(f"a{i}"), F.lit(0)).alias(f"r{i}")
            for i in range(len(offsets))
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(int(o)).alias("day_offset"),
                F.col(f"r{i}").cast("long").alias("retained"),
            )
            for i, o in enumerate(offsets)
        ]
    )
    return (
        totals.select(F.inline(pairs), F.col("cohort_size").cast("long"))
        .orderBy("day_offset")
    )
