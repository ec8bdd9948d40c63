"""Deterministic corpus sampling / sharding for training-data export
(SURVEY.md §2.7 beyond-parity layer).

Two operators a large-scale training pipeline runs between curation and
the dataloader:

- `stratified_sample` : exact per-group quota sampling (N docs per
  source/language), deterministic by content-independent hash — how eval
  and ablation sets are cut so re-runs on a grown corpus keep the same
  members for unchanged groups.
- `shuffle_shards`    : deterministic global shuffle + sharding — the
  step that turns a curated corpus into dataloader shards whose
  within-shard order is pseudorandom but bit-stable across runs,
  engines, and cluster sizes (h48-keyed, like `train_test_split`).
- `mixture_sample`    : deterministic per-group RATE sampling — the
  data-mixture primitive (up-weight curated sources, down-weight crawl)
  as a pure row-local scan filter.
- `temperature_mixture`: COMPUTES the per-source rates mixture_sample
  consumes — n_g^alpha temperature rebalancing (XLM-R alpha=1/2
  oracle-exact in-engine; other alphas via the bounded driver-side
  integer-rate rule `temperature_rates_py`).
- `calibrate_scores`  : per-source integer permille rank — the
  FineWeb/CCNet score-calibration step before any cross-source
  selection threshold.
- `diverse_sample`    : cluster-balanced selection over an embedding
  column (shared IVF quantizer + exact per-cell quota).

The hash-keyed operators use the engine-portable h48 family
(`functions/hashing.py`), and every operator's arithmetic is integer-
exact, so their DuckDB oracles are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from apache_kafka_clickhouse_demo_spark.functions import hashing as H


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
    salt: str = "strat:",
) -> DataFrame:
    """Keep the `n_per_group` rows with the smallest h48(salt || id) in
    each group — an exact, reproducible quota sample.

    Scale shape: a single window partitioned by `group_col` would funnel
    every row of the group's 100 TB worth through ONE task (the skewed-
    group hotspot).  Instead this is the same two-phase reduction as the
    ANN top-k (`similarity._two_phase_topk`): partition-local top-N per
    (group, input partition) as a map-side `collect_list` + sorted slice,
    then a merge of the short per-partition lists — shuffle volume is
    O(groups x N x partitions), never O(rows).  Memory: phase 2's tasks
    hold at most N x (partitions of one group) entries; phase 1's
    aggregation buffer holds one (group, input-partition) slice before
    the cut, so its bound is the INPUT partition size — governed by the
    scan split (`files.maxPartitionBytes`), NOT by group size.  Feed the
    natural scan partitioning; repartitioning BY GROUP first would
    reconcentrate a hot group into one task, the funnel this shape
    exists to avoid.

    Output: (group_col, id_col, strat_rank), rank 1..N by (hash, id) —
    ties on the 48-bit hash are broken by id so the sample is total-order
    deterministic.
    """
    hkey = H.h48(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # keep the id's own type (string doc ids stay strings); struct sort
    # orders by (hkey, id) for any orderable id type
    entry = F.struct(hkey.alias("hkey"), F.col(id_col).alias("rid"))
    scored = df.select(F.col(group_col).alias("grp"), entry.alias("entry"))

    partial = scored.groupBy("grp", F.spark_partition_id().alias("_pid")).agg(
        F.slice(F.array_sort(F.collect_list("entry")), 1, n_per_group).alias("top")
    )
    merged = partial.groupBy("grp").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("top"))), 1, n_per_group
        ).alias("top")
    )
    return (
        merged.select("grp", F.posexplode("top").alias("_pos", "e"))
        .select(
            F.col("grp").alias(group_col),
            F.col("e.rid").alias(id_col),
            (F.col("_pos") + 1).alias("strat_rank"),
        )
        .orderBy(group_col, "strat_rank")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    salt: str = "shuf:",
) -> DataFrame:
    """Deterministic global shuffle into `num_shards` dataloader shards.

    Each row gets a pseudorandom position `pos = h48(salt || id)`;
    `shard = pos % num_shards` balances rows across shards (hash-uniform,
    no hot shard), and `seq` numbers the rows within each shard by
    (pos, id) — the within-shard order IS the shuffled order, bit-stable
    across runs and cluster sizes because nothing depends on input
    partitioning or arrival order.

    One shuffle (the window's hash partitioning on `shard`); per-task
    state is one shard's rows, so scale `num_shards` with the corpus
    (100 TB -> tens of thousands of shards of a few GB — which is also
    the file granularity a dataloader wants).  Ties on the 48-bit hash
    are broken by id, so `seq` is total-order deterministic.

    Output: (id_col, shard, seq).
    """
    pos = H.h48(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    with_pos = df.select(
        F.col(id_col),
        pos.alias("_pos"),
        F.pmod(pos, F.lit(num_shards)).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_pos", id_col)
    return (
        with_pos.withColumn("seq", F.row_number().over(w))
        .select(id_col, "shard", "seq")
        .orderBy("shard", "seq")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str,
    salt: str = "mix:",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group RATE sampling — the data-mixture primitive
    (keep ~rate_g of each source/language/domain, e.g. up-weight curated
    sources and down-weight crawl):

        keep(row) <=> h48(salt || id) % 1e6  <  round(rate_g * 1e6)

    Entirely row-local (one `when`-free map lookup, no shuffle, no join):
    the rates dict becomes a literal map expression, so at 100 TB this is
    a pure scan-side filter that combines with pushdown and costs nothing
    beyond the scan.  Membership is content-independent and bit-stable:
    re-running on a grown corpus keeps exactly the previously-kept rows
    of unchanged groups (monotone thresholds: raising a group's rate only
    ADDS members, never swaps them) — the property that makes mixture
    re-weighting between training runs reproducible.

    `rates` keys are group values; anything absent gets `default_rate`
    (0.0 = drop unknown groups, 1.0 = pass them through).
    """
    pairs: list[Column] = []
    for k, v in sorted(rates.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(int(round(v * 1_000_000))))
    thresh = F.coalesce(
        F.create_map(*pairs)[F.col(group_col)] if pairs else F.lit(None),
        F.lit(int(round(default_rate * 1_000_000))),
    )
    bucket = H.h48(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1_000_000
    return df.filter(bucket < thresh)


#: Bound on the alpha != 1/2 path's driver-side group-count collect
#: (rates are computed per GROUP, so the group column must be low-
#: cardinality — sources/languages/domains, never a doc id).
MAX_TEMP_GROUPS = 100_000


def temperature_rates_py(
    counts: dict, target_rows: int, alpha: float
) -> dict:
    """The integer rate rule of `temperature_mixture`, as plain Python
    over a bounded {group: n_rows} dict:

        w_g          = floor(n_g^alpha * 1000)
        rate_micro_g = min(1e6, (target_rows * w_g * 1e6)
                                  // (sum_h w_h * n_g))

    Everything after the one `pow` is exact int arithmetic.  This IS
    the engine's alpha != 1/2 implementation (the engine collects the
    bounded group counts and calls this), so the operator and its test
    replica share only the RULE, not code paths with float hazards.
    """
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    w = {g: int(math.floor(math.pow(n, alpha) * 1000.0)) for g, n in counts.items()}
    tw = sum(w.values())
    if tw == 0:
        return {g: 0 for g in counts}
    return {
        g: min(1_000_000, target_rows * w[g] * 1_000_000 // (tw * n))
        for g, n in counts.items()
    }


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    target_rows: int,
    id_col: str,
    salt: str = "temp:",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture REBALANCING — the multilingual
    corpus-balancing recipe (Conneau et al. XLM-R at alpha = 1/2,
    mT5 at alpha = 0.3: sample group g with probability proportional
    to p_g^alpha, flattening the head so low-resource groups are not
    drowned).  Where `mixture_sample` APPLIES caller-given rates, this
    operator COMPUTES them from the corpus itself:

        w_g          = floor(n_g^alpha * 1000)
        rate_micro_g = min(1e6, (target_rows * w_g * 1e6)
                                  div (sum_h w_h * n_g))
        keep(row)   <=> h48(salt || id) % 1e6 < rate_micro_g

    so the EXPECTED kept rows total ~target_rows distributed
    proportional to n_g^alpha — head groups capped, tails kept whole
    (rate saturates at 1.0; the realized total then undershoots
    target_rows, the standard behavior — re-normalizing against only
    unsaturated groups is a fixed-point iteration real pipelines skip).

    Two float-honesty regimes (the BPE batched-rule precedent):

    - **alpha = 1/2 (default)** runs fully in the engine as
      w_g = floor(sqrt(n_g * 1e6)) — identical to the rule above in
      the reals, and ORACLE-EXACT because IEEE sqrt is correctly
      rounded, so Spark's and DuckDB's doubles agree bit-for-bit
      (documented agreement bound n_g * 1e6 < 2^52, the isqrt
      precedent).  The division chain runs in DECIMAL(38,0)
      (target * w * 1e6 reaches ~1e26 at real scale; HUGEINT mirrors
      it in DuckDB) — both operands positive, so `div` and `//` agree.
    - **alpha != 1/2** cannot be cross-engine exact (pow is not
      correctly rounded; libm builds differ), so the rates are
      computed DRIVER-SIDE from the bounded group-count rows via
      `temperature_rates_py` — one deterministic `math.pow` per GROUP
      on one machine, never a per-row float in either engine — and
      pinned row-for-row against a pure-Python replica of the same
      rule (tests/test_sampling.py, alpha = 0.3).  The collect is
      bounded by MAX_TEMP_GROUPS (raises on a high-cardinality group
      column — rates per doc id are a caller bug, not a workload).

    NULL-group rows are EXCLUDED from the weights and DROPPED from the
    output (ADVICE r11: they previously depressed every real group's
    rate while the non-null-safe join dropped them anyway) — consistent
    with `mixture_sample`'s default_rate = 0.0 for unknown groups.
    Membership is content-independent and monotone in the rate, the
    same reproducibility contract as `mixture_sample`.

    Output: surviving rows with `rate_micro` attached (the decision is
    observable; groups at rate 1e6 pass whole).

    Plan shape at 100 TB: one map-side-combinable group count, a 1-row
    total broadcast (alpha = 1/2) or a bounded driver round-trip
    (alpha != 1/2), and one group-keyed join of the bounded rates frame
    back to the corpus — pin_wide-pinned on the engine path, since a
    derived aggregate's size estimate is exactly what the r9 misplan
    class got wrong; an explicit broadcast of the driver-built rates
    frame on the collected path (bounded rows by construction).  The
    keep filter itself is row-local.
    """
    from apache_kafka_clickhouse_demo_spark.sources.tables import (
        is_wide_source,
        pin_wide,
        spread_small,
    )

    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    base = spread_small(df).filter(F.col(group_col).isNotNull())
    counts = base.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    bucket = H.h48(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1_000_000

    if alpha == 0.5:
        w = F.floor(F.sqrt(F.col("_n").cast("double") * 1_000_000.0)).cast("long")
        weighted = counts.select(group_col, "_n", w.alias("_w"))
        total = weighted.agg(F.sum("_w").cast("long").alias("_tw"))
        rates = (
            weighted.crossJoin(F.broadcast(total))
            .withColumn(
                "rate_micro",
                F.least(
                    F.lit(1_000_000).cast("long"),
                    F.expr(
                        f"CAST({int(target_rows)} AS DECIMAL(38,0)) * _w * 1000000"
                        " div (CAST(_tw AS DECIMAL(38,0)) * _n)"
                    ).cast("long"),
                ),
            )
            .select(group_col, "rate_micro")
        )
        joined = base.join(pin_wide(rates, is_wide_source(df)), group_col)
        return joined.filter(bucket < F.col("rate_micro"))

    # alpha != 1/2: bounded driver-side rates (see docstring regime 2)
    cnt_rows = counts.limit(MAX_TEMP_GROUPS + 1).collect()
    if len(cnt_rows) > MAX_TEMP_GROUPS:
        raise ValueError(
            f"temperature_mixture: > {MAX_TEMP_GROUPS} distinct groups in "
            f"{group_col!r}; rates are per-source, not per-document"
        )
    rate_map = temperature_rates_py(
        {r[group_col]: r["_n"] for r in cnt_rows}, int(target_rows), alpha
    )
    gtype = df.schema[group_col].dataType.simpleString()
    rates_df = df.sparkSession.createDataFrame(
        [(g, r) for g, r in sorted(rate_map.items())],
        schema=f"{group_col} {gtype}, rate_micro long",
    )
    joined = base.join(F.broadcast(rates_df), group_col)
    return joined.filter(bucket < F.col("rate_micro"))


def diverse_sample(
    emb: DataFrame,
    n_per_cell: int,
    target_centroids: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ivf_salt: str = "ivf:",
    strat_salt: str = "divs:",
) -> DataFrame:
    """Cluster-balanced diverse sampling over an embedding column — the
    semantic-diversity selection of the DataComp/SemDeDup recipes (cap
    how much any one embedding-space region contributes to the training
    mix, instead of letting the head clusters dominate a uniform draw).

    Composition of two PROVABLY-shared primitives: the IVF coarse
    quantizer (`similarity.ivf_quantize` — the same centroids/assignment
    as ivf_topk and semantic_dedup; pass their salt to share the
    quantization decision outright) assigns every vector to a cell, then
    `stratified_sample` keeps an exact deterministic quota per cell (the
    skew-safe two-phase reduction — a head cell's 100 TB worth never
    funnels through one task).

    Output: (cent_id, <id_col>, strat_rank), rank 1..n_per_cell per cell
    by (h48(salt||id), id).

    Plan shape at 100 TB: quantizer = one bounded-centroid broadcast
    argmax (two-level above 4096 centroids) + one per-vector aggregate;
    quota = the two-phase slice reduction, shuffle volume
    O(cells x n x partitions), never O(rows).
    """
    from apache_kafka_clickhouse_demo_spark.operators.similarity import (
        ivf_quantize,
    )

    _, assign = ivf_quantize(emb, target_centroids, vec_col, id_col, ivf_salt)
    cells = assign.select(F.col("vid").alias(id_col), "cent_id")
    return stratified_sample(
        cells, "cent_id", n_per_cell, id_col, salt=strat_salt
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    quantiles_permille: tuple[int, ...] = (250, 500, 750),
) -> DataFrame:
    """ClickHouse `quantileExactWeighted` parity: per group, the exact
    weighted quantiles of an integer value column — each row counts
    `weight` times.  The answer for permille p is the SMALLEST value
    whose running weight (rows ordered by value) reaches
    ceil(total_weight * p / 1000) — the standard exact-weighted rule,
    all-integer, so both engines agree bit-for-bit (no interpolation).

    Stated drop rule (the topKWeighted convention): rows with NULL
    value, NULL weight, or non-positive weight are dropped — weighted
    quantile mass only moves up.

    Plan shape: one cumulative-weight window + one total-weight window
    over the SAME partition spec (one shuffle), then one aggregate of
    min(value where cum >= target) per quantile.  A hot group funnels
    through one task — the window family's known trade
    (`calibrate_scores` states it); groups are bounded-cardinality by
    construction in every registered use.  Ties are safe under the
    row-frame cumsum: among equal values, whichever row first reaches
    the target carries the same value.
    """
    for p in quantiles_permille:
        # ints only: a float would silently truncate in both the target
        # expression and the q{p} alias; duplicates would emit two
        # identically-named columns (AMBIGUOUS_REFERENCE downstream)
        if not isinstance(p, int) or not 0 < p <= 1000:
            raise ValueError(
                "quantiles_permille entries must be ints in (0, 1000]"
            )
    if len(set(quantiles_permille)) != len(quantiles_permille):
        raise ValueError("quantiles_permille entries must be distinct")
    src = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    ).filter(F.col("v").isNotNull() & F.col("w").isNotNull() & (F.col("w") > 0))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("grp")
    staged = src.select(
        "grp",
        "v",
        F.sum("w").over(wcum).alias("_cum"),
        F.sum("w").over(wtot).alias("_tot"),
    )
    aggs = []
    for p in quantiles_permille:
        target = F.expr(f"(_tot * {int(p)} + 999) div 1000")
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col("v"))).alias(f"q{int(p)}")
        )
    aggs.append(F.max("_tot").cast("long").alias("total_weight"))
    return staged.groupBy(F.col("grp").alias(group_col)).agg(*aggs)


def calibrate_scores(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Per-source score calibration (r12) — the FineWeb/CCNet trick of
    replacing a raw quality score with its WITHIN-SOURCE percentile
    before cross-source selection: classifier scores drift across
    dumps/sources (different length mixes, boilerplate rates), so a
    global threshold keeps whole sources and drops whole sources; the
    calibrated value compares like with like.

        calib = (rank(score within group) - 1) * scale
                  div (count(group) - 1)          (0 when count == 1)

    Pure INTEGER arithmetic end-to-end (rank and count are exact, both
    operands non-negative so Spark `div` == DuckDB `//`) — no float
    percentile interpolation to disagree across engines.  Ties share a
    rank (SQL RANK semantics), so equal scores calibrate equally —
    deterministic without an id tie-break, and the id never influences
    a row's calibrated value.

    Scale shape: one window per group (rank + count over the same
    partition spec — ONE shuffle, no join).  A hot source funnels its
    rows through one task — the window family's known trade (the gated
    sessionization/rank rows share it); sources/dumps are
    bounded-cardinality by construction, and the approximate scale
    path for truly monster groups is bucketing against GK-sketch
    boundaries (`value_percentiles_approx`'s family), which trades
    exactness for a bounded broadcast.

    Output: every input row with `calib` attached, in [0, scale].
    NULL groups form one group (SQL window NULL partitioning); NULL
    scores sort first (SQL default) and calibrate lowest.
    """
    if scale < 1:
        raise ValueError("scale must be >= 1")
    w = Window.partitionBy(group_col)
    rank = F.rank().over(w.orderBy(score_col)).cast("long")
    cnt = F.count(F.lit(1)).over(w).cast("long")
    out = df.select("*", rank.alias("_rk"), cnt.alias("_n"))
    # `div` (integer division) needs the SQL form; both operands are
    # non-negative longs, so Spark div == DuckDB // exactly
    calib = F.when(F.col("_n") == 1, F.lit(0).cast("long")).otherwise(
        F.expr(f"(_rk - 1) * {int(scale)} div (_n - 1)")
    )
    return out.withColumn("calib", calib.cast("long")).drop("_rk", "_n")
