"""Registry/bench/oracle wiring invariants — the drift class that broke
test_plan_shapes when a query moved between QUERIES and EXTRA_QUERIES.
Pure static checks; no Spark session needed."""

from __future__ import annotations

import bench
from apache_kafka_clickhouse_demo_spark import queries as Q


def test_gate_registry_is_exactly_50_and_fully_oracled():
    assert len(Q.QUERIES) == 50  # driver records at most 50 rows
    missing = [k for k in Q.QUERIES if k not in Q.oracles()]
    assert missing == [], f"gate queries without oracle SQL: {missing}"


def test_gate_and_extras_do_not_overlap():
    dupes = set(Q.QUERIES) & set(Q.EXTRA_QUERIES)
    assert dupes == set(), f"registered in both gate and extras: {dupes}"


def test_bench_headline_exists_and_baselines_point_at_headliners():
    # bench rows resolve in the registry OR in bench.BENCH_ONLY (the
    # r13 non-SQL-expressible trend rows: unigram fit/apply, FFD
    # packing and its streaming twin)
    missing = [n for n in bench.HEADLINE if n not in bench.ALL_QUERIES]
    assert missing == [], f"HEADLINE names not in any registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    # r13 tiering: a baseline may point at a SAMPLED_TIER row that is
    # not in this round's window — but never at an unknown name
    allowed = set(bench.HEADLINE) | set(bench.SAMPLED_TIER)
    stray = [n for n in bench.BASELINE_SEC if n not in allowed]
    assert stray == [], f"stall-guard baselines for non-headline queries: {stray}"
    assert set(bench.SAMPLED_TIER) <= set(bench.ALL_QUERIES)
    # r14 (VERDICT r13 #7): every gate row is ALWAYS timed — the tier
    # may only hold non-gate extras/BENCH_ONLY rows
    assert not set(bench.SAMPLED_TIER) & set(Q.QUERIES), (
        set(bench.SAMPLED_TIER) & set(Q.QUERIES)
    )
    # every tier row gets a trend point within a full rotation cycle,
    # and the cycle stays at the r13 cadence (<= 3 rounds) so a sampled
    # row is never unchecked longer than that
    n_rounds = -(-len(bench.SAMPLED_TIER) // bench.SAMPLE_K)
    assert n_rounds <= 3, n_rounds
    cycle = set()
    for r in range(1, n_rounds + 1):
        cycle |= set(bench._sampled_window(r))
    assert cycle == set(bench.SAMPLED_TIER)


def test_round_constant_tracks_driver_artifacts():
    """ADVICE r14: ROUND is a manually bumped constant; a forgotten bump
    would silently re-time the same SAMPLED_TIER window forever.  The
    driver drops CORRECTNESS_r{N}.json at round N's close, so during
    round N the artifact count is N-1 (start) or N (after the driver's
    mid-round run).  A stale constant fails here the moment the next
    artifact lands instead of silently repeating a window."""
    import pathlib

    root = pathlib.Path(bench.__file__).resolve().parent
    n_artifacts = len(list(root.glob("CORRECTNESS_r*.json")))
    assert n_artifacts <= bench.ROUND <= n_artifacts + 1, (
        f"bench.ROUND={bench.ROUND} but {n_artifacts} CORRECTNESS_r*.json "
        "artifacts exist — bump (or un-bump) ROUND at round start"
    )


def test_every_headliner_has_a_stall_guard_entry():
    """A headliner without a baseline entry silently disables its stall
    guard (bound = inf); every name must carry its trend start."""
    missing = [n for n in bench.HEADLINE if n not in bench.BASELINE_SEC]
    assert missing == [], f"headliners without a baseline/trend entry: {missing}"


def test_bench_final_line_fits_driver_tail_window():
    """BENCH_r10 recorded parsed:null because the single JSON line with
    84 queries outgrew the driver's 2000-byte stdout tail capture; the
    fallback must keep the line under the window at the CURRENT registry
    size (full dict if it fits, else gate-only with a pointer)."""
    import json

    import bench

    times = {k: 123.456 for k in bench.HEADLINE}
    compact = {
        "metric": "headline_total_wall",
        "value": 9999.999,
        "unit": "sec",
        "queries": times,
        "suspect": [],
        "sf": 0.1,
    }
    line = bench._compact_line(compact)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["value"] == 9999.999
    assert parsed["queries"]  # never degrades to an empty dict here
