"""Reciprocal-rank fusion (operators/similarity.py: rrf_fuse, Cormack
et al. SIGIR'09) — the integer contribution formula against a
pure-Python replica, consensus vs single-arm ordering, truncated-list
semantics, tie-breaks, and the single-arm degenerate case."""

from __future__ import annotations

import pytest

from apache_kafka_clickhouse_demo_spark.operators import similarity as SIM


def _arm(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long, rank int")


def _py_rrf(arms, k, rrf_k=SIM.RRF_K):
    fused: dict[tuple[int, int], list[int]] = {}
    for arm in arms:
        for qid, doc, rank in arm:
            fused.setdefault((qid, doc), []).append(
                SIM.RRF_SCALE // (rrf_k + rank)
            )
        # ranks are unique per (arm, query): the fixture rows must model
        # real top-k lists or the replica itself is meaningless
        seen = [(q, r) for q, _, r in arm]
        assert len(seen) == len(set(seen))
    out = {}
    for (qid, doc), cs in fused.items():
        out.setdefault(qid, []).append((-sum(cs), doc, sum(cs), len(cs)))
    rows = []
    for qid, entries in out.items():
        for pos, (_, doc, score, n) in enumerate(sorted(entries)[:k]):
            rows.append((qid, pos + 1, doc, score, n))
    return sorted(rows)


ARM_A = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)]
ARM_B = [(1, 11, 1), (1, 13, 2), (2, 20, 1), (2, 22, 2), (2, 21, 3)]


def test_matches_pure_python_replica(spark):
    got = sorted(
        tuple(r)
        for r in SIM.rrf_fuse([_arm(spark, ARM_A), _arm(spark, ARM_B)], k=10).collect()
    )
    assert got == _py_rrf([ARM_A, ARM_B], k=10)


def test_contributions_are_exact_integer_floors(spark):
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score_nano"], r["n_arms"])
        for r in SIM.rrf_fuse([_arm(spark, ARM_A), _arm(spark, ARM_B)], k=10).collect()
    }
    # doc 11 sits at rank 2 in arm A and rank 1 in arm B
    assert got[(1, 11)] == (
        SIM.RRF_SCALE // (SIM.RRF_K + 2) + SIM.RRF_SCALE // (SIM.RRF_K + 1),
        2,
    )
    # doc 12 appears only in arm A at rank 3 (truncated-list semantics:
    # the missing arm contributes nothing, the row still surfaces)
    assert got[(1, 12)] == (SIM.RRF_SCALE // (SIM.RRF_K + 3), 1)


def test_consensus_outranks_single_arm_tail(spark):
    out = SIM.rrf_fuse([_arm(spark, ARM_A), _arm(spark, ARM_B)], k=10).collect()
    q1 = [r["doc_id"] for r in out if r["query_id"] == 1]
    # doc 11 (ranks 2+1) must beat every single-arm doc for query 1
    assert q1[0] == 11
    q2 = {r["doc_id"]: r["rank"] for r in out if r["query_id"] == 2}
    # doc 20 is rank 1 in BOTH arms — unbeatable
    assert q2[20] == 1


def test_k_truncation_and_tiebreak_on_doc_id(spark):
    # two docs with the SAME single-arm rank (one per arm) tie exactly —
    # the lower doc_id must win the earlier fused rank
    a = [(1, 200, 1), (1, 5, 2)]
    b = [(1, 100, 1), (1, 6, 2)]
    out = SIM.rrf_fuse([_arm(spark, a), _arm(spark, b)], k=3).collect()
    assert [(r["rank"], r["doc_id"]) for r in out] == [(1, 100), (2, 200), (3, 5)]


def test_single_arm_preserves_arm_order(spark):
    out = SIM.rrf_fuse([_arm(spark, ARM_A)], k=10).collect()
    q1 = [(r["rank"], r["doc_id"]) for r in out if r["query_id"] == 1]
    assert q1 == [(1, 10), (2, 11), (3, 12)]
    assert all(r["n_arms"] == 1 for r in out)


def test_empty_arm_list_raises(spark):
    with pytest.raises(ValueError):
        SIM.rrf_fuse([], k=10)


# ---------------------------------------------------------------------------
# hard_negatives (same rank-frame family)
# ---------------------------------------------------------------------------


def test_hard_negatives_removes_positives_and_renumbers(spark):
    out = SIM.hard_negatives(_arm(spark, ARM_A), _arm(spark, ARM_B), k=10).collect()
    got = {(r["query_id"], r["rank"]): (r["doc_id"], r["cand_rank"]) for r in out}
    # query 1: positives {11, 13} -> candidates 10, 11, 12 lose 11;
    # survivors renumber in candidate order with cand_rank preserved
    assert got[(1, 1)] == (10, 1)
    assert got[(1, 2)] == (12, 3)
    assert (1, 3) not in got
    # query 2: positives {20, 22, 21} swallow both candidates
    assert not [k for k in got if k[0] == 2]


def test_hard_negatives_k_truncates_after_removal(spark):
    cand = [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], start=1)]
    pos = [(1, 11, 1)]
    out = SIM.hard_negatives(_arm(spark, cand), _arm(spark, pos), k=2).collect()
    assert [(r["rank"], r["doc_id"]) for r in out] == [(1, 10), (2, 12)]


def test_hard_negatives_disjoint_arms_pass_through(spark):
    cand = [(1, 10, 1), (1, 11, 2)]
    pos = [(1, 99, 1)]
    out = SIM.hard_negatives(_arm(spark, cand), _arm(spark, pos), k=10).collect()
    assert [(r["rank"], r["doc_id"], r["cand_rank"]) for r in out] == [
        (1, 10, 1),
        (2, 11, 2),
    ]
