"""First-fit-decreasing bin packing (operators/text_analysis.py:
pack_bins_ffd, Krell et al. 2021 no-split regime) — pinned bit-for-bit
against an independent pure-Python replica (non-SQL-expressible: bin
state is a sequential fold, the BPE precedent), plus capacity,
overflow, drop-rule, and efficiency contracts."""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark.functions import hashing as H
from apache_kafka_clickhouse_demo_spark.operators import text_analysis as TA


def _run(spark, rows, capacity, buckets=4, salt="ffd:"):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = TA.pack_bins_ffd(df, capacity, buckets=buckets, salt=salt).collect()
    return sorted((r["bucket"], r["bin_id"], r["doc_id"], r["n_tokens"],
                   r["bin_fill"], r["overflow"]) for r in out)


def _ref(rows, capacity, buckets, salt="ffd:"):
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for doc_id, n in rows:
        if n is None or n < 0:
            continue
        b = H.py_h48(f"{salt}{doc_id}") % buckets
        by_bucket.setdefault(b, []).append((doc_id, n))
    out = []
    for b, docs in by_bucket.items():
        docs.sort(key=lambda dn: (-dn[1], dn[0]))
        fills: list[int] = []
        assign = []
        for doc_id, n in docs:
            placed = -1
            for i, f in enumerate(fills):
                if f + n <= capacity:
                    placed = i
                    fills[i] = f + n
                    break
            if placed < 0:
                placed = len(fills)
                fills.append(n)
            assign.append((doc_id, n, placed))
        for doc_id, n, i in assign:
            out.append((b, i, doc_id, n, fills[i], n > capacity))
    return sorted(out)


ROWS = [(i, (i * 37) % 90 + 5) for i in range(200)]


def test_matches_pure_python_replica_bit_for_bit(spark):
    assert _run(spark, ROWS, capacity=128) == _ref(ROWS, 128, 4)


def test_capacity_respected_except_singleton_overflow_bins(spark):
    got = _run(spark, ROWS + [(999, 500)], capacity=128)
    fills = {}
    members = {}
    for b, bin_id, doc_id, n, fill, over in got:
        fills[(b, bin_id)] = fill
        members.setdefault((b, bin_id), []).append((doc_id, over))
    for key, fill in fills.items():
        if fill > 128:
            # an over-capacity bin must be a single overflow document
            assert members[key] == [(members[key][0][0], True)]
    over_rows = [r for r in got if r[5]]
    assert len(over_rows) == 1, "the oversize doc must survive, flagged"
    assert over_rows == [(over_rows[0][0], over_rows[0][1], 999, 500, 500, True)]


def test_null_and_negative_token_rows_are_dropped(spark):
    rows = [(1, 10), (2, None), (3, -5), (4, 0)]
    got = _run(spark, rows, capacity=16)
    assert sorted(r[2] for r in got) == [1, 4]  # 0-token docs still pack


def test_ffd_never_uses_more_bins_than_next_fit(spark):
    # FFD's bin count is <= the naive sequential next-fit count in every
    # bucket (the whole point of sorting + first-fit)
    rows = [(i, n) for i, n in enumerate([70, 60, 50, 40, 30, 20, 10, 90, 80, 15])]
    got = _run(spark, rows, capacity=100, buckets=1)
    ffd_bins = len({(r[0], r[1]) for r in got})
    docs = [n for _, n in rows]
    nf_bins, fill = 1, 0
    for n in docs:
        if fill + n > 100:
            nf_bins += 1
            fill = n
        else:
            fill += n
    assert ffd_bins <= nf_bins


def test_determinism_across_runs_and_bucket_locality(spark):
    a = _run(spark, ROWS, capacity=96)
    b = _run(spark, ROWS, capacity=96)
    assert a == b
    # every doc appears exactly once
    assert sorted(r[2] for r in a) == sorted(d for d, _ in ROWS)
