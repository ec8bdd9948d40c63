"""Property test: connected_components vs a union-find reference.

Random graphs (including the long-path shapes that defeat plain one-hop
label propagation) must label every node with the smallest reachable id.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from apache_kafka_clickhouse_demo_spark.operators.dedup import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id of each component
    best: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        best[r] = min(best.get(r, v), v)
    return {v: best[find(v)] for v in range(n_nodes)}


def _run(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    if edges:
        pairs = spark.createDataFrame(list(edges), "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == _union_find(n_nodes, edges)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_nodes=st.integers(2, 14),
    raw_edges=st.lists(st.tuples(st.integers(0, 13), st.integers(0, 13)), max_size=12),
)
def test_cc_matches_union_find(spark, n_nodes, raw_edges):
    edges = [(min(a, b), max(a, b)) for a, b in raw_edges if a != b and a < n_nodes and b < n_nodes]
    _run(spark, n_nodes, edges)


def test_cc_long_chain_converges(spark):
    """Path graph with diameter >> a one-hop round budget: pointer jumping
    must converge in O(log n) rounds (plain propagation returned wrong
    labels here before the fix)."""
    n = 40
    _run(spark, n, [(i, i + 1) for i in range(n - 1)])
