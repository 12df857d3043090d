"""PageRank: fixed-iteration results vs a plain Python reference."""

import pytest

from fbs_data_pipelines_spark.operators.graph import pagerank


def _reference_pagerank(edge_list, damping=0.85, n_iter=10):
    edges = sorted(set(edge_list))
    nodes = sorted({u for e in edges for u in e})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: 1.0 for v in nodes}
    for _ in range(n_iter):
        mass = {v: 0.0 for v in nodes}
        for u, v in edges:
            mass[v] += rank[u] / outdeg[u]
        rank = {v: (1 - damping) + damping * mass[v] for v in nodes}
    return rank


def test_pagerank_matches_reference(spark):
    edge_list = [
        (1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (1, 2),  # dup edge collapses
        (5, 3),  # 5 is dangling-in only; 4 and 5 have no in-edges
    ]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, n_iter=10).collect()}
    want = _reference_pagerank(edge_list)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9)


def test_pagerank_hub_dominates(spark):
    # undirected star: the hub holds most of the rank
    spokes = [(0, i) for i in range(1, 9)] + [(i, 0) for i in range(1, 9)]
    df = spark.createDataFrame(spokes, "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(df, n_iter=15).collect()}
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0) * 3
    # total mass is conserved on a graph with no dangling nodes
    assert sum(ranks.values()) == pytest.approx(len(ranks), rel=1e-6)
