"""PageRank operator: exact match vs a local power-method replay (same
rounding schedule), mass conservation, and dangling-node redistribution —
the case the catalog's symmetrized graph can't exercise.
"""

from __future__ import annotations

import math

from prajna_spark.operators.pagerank import pagerank


def _local_pagerank(edges, n_iter=5, d=0.85, dec=9):
    def pr(x):
        return math.floor(x * 10**dec + 0.5) / 10**dec

    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = float(len(nodes))
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0.0) + 1.0
    r = {v: pr(1.0 / n) for v in nodes}
    base = 1.0 - d
    for _ in range(n_iter):
        m = {v: 0.0 for v in nodes}
        for s, t in edges:
            m[t] += r[s] / out[s]
        dang = sum(r[v] for v in nodes if v not in out)
        r = {v: pr(base / n + d * (m[v] + dang / n)) for v in nodes}
    return r


def _run(spark, edges, n_iter=5):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node_id: r.pr for r in pagerank(df, n_iter=n_iter).collect()
    }


def test_matches_local_replay_cycle_with_chord(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    got = _run(spark, edges)
    want = _local_pagerank(edges)
    assert got == want


def test_dangling_node_mass_redistributed(spark):
    # node 3 is a pure sink: without dangling handling its inflow mass
    # would leak and total rank would decay below 1
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges)
    want = _local_pagerank(edges)
    assert got == want
    assert sum(got.values()) == pytest_approx_one()


def pytest_approx_one():
    import pytest

    return pytest.approx(1.0, abs=1e-6)


def test_mass_conserved_on_bipartite_graph(spark):
    pe = [(i * 2, (i % 3) * 2 + 1) for i in range(30)]
    edges = pe + [(t, s) for s, t in pe]
    got = _run(spark, edges, n_iter=3)
    assert sum(got.values()) == pytest_approx_one()
    # symmetric graph with uniform supplier fan-in: hub side (3 nodes of
    # odd parity) must outrank the 30 leaf nodes
    hubs = [v for k, v in got.items() if k % 2 == 1]
    leaves = [v for k, v in got.items() if k % 2 == 0]
    assert min(hubs) > max(leaves)


def test_triangle_count_known_graphs(spark):
    from prajna_spark.operators.triangles import triangle_count

    def count(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        return (r.n_edges, r.n_triangles)

    # K4: 6 edges, 4 triangles (given with duplicates/reversed edges)
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert count(k4) == (6, 4)
    # C5 cycle: 5 edges, 0 triangles
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    assert count(c5) == (5, 0)
    # bipartite 3x3: no odd cycles
    bip = [(i, 10 + j) for i in range(3) for j in range(3)]
    assert count(bip) == (9, 0)
