"""Multi-source BFS operator: differential vs a local model + edge cases."""

from __future__ import annotations

from collections import deque

from hypothesis import given, settings
from hypothesis import strategies as st


def _local_bfs(edges, seeds, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):  # directed
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _spark_bfs(spark, edges, seeds, max_hops):
    from prajna_spark.operators.bfs import multi_source_bfs

    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    s = spark.createDataFrame([(x,) for x in seeds], "nid long")
    out = multi_source_bfs(e, s, max_hops=max_hops)
    return {r["node_id"]: r["hops"] for r in out.collect()}


def test_bfs_simple_path(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = _spark_bfs(spark, edges, [1], max_hops=3)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_multi_source_takes_nearest(spark):
    edges = [(1, 2), (2, 3), (9, 3)]
    got = _spark_bfs(spark, edges, [1, 9], max_hops=5)
    assert got == {1: 0, 9: 0, 2: 1, 3: 1}


def test_bfs_early_exit_and_isolated_seed(spark):
    # seed 7 has no edges; frontier empties after round 1 of 10
    got = _spark_bfs(spark, [(1, 2)], [1, 7], max_hops=10)
    assert got == {1: 0, 7: 0, 2: 1}


def test_bfs_no_edges(spark):
    got = _spark_bfs(spark, [], [3], max_hops=4)
    assert got == {3: 0}


@settings(max_examples=15, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=40
    ),
    seeds=st.sets(st.integers(0, 12), min_size=1, max_size=3),
    max_hops=st.integers(1, 5),
)
def test_bfs_matches_local_model(spark, edges, seeds, max_hops):
    assert _spark_bfs(spark, edges, sorted(seeds), max_hops) == _local_bfs(
        edges, seeds, max_hops
    )
