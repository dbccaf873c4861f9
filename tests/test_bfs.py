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


# --------------------------------------------------------------------------
# bounded_sssp (weighted)
# --------------------------------------------------------------------------


def _local_bf(edges, seeds, rounds):
    dist = {s: 0.0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = min(nxt.get(d, float("inf")), dist[s] + w)
        dist = nxt
    return {k: round(v, 6) for k, v in dist.items()}


def test_bounded_sssp_matches_local_bellman_ford(spark):
    import random

    from prajna_spark.operators.bfs import bounded_sssp

    rng = random.Random(6)
    edges = [
        (rng.randrange(20), rng.randrange(20), round(rng.uniform(1, 9), 2))
        for _ in range(60)
    ]
    seeds = [0, 7]
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    s = spark.createDataFrame([(x,) for x in seeds], "nid long")
    got = {
        r["node_id"]: r["dist"] for r in bounded_sssp(e, s, max_hops=4).collect()
    }
    assert got == _local_bf(edges, seeds, 4)


def test_bounded_sssp_prefers_cheap_two_hop_over_direct(spark):
    from prajna_spark.operators.bfs import bounded_sssp

    e = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 2.0)], "src long, dst long, w double"
    )
    s = spark.createDataFrame([(0,)], "nid long")
    got = {r["node_id"]: r["dist"] for r in bounded_sssp(e, s, 4).collect()}
    assert got == {0: 0.0, 1: 3.0, 2: 1.0}  # 0->2->1 beats the direct edge
