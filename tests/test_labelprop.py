"""Label propagation: two-clique community recovery and a differential
vs a local synchronous reference with the same tie-break."""

from __future__ import annotations

import random
from collections import Counter

from prajna_spark.operators.labelprop import label_propagation


def _local_lp(edges, n_iter):
    sym = {}
    for u, v in set(tuple(sorted(e)) for e in edges if e[0] != e[1]):
        sym.setdefault(u, []).append(v)
        sym.setdefault(v, []).append(u)
    lbl = {n: n for n in sym}
    for _ in range(n_iter):
        nxt = {}
        for n, nbrs in sym.items():
            cnt = Counter(lbl[m] for m in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        lbl = nxt
    return lbl


def _run(spark, edges, n_iter=4):
    df = spark.createDataFrame(edges, "u long, v long")
    out = label_propagation(df, "u", "v", n_iter=n_iter).collect()
    return {r.node_id: r.community for r in out}


def test_two_cliques_with_bridge(spark):
    # two 5-cliques joined by one bridge edge: each clique collapses to
    # its minimum node id; the bridge does not merge them in 4 rounds
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    got = _run(spark, c1 + c2 + [(4, 10)])
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 15)} == {10}


def test_matches_local_sync_reference(spark):
    rng = random.Random(13)
    edges = list(
        {
            tuple(sorted((rng.randrange(30), rng.randrange(30))))
            for _ in range(80)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    got = _run(spark, edges, n_iter=4)
    want = _local_lp(edges, 4)
    assert got == want
