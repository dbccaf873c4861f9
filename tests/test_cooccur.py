"""Item-item co-occurrence: differential vs a local reference model,
structural basket cap, symmetry, and duplicate-row immunity."""

from __future__ import annotations

import itertools
import math
import random


from prajna_spark.pipeline.cooccur import (
    capped_baskets,
    item_pair_counts,
    item_similarity_topk,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "b long, i long")


def _local_topk(rows, cap, k):
    baskets = {}
    for b, i in set(rows):
        baskets.setdefault(b, set()).add(i)
    capped = {b: sorted(s)[:cap] for b, s in baskets.items()}
    ci, cij = {}, {}
    for items in capped.values():
        for i in items:
            ci[i] = ci.get(i, 0) + 1
        for i, j in itertools.combinations(items, 2):
            cij[(i, j)] = cij.get((i, j), 0) + 1
    nbrs = {}
    for (i, j), c in cij.items():
        s = c / math.sqrt(ci[i] * ci[j])
        s = math.floor(s * 1e6 + 0.5) / 1e6
        nbrs.setdefault(i, []).append((-s, j))
        nbrs.setdefault(j, []).append((-s, i))
    return {
        i: [(j, -negs) for negs, j in sorted(cands)[:k]]
        for i, cands in nbrs.items()
    }


def test_matches_local_model(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(40), rng.randrange(25)) for _ in range(600)]
    got = item_similarity_topk(_df(spark, rows), "b", "i", cap=8, k=3).collect()
    want = _local_topk(rows, cap=8, k=3)
    got_map = {}
    for r in sorted(got, key=lambda r: (r.item, r.rk)):
        got_map.setdefault(r.item, []).append((r.neighbor, r.sim))
    assert got_map == want


def test_cap_bounds_pair_explosion(spark):
    # one mega-basket with 1000 items: uncapped would be ~500k pairs;
    # cap=10 keeps the 10 lowest ids -> exactly 45 pairs
    rows = [(1, i) for i in range(1000)]
    capped = capped_baskets(_df(spark, rows), "b", "i", cap=10)
    assert sorted(r.i for r in capped.collect()) == list(range(10))
    pairs = item_pair_counts(capped, "b", "i")
    assert pairs.count() == 45


def test_symmetric_and_duplicate_immune(spark):
    # duplicated (basket, item) rows (lineitem has true dup rows) must
    # not inflate counts; neighbor lists are symmetric for a 2-item pair
    rows = [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20), (2, 20)]
    out = item_similarity_topk(_df(spark, rows), "b", "i", cap=16, k=5).collect()
    by_item = {r.item: r for r in out}
    assert by_item[10].c_pair == 2 and by_item[20].c_pair == 2
    assert by_item[10].sim == 1.0 and by_item[20].sim == 1.0
