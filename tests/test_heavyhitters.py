"""Misra-Gries heavy-hitter invariants: bound soundness, summary size,
no-false-negative guarantee, and sketch-then-verify == brute force.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from prajna_spark.pipeline import heavyhitters


def _skewed_df(spark, n_parts=8):
    # zipf-ish: key k appears ~1000/k times, plus a uniform tail
    rows = []
    for k in range(1, 20):
        rows += [(f"k{k}",)] * (1000 // k)
    rows += [(f"tail{i}",) for i in range(500)]
    # deterministic spread across partitions
    return spark.createDataFrame(rows, "key string").repartition(n_parts)


def test_summary_size_and_bound_soundness(spark):
    df = _skewed_df(spark)
    m = 10
    summaries = heavyhitters.mg_summaries(df, "key", m).collect()
    per_part = Counter(r.part_id for r in summaries if r.key is not None)
    assert all(c <= m for c in per_part.values())

    true_counts = Counter(r.key for r in df.collect())
    bounds = {
        r.key: (r.lower, r.upper)
        for r in heavyhitters.candidate_keys(
            heavyhitters.mg_summaries(df, "key", m)
        ).collect()
    }
    for key, (lo, hi) in bounds.items():
        assert lo <= true_counts[key] <= hi, key


def test_no_false_negatives_above_eps(spark):
    """Any key with true count > total accumulated eps must appear in at
    least one partition summary (the MG representability guarantee)."""
    df = _skewed_df(spark)
    m = 10
    summaries = heavyhitters.mg_summaries(df, "key", m)
    total_eps = (
        summaries.groupBy("part_id").agg(F.first("eps").alias("e")).agg(F.sum("e"))
    ).collect()[0][0]
    present = {r.key for r in summaries.collect() if r.key is not None}
    true_counts = Counter(r.key for r in df.collect())
    for key, n in true_counts.items():
        if n > total_eps:
            assert key in present, (key, n, total_eps)


@pytest.mark.parametrize("m", [None, 8])
def test_exact_matches_brute_force(spark, m):
    """The two-pass result equals a plain groupBy+HAVING for any legal m
    (m=8 with phi=0.2 is the minimal-margin case: 1/phi=5)."""
    df = _skewed_df(spark)
    phi = 0.2 if m == 8 else 0.02
    got = {
        (r[0], r.n)
        for r in heavyhitters.heavy_hitters_exact(df, "key", phi=phi, m=m).collect()
    }
    n_total = df.count()
    brute = {
        (k, n) for k, n in Counter(r.key for r in df.collect()).items()
        if n > n_total * phi
    }
    assert got == brute


def test_m_below_guarantee_raises(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError, match="no-false-negative"):
        heavyhitters.heavy_hitters_exact(df, "key", phi=0.01, m=50)


def test_null_keys_counted_exactly(spark):
    """A null-keyed heavy hitter must appear in the result (nulls bypass
    the sketch — a single known group counted exactly); non-null results
    are unaffected."""
    rows = [("a",)] * 40 + [(None,)] * 40 + [(f"t{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = {r[0]: r.n for r in heavyhitters.heavy_hitters_exact(df, "key", phi=0.3).collect()}
    assert got == {"a": 40, None: 40}
