"""CUSUM change-point: the distributed cumsum-minus-prefix-min spelling
must equal the sequential max(0, S + x - k) recursion, alarms must fire
on a planted level shift, and the chart must be partition-independent."""

from __future__ import annotations

import random

from prajna_spark.operators.changepoint import cusum_integer


def _local_cusum(xs):
    """Sequential reference recursion in exact rationals, scaled by 4C."""
    s, c = sum(xs), len(xs)
    out, acc = [], 0
    for x in xs:
        acc = max(0, acc + 4 * c * x - 5 * s)
        out.append(acc)
    return out, 4 * c, 4 * s


def _spark_chart(spark, xs, n_parts=7):
    rows = [("k", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t long, x long").repartition(n_parts)
    got = cusum_integer(df, "k", "t", "x").orderBy("t").collect()
    return got


def test_matches_sequential_recursion(spark):
    rng = random.Random(7)
    xs = [rng.randrange(0, 50) for _ in range(200)]
    want, scale, thresh = _local_cusum(xs)
    got = _spark_chart(spark, xs)
    assert [r.cusum_scaled for r in got] == want
    assert all(r.scale == scale for r in got)
    assert [r.is_alarm for r in got] == [v > thresh for v in want]


def test_planted_level_shift_alarms(spark):
    # Flat series at 10, then a sustained shift to 30: individual points
    # never spike, but CUSUM must cross the mean threshold in the shifted
    # region and stay quiet before it.
    xs = [10] * 50 + [30] * 30
    got = _spark_chart(spark, xs)
    assert not any(r.is_alarm for r in got[:50])
    assert any(r.is_alarm for r in got[55:])


def test_partition_independent(spark):
    rng = random.Random(11)
    xs = [rng.randrange(0, 100) for _ in range(120)]
    a = [(r.t, r.cusum_scaled, r.is_alarm) for r in _spark_chart(spark, xs, 3)]
    b = [(r.t, r.cusum_scaled, r.is_alarm) for r in _spark_chart(spark, xs, 17)]
    assert a == b


def test_multiple_series_are_independent(spark):
    xs1, xs2 = [5] * 20 + [25] * 10, [40] * 30
    rows = [("a", t, x) for t, x in enumerate(xs1)] + [
        ("b", t, x) for t, x in enumerate(xs2)
    ]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = cusum_integer(df, "k", "t", "x").collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.k, []).append((r.t, r.cusum_scaled))
    want1, _, _ = _local_cusum(xs1)
    want2, _, _ = _local_cusum(xs2)
    assert [v for _, v in sorted(by_key["a"])] == want1
    assert [v for _, v in sorted(by_key["b"])] == want2  # flat series: all 0
    assert all(v == 0 for v in want2)
