"""ewma_bounded: differential vs a local model + gap/edge semantics."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prajna_spark.operators.smoothing import ewma_bounded


def _local(series, decay, window):
    # series: {(key, bucket): x}
    out = {}
    for (k, t), _ in series.items():
        num = den = 0.0
        for j in range(window):
            x = series.get((k, t - j))
            if x is not None:
                w = decay**j
                num += w * x
                den += w
        out[(k, t)] = num / den
    return out


def _spark(spark, series, decay, window):
    rows = [(k, t, x) for (k, t), x in series.items()]
    df = spark.createDataFrame(rows, "k string, b long, x double")
    got = ewma_bounded(df, ["k"], "b", "x", decay, window).collect()
    return {(r["k"], r["b"]): r["ewma"] for r in got}


def test_ewma_simple_decay(spark):
    series = {("a", 0): 1.0, ("a", 1): 1.0, ("a", 2): 4.0}
    got = _spark(spark, series, decay=0.5, window=3)
    assert got[("a", 0)] == 1.0
    assert math.isclose(got[("a", 1)], (1.0 + 0.5) / 1.5)
    assert math.isclose(got[("a", 2)], (4.0 + 0.5 + 0.25) / 1.75)


def test_ewma_gap_renormalizes(spark):
    # bucket 1 missing: ewma(2) = (x2 + 0.25*x0) / 1.25, not /1.75
    series = {("a", 0): 8.0, ("a", 2): 4.0}
    got = _spark(spark, series, decay=0.5, window=3)
    assert math.isclose(got[("a", 2)], (4.0 + 0.25 * 8.0) / 1.25)
    assert set(got) == {("a", 0), ("a", 2)}  # no bucket-1 row invented


def test_ewma_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        ewma_bounded(None, ["k"], "b", "x", 1.0, 3)
    with pytest.raises(ValueError):
        ewma_bounded(None, ["k"], "b", "x", 0.5, 0)


@settings(max_examples=12, deadline=None)
@given(
    pts=st.dictionaries(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 15)),
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=1,
        max_size=25,
    ),
    decay=st.sampled_from([0.3, 0.7, 0.9]),
    window=st.integers(1, 6),
)
def test_ewma_matches_local_model(spark, pts, decay, window):
    want = _local(pts, decay, window)
    got = _spark(spark, pts, decay, window)
    assert set(got) == set(want)
    for key in want:
        assert math.isclose(got[key], want[key], rel_tol=1e-9, abs_tol=1e-9)


# --------------------------------------------------------------------------
# rolling_distinct
# --------------------------------------------------------------------------


def _local_rolling(rows, window):
    # rows: (key, entity, bucket)
    present = {}
    for k, e, b in rows:
        present.setdefault((k, b), set())
    out = {}
    for k, b in present:
        ents = {e for (k2, e, b2) in rows if k2 == k and b - window < b2 <= b}
        out[(k, b)] = len(ents)
    return out


def _spark_rolling(spark, rows, window):
    from prajna_spark.operators.smoothing import rolling_distinct

    df = spark.createDataFrame(rows, "k string, e long, b long")
    got = rolling_distinct(df, ["k"], "b", "e", window).collect()
    return {(r["k"], r["b"]): r["n_distinct"] for r in got}


def test_rolling_distinct_counts_entity_once_across_window(spark):
    rows = [("a", 1, 0), ("a", 1, 1), ("a", 2, 1), ("a", 1, 5)]
    got = _spark_rolling(spark, rows, window=3)
    # bucket 1: users {1,2} (1 counted once despite two source buckets)
    assert got == {("a", 0): 1, ("a", 1): 2, ("a", 5): 1}


def test_rolling_distinct_rejects_bad_window(spark):
    import pytest

    from prajna_spark.operators.smoothing import rolling_distinct

    with pytest.raises(ValueError):
        rolling_distinct(None, ["k"], "b", "e", 0)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 5),
            st.integers(0, 12),
        ),
        min_size=1,
        max_size=30,
    ),
    window=st.integers(1, 5),
)
def test_rolling_distinct_matches_local_model(spark, rows, window):
    assert _spark_rolling(spark, rows, window) == _local_rolling(rows, window)


# --------------------------------------------------------------------------
# ols_trend
# --------------------------------------------------------------------------


def test_ols_trend_matches_numpy_polyfit(spark):
    import numpy as np

    from prajna_spark.operators.smoothing import ols_trend

    rng = np.random.default_rng(5)
    rows = []
    for g in (0, 1):
        xs = np.arange(40)
        ys = (3 * xs + 7 + rng.integers(-5, 6, 40)) * (g + 1)
        rows += [(g, int(x), int(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g int, x long, y long")
    got = {r["g"]: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    for g in (0, 1):
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([y for gg, _, y in rows if gg == g], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        r2 = np.corrcoef(xs, ys)[0, 1] ** 2
        assert abs(got[g]["slope"] - slope) < 1e-6
        assert abs(got[g]["intercept"] - intercept) < 1e-6
        assert abs(got[g]["r2"] - r2) < 1e-6


def test_ols_trend_degenerate_groups(spark):
    from prajna_spark.operators.smoothing import ols_trend

    rows = [
        (0, 5, 1), (0, 5, 9),        # constant x: undefined fit
        (1, 1, 4), (1, 2, 4), (1, 3, 4),  # constant y: slope 0, r2 NULL
        (2, 7, 3),                   # single point
    ]
    df = spark.createDataFrame(rows, "g int, x long, y long")
    got = {r["g"]: r for r in ols_trend(df, ["g"], "x", "y").collect()}
    assert got[0]["slope"] is None and got[0]["r2"] is None
    assert got[1]["slope"] == 0.0 and got[1]["intercept"] == 4.0
    assert got[1]["r2"] is None
    assert got[2]["slope"] is None


def test_twa_weights_hold_durations(spark):
    from prajna_spark.operators.smoothing import time_weighted_avg

    # day [0, 100): v=10 holds t=0..90 (90s), v=100 holds t=90..100 (10s)
    rows = [("a", 0, 0, 1, 10.0), ("a", 0, 90, 2, 100.0)]
    df = spark.createDataFrame(
        rows, "k string, b long, t long, tb long, v double"
    )
    out = time_weighted_avg(df, ["k"], "b", "t", "v", 100, "tb").collect()[0]
    assert out.n_samples == 2
    assert out.twa == (10.0 * 90 + 100.0 * 10) / 100  # 19.0, not avg=55
    # the row-count mean would be 55 — the polling artifact TWA removes


def test_twa_constant_series_is_the_constant(spark):
    from prajna_spark.operators.smoothing import time_weighted_avg

    rows = [("a", 0, t, t, 7.5) for t in (3, 20, 50, 99)]
    df = spark.createDataFrame(
        rows, "k string, b long, t long, tb long, v double"
    )
    out = time_weighted_avg(df, ["k"], "b", "t", "v", 100, "tb").collect()[0]
    assert out.twa == 7.5  # invariant to sampling times


def test_twa_matches_local_model(spark):
    import random

    from prajna_spark.operators.smoothing import time_weighted_avg

    rng = random.Random(7)
    rows = []
    for k in ("a", "b"):
        for b in (0, 1000):
            ts = sorted(rng.sample(range(1000), 12))
            rows += [(k, b, b + t, i, rng.uniform(0, 50)) for i, t in enumerate(ts)]
    df = spark.createDataFrame(
        rows, "k string, b long, t long, tb long, v double"
    )
    got = {
        (r.k, r.b): r.twa
        for r in time_weighted_avg(df, ["k"], "b", "t", "v", 1000, "tb").collect()
    }
    by = {}
    for k, b, t, tb, v in rows:
        by.setdefault((k, b), []).append((t, v))
    import math

    for key, samples in by.items():
        samples.sort()
        end = key[1] + 1000
        s = sum(
            v * ((samples[i + 1][0] if i + 1 < len(samples) else end) - t)
            for i, (t, v) in enumerate(samples)
        )
        want = math.floor(s / (end - samples[0][0]) * 1e4 + 0.5) / 1e4
        assert abs(got[key] - want) < 1e-9, key
