"""Feature engineering (pipeline/features.py): standardization and
winsorization — differentials vs numpy, invariants, and plan shape."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import persist_scope
from prajna_spark.pipeline.features import (
    embedding_dim_stats,
    standardize_embeddings,
    winsorized_stats,
)


def _vec_df(spark, n=200, d=8, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-5, 5) for _ in range(d)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_standardize_matches_numpy(spark):
    rows, df = _vec_df(spark)
    out = {r["vec_id"]: r["z"] for r in standardize_embeddings(df).collect()}
    m = np.array([v for _, v in rows])
    z = (m - m.mean(axis=0)) / m.std(axis=0)
    for i, _ in rows:
        assert np.allclose(out[i], z[i], atol=1e-9)


def test_standardize_result_has_zero_mean_unit_std(spark):
    _, df = _vec_df(spark, seed=11)
    stats = embedding_dim_stats(
        standardize_embeddings(df).select(F.col("z").alias("embedding"))
    ).collect()
    for r in stats:
        assert abs(r["mu"]) < 1e-9
        assert abs(r["sd"] - 1.0) < 1e-9


def test_standardize_constant_dimension_maps_to_zero(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r["z"] for r in standardize_embeddings(df).collect()}
    assert out[0][0] == 0.0 and out[1][0] == 0.0  # constant dim -> 0, not NaN
    assert out[0][1] == -1.0 and out[1][1] == 1.0


def test_standardize_no_data_sized_shuffle_for_vectors(spark):
    """The vectors themselves must never shuffle: the only exchange in
    the plan feeds the dim-stats aggregation (narrow (dim, val) partials);
    the rewrite is a broadcast cross join + map-side zip_with."""
    from prajna_spark.plans.inspect import executed_plan_str

    _, df = _vec_df(spark)
    plan = executed_plan_str(standardize_embeddings(df))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exchanges: the dim-stats agg (+AQE artifacts); no sort of data rows
    assert plan.count("Exchange hashpartitioning") <= 1


def _winsor_ref(vals, p_lo, p_hi):
    lo = float(np.quantile(np.array(vals), p_lo, method="linear"))
    hi = float(np.quantile(np.array(vals), p_hi, method="linear"))
    w = [min(max(v, lo), hi) for v in vals]
    return lo, hi, sum(vals) / len(vals), sum(w) / len(w)


@pytest.mark.parametrize("p_lo,p_hi", [(0.05, 0.95), (0.25, 0.75), (0.0, 1.0)])
def test_winsorized_stats_matches_numpy(spark, p_lo, p_hi):
    rng = random.Random(5)
    data = [(g, rng.gauss(0, 1) * (10**g)) for g in (1, 2) for _ in range(150)]
    df = spark.createDataFrame(data, "g int, v double")
    with persist_scope():
        got = {r["g"]: r for r in winsorized_stats(df, ["g"], "v", p_lo, p_hi).collect()}
    for g in (1, 2):
        vals = [v for gg, v in data if gg == g]
        lo, hi, raw, wm = _winsor_ref(vals, p_lo, p_hi)
        assert got[g]["n"] == len(vals)
        assert math.isclose(got[g]["lo"], lo, rel_tol=1e-12)
        assert math.isclose(got[g]["hi"], hi, rel_tol=1e-12)
        assert math.isclose(got[g]["raw_mean"], raw, rel_tol=1e-9)
        assert math.isclose(got[g]["winsor_mean"], wm, rel_tol=1e-9)


def test_winsorized_mean_is_outlier_robust(spark):
    data = [(0, 1.0)] * 99 + [(0, 1e9)]
    df = spark.createDataFrame(data, "g int, v double")
    with persist_scope():
        r = winsorized_stats(df, ["g"], "v", 0.05, 0.95).collect()[0]
    assert r["raw_mean"] > 1e6  # the outlier wrecks the raw mean
    assert r["winsor_mean"] < 2e8  # clamped at p95 (interpolation bounded)
    assert r["winsor_mean"] < r["raw_mean"]


# --------------------------------------------------------------------------
# quantile_map
# --------------------------------------------------------------------------


def test_quantile_map_is_monotone_and_spans_ref(spark):
    from prajna_spark.pipeline.features import quantile_map

    rng = random.Random(9)
    b = spark.createDataFrame(
        [(i, rng.uniform(0, 1)) for i in range(200)], "id long, v double"
    )
    ref = spark.createDataFrame(
        [(i, rng.gauss(50, 10)) for i in range(300)], "id long, v double"
    )
    with persist_scope():
        rows = quantile_map(b, ref, "v", "id", grid=100).collect()
    ref_vals = [r["v"] for r in ref.collect()]
    by_v = sorted(rows, key=lambda r: (r["v"], r["id"]))
    mapped = [r["mapped"] for r in by_v]
    assert mapped == sorted(mapped)  # rank order preserved
    assert min(mapped) >= min(ref_vals) and max(mapped) <= max(ref_vals)
    # extremes land at the ref extremes (rank 0 -> p0, rank n-1 -> p100)
    assert mapped[0] == min(ref_vals) and mapped[-1] == max(ref_vals)


def test_quantile_map_onto_self_recovers_values(spark):
    """Mapping a sample onto its own distribution is ~identity (exact at
    lattice points; within one lattice cell elsewhere)."""
    from prajna_spark.pipeline.features import quantile_map

    vals = [(i, float(v)) for i, v in enumerate(range(0, 101))]
    df = spark.createDataFrame(vals, "id long, v double")
    with persist_scope():
        rows = quantile_map(df, df, "v", "id", grid=100).collect()
    for r in rows:
        assert abs(r["mapped"] - r["v"]) <= 1.0 + 1e-9


def test_quantile_map_single_row_uses_median(spark):
    from prajna_spark.pipeline.features import quantile_map

    b = spark.createDataFrame([(1, 42.0)], "id long, v double")
    ref = spark.createDataFrame(
        [(i, float(i)) for i in range(101)], "id long, v double"
    )
    with persist_scope():
        r = quantile_map(b, ref, "v", "id", grid=100).collect()[0]
    assert r["mapped"] == 50.0  # n==1 -> ref median


def test_target_encode_loo_excludes_own_row(spark):
    from prajna_spark.pipeline.features import target_encode_loo

    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {
        (r.cat, r.y): r.cat_te
        for r in target_encode_loo(df, "cat", "y", prior_weight=0.0, dec=4).collect()
    }
    # w=0: pure leave-one-out means
    assert out[("a", 10.0)] == 25.0  # (20+30)/2
    assert out[("a", 20.0)] == 20.0  # (10+30)/2
    assert out[("a", 30.0)] == 15.0  # (10+20)/2


def test_target_encode_singleton_falls_back_to_prior(spark):
    from prajna_spark.pipeline.features import target_encode_loo

    rows = [("a", 10.0), ("a", 20.0), ("b", 99.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r.cat: r.cat_te for r in
           target_encode_loo(df, "cat", "y", prior_weight=5.0).collect()
           if r.cat == "b"}
    g = (10.0 + 20.0 + 99.0) / 3
    # singleton: (sum - y) = 0, (n - 1) = 0 -> exactly the prior g
    import math
    assert abs(out["b"] - math.floor((5.0 * g / 5.0) * 1e4 + 0.5) / 1e4) < 1e-12


def test_target_encode_no_leakage_vs_naive_mean(spark):
    """The naive category mean CONTAINS the row's own label; LOO must
    differ on any category whose targets aren't all equal."""
    from prajna_spark.pipeline.features import target_encode_loo

    rows = [("a", 0.0), ("a", 1.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r.y: r.cat_te for r in
           target_encode_loo(df, "cat", "y", prior_weight=0.0).collect()}
    assert out[0.0] == 1.0 and out[1.0] == 0.0  # each sees only the OTHER
