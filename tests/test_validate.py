"""Data-quality validation: one-pass counting, NULL-as-violation, gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prajna_spark.pipeline.validate import check, enforce


def test_check_counts_each_rule_in_one_row(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (3, None, "A"), (4, 7.0, "X")],
        "id long, amt double, cat string",
    )
    row = check(
        df,
        {
            "nonneg": F.col("amt") >= 0,
            "known_cat": F.col("cat").isin("A", "B"),
        },
    ).first()
    assert row.n_rows == 4
    assert row.nonneg_violations == 2  # -5.0 and the NULL (unknown fails)
    assert row.known_cat_violations == 1  # 'X'


def test_check_plan_is_single_aggregation(spark):
    df = spark.range(1000).selectExpr("id", "id % 5 AS k")
    out = check(df, {"a": F.col("id") >= 0, "b": F.col("k") < 5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2  # partial + final, one pass
    assert plan.count("Scan ") <= 1 or plan.count("Range") == 1


def test_enforce_raises_naming_violated_rules(spark):
    df = spark.createDataFrame([(1, -1.0)], "id long, amt double")
    with pytest.raises(ValueError, match="nonneg.*1"):
        enforce(df, {"nonneg": F.col("amt") >= 0, "haskey": F.col("id").isNotNull()})
    # clean data passes silently
    enforce(
        spark.createDataFrame([(1, 1.0)], "id long, amt double"),
        {"nonneg": F.col("amt") >= 0},
    )


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="at least one rule"):
        check(spark.range(1), {})


def test_profile_single_job_and_counts(spark):
    """All columns profile in one aggregation (no per-column scans): nulls,
    exact distincts, native-type min/max (numeric ordering, not string)."""
    from prajna_spark.pipeline.validate import profile

    df = spark.createDataFrame(
        [(10, "b"), (2, None), (10, "a")], "n long, s string"
    )
    got = {r.column: (r.n_rows, r.n_null, r.n_distinct, r.min_value, r.max_value)
           for r in profile(df).collect()}
    assert got["n"] == (3, 0, 2, "2", "10")   # numeric min: 2, not "10"
    assert got["s"] == (3, 1, 2, "a", "b")
    plan = profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0 and plan.count("Scan ExistingRDD") <= 1


def test_profile_quantiles_exact_interpolation(spark):
    """percentile == the linearly-interpolated order statistic (numpy
    'linear' method), exactly, per group, all quantiles in one job."""
    import numpy as np
    from prajna_spark.pipeline.validate import profile_quantiles

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 10]] + [
        ("b", float(v)) for v in [5, 7, 11, 13, 17, 19, 23]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["p50"], r["p95"])
        for r in profile_quantiles(df, ["g"], "v", [0.5, 0.95]).collect()
    }
    for g in ("a", "b"):
        vals = np.array([v for gg, v in rows if gg == g])
        want = (
            float(np.quantile(vals, 0.5, method="linear")),
            float(np.quantile(vals, 0.95, method="linear")),
        )
        assert got[g] == want, (g, got[g], want)


def test_check_referential_counts_orphans_and_broadcasts(spark):
    from prajna_spark.pipeline.validate import check_referential

    fact = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    dim = spark.createDataFrame([(10,), (11,)], "pk long")
    out = check_referential(fact, dim, "fk", "pk")
    row = out.first()
    assert row["n_rows"] == 4 and row["n_orphans"] == 2  # 99 and NULL
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the orphan probe is an anti join against the pruned key column
    # (broadcast at runtime when the dim is small — AQE decides; local
    # createDataFrame stats are not representative, so assert shape only)
    assert "LeftAnti" in plan


def test_check_and_profile_report_zero_not_null_on_empty(spark):
    """A clean-but-empty delivery must report 0 violations / 0 nulls —
    F.sum over zero rows is NULL, which poisons count comparisons and
    makes empty indistinguishable from unmeasured."""
    from pyspark.sql import functions as F

    from prajna_spark.pipeline.validate import check, profile

    empty = spark.createDataFrame([], "a long, b string")
    row = check(empty, {"pos": F.col("a") >= 0}).first()
    assert row["n_rows"] == 0 and row["pos_violations"] == 0
    prows = {r.column: r for r in profile(empty).collect()}
    assert prows["a"].n_null == 0 and prows["a"].n_distinct == 0


# --------------------------------------------------------------------------
# ops/diagnostics tier
# --------------------------------------------------------------------------


def test_join_size_estimate_matches_real_join(spark):
    from prajna_spark.pipeline.validate import join_size_estimate

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (3,), (3,)], "k long"
    )
    right = spark.createDataFrame([(1,), (3,), (3,), (9,)], "k long")
    row = join_size_estimate(left, right, "k", "k").first()
    real = left.join(right, "k").count()
    assert row["n_join_rows"] == real == 2 + 6
    assert row["max_key_fanout"] == 6  # key 3: 3*2
    assert (row["n_left"], row["n_right"]) == (6, 4)


def test_join_size_estimate_disjoint_keys(spark):
    from prajna_spark.pipeline.validate import join_size_estimate

    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(2,)], "k long")
    row = join_size_estimate(left, right, "k", "k").first()
    assert row["n_join_rows"] == 0 and row["max_key_fanout"] == 0


def test_dataset_digest_order_insensitive_change_sensitive(spark):
    from pyspark.sql import functions as F

    from prajna_spark.pipeline.validate import dataset_digest

    rows = [(1, "a"), (2, "b"), (3, "c")]
    mk = lambda rs, parts: spark.createDataFrame(rs, "id long, s string").repartition(parts)
    expr = F.concat_ws("|", F.col("id"), F.col("s"))

    d1 = dataset_digest(mk(rows, 1), expr).first()
    d2 = dataset_digest(mk(list(reversed(rows)), 4), expr).first()
    assert (d1["digest_sum"], d1["digest_xor"], d1["n_rows"]) == (
        d2["digest_sum"], d2["digest_xor"], d2["n_rows"],
    )

    d3 = dataset_digest(mk([(1, "a"), (2, "b"), (3, "X")], 1), expr).first()
    assert d3["digest_sum"] != d1["digest_sum"]

    # duplicate-row pair: xor is blind, the additive channel catches it
    d4 = dataset_digest(mk(rows + [(3, "c"), (3, "c")], 1), expr).first()
    assert d4["digest_xor"] == d1["digest_xor"]
    assert d4["digest_sum"] != d1["digest_sum"]
    assert d4["n_rows"] == 5


# --------------------------------------------------------------------------
# KMV key-overlap diagnostics
# --------------------------------------------------------------------------


def _overlap(spark, a_keys, b_keys, k=64):
    from prajna_spark.pipeline.validate import kmv_key_overlap

    a = spark.createDataFrame([(x,) for x in a_keys], "ka long")
    b = spark.createDataFrame([(x,) for x in b_keys], "kb long")
    return kmv_key_overlap(a, "ka", b, "kb", k=k).collect()[0]


def test_kmv_overlap_exact_below_k(spark):
    r = _overlap(spark, range(30), range(10, 40), k=64)
    assert r["n_a_est"] == 30.0 and r["n_b_est"] == 30.0
    assert r["union_est"] == 40.0
    assert abs(r["jaccard_est"] - 20 / 40) < 1e-9
    assert abs(r["inter_est"] - 20.0) < 1e-9


def test_kmv_overlap_identical_and_disjoint(spark):
    same = _overlap(spark, range(100), range(100), k=32)
    assert same["jaccard_est"] == 1.0
    disj = _overlap(spark, range(100), range(1000, 1100), k=32)
    assert disj["jaccard_est"] == 0.0 and disj["inter_est"] == 0.0


def test_kmv_overlap_accuracy_above_k(spark):
    # |A|=|B|=4000, |A∩B|=2000 -> J = 1/3; k=256 keeps stderr ~6%
    r = _overlap(spark, range(4000), range(2000, 6000), k=256)
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12
    assert abs(r["union_est"] - 6000) / 6000 < 0.25
    assert abs(r["inter_est"] - 2000) / 2000 < 0.4


def test_kmv_overlap_empty_side(spark):
    r = _overlap(spark, range(10), [], k=16)
    assert r["n_b_est"] == 0.0 and r["jaccard_est"] == 0.0 and r["inter_est"] == 0.0


# --------------------------------------------------------------------------
# PSI drift
# --------------------------------------------------------------------------


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    import random

    from prajna_spark.pipeline.validate import psi_drift

    rng = random.Random(4)
    base = [rng.gauss(100, 15) for _ in range(2000)]
    ref = spark.createDataFrame([(v,) for v in base], "v double")
    same = spark.createDataFrame([(v,) for v in base], "v double")
    shifted = spark.createDataFrame([(v + 40,) for v in base], "v double")

    psi_same = sum(r["term"] for r in psi_drift(ref, same, "v").collect())
    psi_shift = sum(r["term"] for r in psi_drift(ref, shifted, "v").collect())
    assert abs(psi_same) < 1e-6  # identical data: exactly calibrated bins
    assert psi_shift > 0.5  # 2.7-sigma shift is unmistakable drift


def test_psi_terms_are_nonnegative_and_bins_complete(spark):
    import random

    from prajna_spark.pipeline.validate import psi_drift

    rng = random.Random(7)
    ref = spark.createDataFrame(
        [(rng.uniform(0, 1),) for _ in range(500)], "v double"
    )
    cur = spark.createDataFrame(
        [(rng.uniform(0.5, 1.5),) for _ in range(300)], "v double"
    )
    rows = psi_drift(ref, cur, "v", n_bins=10).collect()
    assert sorted(r["bin"] for r in rows) == list(range(10))  # empty bins kept
    assert all(r["term"] >= 0 for r in rows)  # (x-y)ln(x/y) >= 0 always
    assert sum(r["n_cur"] for r in rows) == 300
