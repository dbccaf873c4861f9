"""A/B experiment analysis: sticky assignment, balanced split, z-test
arithmetic vs a local reference, degenerate-experiment guards."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prajna_spark.pipeline.experiments import ab_assign, two_proportion_ztest


def _units(spark, rows):
    return spark.createDataFrame(rows, "variant string, converted int")


def test_assignment_is_sticky_and_partition_independent(spark):
    base = spark.range(4000)
    a1 = base.select("id", ab_assign(F.col("id"), "sd").alias("v")).collect()
    a2 = (
        base.repartition(13)
        .select("id", ab_assign(F.col("id"), "sd").alias("v"))
        .collect()
    )
    assert {r.id: r.v for r in a1} == {r.id: r.v for r in a2}


def test_split_is_balanced_and_seed_sensitive(spark):
    base = spark.range(20_000)
    va = base.select(ab_assign(F.col("id"), "s1").alias("v"))
    n_a = va.where(F.col("v") == "A").count()
    assert abs(n_a / 20_000 - 0.5) < 0.02  # uniform hash split
    # different seeds re-randomize: the two assignments disagree somewhere
    s1 = base.select(ab_assign(F.col("id"), "s1").alias("x")).collect()
    s2 = base.select(ab_assign(F.col("id"), "s2").alias("x")).collect()
    assert s1 != s2


def test_ztest_matches_local_formula(spark):
    rows = [("A", 1)] * 30 + [("A", 0)] * 70 + [("B", 1)] * 45 + [("B", 0)] * 55
    out = two_proportion_ztest(_units(spark, rows)).collect()[0]
    assert (out.n_a, out.c_a, out.n_b, out.c_b) == (100, 30, 100, 45)
    p = (30 + 45) / 200
    se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert abs(out.z_score - (0.30 - 0.45) / se) < 1e-12
    assert abs(out.rate_a - 0.30) < 1e-12 and abs(out.rate_b - 0.45) < 1e-12


def test_ztest_degenerate_all_converted_yields_zero_z(spark):
    rows = [("A", 1)] * 10 + [("B", 1)] * 10  # pooled rate 1.0 -> se = 0
    out = two_proportion_ztest(_units(spark, rows)).collect()[0]
    assert out.z_score == 0.0 and out.rate_a == 1.0 and out.rate_b == 1.0


def test_ztest_empty_side_is_defined(spark):
    rows = [("A", 1)] * 4 + [("A", 0)] * 6  # no B exposure at all
    out = two_proportion_ztest(_units(spark, rows)).collect()[0]
    assert out.n_b == 0 and out.rate_b == 0.0
    assert math.isfinite(out.z_score)
