"""Skyline (Pareto frontier) — differential vs brute-force dominance,
plus the plan discipline the distributed prefix-max promises."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import persist_scope
from prajna_spark.operators.skyline import skyline_2d


def brute_skyline(points):
    """Reference dominance filter over distinct pairs (min x, max y)."""
    from collections import Counter

    cnt = Counter(points)
    out = []
    for (x, y), n in cnt.items():
        dominated = any(
            (qx <= x and qy >= y and (qx < x or qy > y)) for (qx, qy) in cnt
        )
        if not dominated:
            out.append((x, y, n))
    return sorted(out)


def run(spark, points, parts=5):
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in points], "x double, y double"
    ).repartition(parts)
    with persist_scope():
        got = [
            (r["x"], r["y"], r["n_rows"])
            for r in skyline_2d(df, "x", "y").collect()
        ]
    return sorted(got)


def test_skyline_matches_brute_force_random(spark):
    rng = random.Random(7)
    pts = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(400)]
    assert run(spark, pts) == brute_skyline([(float(x), float(y)) for x, y in pts])


def test_skyline_duplicates_and_ties_survive_together(spark):
    # exact duplicates don't dominate each other: the surviving point
    # carries its multiplicity; same-x higher-y dominates lower-y
    pts = [(1, 5), (1, 5), (1, 3), (2, 5), (0, 1)]
    got = run(spark, pts)
    assert got == [(0.0, 1.0, 1), (1.0, 5.0, 2)]


def test_skyline_monotone_chain_keeps_all(spark):
    # strictly improving y as x grows: every point is on the frontier
    pts = [(i, i) for i in range(50)]
    assert len(run(spark, pts)) == 50


def test_skyline_single_dominator(spark):
    pts = [(0, 100)] + [(i, j) for i in range(1, 10) for j in range(0, 100)]
    assert run(spark, pts) == [(0.0, 100.0, 1)]


def test_skyline_nulls_excluded_and_empty_ok(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (1.0, None), (2.0, 2.0)], "x double, y double"
    )
    with persist_scope():
        rows = skyline_2d(df, "x", "y").collect()
    assert [(r["x"], r["y"]) for r in rows] == [(2.0, 2.0)]
    empty = spark.createDataFrame([], "x double, y double")
    with persist_scope():
        assert skyline_2d(empty, "x", "y").count() == 0


def test_skyline_no_dominance_join_in_plan(spark):
    """The plan must be sort+prefix-max shaped: no cartesian/NLJ dominance
    product anywhere, and the only window over data rows is partitioned
    by the bucket id (the carry window runs over #buckets rows only)."""
    from prajna_spark.plans.inspect import executed_plan_str

    df = spark.range(1000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 89).cast("double").alias("y"),
    )
    with persist_scope():
        plan = executed_plan_str(skyline_2d(df, "x", "y"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
