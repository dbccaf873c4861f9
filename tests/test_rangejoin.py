"""operators.rangejoin — binned interval join vs the naive cross-join
filter (semantics oracle at toy scale)."""

import random

from pyspark.sql import functions as F

from prajna_spark.operators.rangejoin import interval_join


def test_interval_join_matches_naive(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 500)) for i in range(200)]
    ivs = [
        (j, s, s + rng.randrange(0, 60))
        for j, s in ((j, rng.randrange(0, 500)) for j in range(150))
    ]
    p = spark.createDataFrame(pts, "pid int, d long")
    iv = spark.createDataFrame(ivs, "iid int, s long, e long")

    got = {
        (r.pid, r.iid)
        for r in interval_join(p, "d", iv, "s", "e", bin_width=32).collect()
    }
    expect = {
        (r.pid, r.iid)
        for r in p.crossJoin(iv)
        .where((F.col("d") >= F.col("s")) & (F.col("d") <= F.col("e")))
        .collect()
    }
    assert got == expect  # exactly-once per qualifying pair, none missed


def test_interval_join_bin_width_one_and_empty(spark):
    p = spark.createDataFrame([(1, 10)], "pid int, d long")
    iv = spark.createDataFrame([(1, 10, 10), (2, 11, 20)], "iid int, s long, e long")
    out = interval_join(p, "d", iv, "s", "e", bin_width=1).collect()
    assert [(r.pid, r.iid) for r in out] == [(1, 1)]  # inclusive bounds, no e<d hit


def test_interval_join_plan_is_equi_join(spark):
    # The point: NO BroadcastNestedLoopJoin / CartesianProduct — the bin
    # column turns the inequality join into a plain equi-join.
    p = spark.range(1_000).select(F.col("id").alias("d"))
    iv = spark.range(1_000).select(
        F.col("id").alias("s"), (F.col("id") + 10).alias("e")
    )
    plan = (
        interval_join(p, "d", iv, "s", "e", bin_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "nestedloop" not in plan and "cartesian" not in plan


def test_interval_join_spread_points_same_pairs(spark):
    # r12: the opt-in probe-side spread (round-robin repartition) must be
    # result-invariant — a repartition before an inner join cannot change
    # its rows — while spreading the containment scan across tasks.
    rng = random.Random(11)
    pts = [(i, rng.randrange(0, 300)) for i in range(120)]
    ivs = [
        (j, s, s + rng.randrange(0, 40))
        for j, s in ((j, rng.randrange(0, 300)) for j in range(90))
    ]
    p = spark.createDataFrame(pts, "pid int, d long")
    iv = spark.createDataFrame(ivs, "iid int, s long, e long")
    plain = {
        (r.pid, r.iid)
        for r in interval_join(p, "d", iv, "s", "e", bin_width=16).collect()
    }
    spread = interval_join(
        p, "d", iv, "s", "e", bin_width=16, spread_points=8
    )
    assert {(r.pid, r.iid) for r in spread.collect()} == plain
    plan = spread._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan  # the spread survives optimization
