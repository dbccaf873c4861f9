"""Task-level skew diagnostic (plans.metrics.stage_task_skew): stage
TOTALS are blind to skew — a balanced stage and a one-hot-task stage
report the same sums — so the diagnostic reads task QUANTILES from the
status store.

The demonstration case is a WINDOW over a hot key: algebraic aggregates
don't skew (map-side partials collapse the hot key before the shuffle —
verified here), and AQE's skew-join splitting only fixes JOINS; a
window's partitionBy ships every hot-key row to one task with no engine
remedy, which is exactly why the repo's operators shard dominant keys
themselves (time-bucketed as-of, salted aggregation — operators/salt.py)
and why this diagnostic exists.

Detection thresholds use shuffle-read BYTES (deterministic given the
data); run-time quantiles are load-noisy in CI."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prajna_spark.plans.metrics import (
    max_skew_ratio,
    stage_task_skew,
    stage_totals,
)


def _df(spark, hot: bool, n=400_000):
    # hot: 90% of rows share key 0; balanced: uniform over 1000 keys.
    # The value column is padded so shuffle bytes track row counts.
    key = (
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 1000)
        if hot
        else F.col("id") % 1000
    )
    return spark.range(0, n, 1, 16).select(
        key.alias("k"),
        F.concat(F.lit("x" * 32), F.col("id").cast("string")).alias("v"),
    )


def _measure_skew(spark, build):
    # AQE partition-coalescing folds this tiny fixture's reduce stage
    # into 1-2 tasks (no distribution to measure); the diagnostic's
    # subject is per-task spread at a FIXED partition count, so pin it
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        before = stage_totals(spark)
        build().write.format("noop").mode("overwrite").save()
        skew = stage_task_skew(spark, min_stage_id=before["max_stage_id"])
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    if not skew:
        pytest.skip("taskSummary unavailable on this Spark build")
    return skew


def _rank(df):
    w = Window.partitionBy("k").orderBy("v")
    return df.select("k", F.row_number().over(w).alias("rn"))


def test_hot_key_window_skew_is_detected(spark):
    hot = _measure_skew(spark, lambda: _rank(_df(spark, hot=True)))
    balanced = _measure_skew(spark, lambda: _rank(_df(spark, hot=False)))
    hot_ratio = max_skew_ratio(hot)
    balanced_ratio = max_skew_ratio(balanced)
    # one task reads ~90% of the shuffle vs 1/32 at the median
    assert hot_ratio > 10, (hot_ratio, hot)
    assert balanced_ratio < 5, (balanced_ratio, balanced)


def test_algebraic_agg_does_not_skew_on_hot_key(spark):
    """The counter-case the docstring claims: map-side partials collapse
    the hot key BEFORE the exchange, so a count/max groupBy over the
    same 90%-hot data shows no reducer skew — the diagnostic should stay
    quiet, and skew remedies shouldn't be reached for."""
    skew = _measure_skew(
        spark,
        lambda: _df(spark, hot=True)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.max("v").alias("mx")),
    )
    assert max_skew_ratio(skew) < 5, skew


def test_degrades_to_empty_on_broken_surface():
    # simulate py4j surface drift: any accessor raises -> {} (never an error)
    class BoomCtx:
        def __getattr__(self, _):
            raise RuntimeError("surface drift")

    class FakeSpark:
        sparkContext = BoomCtx()

    assert stage_task_skew(FakeSpark()) == {}
