"""operators.rollup_cascade — cascading multi-resolution rollup."""

import pytest
from pyspark.sql import functions as F

from prajna_spark.operators.rollup_cascade import cascade_rollup


def _raw(spark):
    rows = [(i * 37 % 7200, "a" if i % 3 else "b", float(i % 11)) for i in range(500)]
    return spark.createDataFrame(rows, "t long, k string, v double")


def test_cascade_matches_direct_groupby_each_level(spark):
    df = _raw(spark)
    out = cascade_rollup(df, "t", ["k"], "v", resolutions=[60, 3600])
    for width in (60, 3600):
        got = {
            (r.epoch_start, r.k): (r.n_events, r.total_value)
            for r in out.where(F.col("resolution") == width).collect()
        }
        expect = {
            (r.epoch_start, r.k): (r.n, r.s)
            for r in df.groupBy(
                (F.floor(F.col("t") / width) * width).cast("long").alias("epoch_start"),
                "k",
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        }
        assert got == expect


def test_cascade_rejects_non_multiple_resolutions(spark):
    with pytest.raises(ValueError):
        cascade_rollup(_raw(spark), "t", ["k"], "v", resolutions=[60, 90])


def test_cascade_coarse_levels_read_cached_partials(spark):
    # The scale contract: coarser levels re-aggregate the persisted finer
    # level — the executed union reads in-memory partials, not raw.
    df = _raw(spark)
    out = cascade_rollup(df, "t", ["k"], "v", resolutions=[60, 3600, 86400])
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TableCacheQueryStage" in plan or "InMemoryTableScan" in plan


def test_hll_cascade_union_equals_direct_and_brackets_exact(spark, sf_dir):
    """(1) Unioning hourly sketches to daily gives EXACTLY the estimate of
    sketching the day directly (same lgK — the sufficient-statistic
    property that lets the raw events be discarded); (2) estimates bracket
    the exact distinct counts within HLL tolerance."""
    from pyspark.sql import functions as F

    from prajna_spark.operators.sketch_rollup import hll_cascade, hll_partials
    from prajna_spark.sources import load_table

    ev = load_table(spark, "events", sf_dir).select(
        F.col("ts").cast("long").alias("t"), "event_type", "user_id"
    )
    hourly = hll_partials(ev, "t", ["event_type"], "user_id", 3600)
    out = hll_cascade(hourly, ["event_type"], [3600, 86400])
    daily_est = {
        (r.epoch_start, r.event_type): r.approx_distinct
        for r in out.where(F.col("resolution") == 86400).collect()
    }

    direct = {
        (r.epoch_start, r.event_type): r.approx_distinct
        for r in hll_cascade(
            hll_partials(ev, "t", ["event_type"], "user_id", 86400),
            ["event_type"],
            [86400],
        ).collect()
    }
    assert daily_est == direct  # union-of-sketches == sketch-of-union

    exact = {
        (r.d * 86400, r.event_type): r.n
        for r in ev.groupBy(
            F.floor(F.col("t") / 86400).alias("d"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(daily_est) == set(exact)
    for k, est in daily_est.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2), (k, est, exact[k])


def test_gapfill_plants_zero_rows(spark):
    from pyspark.sql import functions as F

    from prajna_spark.operators.rollup_cascade import gapfill

    rollup = spark.createDataFrame(
        [("a", 0, 5, 1.5), ("a", 7200, 2, 0.5), ("b", 3600, 1, 9.0)],
        "event_type string, epoch_start long, n_events long, total_value double",
    )
    got = {
        (r.event_type, r.epoch_start): (r.n_events, r.total_value)
        for r in gapfill(rollup, ["event_type"], 3600).collect()
    }
    assert got == {
        ("a", 0): (5, 1.5),
        ("a", 3600): (0, 0.0),   # planted gap filled with zeros
        ("a", 7200): (2, 0.5),
        ("b", 3600): (1, 9.0),   # single-bucket dim: grid is one row
    }


def test_interpolate_fills_linear_edges_null(spark):
    from prajna_spark.operators.rollup_cascade import interpolate

    rows = [
        ("a", 0, 10.0), ("a", 30, 16.0), ("a", 40, 20.0),  # gaps 10,20
        ("b", 100, 5.0),                                    # singleton
    ]
    df = spark.createDataFrame(rows, "k string, epoch_start long, v double")
    got = {
        (r["k"], r["epoch_start"]): r["v"]
        for r in interpolate(df, ["k"], 10, "v").collect()
    }
    assert got[("a", 0)] == 10.0 and got[("a", 30)] == 16.0  # known kept
    assert got[("a", 10)] == 12.0 and got[("a", 20)] == 14.0  # linear
    assert got[("a", 40)] == 20.0
    assert got[("b", 100)] == 5.0
    assert len(got) == 6  # grid covers [min, max] per series only


def test_interpolate_single_exchange(spark):
    from prajna_spark.operators.rollup_cascade import interpolate
    import re

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") * 20).alias("epoch_start"),
        F.col("id").cast("double").alias("v"),
    )
    plan = (
        interpolate(df, ["k"], 10, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the grid join + two carries must not multiply data-sized exchanges:
    # bounds agg, grid join, one window partition hash — all on k
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3


def test_locf_carries_last_known_value(spark):
    from prajna_spark.operators.rollup_cascade import locf

    rows = [
        ("a", 0, 10.0),
        ("a", 30, 16.0),  # buckets 10,20 missing -> carry 10.0
        ("b", 10, 5.0),  # single-bucket series
    ]
    df = spark.createDataFrame(rows, "k string, epoch_start long, v double")
    out = {
        (r.k, r.epoch_start): r.v
        for r in locf(df, ["k"], 10, "v").collect()
    }
    assert out == {
        ("a", 0): 10.0,
        ("a", 10): 10.0,
        ("a", 20): 10.0,
        ("a", 30): 16.0,
        ("b", 10): 5.0,
    }


def test_locf_vs_interpolate_vs_gapfill_fill_modes(spark):
    """The trio differ exactly where buckets are absent."""
    from prajna_spark.operators.rollup_cascade import gapfill, interpolate, locf

    rows = [("a", 0, 10.0), ("a", 20, 16.0)]
    df = spark.createDataFrame(rows, "k string, epoch_start long, v double")
    g = {r.epoch_start: r.v for r in gapfill(df, ["k"], 10).collect()}
    i = {r.epoch_start: r.v for r in interpolate(df, ["k"], 10, "v").collect()}
    c = {r.epoch_start: r.v for r in locf(df, ["k"], 10, "v").collect()}
    assert (g[10], i[10], c[10]) == (0.0, 13.0, 10.0)
    # known buckets identical in all three modes
    assert g[0] == i[0] == c[0] == 10.0 and g[20] == i[20] == c[20] == 16.0
