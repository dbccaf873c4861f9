"""Diagnose -> remedy loop for hot-key WINDOW skew (r6 VERDICT item 6).

Hot-key windows are the one skew case AQE cannot fix: a window
partition is indivisible, so WindowExec funnels a hot key's every row
into one task. The remedy (operators.salt.window_agg_grouped) rewrites
the whole-partition window aggregate as hash-aggregate + join-back:
map-side combine collapses the hot key before the aggregate shuffle,
and the join-back is a SHUFFLE JOIN, which AQE's skew-join splitting
can divide at runtime.

The test plants a hot key (95% of rows on one key), measures the
task-quantile spread (plans.metrics.stage_task_skew — the same report
tools/skew_report.py prints) for both spellings, and asserts:
  1. the window spelling shows the hot-task signature (max/median
     shuffle-read ratio well above the alert threshold);
  2. the rewrite collapses the spread below it (AQE skew thresholds
     lowered so the split engages at test scale);
  3. results are row-for-row identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.salt import window_agg_auto, window_agg_grouped
from prajna_spark.plans.metrics import (
    max_skew_ratio,
    stage_task_skew,
    stage_totals,
)

N_ROWS = 200_000
HOT_FRACTION = 0.95
ALERT = 8.0


def _hot_frame(spark):
    # ~95% of rows on key 'hot', remainder spread over 64 cold keys;
    # salt column breaks input-partition alignment with the key
    return (
        spark.range(N_ROWS)
        .select(
            F.when(F.col("id") % 100 < HOT_FRACTION * 100, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 64).cast("string")))
            .alias("k"),
            (F.col("id") % 1000).cast("long").alias("v"),
        )
        .repartition(32)
    )


def _measure(spark, df):
    """Run df end-to-end (noop sink — count() would let Catalyst prune
    the window away) and return (row count, worst max/median
    shuffle-read spread) — the skew_report loop in miniature."""
    before = stage_totals(spark)
    df.write.mode("overwrite").format("noop").save()
    skew = stage_task_skew(
        spark, min_stage_id=before.get("max_stage_id", -1)
    )
    return df.count(), max_skew_ratio(skew, "shuffle_read_bytes")


def test_window_remedy_collapses_hot_key_spread(spark):
    df = _hot_frame(spark).persist()
    try:
        df.count()
        aggs = {
            "total_v": F.sum("v"),
            "n_k": F.count(F.lit(1)),
        }
        # AQE skew-join thresholds lowered so the join-back's hot
        # partition splits at test scale (defaults are 256 MB)
        low_confs = {
            # at test scale AQE would coalesce the reduce side below the
            # diagnostic's 4-task floor; at 100 TB partitions aren't
            # coalescible, so disabling it here models the real shape
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            # keep the windowed run honestly multi-task
            "spark.sql.shuffle.partitions": "32",
        }
        prev = {k: spark.conf.get(k, None) for k in low_confs}
        for k, v in low_confs.items():
            spark.conf.set(k, v)
        try:
            n_win, spread_win = _measure(
                spark, window_agg_auto(df, ["k"], aggs)  # no report -> window
            )
            n_grp, spread_grp = _measure(
                spark, window_agg_auto(df, ["k"], aggs, skew_ratio=spread_win)
            )
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

        assert n_win == n_grp == N_ROWS
        # the diagnostic flags the window spelling...
        assert spread_win >= ALERT, f"window spread only {spread_win:.1f}"
        # ...and the rewrite collapses the spread (one task no longer
        # reads the whole hot key: map-side combine + AQE skew split)
        assert spread_grp < ALERT, f"grouped spread still {spread_grp:.1f}"
        assert spread_grp < spread_win / 2

        # hash-identical results
        win_rows = sorted(
            tuple(r)
            for r in window_agg_auto(df, ["k"], aggs).collect()
        )
        grp_rows = sorted(
            tuple(r)
            for r in window_agg_grouped(df, ["k"], aggs).collect()
        )
        assert win_rows == grp_rows
    finally:
        df.unpersist(blocking=False)


def test_grouped_spelling_keeps_null_keyed_rows(spark):
    """Window.partitionBy treats NULL keys as their own partition group;
    the grouped twin must keep those rows too (null-safe join-back), or
    window_agg_auto silently changes row counts when the skew threshold
    flips the spelling on nullable-keyed data (r7 ADVICE, medium)."""
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("a", 3), (None, 4), ("b", 5)],
        "k string, v int",
    )
    aggs = {"total_v": F.sum("v"), "n_k": F.count(F.lit(1))}

    def rows(out):
        return sorted(
            ((r["k"], r["v"], r["total_v"], r["n_k"]) for r in out.collect()),
            key=lambda t: (t[0] is None, t),
        )

    win = rows(window_agg_auto(df, ["k"], aggs))
    grp = rows(window_agg_grouped(df, ["k"], aggs))
    assert win == grp
    assert len(grp) == 5  # both NULL-keyed rows kept
    assert (None, 2, 6, 2) in grp  # NULL group aggregated as one partition


def test_window_agg_rejects_output_name_collisions(spark):
    """Both spellings raise on aggs-name/df-column collisions instead of
    diverging (window overwrites, grouped duplicates) — r7 ADVICE low."""
    import pytest

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    for fn in (window_agg_grouped, window_agg_auto):
        with pytest.raises(ValueError, match="collide"):
            fn(df, ["k"], {"v": F.sum("v")})


def test_window_agg_auto_threshold_routing(spark):
    df = _hot_frame(spark).limit(1000)
    aggs = {"total_v": F.sum("v")}
    # below threshold -> window plan (WindowExec present, no join)
    plan_win = (
        window_agg_auto(df, ["k"], aggs, skew_ratio=2.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan_win
    # at threshold -> grouped join plan (no WindowExec)
    plan_grp = (
        window_agg_auto(df, ["k"], aggs, skew_ratio=8.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan_grp
