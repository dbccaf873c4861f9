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
