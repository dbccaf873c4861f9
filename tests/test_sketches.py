"""The approximate-sketch surface — the 100 TB path the exact queries
document as their scale twin (SURVEY §2.6 'no approx-distinct' upgrade;
scalars.percentile_order_totals docstring).

Sketches (HLL++, KLL-style quantiles) are mergeable map-side, so they keep
partial aggregation — no oracle hash-match is possible against DuckDB's
different sketch implementations, so these are tolerance tests against the
exact answers on the real sf0.001 tables."""

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_approx_count_distinct_within_rsd(spark):
    od = _orders(spark)
    exact = od.select(F.countDistinct("o_custkey")).first()[0]
    approx = od.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= max(4 * 0.02 * exact, 1)  # 4 sigma


def test_approx_percentile_brackets_exact(spark):
    od = _orders(spark)
    exact_p50, exact_p99 = od.select(
        F.percentile("o_totalprice", F.lit(0.5)),
        F.percentile("o_totalprice", F.lit(0.99)),
    ).first()
    ap50, ap99 = od.select(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10_000)),
        F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10_000)),
    ).first()
    # KLL accuracy at 10k: rank error ~1e-4 -> value error well under 2%
    assert abs(ap50 - exact_p50) / exact_p50 < 0.02
    assert abs(ap99 - exact_p99) / exact_p99 < 0.02


def test_sketch_agg_keeps_partial_aggregation(spark):
    # The point of the sketch at 100 TB: partial (map-side) aggregation —
    # the plan must show a partial_ aggregate before the exchange.
    od = _orders(spark)
    plan = (
        od.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "partial_approx_count_distinct" in plan
