"""Bucketed co-located joins: correctness + the no-exchange plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prajna_spark.sources.bucketing import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    a = spark.range(10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(5_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bk_a", ["k"], 8, sort_cols=["k"], path=str(wh / "bk_a"))
    write_bucketed(b, "bk_b", ["k"], 8, sort_cols=["k"], path=str(wh / "bk_b"))
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ta).join(read_table(spark, tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == 5_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_is_shuffle_free(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_table(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert agg.count() == 10_000


def test_bucketed_join_values_match_plain(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = {
        r.k: (r.va, r.vb)
        for r in read_table(spark, ta).join(read_table(spark, tb), "k").collect()
    }
    assert got == {k: (k * 2, k * 3) for k in range(5_000)}
