"""Salted aggregation / join equivalence and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.salt import salted_agg, salted_broadcast_join


def _skewed(spark):
    # 90% of rows share key 0 (zipf-ish hot key)
    return spark.range(10_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k",
        "CAST(id AS DOUBLE) AS v",
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.total, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.k): (r.total, r.n)
        for r in salted_agg(
            df,
            ["k"],
            [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            [F.sum("s").alias("total"), F.sum("c").alias("n")],
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    df = _skewed(spark)
    stage1 = (
        df.select("*", (F.rand(seed=42) * 16).cast("int").alias("__salt"))
        .groupBy("k", "__salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hot = stage1.where(F.col("k") == 0).collect()
    assert len(hot) > 8  # hot key split across many salt groups


def test_salted_broadcast_join_matches_plain(spark):
    probe = _skewed(spark)
    build = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (5, "b")], "k long, tag string"
    )
    plain = sorted(
        (r.k, r.v, r.tag) for r in probe.join(build, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag)
        for r in salted_broadcast_join(probe, build, ["k"]).collect()
    )
    assert salted == plain


def test_salted_partials_spread_the_hot_key(spark):
    """Stage 1 must fan the hot key across ~n_salts reducer keys — that IS
    the skew fix; if the hot key produced one partial row, stage 1 would
    be a plain (skewed) groupBy."""
    from prajna_spark.operators.salt import salted_partials

    df = _skewed(spark)
    stage1 = salted_partials(
        df, ["k"], [F.count(F.lit(1)).alias("c")], n_salts=16
    ).collect()
    per_key = {}
    for r in stage1:
        per_key.setdefault(r.k, []).append(r.c)
    hot_n = df.where(F.col("k") == 0).count()  # ~91% of all rows
    # hot key 0 spread over (nearly) all 16 salts...
    assert len(per_key[0]) >= 12
    # ...with no single partial holding the whole key
    assert max(per_key[0]) < hot_n * 0.5
    # and the partials still sum to the true counts
    assert sum(per_key[0]) == hot_n
