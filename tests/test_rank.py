"""operators.rank — distributed global ntile / dense_rank vs Spark's own
unpartitioned window functions (the semantics oracle; fine in tests at toy
scale where the single-partition funnel doesn't matter)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from prajna_spark.operators.rank import global_dense_rank, global_ntile


def _expected_ntile(spark_df, order_cols, n):
    w = Window.orderBy(*order_cols)
    return {
        r.k: r.t
        for r in spark_df.select(
            F.col("k"), F.ntile(n).over(w).cast("long").alias("t")
        ).collect()
    }


def test_global_ntile_matches_sql_semantics(spark):
    # 10 rows, 4 tiles -> sizes 3,3,2,2 (first cnt%n tiles get the extra row)
    df = spark.createDataFrame([(i, i * 7 % 10) for i in range(10)], "k int, v int")
    order = [F.col("v").desc(), F.col("k")]
    got = {
        r.k: r.tile
        for r in global_ntile(df, order, 4, "tile").collect()
    }
    assert got == _expected_ntile(df, order, 4)


def test_global_ntile_more_tiles_than_rows(spark):
    df = spark.createDataFrame([(i,) for i in range(3)], "k int")
    got = {r.k: r.tile for r in global_ntile(df, ["k"], 7, "tile").collect()}
    assert got == {0: 1, 1: 2, 2: 3}  # each row its own tile


def test_global_ntile_even_split_many_partitions(spark):
    df = spark.createDataFrame([(i,) for i in range(1_000)], "k int").repartition(8)
    got = {r.k: r.tile for r in global_ntile(df, ["k"], 5, "tile").collect()}
    assert all(got[i] == i // 200 + 1 for i in range(1_000))


def test_global_dense_rank_matches_window(spark):
    df = spark.createDataFrame(
        [(i, [10, 30, 10, 20, 30][i % 5]) for i in range(50)], "k int, g int"
    )
    got = {
        r.k: r.rank for r in global_dense_rank(df, ["g"], "rank").collect()
    }
    expect = {
        r.k: r.rank
        for r in df.select(
            "k", F.dense_rank().over(Window.orderBy("g")).cast("long").alias("rank")
        ).collect()
    }
    assert got == expect


def test_rank_data_path_stays_distributed(spark):
    # No unpartitioned data-sized window: the only windows in the plan are
    # PARTITIONed BY __pid (zipindex internals) or over tiny side tables.
    df = spark.range(10_000).select(F.col("id").alias("k"))
    out = global_ntile(df, ["k"], 4, "tile")
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan
    assert "windowspecdefinition(__pid" in plan
    # the materialized index frame kept the cluster parallelism — the
    # single-partition funnel Spark's own global ntile would build is
    # exactly what must never come back
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
