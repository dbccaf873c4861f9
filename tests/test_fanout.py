"""fan_out (operators/fanout.py) — conditional scan fan-out.

Contract under test:
- a narrow (scan-stage) plan with fewer partitions than cluster
  parallelism is repartitioned up;
- a narrow plan already at/above parallelism is returned unchanged
  (no gratuitous shuffle at scale);
- a plan containing a wide node (shuffle) is returned UNCHANGED —
  resolving its RDD under AQE would eagerly materialize query stages
  just to read a partition count (r8 ADVICE), so the helper must
  detect wide plans from the analyzed logical plan alone.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.fanout import fan_out, scan_partition_count


def _npart(df):
    return df.rdd.getNumPartitions()


def test_small_scan_fans_out(spark):
    df = spark.range(0, 1000, 1, 1).withColumn("x", F.col("id") * 2)
    out = fan_out(df, min_partitions=8)
    assert _npart(out) == 8
    assert out.count() == 1000


def test_wide_enough_scan_unchanged(spark):
    df = spark.range(0, 1000, 1, 16)
    out = fan_out(df, min_partitions=8)
    assert out is df


def test_wide_plan_returned_unchanged(spark):
    # Aggregate → exchange in the physical plan: fan_out must not touch
    # it (and must not run any job deciding that).
    agg = spark.range(0, 100, 1, 1).groupBy((F.col("id") % 5).alias("k")).count()
    assert fan_out(agg, min_partitions=8) is agg
    joined = spark.range(0, 50, 1, 1).join(
        spark.range(0, 50, 1, 1).withColumnRenamed("id", "id2"),
        F.col("id") == F.col("id2"),
    )
    assert fan_out(joined, min_partitions=8) is joined
    srt = spark.range(0, 100, 1, 1).orderBy("id")
    assert fan_out(srt, min_partitions=8) is srt


def test_pandas_group_plans_returned_unchanged(spark):
    # r9 ADVICE: FlatMapGroupsInPandas / FlatMapCoGroupsInPandas nodes
    # must match the wide-node guard — their physical plans carry an
    # exchange, and resolving the RDD would eagerly run query stages.
    import pandas as pd

    def ident(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    base = spark.range(0, 100, 1, 1).withColumn("k", F.col("id") % 5)
    grouped = base.groupBy("k").applyInPandas(ident, schema="id long, k long")
    assert fan_out(grouped, min_partitions=8) is grouped
    cg = (
        base.groupBy("k")
        .cogroup(base.groupBy("k"))
        .applyInPandas(lambda l, r: l, schema="id long, k long")
    )
    assert fan_out(cg, min_partitions=8) is cg


def test_column_name_cannot_false_positive(spark):
    # A column literally named "Join" must not trip the wide-node regex.
    df = spark.range(0, 100, 1, 1).withColumn("Join", F.lit(1))
    out = fan_out(df, min_partitions=4)
    assert _npart(out) == 4


def test_scan_partition_count_narrow_and_wide(spark):
    # narrow scan-stage plan: the real partition count, no job
    df = spark.range(0, 1000, 1, 7).withColumn("x", F.col("id") * 2)
    assert scan_partition_count(df) == 7
    # wide (post-shuffle) plan: None — reading the RDD would eagerly
    # materialize query stages under AQE (r11 VERDICT item 8)
    agg = spark.range(0, 100, 1, 1).groupBy((F.col("id") % 5).alias("k")).count()
    assert scan_partition_count(agg) is None


def test_spread_operators_accept_post_shuffle_frames(spark):
    # r11 VERDICT item 8: rolling_distinct and jaccard_similarity_join
    # are public operators — handed a POST-SHUFFLE frame they must not
    # read .rdd.getNumPartitions() (eager stage materialization); the
    # guarded read falls back to defaultParallelism and results are
    # unchanged.
    from prajna_spark.operators.smoothing import rolling_distinct
    from prajna_spark.pipeline.dedup import jaccard_similarity_join

    events = (
        spark.range(0, 60, 1, 2)
        .select(
            F.lit("k").alias("key"),
            (F.col("id") % 7).alias("bucket"),
            (F.col("id") % 5).alias("user"),
        )
        .groupBy("key", "bucket", "user")
        .count()
        .drop("count")
    )  # aggregate -> wide plan
    out = rolling_distinct(events, ["key"], "bucket", "user", window=3)
    base = rolling_distinct(
        spark.range(0, 60, 1, 2).select(
            F.lit("k").alias("key"),
            (F.col("id") % 7).alias("bucket"),
            (F.col("id") % 5).alias("user"),
        ),
        ["key"],
        "bucket",
        "user",
        window=3,
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, base.collect())
    )

    docs = (
        spark.createDataFrame(
            [(i, "a b c d e f g h") for i in range(6)], "doc_id long, text string"
        )
        .groupBy("doc_id", "text")
        .count()
        .drop("count")
    )  # aggregate -> wide plan
    pairs = jaccard_similarity_join(docs, threshold=0.5, gram=2)
    assert pairs.count() == 15  # identical docs: all C(6,2) pairs match
