"""zip_with_index: deterministic global index, distributed plan."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from prajna_spark.operators.zipindex import zip_with_index


def test_index_follows_total_order(spark):
    rng = random.Random(42)
    vals = [(v,) for v in rng.sample(range(100_000), 5_000)]
    df = spark.createDataFrame(vals, "x long")
    out = zip_with_index(df, ["x"], "idx", num_partitions=8).collect()
    by_idx = sorted(out, key=lambda r: r.idx)
    assert [r.idx for r in by_idx] == list(range(5_000))  # dense 0-based
    assert [r.x for r in by_idx] == sorted(v for v, in vals)  # follows order


def test_composite_order_key(spark):
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "g int, x int"
    )
    out = zip_with_index(df, ["g", "x"], "idx", num_partitions=4).collect()
    expect = sorted(((i % 3, i) for i in range(300)))
    got = [(r.g, r.x) for r in sorted(out, key=lambda r: r.idx)]
    assert got == expect


def test_data_path_stays_distributed(spark):
    # The whole point vs row_number() OVER (ORDER BY ...): the DATA-sized
    # work must not funnel through one partition. The plan's only
    # SinglePartition exchange is the offsets branch, which carries exactly
    # #partitions count rows; the data path is range-partitioned and its
    # window is PARTITIONed BY __pid.
    df = spark.range(10_000).select(F.col("id").alias("x"))
    out = zip_with_index(df, ["x"], "idx", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan  # distributed sort of the data
    assert "windowspecdefinition(__pid" in plan  # data window is per-partition
    # the frame keeps the requested distributed layout — a
    # single-partition funnel can never come back silently
    assert out.rdd.getNumPartitions() == 8
    # partition-id order follows key order: idx is globally correct
    rows = out.collect()
    assert sorted(r.idx for r in rows) == list(range(10_000))
    assert {r.x: r.idx for r in rows} == {i: i for i in range(10_000)}
