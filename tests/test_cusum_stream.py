"""Streaming CUSUM: drained stream == fixed-parameter batch chart, state
carries across micro-batches, and the shared fold's alarm math."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from prajna_spark.operators.changepoint import cusum_integer_fixed
from prajna_spark.streaming.cusum_stream import cusum_fold, cusum_stream


def _drain(spark, rows, src, slack, threshold, name):
    df = spark.createDataFrame(rows, "k string, t long, tb long, x long").select(
        "k", F.timestamp_seconds("t").alias("ts"), "tb", "x"
    )
    df.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema("k string, ts timestamp, tb long, x long").parquet(
        src
    )
    q = (
        cusum_stream(stream, slack=slack, threshold=threshold)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.k, r.t, r.tb, r.x, r.cusum, r.is_alarm)
        for r in spark.table(name).collect()
    )


def test_drain_matches_batch_chart(spark, tmp_path):
    rng = random.Random(17)
    rows = [
        ("ab"[rng.randrange(2)], 100 + i, i, rng.randrange(0, 20))
        for i in range(300)
    ]
    got = _drain(spark, rows, str(tmp_path / "src"), 8, 30, "cusum_t1")
    batch_df = spark.createDataFrame(rows, "k string, t long, tb long, x long")
    want = sorted(
        (r.k, r.t, r.tb, r.x, r.cusum, r.is_alarm)
        for r in cusum_integer_fixed(
            batch_df, "k", "t", "x", slack=8, threshold=30, tiebreak_col="tb"
        ).collect()
    )
    assert got == want


def test_state_carries_across_batches(spark, tmp_path):
    # two sequential drains against ONE checkpoint: the second batch must
    # continue the chart, not restart at zero
    src = str(tmp_path / "src2")
    ck = str(tmp_path / "ck2")
    sink = str(tmp_path / "out2")
    rows1 = [("a", 10 + i, i, 20) for i in range(5)]  # x-k=+10 each
    rows2 = [("a", 100 + i, 50 + i, 20) for i in range(5)]

    def run(rows, mode):
        df = spark.createDataFrame(rows, "k string, t long, tb long, x long").select(
            "k", F.timestamp_seconds("t").alias("ts"), "tb", "x"
        )
        df.write.parquet(src, mode=mode)
        stream = spark.readStream.schema(
            "k string, ts timestamp, tb long, x long"
        ).parquet(src)
        q = (
            cusum_stream(stream, slack=10, threshold=1000, watermark="10 seconds")
            .writeStream.format("parquet")  # memory sink can't resume a ckpt
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(rows1, "overwrite")
    run(rows2, "append")
    out = {r.tb: r.cusum for r in spark.read.parquet(sink).collect()}
    assert out[4] == 50  # end of first drain
    assert out[50] == 60  # second drain CONTINUES from 50
    assert out[54] == 100


def test_fold_alarm_crossing():
    rows = [(t, t, 30) for t in range(5)]  # x - slack = +20 per step
    out, ct, minc = cusum_fold(rows, 0, 0, 10, 50)
    assert [o[3] for o in out] == [20, 40, 60, 80, 100]
    assert [o[4] for o in out] == [False, False, True, True, True]
    assert (ct, minc) == (100, 0)
    # recovery: negatives pull the chart back to zero, never below
    out2, ct2, minc2 = cusum_fold([(9, 9, 0)] * 0 + [(9, 9, -100)], ct, minc, 10, 50)
    assert out2[0][3] == 0 and out2[0][4] is False
