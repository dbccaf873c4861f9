"""Streaming throttle debounce: drained stream == sequential local model,
and the throttle-vs-chain semantic difference is real."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from prajna_spark.streaming.debounce_stream import (
    throttle_debounce_stream,
    throttle_fold,
)


def _drain(spark, rows, tmp_path, gap):
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, t long"
    ).select("user_id", "event_type", F.timestamp_seconds("t").alias("ts"))
    df.write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    name = "q_throttle_test"
    q = (
        throttle_debounce_stream(stream, gap_sec=gap)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r["user_id"], r["event_type"], r["t"])
        for r in spark.table(name).collect()
    )


def test_throttle_stream_matches_sequential_model(spark, tmp_path):
    import random

    rng = random.Random(3)
    rows = sorted(
        {(rng.randrange(4), "ab"[rng.randrange(2)], rng.randrange(2000) + 10)
         for _ in range(300)},
        key=lambda r: r[2],
    )
    got = _drain(spark, rows, tmp_path, gap=60)
    by_key = defaultdict(list)
    for u, e, t in rows:
        by_key[(u, e)].append(t)
    want = sorted(
        (u, e, t)
        for (u, e), ts in by_key.items()
        for t in throttle_fold(sorted(ts), None, 60)[0]
    )
    assert got == want and len(got) > 0


def test_throttle_differs_from_chain_on_stepped_burst(spark, tmp_path):
    # ts {10, 15, 19}, gap 6: chain keeps {10} only; throttle keeps
    # {10, 19} (19 measures from the last KEPT 10, not from 15)
    rows = [(1, "a", 10), (1, "a", 15), (1, "a", 19)]
    got = _drain(spark, rows, tmp_path, gap=6)
    assert got == [(1, "a", 10), (1, "a", 19)]

    from prajna_spark.operators.intervals import burst_first

    df = spark.createDataFrame(rows, "k long, e string, t long")
    chain = sorted(r["t"] for r in burst_first(df, ["k", "e"], "t", 6).collect())
    assert chain == [10]


def test_throttle_fold_boundary_strictness():
    # keep iff t - last_kept > gap: exactly-gap does NOT pass (matches
    # burst_first's chaining inclusivity)
    kept, last = throttle_fold([0, 6, 7, 14], None, 6)
    assert kept == [0, 7, 14] and last == 14
