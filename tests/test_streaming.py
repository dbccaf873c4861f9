"""Structured-Streaming telemetry loop (SURVEY §2.12 upgrades).

The streaming rollup must agree with its batch twin
(``telemetry_hourly_rollup``) when the stream has fully drained — the
Prajna interactive fold cycle, with event-time/watermark correctness Spark
adds on top.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.streaming.telemetry import (
    events_readstream,
    hourly_rollup_stream,
    run_telemetry_snapshot,
)


def test_snapshot_matches_batch_rollup(spark, sf_dir):
    snap = run_telemetry_snapshot(spark, sf_dir, name="t_snapshot")
    got = {
        (r.epoch_start // 3600, r.event_type): (r.n_events, round(r.total_value, 2))
        for r in snap.collect()
    }

    from prajna_spark.queries import queries

    batch = queries()["telemetry_hourly_rollup"](spark, sf_dir)
    want = {
        (r.epoch_hour, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want


def test_stream_plan_is_event_time_windowed(spark, sf_dir):
    stream = hourly_rollup_stream(events_readstream(spark, sf_dir))
    assert stream.isStreaming
    assert stream.schema.fieldNames() == [
        "epoch_start",
        "event_type",
        "n_events",
        "total_value",
    ]


def test_late_data_dropped_past_watermark(spark, tmp_path):
    """Rows older than watermark-behind-max-event-time are dropped in
    append mode — the late-data contract the reference never had."""
    src = str(tmp_path / "src")
    out_name = "t_late"
    # batch 1: two events at hours 0 and 10 (watermark will advance to 08:00)
    spark.createDataFrame(
        [(1, 0, 1, "click", 1.0, "{}"), (2, 36_000 * 10**9, 1, "click", 1.0, "{}")],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(src)

    from prajna_spark.session import tune

    tune(spark)
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, value double, props string"
        )
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    rollup = hourly_rollup_stream(raw, watermark="2 hours")
    q = (
        rollup.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    # append mode emits only windows finalized by the watermark: hour 0 is
    # final (watermark 10:00-2h=08:00), hour 10 still open
    finalized = {r.epoch_start for r in spark.table(out_name).collect()}
    assert finalized == {0}


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream self-join with an event-time interval constraint
    (each purchase joined to the same user's views in the preceding hour),
    both sides watermarked so join state is GC'd past the interval — the
    streaming twin of the batch range join. After AvailableNow drains the
    source, the result must equal the batch join."""
    ev = events_readstream(spark, sf_dir)
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    q = (
        p.join(v, cond, "inner")
        .select("p_id", "v_id")
        .writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.p_id, r.v_id) for r in spark.sql("SELECT * FROM t_ss_join").collect()}

    from prajna_spark.sources import load_table

    batch_events = load_table(spark, "events", sf_dir)
    want = {
        (r.p_id, r.v_id)
        for r in batch_events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .join(
            batch_events.where(F.col("event_type") == "view").select(
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
                F.col("event_id").alias("v_id"),
            ),
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts")),
        )
        .collect()
    }
    assert got == want and want  # non-empty agreement


def test_late_rows_drop_vs_fold_across_cycles(spark, tmp_path):
    """Explicit late-arrival conformance for the watermarked rollup, across
    TWO AvailableNow cycles sharing a checkpoint (watermark persists):

    cycle 1 sees hours 0 and 10 -> watermark 08:00, emits hour 0.
    cycle 2 injects three arrivals:
      - hour 1  (below watermark)  -> DROPPED: its window never appears;
      - hour 9  (behind max event time but ABOVE watermark) -> FOLDED:
        late-but-within-tolerance data still lands in its window;
      - hour 20 -> advances watermark to 18:00, finalizing hours 9 and 10.
    """
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )

    def write(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(src)

    out = str(tmp_path / "out")

    def drain():
        # file sink (not memory): it supports restart from the checkpoint,
        # which is the whole point — the watermark must persist between
        # cycles. Returns the CUMULATIVE finalized windows.
        raw = (
            spark.readStream.schema(schema)
            .parquet(src)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
        q = (
            hourly_rollup_stream(raw, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return {
            r.epoch_start // 3600: (r.n_events, r.total_value)
            for r in spark.read.parquet(out).collect()
        }

    from prajna_spark.session import tune

    tune(spark)
    hr = 3600 * 10**9  # ns per hour
    write([(1, 0 * hr + 10**9, 1, "click", 1.0, "{}"),
           (2, 10 * hr, 1, "click", 2.0, "{}")], "overwrite")
    assert drain() == {0: (1, 1.0)}

    write([(3, 1 * hr, 1, "click", 100.0, "{}"),   # below watermark: drop
           (4, 9 * hr, 1, "click", 4.0, "{}"),     # above watermark: fold
           (5, 20 * hr, 1, "click", 5.0, "{}")], "append")
    # hour 1 never appears (dropped); hour 9 was folded then finalized
    assert drain() == {0: (1, 1.0), 9: (1, 4.0), 10: (1, 2.0)}
