"""Streaming model-scoring alerts — the reference-architecture loop a
telemetry deployment runs continuously: a small model table (here the
hour-of-day seasonal forecast, but the shape fits any broadcastable
scoring table — centroids, thresholds, coefficient rows) is joined to
every micro-batch map-side and violations append to an alert store.

Stateless by design: each event scores against the PRE-TRAINED model, so
a clean drain equals the batch filter row-for-row (the catalog oracle),
retries can only re-append rows the dedup-on-read key filters (alerts
carry event_id), and no watermark is involved. Retraining = rebuilding
the forecast table and restarting the sink; the pattern upgrades to
versioned models by stamping a model_version column on the alerts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from prajna_spark.functions.rounding import pround


def start_forecast_alerts(
    stream: DataFrame,
    forecast: DataFrame,
    join_cols: list[str],
    value_col: str,
    forecast_col: str,
    threshold: float,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Score each micro-batch against the broadcast ``forecast`` table
    and append rows whose absolute deviation exceeds ``threshold`` to
    ``store_path``. Events without a forecast row (unseen key) pass
    through silently — an inner join, the documented contract (alerting
    on unseen keys is a different policy; use a left join + null check
    to get it)."""
    fc = F.broadcast(forecast)

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        alerts = (
            batch_df.join(fc, join_cols)
            .withColumn(
                "deviation", pround(F.col(value_col) - F.col(forecast_col), 6)
            )
            .where(F.abs(F.col(value_col) - F.col(forecast_col)) > threshold)
        )
        alerts.write.mode("append").parquet(store_path)

    writer = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
