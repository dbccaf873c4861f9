from prajna_spark.streaming.telemetry import (
    events_readstream,
    hourly_rollup_stream,
    run_telemetry_snapshot,
)

__all__ = ["events_readstream", "hourly_rollup_stream", "run_telemetry_snapshot"]
