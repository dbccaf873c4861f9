"""State-store provider equivalence: RocksDB vs the default HDFS-backed
provider must compute IDENTICAL results — the provider changes where
state lives (off-heap SSD vs executor heap), never semantics. This is
the 100 TB lever for stateful streaming whose state grows with the key
universe (streaming/statestore.py rationale)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from prajna_spark.streaming.dedup_stream import start_watermark_dedup
from prajna_spark.streaming.statestore import (
    _PROVIDER_CONF,
    ROCKSDB_PROVIDER,
    rocksdb_state,
)


def _drain_dedup(spark, sf_dir, base):
    from prajna_spark.streaming.telemetry import events_readstream

    ev = events_readstream(spark, sf_dir).select(
        "ts",
        "user_id",
        "event_type",
        (F.expr("CAST(ts AS LONG) div 3600") * 3600).alias("epoch_hour"),
    )
    q = start_watermark_dedup(
        ev,
        "ts",
        ["user_id", "event_type", "epoch_hour"],
        f"{base}/store",
        f"{base}/ckpt",
    )
    q.awaitTermination()
    rows = (
        spark.read.parquet(f"{base}/store")
        .select("user_id", "event_type", "epoch_hour")
        .collect()
    )
    return sorted(tuple(r) for r in rows)


def test_rocksdb_provider_matches_default(spark, sf_dir):
    base_default = tempfile.mkdtemp(prefix="ss_default_")
    base_rocks = tempfile.mkdtemp(prefix="ss_rocks_")

    got_default = _drain_dedup(spark, sf_dir, base_default)
    with rocksdb_state(spark):
        assert spark.conf.get(_PROVIDER_CONF) == ROCKSDB_PROVIDER
        got_rocks = _drain_dedup(spark, sf_dir, base_rocks)
    # provider restored after the scope
    assert spark.conf.get(_PROVIDER_CONF, None) != ROCKSDB_PROVIDER

    assert len(got_default) > 0
    assert got_default == got_rocks


def test_rocksdb_scope_restores_previous_provider(spark):
    spark.conf.set(_PROVIDER_CONF, "com.example.CustomProvider")
    try:
        with rocksdb_state(spark, changelog=False):
            assert spark.conf.get(_PROVIDER_CONF) == ROCKSDB_PROVIDER
        assert spark.conf.get(_PROVIDER_CONF) == "com.example.CustomProvider"
    finally:
        spark.conf.unset(_PROVIDER_CONF)
