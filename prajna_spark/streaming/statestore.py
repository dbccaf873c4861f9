"""State-store provider selection for the stateful streaming tier.

The default HDFS-backed state store keeps every key in executor HEAP
(plus checkpoint files). That is the right default for this repo's
bounded-state operators (sketch cells, per-series O(1) folds, watermark-
GC'd join rows) — but a production deployment whose state legitimately
grows with the key universe (e.g. the watermark dedup's survivor keys
over a 100 TB ingest window) wants Spark's RocksDB provider instead:
state lives off-heap on local SSD with block-cache reads, so state
cardinality is bounded by disk, not by executor memory, and snapshot
uploads are incremental (changelog checkpointing).

The provider is BOUND AT CHECKPOINT CREATION: flipping it on an existing
checkpoint is an error, so these helpers are explicit and scoped rather
than a session default — each stateful operator in this repo takes a
fresh checkpoint directory, which is exactly the boundary where the
choice is valid.

Equivalence contract: the provider changes WHERE state lives, never what
a query computes — tests/test_statestore.py drains the same stream under
both providers and asserts byte-identical results.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def rocksdb_state(spark: SparkSession, changelog: bool = True):
    """Scope under which NEWLY STARTED streaming queries use the RocksDB
    state store (with incremental changelog checkpointing unless
    ``changelog=False``). Restores the previous provider on exit; queries
    already running keep the provider their checkpoint was created with.
    """
    prev = spark.conf.get(_PROVIDER_CONF, None)
    prev_cl = spark.conf.get(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        None,
    )
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog else "false",
    )
    try:
        yield spark
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
        if prev_cl is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                prev_cl,
            )
