"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the configs
below are chosen to also be the right defaults on a large cluster:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion) — at 100 TB the static plan is always wrong somewhere.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescePartitions makes a large initial number safe.
- Arrow execution for any pandas-UDF path (the slow path; the catalog's
  hot queries are 100% JVM built-ins).
- Session timezone pinned to UTC so date/time semantics match the DuckDB
  oracle regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(app_name: str = "prajna-spark") -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to a session we did not create.

    The driver passes us its own SparkSession; these confs are safe to set
    after JVM start and are required for oracle parity (UTC) and for the
    plans we want (AQE).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # events.parquet stores ts as TIMESTAMP(NANOS) which the Spark parquet
    # reader rejects; read as raw nanos and convert in the catalog.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
