"""Table catalog over the driver's parquet testdata.

Reference parity: Prajna's sources are ``DSet.loadSource`` (re-open a named
stored DSet, /root/reference/src/CoreLib/DSetGenerics.fs:367-384) and
``DSet.store/saveToHDD`` (ibid:206-366, 519-547). Here a "named DSet" is a
parquet table; ``spark.read.parquet`` gives us columnar scan with predicate
pushdown + column pruning for free — on 100 TB the scan reads only the
row-groups and columns the query touches (verify with
``plans.assert_pushdown``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (they grow
# sublinearly or are fixed-size in TPC-H-ish generators).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ts arrives as raw nanos (TIMESTAMP(NANOS) parquet type);
            # convert losslessly via integer division to micros. `div` stays
            # exact where a double division would lose precision at ~1.7e18.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Plain parquet TIMESTAMP (isAdjustedToUTC=false) reads as NTZ;
            # NTZ cannot cast to numeric, so normalize to session-local
            # (UTC-pinned) timestamp here so downstream epoch math works and
            # matches DuckDB's naive-timestamp epoch().
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def stream_table(
    spark: SparkSession, name: str, sf_dir: str, schema: str
) -> DataFrame:
    """``readStream`` twin of :func:`load_table`, handling BOTH fixture
    shapes: driver testdata tables are single FILES
    (``<sf_dir>/<name>.parquet``), while scaled fixtures and rewrite
    scenarios are DIRECTORIES of part files (tools/gen_scale.py,
    driver_sim's INT96 rewrite). A directory streams directly; a file
    streams via a glob filter over the parent (the file source's basePath
    must be a directory). Streaming always needs the explicit ``schema``
    — there is no inference pass. The caller owns any events-style ts
    normalization (see streaming/telemetry.py)."""
    reader = spark.readStream.schema(schema)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", f"{name}.parquet").parquet(sf_dir)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load the full star schema as a dict of DataFrames (lazy scans)."""
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so the full catalog is
    queryable through ``spark.sql`` — the engine's SQL front door (the
    reference has no SQL surface at all; SURVEY §0)."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
