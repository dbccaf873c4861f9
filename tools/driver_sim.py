"""Driver simulation — verify at the __spark_entry__ boundary.

Hostile conditions the real driver may impose:
- non-UTC host timezone set BEFORE the JVM starts;
- a plain SparkSession (none of prajna_spark.session's confs);
- fresh process importing only __spark_entry__.

Checks:
1. entry(spark) runs and yields >= 0 rows with a stable schema.
2. queries()/oracle_sql() load; a TZ/nanos-sensitive sample
   (window_lag_events, telemetry_hourly_rollup, scalar_date_orders,
   session_window_users) is hash-compared vs DuckDB at sf0.01 using the
   same canonicalization as tools/check_parity.py.
"""

from __future__ import annotations

import os
import sys

os.environ["TZ"] = "America/New_York"
import time

time.tzset()

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
SAMPLE = [
    "window_lag_events",
    "telemetry_hourly_rollup",
    "scalar_date_orders",
    "session_window_users",
    "window_running_revenue",
    "asof_join_purchase_view",
    # the stateful persisted paths: streaming drains + temp stores must
    # also behave under a hostile session
    "rollup_stream_hourly",
    "dedup_stream_firstseen",
]

FLOAT_DECIMALS = 6


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(FLOAT_DECIMALS)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[4]")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    out = e.entry(spark)
    n = out.count()
    print(f"entry(): {n} rows, schema={[f.name for f in out.schema.fields]}")
    assert n >= 0

    qs, oracles = e.queries(), e.oracle_sql()
    print(f"queries: {len(qs)}, oracles: {len(oracles)}")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failed = []
    for name in SAMPLE:
        spark_pdf = canonicalize(qs[name](spark, SF_DIR).toPandas())
        oracle_pdf = canonicalize(con.execute(oracles[name]).df())
        ok = (
            list(spark_pdf.columns) == list(oracle_pdf.columns)
            and len(spark_pdf) == len(oracle_pdf)
            and spark_pdf.astype(str).equals(oracle_pdf.astype(str))
        )
        print(("PASS" if ok else "FAIL"), name, f"rows={len(spark_pdf)}")
        if not ok:
            failed.append(name)
    if failed:
        raise SystemExit(f"driver-sim FAILED: {failed}")
    print("driver-sim: all green under hostile TZ + plain session")


if __name__ == "__main__":
    main()
