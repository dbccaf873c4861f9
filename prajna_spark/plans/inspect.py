"""Executed-plan introspection helpers.

These read Spark's formatted physical plan — the same text
``df.explain("formatted")`` prints — and turn the scale-critical facts into
assertable values:

- ``pushed_filters`` / ``read_schema_columns``: is the parquet scan doing
  the pruning (PushedFilters / ReadSchema), or is the executor filtering
  rows the scan should never have produced? At 100 TB the difference is
  reading terabytes vs gigabytes.
- ``assert_broadcast_join``: did the small side actually broadcast
  (BroadcastHashJoin), or did Catalyst fall back to a shuffle join?
- ``assert_no_single_partition_exchange``: no data-sized stage may funnel
  through Exchange SinglePartition (global windows / unpartitioned sorts
  do this silently).
- ``codegen_stage_count``: how much of the plan runs inside whole-stage
  codegen (wider is better; Python UDF boundaries break spans).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out

def read_schema_columns(df: DataFrame) -> dict[str, list[str]]:
    """table-location -> columns actually read (ReadSchema), per scan."""
    text = explain_str(df)
    scans: dict[str, list[str]] = {}
    for m in re.finditer(
        r"Location:.*?\[.*?([\w./-]+\.parquet).*?\][\s\S]*?ReadSchema: struct<([^>]*)>",
        text,
    ):
        cols = [c.split(":")[0].strip() for c in m.group(2).split(",") if c.strip()]
        scans[m.group(1)] = cols
    return scans


def assert_pushdown(
    df: DataFrame, expect_filter_cols: list[str] = (), max_read_cols: int | None = None
) -> None:
    """Assert predicate pushdown reached a scan for each named column, and
    (optionally) that no scan reads more than ``max_read_cols`` columns —
    the 'scan reads all columns for a 2-column projection is wrong' rule."""
    pf = " ".join(pushed_filters(df))
    for col in expect_filter_cols:
        assert col in pf, f"no pushed filter on {col!r}; PushedFilters={pf!r}"
    if max_read_cols is not None:
        for loc, cols in read_schema_columns(df).items():
            assert len(cols) <= max_read_cols, (
                f"scan {loc} reads {len(cols)} columns {cols}; "
                f"expected <= {max_read_cols} (column pruning failed)"
            )


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    plan = executed_plan_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= expect, f"expected >= {expect} BroadcastHashJoin, saw {n}:\n{plan}"


def assert_no_single_partition_exchange(df: DataFrame) -> None:
    """Fail if any exchange moves all data to one partition. Allowed escape:
    none — data-sized global ordering must use range partitioning
    (repartitionByRange / zip_with_index), tiny driver-side results should
    not be exchanged at all."""
    plan = executed_plan_str(df)
    assert "SinglePartition" not in plan, f"single-partition exchange in plan:\n{plan}"


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan_str(df))))
