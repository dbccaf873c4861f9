"""Data-quality validation — one-pass constraint violation accounting.

A training-data (or any 100 TB) pipeline gates ingestion on declarative
expectations: non-negative amounts, closed value domains, date ranges,
non-null keys. The scalable spelling is ONE aggregation pass computing
every rule's violation count simultaneously (conditional aggregates —
map-side partials, a single exchange of one row per partition), never one
scan per rule and never a collected sample.

``check(df, rules)`` returns a single-row DataFrame with one violation
count per rule plus the total row count; ``enforce`` raises when any rule
is violated (the ingest-gate form). Rules are plain boolean Columns, so
they push down, fold, and codegen like any predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row: n_rows + ``<rule>_violations`` for every rule.

    A NULL rule result counts as a violation (unknown is not a pass) —
    align with SQL by wrapping nullable predicates in coalesce if NULLs
    are acceptable.
    """
    if not rules:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).cast("long").alias(f"{name}_violations")
        )
    return df.agg(*aggs)


def enforce(df: DataFrame, rules: dict[str, Column]) -> None:
    """Raise ValueError naming every violated rule (the ingest gate)."""
    row = check(df, rules).first()
    bad = {
        name: row[f"{name}_violations"]
        for name in rules
        if row[f"{name}_violations"]
    }
    if bad:
        raise ValueError(f"data-quality violations: {bad}")
