"""Distributed prefix sum + sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import persist_scope
from prajna_spark.pipeline.packing import global_prefix_sum, pack_sequences


def test_prefix_sum_matches_serial(spark):
    df = spark.range(5000).selectExpr("id", "(id * 37) % 100 + 1 AS w")
    with persist_scope():
        got = {
            r.id: r.cum_before
            for r in global_prefix_sum(df, ["id"], "w").collect()
        }
    acc, expect = 0, {}
    for i in range(5000):
        expect[i] = acc
        acc += (i * 37) % 100 + 1
    assert got == expect


def test_prefix_sum_respects_arbitrary_order(spark):
    df = spark.range(1000).selectExpr("id", "1 AS one")
    # descending-by-id order: cum_before counts LATER ids
    with persist_scope():
        got = {
            r.id: r.cum_before
            for r in global_prefix_sum(
                df, [F.col("id").desc()], "one"
            ).collect()
        }
    assert got[999] == 0 and got[0] == 999 and got[500] == 499


def test_pack_sequences_invariants(spark):
    budget = 64
    df = spark.range(2000).selectExpr("id", "(id % 90) + 10 AS n_tokens")
    with persist_scope():
        rows = pack_sequences(df, "n_tokens", budget, ["id"]).collect()
    rows.sort(key=lambda r: r.cum_before)
    # offsets are within budget; pack ids are non-decreasing and dense-ish
    acc = 0
    for r in rows:
        assert r.cum_before == acc
        assert r.pack_id == acc // budget
        assert r.pack_offset == acc % budget
        acc += r.n_tokens
    # every pack except possibly the last is fully covered (straddling)
    n_packs = rows[-1].pack_id + 1
    assert n_packs == (acc - rows[-1].n_tokens) // budget + 1


def test_prefix_sum_has_no_data_sized_global_window(spark):
    """The only Window.orderBy without partitioning must be over the
    per-partition totals (#partitions rows), never the data."""
    df = spark.range(100_000).selectExpr("id", "1 AS w")
    out = global_prefix_sum(df, ["id"], "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data path hash-partitions by __pid for the local windows; the
    # SinglePartition exchange only feeds the tiny totals window
    assert plan.count("Exchange SinglePartition") <= 1
    assert "rangepartitioning" in plan.lower()


def test_pack_budget_validation(spark):
    import pytest

    df = spark.range(5).selectExpr("id", "1 AS t")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "t", 0, ["id"])
