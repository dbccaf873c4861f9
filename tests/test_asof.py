"""As-of join operator semantics."""

from __future__ import annotations

from prajna_spark.operators.asof import asof_join


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k int, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)],
        "k int, t long, v double",
    )
    out = asof_join(left, right, on=["k"], ts="t", right_cols=["v"])
    got = {r.tag: r.v_asof for r in out.collect()}
    assert got == {
        "a": 100.0,  # inclusive: right at t=10 visible to left at t=10
        "b": 150.0,  # latest of {10, 15}
        "c": None,  # nothing at-or-before t=5
        "d": None,  # right row for k=2 is in the future
    }
    assert out.count() == left.count()  # left join: every left row kept


def test_asof_null_payload_comes_from_matched_row(spark):
    """All attached columns must come from the SAME matched right row —
    a NULL in the latest right row is attached as NULL, not back-filled
    from an older non-null row (the per-column-fill divergence)."""
    left = spark.createDataFrame([(1, 30, "x")], "k int, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "old"), (1, 20, None, "new")],
        "k int, t long, v double, s string",
    )
    out = asof_join(left, right, on=["k"], ts="t", right_cols=["v", "s"])
    row = out.collect()[0]
    assert row.s_asof == "new"
    assert row.v_asof is None  # NOT 100.0 from the older row


def test_asof_single_shuffle_plan(spark):
    left = spark.range(1000).selectExpr("id % 7 AS k", "id AS t", "id AS x")
    right = spark.range(100).selectExpr("id % 7 AS k", "id * 9 AS t", "id AS y")
    out = asof_join(left, right, on=["k"], ts="t", right_cols=["y"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partition exchange (the window's), no cartesian/BNL expansion
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
