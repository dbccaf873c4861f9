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


def test_bucketed_asof_matches_plain_on_hot_key(spark):
    """Single-user-dominated fixture: the bucketed variant must return
    exactly what the one-shuffle spelling returns, for every bucket
    width — including rows whose match sits many empty buckets back."""
    from prajna_spark.operators.asof import asof_join_bucketed

    # user 1 dominates (~95% of rows); right side sparse -> long carries
    left = spark.range(2000).selectExpr(
        "CASE WHEN id % 20 = 19 THEN 2 ELSE 1 END AS k",
        "id * 10 AS t",
        "id AS tag",
    )
    right = spark.range(20).selectExpr(
        "CASE WHEN id % 5 = 4 THEN 2 ELSE 1 END AS k",
        "id * 950 + 3 AS t",
        "CAST(id AS DOUBLE) AS v",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('s', id) END AS s",
    )
    expect = sorted(
        map(tuple, asof_join(left, right, ["k"], "t", ["v", "s"]).collect())
    )
    for width in (100, 1000, 7919):
        got = sorted(
            map(
                tuple,
                asof_join_bucketed(
                    left, right, ["k"], "t", ["v", "s"], bucket_width=width
                ).collect(),
            )
        )
        assert got == expect, f"bucket_width={width}"


def test_bucketed_asof_shards_the_window_by_bucket(spark):
    """The data-sized window must hash-partition on (key, bucket) — that
    is the hot-key spread; only the O(#buckets) carry pass may partition
    on the bare key."""
    from prajna_spark.operators.asof import asof_join_bucketed

    left = spark.range(1000).selectExpr("1 AS k", "id * 10 AS t", "id AS x")
    right = spark.range(10).selectExpr("1 AS k", "id * 900 AS t", "id AS y")
    out = asof_join_bucketed(left, right, ["k"], "t", ["y"], bucket_width=500)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__asof_bucket" in plan
    assert plan.count("Exchange hashpartitioning") >= 2  # sharded + carry
