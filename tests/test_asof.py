"""As-of join operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

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


# --------------------------------------------------------------------------
# Direction variants: forward / nearest / tolerance vs a local model
# --------------------------------------------------------------------------


def _local_asof(lrows, rrows, direction, tol=None):
    """Reference over (key, ts) rows; rrows values unique per (key, ts)."""
    out = {}
    for lk, lt in lrows:
        cands = [(rt, rv) for rk, rt, rv in rrows if rk == lk]
        back = max(((rt, rv) for rt, rv in cands if rt <= lt), default=None)
        fwd = min(((rt, rv) for rt, rv in cands if rt >= lt), default=None)
        if tol is not None:
            if back and lt - back[0] > tol:
                back = None
            if fwd and fwd[0] - lt > tol:
                fwd = None
        if direction == "backward":
            pick = back
        elif direction == "forward":
            pick = fwd
        else:
            if back is None:
                pick = fwd
            elif fwd is None:
                pick = back
            else:  # exact tie -> backward
                pick = fwd if (fwd[0] - lt) < (lt - back[0]) else back
        out[(lk, lt)] = pick and pick[1]
    return out


def _asof_case(spark, direction, tol):
    import random

    from prajna_spark.operators.asof import asof_join

    rng = random.Random(11)
    lrows = sorted({(rng.randrange(5), rng.randrange(1000)) for _ in range(300)})
    rrows = [
        (k, t, k * 10000 + t)
        for (k, t) in sorted({(rng.randrange(5), rng.randrange(1000)) for _ in range(200)})
    ]
    left = spark.createDataFrame(lrows, "k int, t long")
    right = spark.createDataFrame(rrows, "k int, t long, v long")
    got = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(
            left, right, on=["k"], ts="t", right_cols=["v"],
            direction=direction, tolerance_sec=tol,
        ).collect()
    }
    assert got == _local_asof(lrows, rrows, direction, tol), (direction, tol)


def test_asof_directions_match_local_model(spark):
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50, 0):
            _asof_case(spark, direction, tol)


def test_asof_nearest_tie_resolves_backward(spark):
    from prajna_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 90, 7), (1, 110, 8)], "k int, t long, v long"
    )
    r = asof_join(
        left, right, on=["k"], ts="t", right_cols=["v"], direction="nearest"
    ).collect()[0]
    assert r["v_asof"] == 7  # equidistant: backward wins


def test_asof_exact_ts_match_is_inclusive_both_directions(spark):
    from prajna_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k int, t long")
    right = spark.createDataFrame([(1, 100, 5)], "k int, t long, v long")
    for d in ("backward", "forward", "nearest"):
        r = asof_join(
            left, right, on=["k"], ts="t", right_cols=["v"], direction=d
        ).collect()[0]
        assert r["v_asof"] == 5, d


def test_asof_single_exchange_for_nearest(spark):
    """nearest runs TWO carries but must still shuffle the union once —
    the opposite-order window re-sorts within partitions, it must not
    re-exchange."""
    from prajna_spark.operators.asof import asof_join

    left = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("t"))
    right = spark.range(50).select((F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("t"), F.col("id").alias("v"))
    plan = (
        asof_join(left, right, on=["k"], ts="t", right_cols=["v"], direction="nearest")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
