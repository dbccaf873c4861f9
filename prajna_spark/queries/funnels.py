"""Event-funnel and cohort-retention analytics over the ``events``
table — the product-analytics tier every telemetry deployment of the
reference's VM-Hub loop (SURVEY §2.12, paper §5.2) runs downstream.

Scale shapes: every join and aggregate here keys on ``user_id`` (narrow,
high-cardinality, uniform) or on (cohort_week, week_offset)
(low-cardinality rollup); per-step frames are user-cardinality, never
event-cardinality, so a 100 TB event log reduces at the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prajna_spark.queries import query
from prajna_spark.session import tune
from prajna_spark.sources import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, "events", sf_dir)


@query(
    "funnel_signup_view_purchase",
    oracle="""
    -- ordered 3-step funnel: first signup, first view AFTER it, first
    -- purchase after THAT; per-step user counts
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), v AS (
      SELECT e.user_id, min(e.ts) AS v_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'view' AND e.ts > s.s_ts
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
      GROUP BY 1
    )
    SELECT CAST(1 AS BIGINT) AS step, 'signup' AS name, count(*) AS n_users FROM s
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'view_after_signup', count(*) FROM v
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase_after_view', count(*) FROM p
    """,
    tags=("funnel", "events", "analytics"),
)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel: users who signed up, then viewed AFTER
    signing up, then purchased after that first view — the sequencing
    makes it a funnel rather than three independent filters. Each step
    is a conditional min-aggregate keyed on user_id joined to the
    previous step's user-cardinality frame: the raw event log is
    touched once per step with a pushed event_type filter and reduced
    to |users| rows immediately; step frames then join narrow. The
    event-time ORDER constraint (ts > previous step's ts) is what
    window-free funnel SQL gets wrong most often — here it is explicit
    in each step's predicate."""
    ev = _events(spark, sf_dir)

    def first_after(etype: str, prev: DataFrame | None, prev_ts: str, out_ts: str):
        step = ev.where(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            step = step.join(prev, "user_id").where(F.col("ts") > F.col(prev_ts))
        return step.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s = first_after("signup", None, "", "s_ts")
    v = first_after("view", s, "s_ts", "v_ts")
    p = first_after("purchase", v, "v_ts", "p_ts")
    rows = [
        (1, "signup", s),
        (2, "view_after_signup", v),
        (3, "purchase_after_view", p),
    ]
    out = None
    for step_no, name, frame in rows:
        one = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step_no).cast("long").alias("step"),
            F.lit(name).alias("name"),
            F.col("n_users"),
        )
        out = one if out is None else out.unionByName(one)
    return out


@query(
    "cohort_weekly_retention",
    oracle="""
    -- cohort retention: users bucketed by first-activity week, counted
    -- in each subsequent active week (distinct user-week pairs)
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT CAST(epoch(f.cohort_week) AS BIGINT) AS cohort_week,
           CAST((epoch(a.active_week) - epoch(f.cohort_week)) / 604800
                AS BIGINT) AS week_offset,
           count(*) AS n_users
    FROM activity a JOIN first_seen f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    tags=("cohort", "retention", "events", "analytics"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: each user joins the cohort of
    their first active week; every (cohort, week-offset) cell counts
    users active that week — the engagement decay table behind every
    retention curve. Two aggregates over the log (first-seen min and
    distinct user-weeks), both keyed on user_id, then a
    user-cardinality join and a low-cardinality rollup. Monday-start
    week truncation and epoch arithmetic are identical on both engines,
    so the matrix is hash-exact."""
    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    week = 604800
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (
                (
                    F.unix_timestamp("active_week")
                    - F.col("cohort_week")
                )
                / week
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "funnel_conversion_latency",
    oracle="""
    -- signup -> first purchase conversion latency percentiles (hours)
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.s_ts
      GROUP BY 1
    )
    SELECT count(*) AS n_converted,
           quantile_cont((epoch_us(p.p_ts) - epoch_us(s.s_ts)) / 3.6e9, 0.5) AS p50_hours,
           quantile_cont((epoch_us(p.p_ts) - epoch_us(s.s_ts)) / 3.6e9, 0.95) AS p95_hours
    FROM p JOIN s ON s.user_id = p.user_id
    """,
    tags=("funnel", "latency", "quantiles", "events", "analytics"),
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the funnel and quantile tiers: time from signup to
    first subsequent purchase, p50/p95 in hours — the conversion-latency
    readout product teams watch. Same user-cardinality reduction as the
    funnel (two conditional min-aggregates + a narrow join), then ONE
    exact percentile aggregate over |converted users| rows; epoch
    arithmetic and interpolation are bit-identical across engines."""
    ev = _events(spark, sf_dir)
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = p.join(s, "user_id").select(
        (
            (F.unix_micros("p_ts") - F.unix_micros("s_ts")) / F.lit(3.6e9)
        ).alias("hours")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("hours", 0.5).alias("p50_hours"),
        F.percentile("hours", 0.95).alias("p95_hours"),
    )
