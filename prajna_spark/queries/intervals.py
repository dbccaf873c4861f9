"""Temporal-interval catalog queries: SCD Type-2 state history and
interval-concurrency analytics over the ``events`` table — the
warehouse/temporal tier downstream of the reference's telemetry loop
(SURVEY §2.12), built on operators.intervals.

Scale shapes: SCD2 is one shuffle on user_id with per-user windows
(parallelism = user cardinality); the concurrency sweep aggregates raw
events to (key, boundary) rows immediately and runs its running sum
through the single-shuffle sampled-bucket prefix (pipeline.packing) — no
single-partition window anywhere.
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
    "scd2_user_state_history",
    oracle="""
    -- SCD Type-2 validity intervals from the per-user event stream:
    -- consecutive duplicate states collapse; each change opens an
    -- interval closed by the next change ((user_id, ts) is globally
    -- unique, so per-user ordering is deterministic)
    WITH ch AS (
      SELECT user_id, event_type AS state, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ), changes AS (
      SELECT user_id, state, ts FROM ch
      WHERE prev IS NULL OR state <> prev
    )
    SELECT user_id, state,
           CAST(floor(epoch(ts)) AS BIGINT) AS effective_from,
           CAST(coalesce(floor(epoch(lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts))), 0) AS BIGINT) AS effective_to,
           CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY ts) AS BIGINT) AS version,
           CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM changes
    """,
    tags=("scd2", "temporal", "events", "window"),
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build
    (operators.intervals.scd2_intervals): each user's event_type stream
    becomes validity intervals [effective_from, effective_to) with a
    1-based version and an is_current flag — the temporal-table
    construction every warehouse dimension load runs. One shuffle on
    user_id; every window is per-user, so a 100 TB event log
    parallelizes across its user cardinality. Open intervals encode
    effective_to as 0 (epoch sentinel) so the hash compare never sees
    NULL-vs-NaN drift."""
    from prajna_spark.operators.intervals import scd2_intervals

    ev = _events(spark, sf_dir).select(
        "user_id", F.col("event_type").alias("state"), "ts"
    )
    hist = scd2_intervals(ev, ["user_id"], "state", "ts")
    return hist.select(
        "user_id",
        "state",
        F.unix_timestamp("effective_from").cast("long").alias("effective_from"),
        F.coalesce(F.unix_timestamp("effective_to"), F.lit(0))
        .cast("long")
        .alias("effective_to"),
        "version",
        "is_current",
    )


@query(
    "max_concurrent_intervals",
    oracle="""
    -- peak concurrency per event type over [start, start + minutes)
    -- intervals via the +1/-1 boundary sweep; ties at an instant cancel
    -- BEFORE the running sum (end-exclusive semantics), making the
    -- running total order-independent
    WITH iv AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + (CAST(floor(value) AS BIGINT) + 1) * 60 AS e
      FROM events
    ), b AS (
      SELECT event_type, t, CAST(sum(d) AS BIGINT) AS net FROM (
        SELECT event_type, s AS t, 1 AS d FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS d FROM iv
      ) GROUP BY 1, 2
    ), c AS (
      SELECT event_type, t,
             sum(net) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM b
    ), m AS (
      SELECT event_type, t, conc,
             max(conc) OVER (PARTITION BY event_type) AS mx
      FROM c
    )
    SELECT event_type,
           CAST(max(mx) AS BIGINT) AS max_concurrent,
           CAST(min(CASE WHEN conc = mx THEN t END) AS BIGINT) AS first_peak_t
    FROM m GROUP BY 1
    """,
    tags=("intervals", "concurrency", "events", "prefix-sum"),
)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous open intervals per event type
    (operators.intervals.max_concurrency): each event opens a
    [ts, ts + (floor(value)+1) minutes) interval; the sweep counts how
    many are open at once and when the peak is first reached — the
    max-concurrent-sessions / capacity-planning readout. Boundaries
    aggregate to (key, t) rows immediately (integer epoch arithmetic,
    exact on both engines); the running sum is the single-shuffle
    sampled-bucket distributed prefix, never a single-partition window — the
    oracle's one-partition OVER clause is the semantics, not the plan."""
    from prajna_spark.operators.intervals import max_concurrency

    ev = _events(spark, sf_dir)
    iv = ev.select(
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("s"),
        (
            F.unix_timestamp("ts").cast("long")
            + (F.floor("value").cast("long") + F.lit(1)) * 60
        ).alias("e"),
    )
    return max_concurrency(iv, ["event_type"], "s", "e")
