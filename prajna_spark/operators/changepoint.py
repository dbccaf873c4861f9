"""CUSUM change-point detection over keyed integer series.

The reference's monitoring loop (SURVEY §2.12 — `/root/reference/src/
ServiceLib/MonitorService.fs` aggregating per-VM telemetry) stops at
rollups; the standard next step a deployment runs on those rollups is a
control chart: flag the hour a series' level SHIFTS, not just its
outliers (the MAD profile in queries/funnels.py catches spikes; CUSUM
catches sustained drifts that never individually spike).

One-sided CUSUM recursion, slack k:  S_t = max(0, S_{t-1} + x_t - k).
The recursion looks inherently sequential, but the classic identity

    S_t = C_t - min(0, min_{j<=t} C_j),   C_t = cumsum(x_t - k)

turns it into two ordered-window aggregates — fully distributed: the
only shuffle is the window's partition-by-key exchange, and each series
evaluates independently inside its partition. No applyInPandas, no
driver loop.

Exactness contract (oracle hash-compare): the chart runs on MEAN-CENTERED
values with slack a quarter of the mean — y_t = (x_t - mu) - mu/4 with
mu = S/C (so the per-step deduction off the raw series is 5S/(4C)), and
alarm threshold h = mu. With S,C the series' integer sum/length these
are rationals, so the whole chart is computed SCALED BY 4C in BIGINT —
sums, prefix minima, and the alarm comparison are exact integer
arithmetic on both engines, so there is no float anywhere and no
rounding policy to align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_integer(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """One-sided integer-exact CUSUM per key.

    ``series`` holds one row per (key, time) with an integer
    ``value_col``. Slack is a quarter of the series mean, alarm
    threshold the series mean — both kept as rationals by scaling the
    chart by ``4 * n_points``:

        y_t        = 4*C*x_t - 5*S          (x_t - mean - mean/4, scaled)
        cusum_t    = C_t - min(0, min prefix C_j)
        alarm_t    = cusum_t > 4*C*mean = 4*S (scaled)

    Returns (key, time, value, cusum_scaled, scale, is_alarm); callers
    divide cusum_scaled/scale if they want the unscaled chart.
    """
    k, t, x = F.col(key_col), F.col(time_col), F.col(value_col).cast("long")
    whole = Window.partitionBy(key_col)
    prefix = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tot = series.select(
        k.alias(key_col),
        t.alias(time_col),
        x.alias(value_col),
        F.sum(x).over(whole).alias("_S"),
        F.count(F.lit(1)).over(whole).alias("_C"),
    )
    y = F.lit(4) * F.col("_C") * F.col(value_col) - F.lit(5) * F.col("_S")
    with_c = with_tot.withColumn("_ct", F.sum(y).over(prefix))
    cusum = F.col("_ct") - F.least(F.lit(0).cast("long"), F.min("_ct").over(prefix))
    return with_c.select(
        key_col,
        time_col,
        value_col,
        cusum.alias("cusum_scaled"),
        (F.lit(4) * F.col("_C")).alias("scale"),
        (cusum > F.lit(4) * F.col("_S")).alias("is_alarm"),
    )


def cusum_integer_sql(
    source_sql: str, key_sql: str = "k", time_sql: str = "t", value_sql: str = "x"
) -> str:
    """Engine-portable SQL twin of :func:`cusum_integer` over a relation
    ``source_sql`` producing columns (k, t, x) — same scaled-BIGINT
    arithmetic, same window spellings."""
    return f"""(
      WITH base AS (
        SELECT {key_sql} AS k, {time_sql} AS t, CAST({value_sql} AS BIGINT) AS x,
               CAST(sum({value_sql}) OVER (PARTITION BY {key_sql}) AS BIGINT) AS s,
               CAST(count(*) OVER (PARTITION BY {key_sql}) AS BIGINT) AS c
        FROM {source_sql}
      ), pre AS (
        -- DuckDB sum(BIGINT) yields HUGEINT: cast back so dtypes match
        SELECT k, t, x, s, c,
               CAST(sum(4 * c * x - 5 * s) OVER (
                 PARTITION BY k ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS ct
        FROM base
      )
      SELECT k, t, x,
             CAST(ct - least(CAST(0 AS BIGINT), min(ct) OVER (
               PARTITION BY k ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS BIGINT) AS cusum_scaled,
             CAST(4 * c AS BIGINT) AS scale,
             (ct - least(CAST(0 AS BIGINT), min(ct) OVER (
               PARTITION BY k ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) > 4 * s
               AS is_alarm
      FROM pre
    )"""


def cusum_integer_fixed(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    slack: int,
    threshold: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """:func:`cusum_integer` with CALLER-FIXED integer slack/threshold
    instead of series-mean rationals — the variant a STREAMING monitor
    needs (the mean of a series that hasn't finished arriving is
    unknowable), and the batch twin its drain is checked against.
    Same cumsum-minus-prefix-min identity, pure BIGINT end to end.
    ``tiebreak_col`` disambiguates equal timestamps deterministically."""
    order = [time_col] + ([tiebreak_col] if tiebreak_col else [])
    prefix = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col).cast("long")
    with_c = series.withColumn("_ct", F.sum(x - F.lit(int(slack))).over(prefix))
    cusum = F.col("_ct") - F.least(
        F.lit(0).cast("long"), F.min("_ct").over(prefix)
    )
    return with_c.select(
        key_col,
        *([tiebreak_col] if tiebreak_col else []),
        time_col,
        F.col(value_col).cast("long").alias(value_col),
        cusum.alias("cusum"),
        (cusum > F.lit(int(threshold))).alias("is_alarm"),
    )
