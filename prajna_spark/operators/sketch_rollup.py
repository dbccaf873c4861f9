"""Mergeable-sketch rollup — COUNT DISTINCT as a continuous aggregate.

The cascading rollup (operators.rollup_cascade) works because counts and
sums are ADDITIVE: coarser buckets are sums of finer partials. Distinct
counts are not — you cannot add hourly unique-user counts into a daily
one — which is why real hypertable/continuous-aggregate systems store
mergeable SKETCHES at the finest level and union them upward. Spark ships
Apache DataSketches HLL natively (``hll_sketch_agg`` / ``hll_union_agg``
/ ``hll_sketch_estimate``), so the cascade stays all-JVM with map-side
partial aggregation at every level.

Key invariant (tested): with the same lgConfigK, the union of finer
sketches IS the sketch of the union — cascading loses nothing versus
aggregating the raw data at the coarser resolution directly. That is what
makes the finest-level sketch store a sufficient statistic: raw events
can be discarded, any coarser distinct-count is derivable.

Reference contrast: Prajna's telemetry fold re-reads all live state per
cycle and has no approximate surface at all (SURVEY §2.6 upgrade).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prajna_spark.operators.rollup_cascade import _bucket


def hll_partials(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    key_col: str,
    finest_sec: int,
    lg_k: int = 12,
) -> DataFrame:
    """Finest-level HLL sketch per (bucket, dims) over ``key_col``.
    One shuffle; sketches combine map-side (ObjectHashAggregate partials),
    so each reducer receives one ~2^lg_k-byte sketch per map task, never
    the keys."""
    return df.groupBy(
        _bucket(ts_col, finest_sec).alias("epoch_start"), *dims
    ).agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("hll"))


def hll_cascade(
    partials: DataFrame, dims: list[str], resolutions: list[int]
) -> DataFrame:
    """Estimate distinct counts at every resolution from finest-level
    sketches (resolutions[0] = the partials' bucket width, ascending
    multiples). Mirrors cascade_from_partials: each coarser level unions
    the previous level's sketches — O(buckets) rows of work per level."""
    finest = resolutions[0]
    level = partials
    levels = [
        level.select(
            F.lit(finest).cast("long").alias("resolution"),
            "epoch_start",
            *dims,
            F.hll_sketch_estimate("hll").alias("approx_distinct"),
        )
    ]
    for width in resolutions[1:]:
        level = level.groupBy(
            _bucket("epoch_start", width).alias("epoch_start"), *dims
        ).agg(F.hll_union_agg("hll").alias("hll"))
        levels.append(
            level.select(
                F.lit(width).cast("long").alias("resolution"),
                "epoch_start",
                *dims,
                F.hll_sketch_estimate("hll").alias("approx_distinct"),
            )
        )
    return reduce(DataFrame.unionByName, levels)


def fixed_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """MERGEABLE equi-width histogram: ``(group..., bin, cnt)`` with FIXED
    caller-declared bounds — the property that makes it a sketch: bin
    counts from any partition/micro-batch/time-slice add exactly (unlike
    data-dependent bounds, which break under merge). Out-of-range values
    clamp to the edge bins, preserving total count. Deterministic double
    arithmetic: the same (value - lo)/width floor on any engine."""
    from pyspark.sql import functions as F

    width = (hi - lo) / n_bins
    b = F.least(
        F.greatest(F.floor((F.col(value_col) - lo) / width), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int,
    est_decimals: int = 6,
) -> DataFrame:
    """Quantile ESTIMATES from a :func:`fixed_histogram`:
    ``(group..., q, est)`` long form. For each target rank q*N, find the
    first bin whose cumulative count reaches it and interpolate linearly
    inside: est = lo + width*(bin + (target - cum_before)/cnt). The
    estimate is deterministic (hence oracle-exact) and within one bin
    width of the true quantile — the monitoring-histogram guarantee; all
    windows run over <= n_bins rows per group, never the data."""
    from functools import reduce as _reduce

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from prajna_spark.functions.rounding import pround

    width = (hi - lo) / n_bins
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    ).withColumn("cum_before", F.col("cum") - F.col("cnt"))

    outs = []
    for q in quantiles:
        target = F.col("total").cast("double") * q
        est = pround(
            F.lit(lo)
            + F.lit(width)
            * (
                F.col("bin").cast("double")
                + (target - F.col("cum_before").cast("double"))
                / F.col("cnt").cast("double")
            ),
            est_decimals,
        )
        picked = (
            cum.where(F.col("cum").cast("double") >= target)
            .groupBy(*group_cols)
            .agg(F.min_by(est, F.col("bin")).alias("est"))
            .select(*group_cols, F.lit(q).alias("q"), "est")
        )
        outs.append(picked)
    return _reduce(_DF.unionByName, outs)
