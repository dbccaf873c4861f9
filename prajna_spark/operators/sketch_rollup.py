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


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the DETERMINISTIC mergeable
# distinct counter. HLL above is the production-accuracy path but its
# estimates are library-internal (rows-only at the oracle gate); KMV with
# an md5-derived hash is bit-identically replayable on any engine, so the
# whole sketch->merge->estimate pipeline is hash-checkable cross-engine.
#
# Sketch = the k smallest DISTINCT 60-bit hashes of the key (sorted
# array<long>). Mergeable losslessly: the k minima of a union are always
# contained in the union of the per-part k-minima, so merging sketches
# reproduces EXACTLY the sketch of the union — the merge invariant is an
# equality, not an approximation (tested). Estimator (Bar-Yossef et al.,
# RANDOM'02): with fewer than k hashes the count is exact; otherwise
# (k-1) / (h_k / 2^60), the classic unbiased form.
# --------------------------------------------------------------------------

_KMV_SPACE = float(1 << 60)  # hash domain size: 15 hex digits


def _kmv_hash(key_col: str, seed: str):
    """Uniform 60-bit hash as a LONG — Spark spelling of the oracle's
    CAST('0x' || substring(md5(seed|key), 1, 15) AS BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def kmv_hash_sql(key_sql: str, seed: str) -> str:
    """DuckDB spelling of :func:`_kmv_hash` for oracle queries."""
    return (
        f"CAST('0x' || substring(md5('{seed}|' || CAST({key_sql} AS VARCHAR)), 1, 15)"
        " AS BIGINT)"
    )


def _k_smallest(hashes: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group..., h) -> (group..., sketch): the k smallest distinct h per
    group as a sorted array. Distinct is a map-combined hash agg; the
    row_number bound is Spark's WindowGroupLimit rewrite — a PARTIAL
    limit per input partition BEFORE the shuffle, so at most k rows per
    group per map task cross the wire (same engine path the exact-k
    sampler relies on; tests/test_sampling.py)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
    )


def kmv_partials(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    key_col: str,
    finest_sec: int,
    k: int = 64,
    seed: str = "kmv1",
) -> DataFrame:
    """Finest-level KMV sketch per (bucket, dims) over ``key_col``:
    ``(epoch_start, dims..., sketch array<long>)``. Only
    (bucket, dims, 8-byte hash) rows ever shuffle — never the keys."""
    hashes = df.select(
        _bucket(ts_col, finest_sec).alias("epoch_start"),
        *dims,
        _kmv_hash(key_col, seed).alias("h"),
    )
    return _k_smallest(hashes, ["epoch_start", *dims], k)


def kmv_merge(
    partials: DataFrame, dims: list[str], width: int, k: int
) -> DataFrame:
    """Union finer sketches into ``width``-second buckets. Explode is
    bounded: at most k longs per input sketch; the result IS the sketch
    that :func:`kmv_partials` would build at ``width`` directly (exact
    merge invariant — see module comment)."""
    exploded = partials.select(
        _bucket("epoch_start", width).alias("epoch_start"),
        *dims,
        F.explode("sketch").alias("h"),
    )
    return _k_smallest(exploded, ["epoch_start", *dims], k)


def kmv_estimate(sketches: DataFrame, k: int, est_decimals: int = 6) -> DataFrame:
    """Append ``n_kept`` and ``approx_distinct`` to sketch rows. Below k
    the sketch holds every distinct hash — the estimate is EXACT; at k the
    Bar-Yossef estimator (k-1)*2^60/h_k applies. Pure column arithmetic,
    replayable bit-for-bit by the SQL oracle (one IEEE division)."""
    n = F.size("sketch").cast("long")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1) * _KMV_SPACE) / F.element_at("sketch", k).cast("double")
    )
    return sketches.withColumn("n_kept", n).withColumn(
        "approx_distinct", F.round(est, est_decimals)
    )
