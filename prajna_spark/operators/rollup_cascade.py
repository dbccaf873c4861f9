"""Hypertable-style cascading time rollup (multi-resolution continuous
aggregate).

The scale pattern behind TimescaleDB continuous aggregates / OLAP rollup
cubes: compute the FINEST time bucket once from the raw events, then
derive every coarser resolution by re-aggregating the finer level's
partial aggregates (counts and sums compose; averages are derived from
sum/count at read time). At 100 TB the raw table is scanned exactly once
— the cascade inputs shrink by orders of magnitude per level, so the
coarser rollups are nearly free, versus one full raw scan per resolution
in the naive spelling.

The reference's telemetry loop (paper §5.2) re-folds raw in-memory stats
every cycle; this is the declared batch upgrade. The streaming twin would
maintain the finest level incrementally (foreachBatch upsert) and cascade
on read.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import scoped_persist


def _validate_resolutions(resolutions: list[int]) -> None:
    for fine, coarse in zip(resolutions, resolutions[1:]):
        if coarse % fine != 0:
            raise ValueError(f"{coarse} is not a multiple of finer resolution {fine}")


def _bucket(col: str, width: int):
    return (F.floor(F.col(col) / width) * width).cast("long")


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    value_col: str,
    resolutions: list[int],
) -> DataFrame:
    """Multi-resolution rollup of ``value_col`` over ``dims``.

    ``ts_col`` is epoch seconds (long); ``resolutions`` are bucket widths
    in seconds, finest first, each a multiple of its predecessor (so every
    coarse bucket is a union of whole fine buckets and the cascade is
    exact). Returns one row per (resolution, bucket, dims) with
    ``n_events`` / ``total_value`` partial aggregates.
    """
    _validate_resolutions(resolutions)
    finest_partials = df.groupBy(
        _bucket(ts_col, resolutions[0]).alias("epoch_start"), *dims
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("total_value"),
    )
    # already one row per (bucket, dims): skip the delta-merge pass
    return cascade_from_partials(finest_partials, dims, resolutions, merge=False)


def cascade_from_partials(
    partials: DataFrame,
    dims: list[str],
    resolutions: list[int],
    merge: bool = True,
) -> DataFrame:
    """Cascade pre-aggregated finest-level partials
    (epoch_start at resolutions[0], dims..., n_events, total_value) into
    every requested resolution. ``merge=True`` first combines duplicate
    partial rows per (bucket, dims) — the streaming store appends one
    DELTA row per micro-batch per bucket, and partials compose by sum.
    """
    _validate_resolutions(resolutions)
    finest = resolutions[0]
    level = partials
    if merge:
        level = level.groupBy("epoch_start", *dims).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    # Persisted so every consumer — the output union AND the next coarser
    # level — reads these (tiny, aggregated) partials instead of
    # re-scanning the input. Catalyst's exchange-reuse does NOT fire
    # across the union's re-analyzed branches, so without this each
    # resolution would trigger its own full input scan. Release: wrap use
    # in lifecycle.persist_scope() (long-lived drivers should).
    level = scoped_persist(level)
    levels = [level.withColumn("resolution", F.lit(finest).cast("long"))]
    for width in resolutions[1:]:
        level = scoped_persist(
            level.groupBy(_bucket("epoch_start", width).alias("epoch_start"), *dims)
            .agg(
                F.sum("n_events").alias("n_events"),  # partials compose
                F.sum("total_value").alias("total_value"),
            )
        )
        levels.append(level.withColumn("resolution", F.lit(width).cast("long")))
    return reduce(DataFrame.unionByName, levels).select(
        "resolution", "epoch_start", *dims, "n_events", "total_value"
    )


def gapfill(
    rollup: DataFrame,
    dims: list[str],
    width: int,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Densify a bucketed rollup: emit a row for EVERY bucket on each
    dim-combination's [min, max] grid, filling absent buckets with the
    given values (default 0) — the hypertable ``gapfill`` feature a
    dashboard needs for honest time axes (a missing hour must chart as
    zero, not be skipped).

    Plan: per-dims min/max (tiny agg) -> ``sequence`` explodes the bucket
    grid (O(#dims x #buckets) narrow rows, data-independent) -> LEFT join
    the real rollup back on (dims, bucket). The grid side is bounded by
    time-range/width, so at any corpus size the join's small side is the
    GRID, not the data; rollup itself is already aggregated.

    ``rollup`` must have ``epoch_start`` plus ``dims``; every other
    column is a measure to fill.
    """
    measures = [c for c in rollup.columns if c != "epoch_start" and c not in dims]
    fill = fill or {}
    bounds = rollup.groupBy(*dims).agg(
        F.min("epoch_start").alias("__lo"), F.max("epoch_start").alias("__hi")
    )
    grid = bounds.select(
        *dims,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(width))
        ).alias("epoch_start"),
    )
    joined = grid.join(rollup, [*dims, "epoch_start"], "left")
    return joined.select(
        *dims,
        "epoch_start",
        *[
            F.coalesce(F.col(m), F.lit(fill.get(m, 0))).alias(m)
            for m in measures
        ],
    )


def interpolate(
    rollup: DataFrame,
    dims: list[str],
    width: int,
    value_col: str,
    out_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Linear interpolation across missing buckets — gapfill's other
    half (TimescaleDB ``interpolate`` vs its zero-filling ``gapfill``):
    a sensor that reports 10 then 16 an absent-hour apart charts 13 in
    between, not 0. Buckets before the first / after the last known
    value stay NULL (no extrapolation).

    Plan: densify on the grid (gapfill with NULL fill), then per series
    carry (last known value, its bucket) forward and (first known value,
    its bucket) backward with two frame windows over the SAME partition
    key — one hash exchange of grid-sized rows, a second in-partition
    sort for the reversed frame, no second shuffle. The interpolation
    weight is exact integer bucket arithmetic fed to one IEEE division.
    """
    from pyspark.sql import Window

    out_col = out_col or value_col
    dense = gapfill(rollup, dims, width, fill={value_col: None})
    t = F.col("epoch_start")
    wb = (
        Window.partitionBy(*dims)
        .orderBy("epoch_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*dims)
        .orderBy(F.col("epoch_start").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    known = F.when(F.col(value_col).isNotNull(), F.struct(t.alias("t"), F.col(value_col).alias("v")))
    prev = F.last(known, ignorenulls=True).over(wb)
    nxt = F.last(known, ignorenulls=True).over(wf)
    frac = (t - prev["t"]).cast("double") / (nxt["t"] - prev["t"]).cast("double")
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col).cast("double")).otherwise(
        F.when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"].cast("double")
            + (nxt["v"].cast("double") - prev["v"].cast("double")) * frac,
        )
    )
    return dense.select(
        *dims, "epoch_start", F.round(interp, decimals).alias(out_col)
    )


def locf(
    rollup: DataFrame,
    dims: list[str],
    width: int,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward — the third fill mode beside
    :func:`gapfill` (zeros) and :func:`interpolate` (lines): a gauge
    metric (queue depth, balance, temperature) holds its LAST reading
    through silent buckets; zero/line fills would both chart lies.
    Buckets before a series' first known value stay NULL.

    Plan: densify on the grid, then ONE forward carry window per series
    (same single hash exchange as interpolate's forward half; no
    backward pass needed). The carried value is copied bit-for-bit,
    never recomputed, so no rounding policy is involved.
    """
    from pyspark.sql import Window

    out_col = out_col or value_col
    dense = gapfill(rollup, dims, width, fill={value_col: None})
    wb = (
        Window.partitionBy(*dims)
        .orderBy("epoch_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col(value_col), ignorenulls=True).over(wb)
    return dense.select(*dims, "epoch_start", carried.alias(out_col))
