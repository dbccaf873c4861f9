"""Feature engineering over embedding and numeric columns — the
normalization steps between raw corpus tables and model-ready tensors.

Two operators:

- :func:`standardize_embeddings` — feature-wise z-scoring of an
  ``array<float/double>`` column (per-DIMENSION mean/std over the whole
  table). The scale shape matters: the stats pass aggregates the exploded
  (dim, value) rows with map-side combine into exactly ``dim`` rows, those
  collapse to ONE row of (mus[], sds[]) arrays, and that single row is
  broadcast back so the standardized array is produced map-side by
  ``zip_with`` — the table's vectors cross the wire ZERO times (only
  dim-keyed partials shuffle). The obvious alternative — explode, join
  per-dim stats, re-assemble with collect_list — shuffles n*dim rows
  twice.

- :func:`winsorized_stats` — per-group robust aggregates with exact
  percentile clamping (winsorization): values are clamped to the group's
  [p_lo, p_hi] exact quantiles before the mean, the standard outlier
  guard for reward/quality scores. Two aggregations on the group key (the
  bounds must exist before clamping — inherently two passes); the bounds
  frame is #groups rows, broadcast by default.

Reference parity: Prajna has no feature/normalization surface (SURVEY
§2); declared Spark-native additions in the north-star pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import pround
from prajna_spark.operators.lifecycle import scoped_persist


def embedding_dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (1-based ``dim``) mean and population stddev of the
    array column: ``(dim, mu, sd)``, exactly ``dim`` rows. One shuffle of
    dim-keyed partials (map-side combined — each map task emits at most
    ``dim`` partial rows regardless of input size)."""
    return (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("p", "val"))
        .select((F.col("p") + 1).alias("dim"), "val")
        .groupBy("dim")
        .agg(F.avg("val").alias("mu"), F.stddev_pop("val").alias("sd"))
    )


def standardize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "z"
) -> DataFrame:
    """Append ``out_col``: the feature-wise standardized vector
    ``z[i] = (v[i] - mu[i]) / sd[i]`` (0 where a dimension is constant).
    Stats collapse to one broadcast row; the rewrite itself is map-side
    ``zip_with`` — no data-sized shuffle anywhere in the plan."""
    stats = embedding_dim_stats(df, vec_col)
    one = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s.mu
        ).alias("__mus"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "sd"))), lambda s: s.sd
        ).alias("__sds"),
    )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("__mus"), lambda v, m: v - m
    )
    z = F.zip_with(
        centered,
        F.col("__sds"),
        lambda c, s: F.when(s == 0, F.lit(0.0)).otherwise(c / s),
    )
    return (
        df.crossJoin(F.broadcast(one))
        .withColumn(out_col, z)
        .drop("__mus", "__sds")
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Per-group stats with exact-percentile winsorization:
    ``(group..., n, lo, hi, raw_mean, winsor_mean)``. ``lo``/``hi`` are
    the group's exact interpolated quantiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``); the winsorized mean averages values
    clamped into [lo, hi]. Set ``broadcast_bounds=False`` when the group
    cardinality is itself data-sized (the join then shuffles on the
    group key — same key as the final aggregation, so AQE coalesces)."""
    df = scoped_persist(df.select(*group_cols, value_col))
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, p_lo).alias("lo"),
        F.percentile(value_col, p_hi).alias("hi"),
    )
    if broadcast_bounds:
        bounds = F.broadcast(bounds)
    v = F.col(value_col)
    clamped = df.join(bounds, group_cols).withColumn(
        "__w", F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    )
    return clamped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.avg(value_col).alias("raw_mean"),
        F.avg("__w").alias("winsor_mean"),
    )


def quantile_map(
    df: DataFrame,
    ref: DataFrame,
    value_col: str,
    id_col: str,
    out_col: str = "mapped",
    grid: int = 100,
) -> DataFrame:
    """Quantile normalization: re-express each ``df`` value on the REF
    distribution's scale (score calibration across heterogeneous corpus
    sources — source B's p73 value becomes whatever source A's p73 is).

    Method: ref's exact interpolated quantiles at a (grid+1)-point
    lattice (ONE aggregation -> a one-row broadcast array), each df row's
    exact rank percentile (distributed zip-with-index over (value, id) —
    ties id-broken, no single-task ORDER BY), nearest-lattice lookup.
    Rank and cell arithmetic are integer-exact; the lattice is
    engine-portable (Spark percentile == DuckDB quantile_cont), so the
    mapping is deterministic to the digit. Precision is 1/grid of the
    ref ECDF — raise ``grid`` for finer calibration; cost is unchanged
    (the lattice row stays tiny)."""
    ps = [i / grid for i in range(grid + 1)]
    g = ref.agg(F.percentile(F.col(value_col), F.lit(ps)).alias("__grid"))
    from prajna_spark.operators.zipindex import zip_with_index

    ranked = zip_with_index(df, [value_col, id_col], "__rk")
    n = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    pct = F.col("__rk").cast("double") / (F.col("__n") - 1).cast("double")
    cell = F.when(
        F.col("__n") > 1, F.least(F.floor(pct * grid), F.lit(grid))
    ).otherwise(F.lit(grid // 2))
    return (
        ranked.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(g))
        .withColumn(out_col, F.element_at("__grid", cell.cast("int") + 1))
        .drop("__rk", "__n", "__grid")
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    prior_weight: float = 10.0,
    dec: int = 4,
) -> DataFrame:
    """Leave-one-out target encoding with prior smoothing — the
    categorical->numeric feature a training pipeline derives from
    (category, outcome) pairs. Each ROW's encoding excludes its OWN
    target (the leakage guard: a naive category-mean feature lets the
    model read its label through the feature):

        enc = (sum_cat - y + w * g) / (n_cat - 1 + w)

    with g the global target mean and w the prior weight (singleton
    categories fall back smoothly to g instead of 0/0).

    Scale shape: per-category sum/count are ONE unbounded window over
    the category key (single hash exchange, category-keyed — no join
    against a stats table, no second shuffle); the global mean is a
    one-row broadcast. Sums of doubles are order-sensitive, so the
    encoding is rounded at ``dec`` <= 4 (the repo's grouped-double
    convention) for cross-engine comparison.
    """
    from pyspark.sql import Window

    w_cat = Window.partitionBy(cat_col)
    y = F.col(target_col).cast("double")
    g = df.agg(
        (F.sum(y) / F.count(F.lit(1)).cast("double")).alias("__g")
    )
    denom = (
        F.count(F.lit(1)).over(w_cat).cast("double")
        - F.lit(1.0)
        + F.lit(float(prior_weight))
    )
    enc = (
        F.sum(y).over(w_cat) - y + F.lit(float(prior_weight)) * F.col("__g")
    ) / denom
    # w=0 + singleton category -> 0/0: fall back to the global mean (the
    # guard never fires when prior_weight > 0, so oracles need no twin)
    enc = F.when(denom == F.lit(0.0), F.col("__g")).otherwise(enc)
    return df.crossJoin(F.broadcast(g)).select(
        *df.columns,
        pround(enc, dec).alias(f"{cat_col}_te"),
    )
