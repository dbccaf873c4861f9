"""Time-decayed smoothing over bucketed series (EWMA, bounded memory).

Classic EWMA is a linear recurrence (state_t = a*x_t + (1-a)*state_{t-1})
— inherently sequential per key, the wrong shape for a distributed
engine, and its infinite tail cannot be replayed exactly by an
independent oracle. The operator here is the bounded-window form used by
monitoring pipelines: a trailing W-bucket weighted mean with geometric
weights decay^j, normalized over the buckets actually PRESENT in the
window (so series gaps neither zero-fill nor leak weight).

Spark-first plan: instead of a per-target window scan (which would need
a variable per-row weight no window frame can express), each source
bucket EXPLODES into its W forward contributions (weight decay^j to
bucket t+j) and one hash aggregation per (key, target) sums them — the
same map-side-combinable shape as every rollup in this engine. The
explode multiplies the series (group-cardinality, tiny), never the raw
events.

Cross-engine exactness: weights are libm ``pow`` (bit-identical), the
sum order is the only drift source, handled by the catalog's standard
4-decimal portable rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_bounded(
    series: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    decay: float,
    window: int,
) -> DataFrame:
    """series (key..., bucket long, value) -> (key..., bucket, ewma):
    ewma(t) = sum_{j: t-j present} decay^j * x(t-j) / sum decay^j,
    j in [0, window). Only buckets present in the input are emitted."""
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    if window < 1:
        raise ValueError("window must be >= 1")
    j = F.posexplode(F.sequence(F.lit(0), F.lit(window - 1)))
    w = F.pow(F.lit(decay), F.col("j").cast("double"))
    contrib = series.select(
        *key_cols,
        F.col(bucket_col).alias("__src"),
        F.col(value_col).alias("__x"),
        j.alias("j", "__dup"),
    ).select(
        *key_cols,
        (F.col("__src") + F.col("j")).alias(bucket_col),
        (w * F.col("__x")).alias("__wx"),
        w.alias("__w"),
    )
    agg = contrib.groupBy(*key_cols, bucket_col).agg(
        (F.sum("__wx") / F.sum("__w")).alias("ewma")
    )
    # emit only buckets that exist in the source series
    present = series.select(*key_cols, bucket_col)
    return agg.join(present, [*key_cols, bucket_col], "left_semi")


def rolling_distinct(
    events: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    entity_col: str,
    window: int,
) -> DataFrame:
    """Exact trailing-``window``-bucket COUNT DISTINCT of ``entity_col``
    per key: for each bucket t, how many distinct entities appeared in
    (t-window, t]. The naive spelling re-scans the window per bucket;
    this one is linear: dedup to (key, entity, bucket) pairs, explode
    each pair into its ``window`` forward target buckets, dedup again on
    (key, entity, target) (an entity active in several source buckets
    must count once), then one hash count per (key, target). Shuffles
    carry narrow (key, entity, bucket) triples only; the explode factor
    is the window length, applied to the DEDUPED pair set, not raw
    events. Only buckets present in the input are emitted."""
    if window < 1:
        raise ValueError("window must be >= 1")
    pairs = events.select(*key_cols, entity_col, bucket_col).distinct()
    # AQE right-sizes the dedup's output for its BYTES (a few MB -> one
    # reducer), but the very next operator multiplies rows `window`-fold:
    # the explode then runs inside that single coalesced task (measured:
    # 2.2 s serial stage writing 24 MB while 31 cores idle). Re-spread
    # the deduped pairs first; the partition count scales with the
    # INPUT's scan parallelism (which maxPartitionBytes derives from
    # bytes), not with a local core constant (guide §2.5). The guarded
    # read returns None on a post-shuffle caller frame instead of
    # eagerly materializing query stages (r11 VERDICT item 8).
    from prajna_spark.operators.fanout import scan_partition_count

    n_spread = max(
        events.sparkSession.sparkContext.defaultParallelism,
        scan_partition_count(events) or 0,
    )
    pairs = pairs.repartition(n_spread, entity_col)
    targets = (
        pairs.select(
            *key_cols,
            entity_col,
            F.col(bucket_col).alias("__src"),
            F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__j"),
        )
        .select(
            *key_cols,
            entity_col,
            (F.col("__src") + F.col("__j")).alias(bucket_col),
        )
        .distinct()
    )
    counts = targets.groupBy(*key_cols, bucket_col).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    present = events.select(*key_cols, bucket_col).distinct()
    return counts.join(present, [*key_cols, bucket_col], "left_semi")


def ols_trend(
    df: "DataFrame",
    group_cols: list[str],
    x_col: str,
    y_col: str,
    decimals: int = 6,
):
    """Per-group ordinary-least-squares line fit from sufficient
    statistics: ``(group..., n, slope, intercept, r2)``.

    ONE map-combined aggregation computes (n, Σx, Σy, Σxy, Σx², Σy²);
    the closed forms

        slope = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²)
        intercept = (Σy - slope·Σx) / n
        r² = (nΣxy - ΣxΣy)² / ((nΣx² - (Σx)²)(nΣy² - (Σy)²))

    are pure column arithmetic. With INTEGER x and y every sufficient
    statistic is exact (long sums — no fp accumulation order anywhere)
    and the final divisions are single IEEE ops, so the result is
    bit-identical on any engine — the catalog query exploits this with
    integer hour indexes and counts. Degenerate groups (constant x)
    return NULL slope/intercept/r2 rather than Inf; constant y with
    varying x fits slope 0, r2 NULL (zero variance to explain)."""
    from pyspark.sql import functions as F

    x, y = F.col(x_col), F.col(y_col)
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nn = F.col("n")
    cov_n = nn * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nn * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(var_x != 0, cov_n.cast("double") / var_x.cast("double"))
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nn.cast(
        "double"
    )
    # square/multiply in DOUBLE space: (nΣxy - ΣxΣy)^2 overflows long for
    # entirely ordinary magnitudes; the double spelling is what the
    # oracle mirrors
    cd = cov_n.cast("double")
    r2 = F.when(
        (var_x != 0) & (var_y != 0),
        (cd * cd) / (var_x.cast("double") * var_y.cast("double")),
    )
    return stats.select(
        *group_cols,
        "n",
        F.round(slope, decimals).alias("slope"),
        F.round(intercept, decimals).alias("intercept"),
        F.round(r2, decimals).alias("r2"),
    )


def time_weighted_avg(
    samples: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    t_col: str,
    value_col: str,
    bucket_width: int,
    tiebreak_col: str | None = None,
    dec: int = 4,
) -> DataFrame:
    """Time-weighted average per (keys, bucket) over IRREGULAR samples —
    the correct mean for gauge metrics (a reading that held for 50
    minutes must weigh 50x one that held a minute; the row-count mean
    the plain ``avg`` computes is a polling-frequency artifact). Each
    sample holds (LOCF semantics) until the next sample in its bucket,
    the last until the bucket's end:

        twa = sum(v_i * (t_{i+1 or bucket_end} - t_i))
              / (bucket_end - t_first)

    One lead window + one aggregate, both on the (keys, bucket) key —
    a single exchange. Weights are exact integer second deltas; the
    weighted sum of doubles is order-sensitive, so the result is
    rounded at ``dec`` <= 4 (the repo's grouped-double convention).
    ``bucket_col`` must hold the bucket START epoch (t div width * width).
    """
    from pyspark.sql import Window

    order = [t_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols, bucket_col).orderBy(*order)
    end = F.col(bucket_col) + F.lit(int(bucket_width))
    nxt = F.coalesce(F.lead(t_col).over(w), end)
    weighted = samples.select(
        *key_cols,
        bucket_col,
        t_col,
        (F.col(value_col).cast("double") * (nxt - F.col(t_col)).cast("double")).alias(
            "__wv"
        ),
    )
    from prajna_spark.functions.rounding import pround

    return (
        weighted.groupBy(*key_cols, bucket_col)
        .agg(
            F.sum("__wv").alias("__s"),
            F.min(t_col).alias("__t0"),
            F.count(F.lit(1)).cast("long").alias("n_samples"),
        )
        .select(
            *key_cols,
            bucket_col,
            "n_samples",
            pround(
                F.col("__s")
                / (F.col(bucket_col) + F.lit(int(bucket_width)) - F.col("__t0")).cast(
                    "double"
                ),
                dec,
            ).alias("twa"),
        )
    )
