"""Interval analytics: SCD Type-2 history construction and interval
concurrency (the +1/-1 boundary sweep).

Reference provenance: Prajna has no temporal-table machinery — users
rebuilt validity windows with hand-written ``binSortByKey`` +
per-partition scans (the SortedSet cache pattern,
/root/reference/src/CoreLib/cache.fs:587, DSetGenerics.fs:1466).
Both operators here are the DataFrame-native spelling: one shuffle on
the entity key, per-key window functions, no driver participation.

Scale notes
-----------
``scd2_intervals`` shuffles once on the entity key; every window is
per-key, so parallelism equals key cardinality (users — high and
uniform). No global window exists anywhere.

``max_concurrency`` avoids the classic single-partition trap: a naive
``Window.orderBy(t)`` running sum funnels every boundary through one
task. Instead boundaries are aggregated to (key, t) rows (collapsing
ties — this also makes end-exclusive semantics order-independent:
a -1 and +1 at the same instant cancel BEFORE the running sum sees
them), then pipeline.packing.global_prefix_sum computes the running
sum with the single-shuffle sampled-bucket prefix. The prefix runs over
(key, t) order ACROSS keys, yet per-key correctness needs no
correction: every interval contributes exactly +1 and -1, so each
key's deltas sum to zero and the running total is structurally back
to zero when the order crosses a key boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import scoped_persist
from prajna_spark.pipeline.packing import global_prefix_sum

_OPEN_SENTINEL = (1 << 63) - 1  # Long.MaxValue: "never closes"


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    state_col: str,
    ts_col: str,
) -> DataFrame:
    """Build a slowly-changing-dimension Type-2 history from a change
    stream: consecutive duplicate states per key are collapsed (only a
    CHANGE opens a new validity interval), then each interval runs from
    its change timestamp to the next change (open intervals have NULL
    ``effective_to``). Adds ``effective_from``, ``effective_to``,
    ``version`` (1-based per key), ``is_current`` (0/1).

    Requires (keys..., ts_col) unique within the input — the standard
    change-stream contract; ties would make "previous state" ambiguous
    in any engine. NULL is a legal state (e.g. "attribute cleared"): the
    change test is null-safe, so a transition to/from NULL opens an
    interval and consecutive NULLs collapse like any repeated state.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    changes = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        # null-safe change test: plain != is three-valued and silently
        # drops transitions into NULL states; the first row per key is
        # always a change (its __prev NULL is positional, not a state)
        .where(
            (F.col("__rn") == 1)
            | ~F.col(state_col).eqNullSafe(F.col("__prev"))
        )
        .drop("__prev", "__rn")
    )
    wc = Window.partitionBy(*keys).orderBy(ts_col)
    return (
        changes.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(wc))
        .withColumn("version", F.row_number().over(wc).cast("long"))
        .withColumn(
            "is_current",
            F.when(F.col("effective_to").isNull(), 1).otherwise(0).cast("long"),
        )
    )


def max_concurrency(
    df: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
    broadcast_peaks: bool = True,
) -> DataFrame:
    """Per-key maximum number of simultaneously open intervals
    [start, end) and the FIRST instant it is reached. End-exclusive: an
    interval ending exactly when another starts never overlaps it.

    Start/end columns must be mutually comparable and sortable (use
    epoch seconds for timestamps so downstream consumers stay
    engine-portable). Returns one row per key group:
    (keys..., max_concurrent, first_peak_t).

    ``broadcast_peaks`` hints the per-key-maximum side of the join-back
    (one row per key group). Pass False when key cardinality is itself
    data-sized (e.g. per-user concurrency over billions of users) and
    let AQE pick the strategy.

    NULL handling: a NULL ``end_col`` means the interval is still OPEN —
    it counts from its start onward (scd2_intervals' current rows compose
    directly). Internally the open end closes at a +infinity sentinel
    (Long.MaxValue): that keeps every interval's deltas cancelling per
    key — the invariant the cross-key prefix sum rests on — and cannot
    change any peak, because the sentinel close only ever decreases the
    count after all real instants. A NULL ``start_col`` is an undefined
    interval and is dropped. NULL key members form their own group (the
    join-back is null-safe).
    """
    valid = df.where(F.col(start_col).isNotNull())
    # both boundaries of every interval in ONE pass: the former
    # starts/ends union put the (often join-derived) input under both
    # branches, executing it twice (r11; same fix as operators.symmetry)
    boundaries = valid.select(
        *keys,
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("d")),
                F.struct(
                    F.coalesce(F.col(end_col), F.lit(_OPEN_SENTINEL)).alias(
                        "t"
                    ),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("__b"),
    ).select(*keys, F.col("__b.t").alias("t"), F.col("__b.d").alias("d"))
    net = (
        boundaries
        .groupBy(*keys, "t")
        .agg(F.sum("d").cast("long").alias("net"))
    )
    cum = global_prefix_sum(
        net, [*keys, "t"], "net", "cum_before", num_partitions
    ).withColumn("conc", (F.col("cum_before") + F.col("net")).cast("long"))
    cum = scoped_persist(cum.select(*keys, "t", "conc"))
    # rename the aggregate's key columns: peaks derives from cum, so a
    # same-name join condition would be an ambiguous self-join reference
    peaks = (
        cum.groupBy(*keys)
        .agg(F.max("conc").alias("max_concurrent"))
        .select(
            *[F.col(k).alias(f"__pk_{k}") for k in keys], "max_concurrent"
        )
    )
    if broadcast_peaks:
        peaks = F.broadcast(peaks)
    cond = [
        F.col(k).eqNullSafe(F.col(f"__pk_{k}")) for k in keys
    ]  # NULL keys survive the join-back
    return (
        cum.join(peaks, cond)
        .where(F.col("conc") == F.col("max_concurrent"))
        .groupBy(*keys)
        .agg(
            F.first("max_concurrent").alias("max_concurrent"),
            F.min("t").alias("first_peak_t"),
        )
    )


def burst_first(
    df: DataFrame, key_cols: list[str], ts_col: str, gap: float
) -> DataFrame:
    """Debounce: keep only the FIRST row of every activity burst per key,
    where a burst chains rows whose successive gaps are <= ``gap`` (the
    same chaining rule as session windows — a kept row represents the
    burst that follows it). The other debounce flavor ("throttle":
    distance measured from the last KEPT row) is inherently sequential
    state and lives in the streaming tier; this chain form is one lag
    window per key — a single hash shuffle, no state."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    return (
        df.withColumn("__prev", prev)
        .where(F.col("__prev").isNull() | (F.col(ts_col) - F.col("__prev") > gap))
        .drop("__prev")
    )
