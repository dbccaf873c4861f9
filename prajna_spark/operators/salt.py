"""Salting for skewed keys — two-stage aggregation and salted broadcast
joins.

Neither exists in the reference (its shuffle hash-partitions blindly;
a hot key serializes one container). At 100 TB a zipfian key in a
groupBy/join makes one reducer the whole job's critical path. Two tools:

- ``salted_agg``: groupBy((key, salt)) partial → groupBy(key) final. The
  first shuffle spreads a hot key over ``n_salts`` reducers; the second
  shuffle only carries ``n_salts`` rows per key. Works for any
  decomposable aggregate (sum/count/min/max; avg via sum+count).
- ``salted_broadcast_join``: replicate the (small) build side ``n_salts``
  ways with an explode, salt the probe side randomly — every probe
  partition finds its match locally regardless of key skew. (For
  shuffle joins, AQE's skewJoin splitting — enabled in session.py — is
  the first line of defense; explicit salting is for when the skew is
  known and extreme.)

Note on AQE: adaptive execution coalesces and splits post-shuffle
partitions, which fixes *partition*-level skew of a shuffle join, but a
single hot KEY in a hash aggregate still lands on one reducer — partial
aggregation usually absorbs it (map-side combine), EXCEPT for aggregates
with large per-key state (collect_list/collect_set/percentile). Salting
is the fix for exactly those.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_partials(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Stage 1 of salted_agg: aggregate within (keys, __salt).

    Exposed separately so tests (and incremental pipelines) can observe
    that a hot key really is spread across ``n_salts`` reducers — the
    output has up to n_salts rows per key."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    return df.select("*", salt).groupBy(*keys, "__salt").agg(*partial_aggs)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs`` combine
    the partials per key and must reference the partial output columns.
    Example::

        salted_agg(df, ["k"],
                   [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
                   [F.sum("s").alias("total"), F.sum("c").alias("n")])
    """
    stage1 = salted_partials(df, keys, partial_aggs, n_salts)
    return stage1.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: explode the broadcast build side across
    ``n_salts`` salt values, salt probe rows uniformly, join on
    (on..., salt). Output == plain inner join on ``on``."""
    on = list(on)
    build_salted = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    probe_salted = probe.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    return probe_salted.join(F.broadcast(build_salted), on + ["__salt"]).drop("__salt")


def window_agg_grouped(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Skew-immune spelling of a WHOLE-PARTITION window aggregate —
    ``F.sum(x).over(Window.partitionBy(keys))`` and friends.

    The window spelling is the one skew case AQE cannot fix: a window
    partition is indivisible, so a hot key's every row lands on ONE task
    and skew-join splitting never applies (WindowExec isn't a join).
    This twin computes the per-key aggregate with a hash aggregate
    (map-side combine collapses the hot key to one row per input
    partition BEFORE the shuffle) and joins it back to the rows. The
    join-back still hashes the hot key to one partition — but that IS a
    shuffle join, which AQE's skew-join splitting can divide at runtime;
    the aggregate shuffle itself carries only |keys|x|partitions| rows.

    ``aggs`` maps output column name -> decomposable aggregate
    expression (unaliased). Output == ``df`` plus one column per agg,
    exactly matching the window spelling row-for-row — including rows
    with NULL key values: Window.partitionBy treats the NULL group as a
    partition and groupBy keeps it as a group, so the join-back uses
    null-safe equality (a plain equi-join would silently drop them)."""
    keys = list(keys)
    _reject_agg_name_collisions(df, keys, aggs)
    per_key = df.groupBy(*keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    # Rename the aggregate's key columns so the null-safe join condition
    # is unambiguous, then drop them — output columns == df + aggs.
    renamed = per_key
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__pk_{k}")
    cond = None
    for k in keys:
        term = df[k].eqNullSafe(renamed[f"__pk_{k}"])
        cond = term if cond is None else cond & term
    return df.join(renamed, cond).drop(*[f"__pk_{k}" for k in keys])


def _reject_agg_name_collisions(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> None:
    """Both window_agg spellings must behave identically on name
    collisions; without this the window path would silently OVERWRITE an
    existing column while the grouped path produced a duplicate."""
    collisions = sorted(set(aggs) & set(df.columns))
    if collisions:
        raise ValueError(
            f"aggs output names collide with existing columns: {collisions}; "
            "alias the aggregates to fresh names"
        )
    reserved = sorted({f"__pk_{k}" for k in keys} & set(df.columns))
    if reserved:
        raise ValueError(f"reserved join-back names present in df: {reserved}")


def window_agg_auto(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    skew_ratio: float | None = None,
    threshold: float = 8.0,
) -> DataFrame:
    """Diagnostic-driven selection between the window spelling and the
    grouped-join twin: pass the measured ``plans.metrics.max_skew_ratio``
    from a prior run's ``stage_task_skew`` report (the
    ``tools/skew_report.py`` loop); at or above ``threshold`` the
    grouped-join spelling is selected, else the plain window. The
    default threshold matches skew_report's ALERT_RATIO.

    This closes the diagnose->remedy loop for hot-key windows: AQE
    handles skewed shuffle JOINS at runtime, partial aggregation handles
    skewed GROUPBYs for free, and this rewrite converts the remaining
    case (skewed window partitions) into the first one."""
    from pyspark.sql import Window

    _reject_agg_name_collisions(df, keys, aggs)
    if skew_ratio is not None and skew_ratio >= threshold:
        return window_agg_grouped(df, keys, aggs)
    w = Window.partitionBy(*[F.col(k) for k in keys])
    out = df
    for name, a in aggs.items():
        out = out.withColumn(name, a.over(w))
    return out
