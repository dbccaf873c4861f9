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
