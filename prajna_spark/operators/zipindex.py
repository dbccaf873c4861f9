"""Deterministic zip-with-index over a total order, at scale.

Reference parity: Prajna ``mapi`` hands the user (partition index,
in-partition ordinal) (/root/reference/src/CoreLib/DSetGenerics.fs:1041-1054,
wrapper function.fs:~1672). The cluster-scale deterministic analogue is a
global 0-based index over an explicit total order.

The naive Spark spelling — ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY — collapses all data into ONE task; at 100 TB that is a
non-starter. This implementation keeps the work distributed AND keeps the
data-sized shuffle count at ONE:

1. range-repartition + sort within partitions on the order keys
   (partitions are range-disjoint, so partition id ordering == key order);
2. per-partition ordinal read straight off
   ``monotonically_increasing_id()`` evaluated above the sort: Spark's
   documented bit layout is (partition id << 33) + consecutive 0-based
   in-partition record number, so the local ordinal is the low 33 bits
   and the partition id the high bits — no window, and crucially no
   second Exchange (a ``Window.partitionBy(partition_id)`` does NOT see
   range partitioning as satisfying its clustering requirement, so the
   windowed spelling re-shuffles the whole dataset by partition id —
   measured two data-sized Exchanges in the executed plan);
3. per-partition row counts -> prefix-sum offsets via a window over only
   #partitions rows (trivially small);
4. broadcast-join offsets back: idx = offset + local ordinal.

The indexed frame is persisted so the offset branch and the main branch
see identical partitioning (range-partitioner sampling and the
nondeterministic id assignment must not re-run).

Bound: the low-33-bit ordinal overflows past 2^33 (~8.6e9) rows in ONE
partition — far beyond any sane partition size (and the pre-fix window
spelling would have been a single 8.6e9-row sort task anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import scoped_persist

_LOCAL_MASK = (1 << 33) - 1


def zip_with_index(
    df: DataFrame,
    order_by: list[str | Column],
    index_col: str = "idx",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Add a 0-based ``index_col`` following the total order ``order_by``.

    ``order_by`` entries are column names or sort expressions (e.g.
    ``F.col("x").desc()``); together they must form a unique composite key
    for the result to be deterministic (same contract as the reference's
    EstablishCorrelatedMix co-location check, DSetGenerics.fs:113-129).
    The range partitioner honors sort direction, so partition-id order
    follows the requested total order either way.

    ``total_col``: when set, every row additionally carries the GLOBAL
    row count under that name — computed as one extra window aggregate
    over the #partitions-row offsets table and delivered by the SAME
    broadcast join that attaches the offsets. Consumers that need the
    total (global_ntile's bucket arithmetic) previously ran a separate
    count branch whose analyzed plan re-inlined the whole upstream
    subtree per call — chained ntiles doubled the plan per level (r11).
    """
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # LAZY persist, deliberately (r11 measured both ways): the offsets
    # branch runs first (its broadcast-build job materializes the cache
    # end-to-end — full-partition consumption, no partial-cache race)
    # and the main branch then reads cached blocks, so correctness of
    # the sampled partitioning + nondeterministic ids holds without an
    # extra eager materialization job; an eager localCheckpoint here
    # cost the two headline zipindex queries +0.3-0.5 s each (min-of-3,
    # reverted). Released via operators.lifecycle.persist_scope when the
    # caller scopes.
    local = scoped_persist(
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("int"))
        .withColumn("__local", F.col("__mid").bitwiseAND(F.lit(_LOCAL_MASK)))
        .drop("__mid")
    )

    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_prefix = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )  # window over #partitions rows only — not a data-sized bottleneck
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__cnt").over(w_prefix), F.lit(0))
    )
    if total_col is not None:
        w_all = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = offsets.withColumn(
            total_col, F.sum("__cnt").over(w_all).cast("long")
        )
    offsets = offsets.select(
        "__pid", "__offset", *([total_col] if total_col is not None else [])
    )

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(index_col, (F.col("__offset") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )
