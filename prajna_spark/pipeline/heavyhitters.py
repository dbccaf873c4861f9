"""Distributed heavy hitters: mergeable Misra-Gries partition summaries +
an exact confirmation pass.

The 100 TB pattern: find keys whose frequency exceeds phi*N WITHOUT a
corpus-sized groupBy. Pass 1 computes a bounded Misra-Gries (MG) summary
per partition (m counters, error eps_p <= n_p/(m+1)) — map-side only, no
shuffle of raw keys; what crosses the wire is <= m rows per partition.
Pass 2 counts ONLY the candidate keys exactly (broadcast semi-join prunes
the scan's aggregation to candidates) and applies the threshold to exact
counts — so the result is EXACT heavy hitters, not estimates, for any
summary size m >= 1/phi (the MG guarantee: a key with count > N/(m+1)
survives at least one summary; with m >= 1/phi, every key at or above the
phi*N threshold is a candidate). This is why the catalog query is
hash-checked against a plain exact-count oracle.

MG summaries are *mergeable* (Agarwal et al., "Mergeable Summaries",
PODS'12): keywise-sum two summaries, subtract the (m+1)-th largest count,
drop non-positives — errors add. The per-partition fold below applies
exactly that merge between the partition's Arrow batches, so memory stays
O(m + batch distinct), never O(partition distinct).

Reference parity: Prajna has no sketch surface at all (closest is
fold-based exact counting, DSetGenerics.fs:392); this module is a declared
Spark-native addition alongside the HLL rollup (operators/sketch_rollup).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summaries(df: DataFrame, key_col: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(part_id, key, est, eps)``.

    ``est`` underestimates the key's true in-partition count by at most
    ``eps`` (that partition's accumulated truncation); keys absent from a
    partition's summary have in-partition count <= eps. At most ``m`` key
    rows per partition are emitted.

    NULL keys are excluded from the sketch BY CONTRACT (a null ``key``
    row is the empty-partition eps sentinel): null is a single known
    group, so callers needing it count it exactly with one aggregate —
    :func:`heavy_hitters_exact` does exactly that.
    """
    if m < 1:
        raise ValueError("summary size m must be >= 1")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId()
        counts = pd.Series(dtype="int64")
        eps = 0
        for batch in batches:
            batch_counts = batch[key_col].value_counts(dropna=True)
            counts = counts.add(batch_counts, fill_value=0).astype("int64")
            if len(counts) > m:
                # MG merge truncation: subtract the (m+1)-th largest count
                # from everything, keep strictly-positive counters.
                cutoff = int(counts.nlargest(m + 1).iloc[-1])
                counts = counts - cutoff
                counts = counts[counts > 0]
                eps += cutoff
        out = pd.DataFrame(
            {
                "part_id": part_id,
                "key": counts.index.to_numpy(),
                "est": counts.to_numpy(dtype="int64"),
                "eps": eps,
            }
        )
        if out.empty:
            # still report the partition's eps so global bounds are sound
            out = pd.DataFrame(
                {"part_id": [part_id], "key": [None], "est": [0], "eps": [eps]}
            )
        yield out

    key_type = dict(df.dtypes)[key_col]
    schema = f"part_id int, key {key_type}, est long, eps long"
    return df.select(key_col).mapInPandas(summarize, schema)


def candidate_keys(summaries: DataFrame) -> DataFrame:
    """Global candidate set with deterministic count bounds:
    ``(key, lower, upper)`` where lower <= true count <= upper.

    lower = sum of ests over partitions that kept the key. upper = lower +
    TOTAL eps across ALL partitions: a keeping partition's est undercounts
    by up to its eps (MG subtracts from every counter, the key's
    included), and a dropping partition can hide up to its eps — either
    way each partition contributes at most eps_p of slack. total_eps rides
    a one-row broadcast."""
    per_part_eps = summaries.groupBy("part_id").agg(F.first("eps").alias("eps"))
    total = per_part_eps.agg(F.sum("eps").alias("total_eps"))
    return (
        summaries.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("lower"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "lower",
            (F.col("lower") + F.col("total_eps")).alias("upper"),
        )
    )


def heavy_hitters_exact(
    df: DataFrame, key_col: str, phi: float, m: int | None = None
) -> DataFrame:
    """Exact keys with count > phi*N via sketch-then-verify:
    ``(key_col, n)`` with exact counts.

    Pass 1 prunes to candidates whose UPPER bound can reach the threshold
    (upper >= lower bound of phi*N is relaxed to upper-vs-threshold on the
    exact N, computed in-plan); pass 2 exact-counts candidates only. For
    m >= 1/phi the candidate set provably contains every true heavy
    hitter, so the output equals the brute-force groupBy+HAVING — the
    property the DuckDB oracle checks. NULL keys are handled exactly
    outside the sketch (null is one known group — a single aggregate
    counts it; the sketch's null row is its eps sentinel, and an
    equi-join would drop nulls anyway)."""
    if m is None:
        m = max(16, int(2.0 / phi))
    if m * phi < 1.0:
        raise ValueError(
            f"m={m} too small for phi={phi}: need m >= 1/phi for the "
            "no-false-negative guarantee"
        )
    total = df.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    cands = (
        candidate_keys(mg_summaries(df, key_col, m))
        .crossJoin(F.broadcast(total))
        .where(F.col("upper").cast("double") > F.col("n_total") * phi)
        .select(F.col("key").alias(key_col))
    )
    non_null = (
        df.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    null_grp = (
        df.where(F.col(key_col).isNull())
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") > 0)
        .select(F.lit(None).cast(dict(df.dtypes)[key_col]).alias(key_col), "n")
    )
    return (
        non_null.unionByName(null_grp)
        .crossJoin(F.broadcast(total))
        .where(F.col("n").cast("double") > F.col("n_total") * phi)
        .select(key_col, "n")
    )
