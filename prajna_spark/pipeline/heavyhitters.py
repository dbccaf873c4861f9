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


# --------------------------------------------------------------------------
# Count-min sketch: mergeable point-frequency estimates. MG above answers
# "which keys are heavy"; CM answers "how often does key x occur" for ANY
# x, in w*d counters. Deterministic md5-derived row hashes make the whole
# sketch replayable on another engine (the same portability trick as the
# KMV sketch in operators/sketch_rollup.py).
#
# Guarantees (Cormode & Muthukrishnan '04): est >= true always (counts
# only ever collide upward); est <= true + eps*N with probability
# >= 1 - delta for w = ceil(e/eps), d = ceil(ln 1/delta). Merge = cell-
# wise ADDITION — partial aggregation applies, so building the sketch is
# one map-combined shuffle of at most w*d rows per map task.
# --------------------------------------------------------------------------


def _cm_bucket(key_col: str, row: int, w: int):
    """Row ``row``'s bucket for a key: first 15 hex digits of
    md5('cm{row}|'||key) as a 60-bit int, mod w. Independent-enough rows
    come from distinct seed prefixes (md5 avalanche)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cm{row}|"), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (h % w).cast("long")


def cm_bucket_sql(key_sql: str, row: int, w: int) -> str:
    """DuckDB spelling of :func:`_cm_bucket` for oracle replays."""
    return (
        f"CAST('0x' || substring(md5('cm{row}|' || CAST({key_sql} AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % {w}"
    )


def cm_sketch(df: DataFrame, key_col: str, w: int = 256, d: int = 4) -> DataFrame:
    """Build the sketch: ``(row, bucket, cnt)`` — at most ``w*d`` rows
    total regardless of input size. The d-fold row expansion is an
    explode over a literal array (map-side, before the aggregation's
    partial combine). Merging sketches = unionAll + re-aggregate."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                _cm_bucket("__k", i, w).alias("bucket"),
            )
            for i in range(d)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("__k"))
        .select(F.explode(pairs).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, w: int, d: int
) -> DataFrame:
    """Point-frequency estimates for ``keys``: ``(key_col, est)`` with
    ``est = min over rows of the key's bucket count`` (0 if a bucket is
    empty — the sketch stores no zero cells). The sketch is at most w*d
    rows, so it broadcasts; estimation is d broadcast-hash probes per
    key, no data-sized shuffle."""
    probes = keys.select(F.col(key_col).alias("__k")).distinct()
    for i in range(d):
        probes = probes.withColumn(f"__q{i}", _cm_bucket("__k", i, w))
    est = None
    sk = F.broadcast(sketch)
    out = probes
    for i in range(d):
        cell = sk.select(
            F.col("row").alias(f"__r{i}"),
            F.col("bucket").alias(f"__cb{i}"),
            F.col("cnt").alias(f"__c{i}"),
        ).where(F.col(f"__r{i}") == i)
        out = out.join(
            cell, out[f"__q{i}"] == cell[f"__cb{i}"], "left"
        ).drop(f"__r{i}", f"__cb{i}", f"__q{i}")
        c = F.coalesce(F.col(f"__c{i}"), F.lit(0))
        est = c if est is None else F.least(est, c)
    return out.select(
        F.col("__k").alias(key_col), est.cast("long").alias("est")
    )
