"""Bloom-filter join pruning as first-class, oracle-replayable columns.

Spark's own runtime filters (``spark.sql.optimizer.runtime.bloomFilter``)
inject exactly this shape behind the scenes; surfacing it as an operator
makes the pruning *inspectable* (set-bit counts, false-positive rates are
query outputs) and *portable* (the filter is a tiny (word_idx, word)
table you can persist and ship to other jobs — the classic way to prune
a 100 TB fact scan against yesterday's dimension delta without a join).

Everything is deterministic integer arithmetic on md5 bits, so a DuckDB
oracle replays the filter BIT-FOR-BIT: build and probe use
``conv(substr(md5(seed|key),1,15),16,10)`` positions (hex→int parses are
bit-identical cross-engine) into 63-bit words (bit 63 stays clear, so no
signed-shift edge cases on any engine).

Scale notes:
- the filter is ≤ ceil(m/63) longs — broadcast-sized by construction;
- the probe is k broadcast equi-joins (k fixed small), so the fact side
  takes ZERO shuffles and stays in whole-stage codegen: no explode, no
  re-aggregation, just column arithmetic + two map-side lookups;
- no false negatives ever (checked by property test), so
  bloom-then-exact-verify equals the exact semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63


def _position(key: Column, seed: str, m_bits: int) -> Column:
    """md5-derived bit position in [0, m_bits) — the cross-engine hash
    contract (15 hex digits = 60 bits, positive in int64)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(seed + "|"), key.cast("string"))), 1, 15), 16, 10)
    return h.cast("long") % m_bits


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, seeds: tuple[str, ...] = ("b1", "b2")
) -> DataFrame:
    """Aggregate a key set into a Bloom filter: (word_idx, word) rows,
    word_idx = pos // 63, bit pos%63 set. One narrow shuffle on word_idx
    (≤ ceil(m/63) groups) regardless of key cardinality — map-side
    partial bit_or collapses almost everything."""
    key = F.col(key_col)
    per_seed = [
        keys.select(_position(key, s, m_bits).alias("pos")) for s in seeds
    ]
    positions = per_seed[0]
    for p in per_seed[1:]:
        positions = positions.unionAll(p)
    return (
        positions.select(
            (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(pos % {WORD_BITS} AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    seeds: tuple[str, ...] = ("b1", "b2"),
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Append ``flag_col`` (boolean: possibly-in-set) to ``candidates``.
    One broadcast equi-join per seed; a missing word means an all-zero
    word (coalesce to 0). The candidate side never shuffles."""
    out = candidates
    key = F.col(key_col)
    flags = []
    for i, s in enumerate(seeds):
        pos = f"__pos{i}"
        word = f"__word{i}"
        b = bloom.select(
            F.col("word_idx").alias(f"__wi{i}"), F.col("word").alias(word)
        )
        out = (
            out.withColumn(pos, _position(key, s, m_bits))
            .join(
                F.broadcast(b),
                (F.col(pos) / WORD_BITS).cast("long") == F.col(f"__wi{i}"),
                "left",
            )
            .drop(f"__wi{i}")
        )
        flags.append(
            F.expr(
                f"(shiftright(coalesce({word}, 0L), CAST({pos} % {WORD_BITS} AS INT)) & 1L) = 1L"
            )
        )
    flag = flags[0]
    for f_ in flags[1:]:
        flag = flag & f_
    drop = [c for c in out.columns if c.startswith("__pos") or c.startswith("__word")]
    return out.withColumn(flag_col, flag).drop(*drop)
