"""Deterministic sampling & corpus mixing (north-star LLM-pipeline
surface; no reference equivalent — Prajna's sampling is per-partition RNG,
storage.fs:55-74, which is neither reproducible across runs nor portable
across engines).

Training-data pipelines need REPRODUCIBLE sampling: re-running the job on
the same corpus must select the same documents (dataset cards, ablations,
incremental rebuilds), and the decision must depend only on the ROW, not
on partitioning or visit order. The tool is hash-gating:

    keep(row) <=> md5(seed | key)[:8] <= threshold(rate)

- md5 hex is uniform, so the first 8 hex digits are a uniform 32-bit
  draw; comparing the HEX STRING lexicographically equals comparing the
  integer (fixed-width lowercase hex), which keeps the predicate
  engine-portable (identical in Spark and DuckDB/ANSI SQL) and wholly
  inside whole-stage codegen;
- the predicate is a row-local filter: it pushes toward the scan, never
  shuffles, and is unaffected by repartitioning, retries, or
  speculative execution — the properties per-partition RNG sampling
  (DSet.sample / rand()) cannot give;
- different ``seed`` values give independent samples (held-out splits,
  A/B slices) from one pass.

``stratified_gate`` composes per-stratum rates into one predicate — the
data-mixing recipe (sample each language/source at its own rate) as a
single scan with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

_SPACE = 16**8  # 8 hex digits


def _threshold_hex(rate: float) -> str:
    """Largest 8-hex value kept for ``rate`` (clamped to [0, 1]).

    P(keep) = int(rate * 16^8) / 16^8 — exact to ~2.3e-10, deterministic.
    rate <= 0 keeps nothing (threshold below the hex alphabet).
    """
    if rate <= 0:
        return "/" * 8  # '/' < '0' in ASCII: matches no md5 output
    n = min(int(rate * _SPACE), _SPACE)
    return format(n - 1, "08x")


def hash_gate(key: Column, rate: float, seed: str = "s0") -> Column:
    """Deterministic Bernoulli(rate) keep-predicate on ``key``."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 8
    )
    return h <= F.lit(_threshold_hex(rate))


def hash_gate_sql(key_sql: str, rate: float, seed: str = "s0") -> str:
    """The identical predicate as engine-portable SQL text (oracle twin)."""
    return (
        f"substring(md5('{seed}|' || CAST({key_sql} AS VARCHAR)), 1, 8)"
        f" <= '{_threshold_hex(rate)}'"
    )


def stratified_gate(
    stratum: Column, key: Column, rates: dict[str, float], seed: str = "s0"
) -> Column:
    """Per-stratum deterministic sampling in one predicate: stratum value
    -> its rate (absent strata are dropped). The corpus-mixing gate."""
    expr = F.lit(False)
    for value, rate in sorted(rates.items()):
        expr = F.when(stratum == value, hash_gate(key, rate, seed)).otherwise(expr)
    return expr


def stratified_gate_sql(
    stratum_sql: str, key_sql: str, rates: dict[str, float], seed: str = "s0"
) -> str:
    cases = " ".join(
        f"WHEN {stratum_sql} = '{v}' THEN ({hash_gate_sql(key_sql, r, seed)})"
        for v, r in sorted(rates.items())
    )
    return f"(CASE {cases} ELSE FALSE END)"


def stratified_gate_join(
    df,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    seed: str = "s0",
):
    """``stratified_gate`` as a broadcast join — the high-cardinality
    spelling. The ``when``-chain variant builds an expression tree one level
    deep per stratum: fine for tens of strata, pathological for a
    thousand-language mixing recipe. Here the recipe lives in DATA — a tiny
    (stratum, threshold_hex) frame broadcast to every executor — so the plan
    depth is constant no matter how many strata the recipe names, and the
    join stays a map-side BroadcastHashJoin (no shuffle of ``df``).

    Semantics match ``stratified_gate`` exactly: absent strata drop (inner
    join), each kept row passes its stratum's hash gate.
    """
    spark = df.sparkSession
    recipe = spark.createDataFrame(
        [(v, _threshold_hex(r)) for v, r in sorted(rates.items())],
        f"{stratum_col} string, __thr string",
    )
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string"))), 1, 8
    )
    return (
        df.join(F.broadcast(recipe), stratum_col)
        .where(h <= F.col("__thr"))
        .drop("__thr")
    )


def topk_per_stratum(df, stratum_col: str, key_col: str, k: int, seed: str = "s0"):
    """Exact-k deterministic sample per stratum (fixed-SIZE per-group
    samples — what ``stratified_gate``'s Bernoulli rates cannot promise):
    rank each stratum's rows by their md5 draw and keep the k smallest.
    Reproducible, partition-independent, engine-portable — the same
    properties as the hash gates, plus an exact count.

    Scale shape: ONE exchange on the stratum. Spark's WindowGroupLimit
    rewrite (rank-function window + ``<= k`` filter) inserts a PARTIAL
    group-limit before the shuffle, so every map task forwards at most k
    rows per stratum and the post-shuffle sort sees O(k x #partitions)
    rows per stratum — a hot stratum never funnels its full data through
    one task. Plan-asserted in tests/test_sampling.py; a hand-built
    two-stage rank was measured STRICTLY WORSE (an extra
    (stratum, partition-id) exchange for state the engine already bounds).
    """
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


_ES_SPACE = float(16**12)  # 12 hex digits = 48-bit uniform draw


def es_key(key: Column, weight: Column, seed: str = "s0") -> Column:
    """Efraimidis–Spirakis weighted-sampling key: ``-ln(u) / w`` with
    ``u`` a deterministic md5-derived uniform in (0, 1]. The k SMALLEST
    keys are a weighted-without-replacement sample of size k
    (inclusion probability increases with ``w``; u=md5 makes the draw
    reproducible and partition-independent, same as :func:`hash_gate`).

    Engine-portable: the 48-bit hex slice parses identically
    (Spark ``conv(h,16,10)`` == DuckDB ``CAST('0x'||h AS BIGINT)``) and
    ``ln`` is bit-identical libm on both engines (verified in
    tests/test_sampling.py against the DuckDB oracle)."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    draw = F.conv(F.substring(h, 1, 12), 16, 10).cast("double")
    u = (draw + 1.0) / (_ES_SPACE + 1.0)
    return -F.log(u) / weight


def es_key_sql(key_sql: str, weight_sql: str, seed: str = "s0") -> str:
    """The identical E-S key as DuckDB SQL (oracle twin)."""
    h = f"md5('{seed}|' || CAST({key_sql} AS VARCHAR))"
    draw = f"CAST('0x' || substring({h}, 1, 12) AS BIGINT)"
    return f"(-ln(({draw} + 1e0) / (power(16, 12) + 1e0)) / ({weight_sql}))"


def weighted_topk(df, key_col: str, weight_col: str, k: int, seed: str = "s0"):
    """Fixed-size weighted-without-replacement sample: keep the k rows
    with the smallest E-S keys. Heavier rows (bigger ``weight_col``) are
    proportionally more likely to be kept — the corpus-mixing primitive
    for 'sample documents proportionally to token count'.

    Scale shape: orderBy(key).limit(k) plans as TakeOrderedAndProject —
    every partition forwards only its local top-k, the driver merges
    O(k x #partitions) — no global sort, no stratum funnel. Weights must
    be > 0 (rows with NULL/non-positive weight produce NULL/negative
    keys; filter first)."""
    key = es_key(F.col(key_col), F.col(weight_col), seed)
    return (
        df.withColumn("__es", key)
        .orderBy(F.col("__es").asc(), F.col(key_col))
        .limit(k)
        .drop("__es")
    )


def split_assign(
    key: Column, fractions: dict[str, float], seed: str = "s0"
) -> Column:
    """Deterministic dataset splitting: map each row to exactly one named
    split (train/val/test, ...) by its md5 draw against cumulative
    thresholds. Total coverage and disjointness hold by construction —
    every 8-hex draw falls in exactly one half-open range, and the final
    split's upper bound is the whole space, so fraction rounding can
    never orphan a row. Same determinism contract as :func:`hash_gate`:
    a pure function of (seed, key), immune to partitioning and retries.

    ``fractions`` must sum to 1 (±1e-9); insertion order fixes the
    ranges, so the same dict always yields the same assignment."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 8
    )
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cond = h <= F.lit(_threshold_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    ).alias("split")


def split_assign_sql(
    key_sql: str, fractions: dict[str, float], seed: str = "s0"
) -> str:
    """The identical assignment as engine-portable SQL (oracle twin)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = f"substring(md5('{seed}|' || CAST({key_sql} AS VARCHAR)), 1, 8)"
    names = list(fractions)
    parts = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {h} <= '{_threshold_hex(cum)}' THEN '{name}'")
    if not parts:
        return f"'{names[0]}'"
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def _threshold_hex_col(rate: Column) -> Column:
    """Column form of :func:`_threshold_hex` — the keep-threshold as an
    8-hex string computed IN THE PLAN from a rate column. floor() before
    the BIGINT cast is load-bearing for portability: double->int casts
    TRUNCATE in Spark but ROUND in DuckDB; floor agrees everywhere.
    Rates below 2^-32 clamp to the minimal one-in-2^32 gate rather than
    underflowing to a negative hex."""
    n = F.floor(F.least(rate * F.lit(float(_SPACE)), F.lit(float(_SPACE))))
    n = F.greatest(n, F.lit(1)).cast("long")
    return F.lower(F.lpad(F.hex(n - 1), 8, "0"))


def threshold_hex_sql(rate_sql: str) -> str:
    """The identical in-plan threshold as DuckDB SQL (oracle twin)."""
    n = f"greatest(CAST(floor(least(({rate_sql}) * 4294967296e0, 4294967296e0)) AS BIGINT), 1)"
    return f"lower(lpad(to_hex({n} - 1), 8, '0'))"


def temperature_rates(
    df, stratum_col: str, alpha: float, target_rows: int
):
    """Per-stratum keep rates for TEMPERATURE-based corpus mixing
    (multilingual rebalancing): sampling share p_s ∝ n_s^alpha, so
    alpha=1 keeps natural proportions, alpha=0 equalizes strata, and
    0<alpha<1 up-weights the tail — the standard knob for rebalancing a
    head-heavy corpus. rate_s = min(1, target_rows * p_s / n_s),
    computed ENTIRELY in the plan (one stratum rollup + a one-row
    broadcast of the normalizer) — no driver round-trip, so the recipe
    recomputes correctly as the corpus grows.

    The normalizer Z = sum(n_s^alpha) is a float sum feeding a HARD md5
    gate (floor(rate * 2^32) hex threshold — no rounding absorbs a 1-ulp
    wobble), so its addition ORDER must be pinned: a plain F.sum's
    partial-merge order varies run-to-run and across engines, and an ulp
    flip at a threshold boundary keeps a document on one engine and
    drops it on the other. Z is therefore folded SEQUENTIALLY in stratum
    order (sort_array + aggregate here; list(ORDER BY) + list_reduce in
    the oracle twin). |strata| is recipe-bounded, so the one-row fold
    costs the same as the F.sum it replaces."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    norm = counts.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(stratum_col).alias("s"),
                        F.pow(F.col("__n").cast("double"), F.lit(alpha)).alias("p"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["p"],
        ).alias("__z")
    )
    return counts.join(F.broadcast(norm)).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_rows))
            * F.pow(F.col("__n").cast("double"), F.lit(alpha))
            / F.col("__z")
            / F.col("__n").cast("double"),
        ).alias("rate"),
    )


def temperature_gate(
    df,
    stratum_col: str,
    key_col: str,
    alpha: float,
    target_rows: int,
    seed: str = "s0",
):
    """Apply :func:`temperature_rates` as a deterministic gate: the rate
    frame (|strata| rows) broadcasts onto the corpus and each row's md5
    draw compares against its stratum's in-plan hex threshold — one scan,
    one broadcast join, zero shuffles of the corpus."""
    rates = temperature_rates(df, stratum_col, alpha, target_rows)
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string"))), 1, 8
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .where(h <= _threshold_hex_col(F.col("rate")))
        .drop("rate")
    )


# --------------------------------------------------------------------------
# Poisson bootstrap: the distributed bootstrap. Classic resampling draws n
# rows WITH replacement per replicate — impossible without a global index.
# The Poisson approximation gives each row an INDEPENDENT Poisson(1)
# multiplicity per replicate (multiplicities sum to ~n), which is a pure
# per-row decision: one md5-uniform draw per (row, replicate), inverted
# through the Poisson(1) CDF. Deterministic, shuffle-free until the
# B-group aggregate, and exactly replayable in SQL.
# --------------------------------------------------------------------------

import math as _math

#: cumulative Poisson(1) CDF thresholds for k = 0..7; u >= the last entry
#: (p ~ 1.1e-9) caps the multiplicity at 8. Python-evaluated literals are
#: inlined into BOTH engines' expressions, so the comparison constants are
#: bit-identical by construction.
_POIS1_CDF = [
    sum(_math.exp(-1.0) / _math.factorial(j) for j in range(k + 1))
    for k in range(8)
]

_U_DENOM = float(1 << 60)  # 15 hex digits of md5 -> uniform in [0, 1)


def bootstrap_uniform(key: Column, rep: Column, seed: str = "boot") -> Column:
    """Deterministic uniform in [0,1) per (key, replicate): first 15 hex
    digits of md5('<seed>|<rep>|<key>') over 2^60."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}|"),
                    rep.cast("string"),
                    F.lit("|"),
                    key.cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return h.cast("double") / F.lit(_U_DENOM)


def poisson1_multiplicity(u: Column) -> Column:
    """Invert the Poisson(1) CDF at ``u``: the bootstrap multiplicity."""
    w = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("long")


def bootstrap_sql(key_sql: str, rep_sql: str, seed: str = "boot") -> str:
    """DuckDB replay of bootstrap_uniform + poisson1_multiplicity."""
    u = (
        f"(CAST('0x' || substring(md5('{seed}|' || CAST({rep_sql} AS VARCHAR)"
        f" || '|' || CAST({key_sql} AS VARCHAR)), 1, 15) AS BIGINT)"
        f" / {_U_DENOM!r})"
    )
    expr = "8"
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        expr = f"CASE WHEN {u} < {_POIS1_CDF[k]!r} THEN {k} ELSE {expr} END"
    return f"CAST({expr} AS BIGINT)"


def poisson_bootstrap_means(
    df,
    key_col: str,
    value_col: str,
    b: int = 32,
    seed: str = "boot",
    dec: int = 6,
):
    """Per-replicate bootstrap means: ``(rep, n_eff, mean)`` with the
    mean portably rounded. One explode to B replicates per row (narrow:
    rep, w, value), then a B-group aggregate — map-side partials collapse
    each partition to B rows, so the shuffle is O(B x partitions)
    regardless of input size. Confidence intervals are exact percentiles
    over the B rounded means."""
    from prajna_spark.functions.rounding import pround

    from prajna_spark.operators.fanout import fan_out

    rep = F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep")
    # the B-way explode + per-(row, rep) md5 draw is the expensive map
    # side, and a single-file input scans as ONE split — fan out the
    # narrow (k, v) rows BEFORE the explode (sf0.1 orders, B=32: 8.9s ->
    # 1.5s isolated, 8.2s -> 2.1s for the full catalog query; no-op on a
    # many-split table at scale)
    rows = fan_out(
        df.select(F.col(key_col).alias("__k"), F.col(value_col).alias("__v"))
    ).select("__k", "__v", rep)
    w = poisson1_multiplicity(bootstrap_uniform(F.col("__k"), F.col("rep"), seed))
    return (
        rows.withColumn("__w", w)
        .groupBy("rep")
        .agg(
            F.sum("__w").alias("n_eff"),
            F.when(
                F.sum("__w") > 0,
                pround(
                    F.sum(F.col("__w") * F.col("__v"))
                    / F.sum("__w").cast("double"),
                    dec,
                ),
            ).alias("mean"),
        )
    )
