"""Online-experiment (A/B test) analysis over an event log.

The reference's telemetry loop (SURVEY §2.12 — VM-Hub clients reporting
events into the aggregation hub, `/root/reference/src/ServiceLib/
MonitorService.fs`) is exactly the data a product experiment reads; this
module adds the downstream statistics a deployment runs on it: unit-level
deterministic variant assignment and the pooled two-proportion z-test.

Scale shape: the event log reduces to ONE row per experiment unit at the
first aggregate (shuffle keyed on the unit id — narrow, high-cardinality,
uniform by construction since the assignment hash is uniform), then to one
row per variant (tiny), then to a single stats row. Nothing downstream of
the first aggregate is data-sized, so the plan survives any corpus scale.

Determinism contract (oracle hash-compare): assignment reuses the md5
hash-gate spelling from :mod:`prajna_spark.pipeline.sampling` (first 8 md5
hex digits vs a rate threshold — identical text on both engines), and the
z statistic is computed with one fixed association of exact-deterministic
IEEE-754 ops (divides, multiply-adds, one correctly-rounded sqrt), so both
engines produce bit-identical doubles before the portable rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prajna_spark.pipeline.sampling import hash_gate, hash_gate_sql


def ab_assign(unit: Column, seed: str = "ab0", treat_rate: float = 0.5) -> Column:
    """Deterministic variant label ('A' = treatment w.p. ``treat_rate``,
    else 'B') for an experiment unit — sticky across sessions/restarts
    because it hashes the unit id, never a random draw."""
    return F.when(hash_gate(unit, treat_rate, seed=seed), F.lit("A")).otherwise(
        F.lit("B")
    )


def ab_assign_sql(unit_sql: str, seed: str = "ab0", treat_rate: float = 0.5) -> str:
    """Engine-portable SQL twin of :func:`ab_assign`."""
    return (
        f"CASE WHEN {hash_gate_sql(unit_sql, treat_rate, seed=seed)}"
        " THEN 'A' ELSE 'B' END"
    )


def two_proportion_ztest(
    units: DataFrame, variant_col: str = "variant", converted_col: str = "converted"
) -> DataFrame:
    """Pooled two-proportion z-test from a (unit, variant, converted 0/1)
    frame. Returns ONE row: per-variant counts/rates plus the z statistic

        z = (p_a - p_b) / sqrt(p * (1 - p) * (1/n_a + 1/n_b))

    with p the pooled conversion rate. The conditional aggregation is a
    single tiny job over the per-unit frame; the z expression keeps one
    fixed association so the oracle replay is bit-identical (see module
    docstring). Rates/z are returned UNROUNDED — callers round for
    cross-engine comparison."""
    v = F.col(variant_col)

    def side(tag: str, what: Column) -> Column:
        return F.sum(F.when(v == tag, what).otherwise(F.lit(0)))

    agg = units.agg(
        side("A", F.lit(1)).alias("n_a"),
        side("A", F.col(converted_col)).alias("c_a"),
        side("B", F.lit(1)).alias("n_b"),
        side("B", F.col(converted_col)).alias("c_b"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    c_a = F.col("c_a").cast("double")
    c_b = F.col("c_b").cast("double")

    def ratio(c: Column, n: Column) -> Column:
        # Guarded division (ANSI mode errors on /0): empty side -> rate 0.
        return F.when(n == F.lit(0.0), F.lit(0.0)).otherwise(c / n)

    p_a = ratio(c_a, n_a)
    p_b = ratio(c_b, n_b)
    pool = ratio(c_a + c_b, n_a + n_b)
    se = F.sqrt(
        pool * (F.lit(1.0) - pool) * (ratio(F.lit(1.0), n_a) + ratio(F.lit(1.0), n_b))
    )
    # Degenerate experiments report z = 0 rather than erroring — the
    # caller reads significance off a well-posed test only. An empty side
    # needs its OWN guard: ratio() maps 1/n to 0 when n = 0, so with
    # n_a = 0 and 0 < pooled rate < 1 the se is still positive and
    # (0 - p_b)/se would be a spurious, possibly large z.
    z = F.when(
        (n_a == F.lit(0.0)) | (n_b == F.lit(0.0)) | ~(se > F.lit(0.0)),
        F.lit(0.0),
    ).otherwise((p_a - p_b) / se)
    return agg.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        p_a.alias("rate_a"),
        p_b.alias("rate_b"),
        z.alias("z_score"),
    )


def two_proportion_ztest_sql(
    exposed_sql: str, rate_decimals: int = 6
) -> str:
    """Oracle twin of :func:`two_proportion_ztest` over a CTE named by
    ``exposed_sql`` producing (variant, converted). Emits the SELECT list
    with the IDENTICAL association of IEEE ops; rates and z are rounded
    with the portable R spelling at ``rate_decimals``."""
    from prajna_spark.functions.rounding import R

    n_a = "CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS DOUBLE)"
    c_a = "CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS DOUBLE)"
    n_b = "CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS DOUBLE)"
    c_b = "CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS DOUBLE)"

    def ratio(c: str, n: str) -> str:
        return f"(CASE WHEN ({n}) = 0e0 THEN 0e0 ELSE ({c}) / ({n}) END)"

    p_a = ratio(c_a, n_a)
    p_b = ratio(c_b, n_b)
    pool = ratio(f"({c_a}) + ({c_b})", f"({n_a}) + ({n_b})")
    se = (
        f"sqrt({pool} * (1e0 - {pool})"
        f" * ({ratio('1e0', n_a)} + {ratio('1e0', n_b)}))"
    )
    z = (
        f"(CASE WHEN ({n_a}) = 0e0 OR ({n_b}) = 0e0 THEN 0e0"
        f" WHEN ({se}) > 0e0 THEN (({p_a}) - ({p_b})) / ({se})"
        f" ELSE 0e0 END)"
    )
    return f"""
    SELECT CAST({n_a} AS BIGINT) AS n_a, CAST({c_a} AS BIGINT) AS c_a,
           CAST({n_b} AS BIGINT) AS n_b, CAST({c_b} AS BIGINT) AS c_b,
           {R(p_a, rate_decimals)} AS rate_a,
           {R(p_b, rate_decimals)} AS rate_b,
           {R(z, rate_decimals)} AS z_score
    FROM {exposed_sql}
    """
