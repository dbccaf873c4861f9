"""Distributed statistics operators with exact cross-engine contracts.

Each of these backs a catalog query AND a hypothesis differential
(tests/test_properties_wave5.py) against an independent local model —
the guard against shared-blindspot oracles, since the DuckDB replays
necessarily mirror the same algebra.

Exactness disciplines (see functions.rounding): integer sufficient
statistics until one final fixed-association IEEE expression; global
ranks via the distributed zip-with-index, never a single-task window;
ordered running sums only where both engines fold sequentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import pround
from prajna_spark.operators.zipindex import zip_with_index


def gini_cents(
    df: DataFrame, cents_col: str, key_col: str, dec: int = 6
) -> DataFrame:
    """Gini coefficient over exact integer amounts:
    G = sum((2i - n - 1) * x_i) / (n * sum(x)), x ascending (ties broken
    by ``key_col``), ranks from the distributed zip-with-index. Integer
    until ONE final division. Returns (n_units, gini)."""
    r = zip_with_index(
        df.select(F.col(cents_col).alias("cents"), F.col(key_col).alias("k")),
        order_by=["cents", "k"],
        index_col="__i0",
    ).withColumn("i", (F.col("__i0") + 1).cast("long"))
    n = r.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # the rank-weighted moment runs ENTIRELY in DECIMAL(38,0) — the rank
    # weight is cast before the multiply, so even the per-row product
    # (~2*n*cents, past int64 once n*mean_cents exceeds ~4.6e18) cannot
    # wrap before widening, and the SUM (~n^2*mean — past int64 around
    # 1e8 cent-valued rows, exactly the 100 TB shape) accumulates in
    # decimal (ANSI mode would fail the job; non-ANSI would wrap
    # silently). DuckDB's BIGINT arithmetic widens to HUGEINT on its
    # own; both engines then convert the same exact integer to double
    # once, identically.
    term = (2 * F.col("i") - F.col("n") - 1).cast("decimal(38,0)") * F.col(
        "cents"
    )
    s = r.crossJoin(F.broadcast(n)).agg(
        F.first("n").alias("n"),
        # the plain total wraps too once n * mean_cents passes ~9.2e18
        # (1e12 rows at 1e7 cents) — same decimal widening as the moment
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("tot"),
        F.sum(term).alias("num"),
    )
    return s.select(
        F.col("n").alias("n_units"),
        pround(
            F.col("num").cast("double")
            / (F.col("n").cast("double") * F.col("tot").cast("double")),
            dec,
        ).alias("gini"),
    )


def km_curve(
    life: DataFrame, t_col: str, event_col: str, dec: int = 6
) -> DataFrame:
    """Kaplan-Meier estimator over (observed time, event 0/1) rows —
    event=1 is the terminal event, 0 right-censored at ``t_col``.
    Returns (day, n_at_risk, churned, survival): integer risk sets, the
    survival product as exp(cumsum(ln(1 - d/n))) over the ascending-day
    window (libm-identical cross-engine). A fully-saturated day
    (d == n) zeroes survival from that day on via an explicit absorbing
    flag — Spark's ``log(0)`` is NULL (not -inf) and windowed sums SKIP
    nulls, so the naive ln-sum would silently drop the term and
    overstate every later value (caught by the hypothesis differential,
    tests/test_properties_wave5.py).

    Scale contract: the survival product is an ordered window over the
    per-DAY frame — bounded by the observation horizon (thousands of
    rows at any corpus size), never by the subject count, which the
    groupBy collapses first."""
    d = life.groupBy(F.col(t_col).alias("t")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col(event_col)).alias("ch"),
    )
    n = life.agg(F.count(F.lit(1)).alias("nn"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    r = d.crossJoin(F.broadcast(n)).withColumn(
        "at_risk", F.col("nn") - (F.sum("c").over(w) - F.col("c"))
    )
    dead = F.max(
        F.when(F.col("ch") == F.col("at_risk"), 1).otherwise(0)
    ).over(w)
    term = F.when(
        F.col("ch") < F.col("at_risk"),
        F.log(
            F.lit(1.0)
            - F.col("ch").cast("double") / F.col("at_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(w))
    )
    return r.select(
        F.col("t").alias("day"),
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.col("ch").cast("long").alias("churned"),
        pround(surv, dec).alias("survival"),
    )


def ks_2samp(
    df: DataFrame, value_col: str, grp_col: str, dec: int = 6
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic; ``grp_col`` must be 1 or
    2. Duplicate-safe: one row per distinct value carries both samples'
    counts, so each ECDF step lands after all ties. Returns (n_first,
    n_second, ks_stat).

    Scale contract: the ECDF pass is a single ordered window over the
    DISTINCT-VALUE frame, so the value domain must be bounded (prices in
    cents, quantized scores) — KS over a continuous raw column should be
    quantized first, or the "aggregate-sized" frame IS the data and the
    ordered pass becomes a single-task funnel. The catalog query
    (ks_price_drift) feeds cent-valued prices."""
    g = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.when(F.col(grp_col) == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col(grp_col) == 2, 1).otherwise(0)).alias("n2"),
    )
    t = g.agg(
        F.sum("n1").cast("double").alias("t1"),
        F.sum("n2").cast("double").alias("t2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    e = g.crossJoin(F.broadcast(t)).select(
        F.abs(
            F.sum("n1").over(w).cast("double") / F.col("t1")
            - F.sum("n2").over(w).cast("double") / F.col("t2")
        ).alias("d"),
        "t1",
        "t2",
    )
    return e.agg(
        F.first("t1").cast("long").alias("n_first"),
        F.first("t2").cast("long").alias("n_second"),
        pround(F.max("d"), dec).alias("ks_stat"),
    )


def markov_removal_effects(
    trans: DataFrame,
    a_name: str,
    b_name: str,
    dec: int = 6,
) -> DataFrame:
    """Removal-effect attribution from a transition-edge frame
    ``(f, t)`` over states {START, a, b} -> {a, b, CONV, NULL} with the
    two transient states ``a_name``/``b_name``. The absorbing-chain
    conversion probability for two transient states has a closed form
    (Cramer), so everything is one fixed IEEE expression over integer
    count ratios. Removal diverts a channel's inbound edges to NULL.
    Returns (channel, removal_effect, share)."""

    def cell(f, t=None):
        cond = F.col("f") == f if t is None else (
            (F.col("f") == f) & (F.col("t") == t)
        )
        return F.sum(F.when(cond, 1).otherwise(0)).cast("double")

    cells = trans.agg(
        cell("START", a_name).alias("sa"),
        cell("START", b_name).alias("sb"),
        cell("START", "CONV").alias("sc_"),
        cell("START").alias("sn"),
        cell(a_name, a_name).alias("aa"),
        cell(a_name, b_name).alias("ab"),
        cell(a_name, "CONV").alias("ac"),
        cell(a_name).alias("an"),
        cell(b_name, a_name).alias("ba"),
        cell(b_name, b_name).alias("bb"),
        cell(b_name, "CONV").alias("bc"),
        cell(b_name).alias("bn"),
    )
    p = cells.select(
        (F.col("sa") / F.col("sn")).alias("tsa"),
        (F.col("sb") / F.col("sn")).alias("tsb"),
        (F.col("sc_") / F.col("sn")).alias("tsc"),
        (F.col("aa") / F.col("an")).alias("taa"),
        (F.col("ab") / F.col("an")).alias("tab"),
        (F.col("ac") / F.col("an")).alias("tac"),
        (F.col("ba") / F.col("bn")).alias("tba"),
        (F.col("bb") / F.col("bn")).alias("tbb"),
        (F.col("bc") / F.col("bn")).alias("tbc"),
    )
    det = (1.0 - F.col("taa")) * (1.0 - F.col("tbb")) - F.col("tab") * F.col(
        "tba"
    )
    pa = (F.col("tac") * (1.0 - F.col("tbb")) + F.col("tab") * F.col("tbc")) / det
    pb = (F.col("tbc") * (1.0 - F.col("taa")) + F.col("tba") * F.col("tac")) / det
    base = p.select(
        "*", (F.col("tsa") * pa + F.col("tsb") * pb + F.col("tsc")).alias("ps")
    )
    re_a = 1.0 - (
        F.col("tsb") * (F.col("tbc") / (1.0 - F.col("tbb"))) + F.col("tsc")
    ) / F.col("ps")
    re_b = 1.0 - (
        F.col("tsa") * (F.col("tac") / (1.0 - F.col("taa"))) + F.col("tsc")
    ) / F.col("ps")
    removals = base.select(
        F.lit(a_name).alias("channel"), re_a.alias("re")
    ).unionByName(
        base.select(F.lit(b_name).alias("channel"), re_b.alias("re"))
    )
    tot = removals.agg(F.sum("re").alias("sre"))
    return removals.crossJoin(F.broadcast(tot)).select(
        "channel",
        pround(F.col("re"), dec).alias("removal_effect"),
        F.when(
            F.col("sre") != 0, pround(F.col("re") / F.col("sre"), dec)
        ).alias("share"),
    )
