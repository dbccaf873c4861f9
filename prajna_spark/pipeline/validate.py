"""Data-quality validation — one-pass constraint violation accounting.

A training-data (or any 100 TB) pipeline gates ingestion on declarative
expectations: non-negative amounts, closed value domains, date ranges,
non-null keys. The scalable spelling is ONE aggregation pass computing
every rule's violation count simultaneously (conditional aggregates —
map-side partials, a single exchange of one row per partition), never one
scan per rule and never a collected sample.

``check(df, rules)`` returns a single-row DataFrame with one violation
count per rule plus the total row count; ``enforce`` raises when any rule
is violated (the ingest-gate form). Rules are plain boolean Columns, so
they push down, fold, and codegen like any predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row: n_rows + ``<rule>_violations`` for every rule.

    A NULL rule result counts as a violation (unknown is not a pass) —
    align with SQL by wrapping nullable predicates in coalesce if NULLs
    are acceptable. An EMPTY input reports 0 violations, not NULL
    (F.sum over zero rows is NULL; a clean-but-empty delivery must be
    distinguishable from a failed measurement).
    """
    if not rules:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)),
                F.lit(0),
            ).cast("long").alias(f"{name}_violations")
        )
    return df.agg(*aggs)


def enforce(df: DataFrame, rules: dict[str, Column]) -> None:
    """Raise ValueError naming every violated rule (the ingest gate)."""
    row = check(df, rules).first()
    bad = {
        name: row[f"{name}_violations"]
        for name in rules
        if row[f"{name}_violations"]
    }
    if bad:
        raise ValueError(f"data-quality violations: {bad}")


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profile — the delivery-inspection companion to
    ``check``: per column, null count, exact distinct count, and min/max
    (as strings, so one long-format frame covers mixed types). ALL
    columns profile in a single aggregation job: the distinct counts ride
    Catalyst's Expand-based multi-distinct rewrite (one shuffle), the
    rest are plain conditional aggregates with map-side partials — never
    one scan per column.

    Output: (column, n_rows, n_null, n_distinct, min_value, max_value),
    one row per profiled column, deterministic order by unpivot.
    """
    cols = columns or df.columns
    if not cols:
        raise ValueError("no columns to profile")
    from prajna_spark.operators.fanout import fan_out

    # the multi-distinct rewrite EXPANDS every row (columns+1)-fold and
    # hashes high-cardinality distinct keys map-side — on a single-split
    # table that all ran in one task (measured: 1.7 s serial stage);
    # conditional spread, no-op on a many-split table (r11, guide §2.5)
    df = fan_out(df)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            # aggregate in NATIVE type (numeric/temporal ordering), cast
            # the single result to string for the long-format output
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def profile_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact grouped quantiles (linear interpolation) — the distribution
    companion to :func:`profile`'s min/max. One aggregation job: Spark's
    ``percentile`` computes every requested quantile of a group in a
    single sort-based aggregate (partial collections merge map-side), so
    adding quantiles costs one shuffle of (group, value-sketch) rows —
    never a per-quantile pass and never a window sort of the full table.

    Exactness matters for the oracle gate: ``percentile`` (Spark) and
    ``quantile_cont`` (DuckDB) both take the linearly-interpolated
    order statistic, and sorting + interpolation is deterministic IEEE
    arithmetic — results are bit-identical across engines, unlike any
    approx_percentile sketch. At truly unbounded group sizes switch to
    approx_percentile and drop the oracle; the exact form is right up to
    groups of ~10^8 rows (the sort is per-group, distributed across the
    shuffle).

    Output: group_cols + ``p<q>`` columns (q as percent, e.g. p50, p95).
    """
    aggs = [
        F.percentile(value_col, q).alias(f"p{int(round(q * 100))}") for q in qs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def check_referential(
    fact: DataFrame, dim: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Referential-integrity check: one row (n_rows, n_orphans) counting
    fact rows whose ``fk`` has no match in ``dim.pk`` (NULL fks are
    orphans — unknown is not a pass, matching :func:`check`). The probe
    is a LEFT ANTI join against the distinct key column only: the dim
    reduces to its key (column-pruned scan) and broadcasts when small,
    so the fact table is never shuffled in the common dim-check case."""
    orphans = fact.select(fk).join(
        dim.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    n = fact.agg(F.count(F.lit(1)).alias("n_rows"))
    o = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    return n.join(o)


def join_size_estimate(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """EXACT inner-join output cardinality WITHOUT executing the join:
    |A join B| = sum over keys of cnt_A(k) * cnt_B(k). Two map-combined
    group-bys collapse each side to its key histogram (key-cardinality
    rows), one narrow merge join of the histograms, one sum — the
    planner-diagnostic that tells you a fact-fact join will explode
    BEFORE you shuffle two corpus-sized tables into it. Returns one row:
    (n_left, n_right, n_join_rows, max_key_fanout)."""
    lc = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("ln")
    )
    rc = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("rn")
    )
    per_key = lc.join(rc, "k").select(
        (F.col("ln") * F.col("rn")).alias("fanout")
    )
    totals = per_key.agg(
        F.coalesce(F.sum("fanout"), F.lit(0)).alias("n_join_rows"),
        F.coalesce(F.max("fanout"), F.lit(0)).alias("max_key_fanout"),
    )
    nl = left.agg(F.count(F.lit(1)).alias("n_left"))
    nr = right.agg(F.count(F.lit(1)).alias("n_right"))
    return (
        nl.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(totals))
        .select("n_left", "n_right", "n_join_rows", "max_key_fanout")
    )


def dataset_digest(df: DataFrame, row_expr: Column) -> DataFrame:
    """Order-insensitive, mergeable dataset checksum: per-row md5 of a
    canonical string, parsed to a 60-bit int, summed (with count) — any
    added/removed/changed row moves the digest; row and partition order
    don't (addition commutes). Combine with per-partition computation and
    the digest of digests for a Merkle-ish audit trail. ``row_expr`` must
    be a STRING column built from format-stable casts (ints/strings —
    never raw floats or timestamps; see the catalog query for the
    convention)."""
    h = F.conv(F.substring(F.md5(row_expr), 1, 15), 16, 10).cast("long")
    # the additive digest accumulates in DECIMAL(38,0) (exact at any row
    # count — a raw BIGINT sum would wrap at ~10^18/10^18-th row) and is
    # reduced mod 2^60 for a format-stable BIGINT output; XOR is the
    # complementary channel (overflow-free, but blind to duplicate-row
    # pairs, which the additive channel catches)
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(1 << 60)).cast("long"),
            F.lit(0),
        ).alias("digest_sum"),
        F.coalesce(F.bit_xor("h"), F.lit(0)).alias("digest_xor"),
    )


def kmv_key_overlap(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    k: int = 128,
    seed: str = "kmv1",
    est_decimals: int = 6,
) -> DataFrame:
    """Key-set overlap diagnostics WITHOUT joining the tables: one row
    ``(n_a_est, n_b_est, union_est, jaccard_est, inter_est)`` from two
    KMV sketches (operators.sketch_rollup) of the key columns.

    The pre-flight FK-health check at scale: |A|, |B|, |A∪B| come from
    the Bar-Yossef estimator on each sketch (exact below k); Jaccard is
    the fraction of the MERGED sketch's hashes present in both sides
    (Bayer et al.'s KMV set-operation rule: the k minima of the union
    are an unbiased sample of A∪B); intersection = J * |A∪B|. Each side
    costs one map-combined distinct + a TakeOrdered k-heap — the tables
    never shuffle against each other (contrast join_size_estimate, which
    histograms every key). md5-derived hashes make every number here
    deterministic and replayable by the SQL oracle."""
    from prajna_spark.operators.sketch_rollup import _KMV_SPACE, _kmv_hash

    def k_min(df: DataFrame, key: str) -> DataFrame:
        return (
            df.where(F.col(key).isNotNull())
            .select(_kmv_hash(key, seed).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    ha, hb = k_min(a, a_key), k_min(b, b_key)
    merged = ha.unionAll(hb).distinct().orderBy("h").limit(k)
    both = merged.join(ha, "h", "left_semi").join(hb, "h", "left_semi")

    def est(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("__n"), F.max("h").alias("__hk")
        ).select(
            F.when(F.col("__n") < k, F.col("__n").cast("double"))
            .otherwise(F.lit(float(k - 1) * _KMV_SPACE) / F.col("__hk").cast("double"))
            .alias(name),
            *([F.col("__n").alias("__nm")] if name == "union_est" else []),
        )

    inter = both.agg(F.count(F.lit(1)).cast("double").alias("__ni"))
    out = (
        est(ha, "n_a_est")
        .crossJoin(F.broadcast(est(hb, "n_b_est")))
        .crossJoin(F.broadcast(est(merged, "union_est")))
        .crossJoin(F.broadcast(inter))
    )
    j = F.when(F.col("__nm") > 0, F.col("__ni") / F.col("__nm")).otherwise(F.lit(0.0))
    return out.select(
        F.round("n_a_est", est_decimals).alias("n_a_est"),
        F.round("n_b_est", est_decimals).alias("n_b_est"),
        F.round("union_est", est_decimals).alias("union_est"),
        F.round(j, est_decimals).alias("jaccard_est"),
        F.round(j * F.col("union_est"), est_decimals).alias("inter_est"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Population Stability Index between two samples of ``value_col`` —
    the standard drift monitor between a reference snapshot and current
    data: ``(bin, n_ref, n_cur, term)`` per reference-quantile bin, with
    PSI = Σ term = Σ (p_cur - p_ref) · ln(p_cur / p_ref).

    Bins are the REF distribution's exact quantile edges (a one-row
    broadcast lattice; perfectly calibrated: p_ref ≈ 1/n_bins each).
    Proportions are add-half smoothed — (cnt + 0.5) / (n + n_bins/2) —
    so empty bins contribute a finite, deterministic penalty instead of
    an infinity or an arbitrary clamp. Each side is one map-combined
    bin-count aggregation; ln and the integer-fed divisions are
    bit-identical cross-engine (PSI > 0.2 is the conventional
    investigate threshold)."""
    ps = [i / n_bins for i in range(1, n_bins)]
    edges = ref.agg(F.percentile(F.col(value_col), F.lit(ps)).alias("__edges"))

    def bin_counts(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col)
        b = F.size(F.filter(F.col("__edges"), lambda e: v > e))
        return (
            df.where(v.isNotNull())
            .crossJoin(F.broadcast(edges))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    bins = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    r = bin_counts(ref, "n_ref")
    c = bin_counts(cur, "n_cur")
    tot = (
        r.agg(F.sum("n_ref").alias("__tr"))
        .crossJoin(c.agg(F.sum("n_cur").alias("__tc")))
    )
    joined = (
        bins.join(r, "bin", "left")
        .join(c, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            "__tr",
            "__tc",
        )
    )
    half = F.lit(0.5)
    pr = (F.col("n_ref") + half) / (F.col("__tr") + half * n_bins)
    pc = (F.col("n_cur") + half) / (F.col("__tc") + half * n_bins)
    return joined.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((pc - pr) * F.log(pc / pr), decimals).alias("term"),
    )
