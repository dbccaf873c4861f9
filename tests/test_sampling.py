"""Deterministic hash-gate sampling: reproducible, partition-independent,
rate-accurate, seed-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.pipeline.sampling import (
    _threshold_hex,
    hash_gate,
    stratified_gate,
)


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_gate_is_deterministic_and_partition_independent(spark):
    base = spark.range(5000)
    kept1 = _ids(base.where(hash_gate(F.col("id"), 0.3, "s")))
    kept2 = _ids(base.repartition(17).where(hash_gate(F.col("id"), 0.3, "s")))
    kept3 = _ids(base.coalesce(1).where(hash_gate(F.col("id"), 0.3, "s")))
    assert kept1 == kept2 == kept3  # selection is a pure row property


def test_gate_rate_is_accurate(spark):
    n = spark.range(20_000).where(hash_gate(F.col("id"), 0.3, "s")).count()
    assert abs(n / 20_000 - 0.3) < 0.02


def test_gates_nest_monotonically(spark):
    """Raising the rate only ADDS rows (thresholds nest) — incremental
    corpus growth keeps every previously selected document."""
    base = spark.range(3000)
    small = set(_ids(base.where(hash_gate(F.col("id"), 0.1, "s"))))
    large = set(_ids(base.where(hash_gate(F.col("id"), 0.4, "s"))))
    assert small <= large


def test_different_seeds_are_independent(spark):
    base = spark.range(20_000)
    a = set(_ids(base.where(hash_gate(F.col("id"), 0.5, "seedA"))))
    b = set(_ids(base.where(hash_gate(F.col("id"), 0.5, "seedB"))))
    overlap = len(a & b) / 20_000
    assert abs(overlap - 0.25) < 0.02  # P(A)P(B), not the same slice


def test_stratified_rates_apply_per_stratum(spark):
    df = spark.range(30_000).select(
        "id", (F.col("id") % 2 == 0).cast("string").alias("s")
    )
    kept = df.where(
        stratified_gate(F.col("s"), F.col("id"), {"true": 0.8, "false": 0.1}, "m")
    )
    got = {r.s: r.n for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(got["true"] / 15_000 - 0.8) < 0.03
    assert abs(got["false"] / 15_000 - 0.1) < 0.03


def test_stratified_drops_unlisted_strata(spark):
    df = spark.range(100).select("id", F.lit("other").alias("s"))
    assert df.where(stratified_gate(F.col("s"), F.col("id"), {"en": 1.0}, "m")).count() == 0


def test_edge_rates(spark):
    base = spark.range(500)
    assert base.where(hash_gate(F.col("id"), 0.0, "s")).count() == 0
    assert base.where(hash_gate(F.col("id"), 1.0, "s")).count() == 500
    assert _threshold_hex(1.0) == "ffffffff"


def test_gate_pushes_to_scan(spark, sf_dir, tmp_path):
    """The predicate is scan-local: no shuffle anywhere in the plan."""
    from prajna_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    plan = (
        docs.where(hash_gate(F.col("doc_id"), 0.25, "s"))
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_stratified_gate_join_matches_when_chain(spark):
    """The broadcast-join spelling and the when-chain spelling are the same
    gate: identical kept-row sets on a multi-stratum fixture, and the plan
    is a broadcast join (no shuffle of the fact side)."""
    from pyspark.sql import functions as F

    from prajna_spark.pipeline.sampling import stratified_gate, stratified_gate_join

    rates = {"en": 0.7, "es": 0.3, "fr": 0.05}
    rows = [(i, ["en", "es", "fr", "de"][i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    chain = df.where(
        stratified_gate(F.col("lang"), F.col("doc_id"), rates, seed="mix1")
    )
    joined = stratified_gate_join(df, "lang", "doc_id", rates, seed="mix1")

    got_chain = {r.doc_id for r in chain.collect()}
    got_join = {r.doc_id for r in joined.collect()}
    assert got_chain == got_join and got_chain  # same keeps, non-empty
    assert not any(r.lang == "de" for r in joined.collect())  # absent stratum drops
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()


def test_topk_per_stratum_exact_counts_and_determinism(spark):
    """Exactly min(k, stratum size) rows per stratum, identical selection
    across different partitionings (partition-independence is the whole
    point), and a short stratum returns all its rows."""
    from prajna_spark.pipeline.sampling import topk_per_stratum

    rows = [(i, "big") for i in range(200)] + [(1000 + i, "small") for i in range(3)]
    df8 = spark.createDataFrame(rows, "id long, s string").repartition(8)
    df1 = spark.createDataFrame(list(reversed(rows)), "id long, s string").coalesce(1)

    got8 = {(r.id, r.s) for r in topk_per_stratum(df8, "s", "id", k=10).collect()}
    got1 = {(r.id, r.s) for r in topk_per_stratum(df1, "s", "id", k=10).collect()}
    assert got8 == got1  # partitioning/visit-order independent
    assert sum(1 for _, s in got8 if s == "big") == 10
    assert {(i, s) for i, s in got8 if s == "small"} == {
        (1000, "small"), (1001, "small"), (1002, "small")
    }


def test_topk_per_stratum_plan_has_partial_group_limit(spark):
    """The rank + filter spelling must trigger Spark's WindowGroupLimit
    rewrite with a PARTIAL (pre-shuffle) limit — the property that bounds
    a hot stratum's shuffle volume at k rows per map task — and exactly
    one data exchange."""
    from prajna_spark.pipeline.sampling import topk_per_stratum

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("s")
    )
    plan = (
        topk_per_stratum(df, "s", "id", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_stratified_gate_join_at_thousand_strata(spark):
    """The broadcast-recipe spelling analyzes and runs at 1000-stratum
    cardinality with constant plan depth (the when-chain variant builds a
    1000-deep expression tree — the case this spelling exists for)."""
    from prajna_spark.pipeline.sampling import stratified_gate_join

    rates = {f"lang_{i:04d}": (i % 100) / 100.0 for i in range(1000)}
    rows = [(i, f"lang_{i % 1000:04d}") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_gate_join(df, "lang", "doc_id", rates, seed="big1")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    n = out.count()
    assert 0 < n < 5000  # gates actually applied, strata with rate 0 drop


def test_weighted_topk_favors_heavy_rows_and_is_deterministic(spark):
    """E-S sampling: inclusion probability scales with weight — on a
    two-class weight population (1 vs 100) the sample must be dominated
    by heavy rows; the draw is a pure function of (seed, key), so
    repartitioning cannot change the selected set."""
    from prajna_spark.pipeline.sampling import weighted_topk

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = weighted_topk(df, "id", "w", k=200, seed="es-test")
    ids = sorted(r["id"] for r in picked.collect())
    assert len(ids) == 200
    heavy = sum(1 for i in ids if i % 2 == 0)
    # E[heavy] ~= 198 of 200 at a 100:1 weight ratio; 170 is ~6 sigma off
    assert heavy > 170, heavy
    ids_repart = sorted(
        r["id"]
        for r in weighted_topk(
            df.repartition(17, "w"), "id", "w", k=200, seed="es-test"
        ).collect()
    )
    assert ids == ids_repart


def test_weighted_topk_plans_take_ordered(spark):
    """orderBy(key).limit(k) must plan as TakeOrderedAndProject — each
    task forwards its local top-k, no global sort exchange."""
    from prajna_spark.pipeline.sampling import weighted_topk

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = (
        weighted_topk(df, "id", "w", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_split_assign_covers_and_is_stable_under_growth(spark):
    """Every row lands in exactly one split; fractions are honored; and
    growing the corpus never reassigns an existing row (the incremental
    rebuild property the seed-keyed draw exists for)."""
    from prajna_spark.pipeline.sampling import split_assign

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = spark.range(2000).select(F.col("id"))
    big = spark.range(6000).select(F.col("id"))
    s_small = {r["id"]: r["split"]
               for r in small.select("id", split_assign(F.col("id"), fr)).collect()}
    s_big = {r["id"]: r["split"]
             for r in big.select("id", split_assign(F.col("id"), fr)).collect()}
    assert set(s_small.values()) == {"train", "val", "test"}
    assert all(s_big[i] == s for i, s in s_small.items())
    n = len(s_big)
    train_frac = sum(1 for s in s_big.values() if s == "train") / n
    assert abs(train_frac - 0.8) < 0.03


def test_split_assign_rejects_bad_fractions(spark):
    import pytest
    from prajna_spark.pipeline.sampling import split_assign

    with pytest.raises(ValueError):
        split_assign(F.col("id"), {"a": 0.5, "b": 0.4})


def test_temperature_rates_alpha_extremes(spark):
    """alpha=1 reproduces natural proportions (uniform rate across
    strata); alpha=0 equalizes expected kept counts regardless of
    stratum size."""
    from prajna_spark.pipeline.sampling import temperature_rates

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, s string")

    r1 = {r["s"]: r["rate"] for r in temperature_rates(df, "s", 1.0, 500).collect()}
    assert abs(r1["big"] - r1["small"]) < 1e-12  # natural: same rate

    r0 = {r["s"]: r["rate"] for r in temperature_rates(df, "s", 0.0, 200).collect()}
    # equalized: expected kept = rate * n identical across strata
    assert abs(r0["big"] * 900 - r0["small"] * 100) < 1e-9


def test_temperature_gate_upweights_tail(spark):
    """alpha=0.5 keeps the tail stratum at a HIGHER rate than the head
    (the rebalancing the knob exists for), with totals near target."""
    from prajna_spark.pipeline.sampling import temperature_gate

    rows = [(i, "head" if i < 1800 else "tail") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, s string")
    kept = temperature_gate(df, "s", "id", alpha=0.5, target_rows=400)
    counts = {r["s"]: r["c"] for r in
              kept.groupBy("s").agg(F.count(F.lit(1)).alias("c")).collect()}
    head_rate = counts.get("head", 0) / 1800
    tail_rate = counts.get("tail", 0) / 200
    assert tail_rate > 2 * head_rate, (head_rate, tail_rate)
    total = sum(counts.values())
    assert abs(total - 400) < 80, total
