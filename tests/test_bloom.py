"""Bloom-filter pruning: no-false-negatives property + plan shape."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prajna_spark.pipeline.bloom import bloom_build, bloom_probe

M = 252  # 4 words — small on purpose so false positives are plentiful


def _flags(spark, keys, probes):
    kdf = spark.createDataFrame([(k,) for k in keys] or [(0,)], "k long")
    if not keys:
        kdf = kdf.limit(0)
    pdf = spark.createDataFrame([(p,) for p in probes], "k long")
    bloom = bloom_build(kdf, "k", M)
    out = bloom_probe(pdf, bloom, "k", M)
    return {r["k"]: r["bloom_pass"] for r in out.collect()}


@settings(max_examples=10, deadline=None)
@given(
    keys=st.sets(st.integers(0, 500), max_size=40),
    extra=st.sets(st.integers(0, 500), min_size=1, max_size=40),
)
def test_bloom_never_false_negative(spark, keys, extra):
    flags = _flags(spark, sorted(keys), sorted(keys | extra))
    for k in keys:
        assert flags[k], f"false negative on {k}"


def test_bloom_empty_keyset_rejects_everything(spark):
    flags = _flags(spark, [], [1, 2, 3])
    assert flags == {1: False, 2: False, 3: False}


def test_bloom_words_are_broadcast_sized_and_positive(spark):
    kdf = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = bloom_build(kdf, "k", M).collect()
    assert len(words) <= (M + 62) // 63
    # 63-bit words: the sign bit must never be set
    assert all(r["word"] > 0 for r in words)


def test_bloom_probe_plan_has_no_probe_side_shuffle(spark):
    """The probe is two broadcast joins; a SortMergeJoin would mean the
    fact side took an exchange it was designed to avoid."""
    kdf = spark.range(0, 100).select(F.col("id").alias("k"))
    pdf = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = (
        bloom_probe(pdf, bloom_build(kdf, "k", M), "k", M)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
