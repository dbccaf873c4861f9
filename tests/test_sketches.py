"""The approximate-sketch surface — the 100 TB path the exact queries
document as their scale twin (SURVEY §2.6 'no approx-distinct' upgrade;
scalars.percentile_order_totals docstring).

Sketches (HLL++, KLL-style quantiles) are mergeable map-side, so they keep
partial aggregation — no oracle hash-match is possible against DuckDB's
different sketch implementations, so these are tolerance tests against the
exact answers on the real sf0.001 tables."""

import os

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_approx_count_distinct_within_rsd(spark):
    od = _orders(spark)
    exact = od.select(F.countDistinct("o_custkey")).first()[0]
    approx = od.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= max(4 * 0.02 * exact, 1)  # 4 sigma


def test_approx_percentile_brackets_exact(spark):
    od = _orders(spark)
    exact_p50, exact_p99 = od.select(
        F.percentile("o_totalprice", F.lit(0.5)),
        F.percentile("o_totalprice", F.lit(0.99)),
    ).first()
    ap50, ap99 = od.select(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10_000)),
        F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10_000)),
    ).first()
    # KLL accuracy at 10k: rank error ~1e-4 -> value error well under 2%
    assert abs(ap50 - exact_p50) / exact_p50 < 0.02
    assert abs(ap99 - exact_p99) / exact_p99 < 0.02


def test_sketch_agg_keeps_partial_aggregation(spark):
    # The point of the sketch at 100 TB: partial (map-side) aggregation —
    # the plan must show a partial_ aggregate before the exchange.
    od = _orders(spark)
    plan = (
        od.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .lower()
    )
    assert "partial_approx_count_distinct" in plan


def test_lsh_bucket_cap_bounds_adversarial_corpus(spark):
    """All-identical documents collapse into ONE band bucket — uncapped
    pair expansion is O(n^2); max_bucket_size drops the degenerate bucket
    so candidate generation stays bounded, and leaves a normal corpus
    untouched."""
    from prajna_spark.pipeline.dedup import lsh_band_pairs

    same = spark.range(200).selectExpr(
        "id AS doc_id", "'the exact same boilerplate text' AS text"
    )
    uncapped = lsh_band_pairs(same, "doc_id", "text", n_hashes=4, band_size=2)
    assert uncapped.count() == 200 * 199 // 2  # the quadratic blowup
    capped = lsh_band_pairs(
        same, "doc_id", "text", n_hashes=4, band_size=2, max_bucket_size=50
    )
    assert capped.count() == 0  # hot bucket dropped before expansion

    mixed = spark.range(40).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 2 THEN 'twin text alpha beta' "
        "ELSE concat('unique-', id, ' words ', id * 7) END AS text",
    )
    normal = lsh_band_pairs(mixed, "doc_id", "text", n_hashes=4, band_size=2)
    guarded = lsh_band_pairs(
        mixed, "doc_id", "text", n_hashes=4, band_size=2, max_bucket_size=10
    )
    assert sorted(map(tuple, normal.collect())) == sorted(map(tuple, guarded.collect()))


def test_lsh_band_size_must_divide_n_hashes(spark):
    import pytest

    from prajna_spark.pipeline.dedup import lsh_band_pairs

    docs = spark.range(3).selectExpr("id AS doc_id", "'abc def' AS text")
    with pytest.raises(ValueError, match="multiple of band_size"):
        lsh_band_pairs(docs, "doc_id", "text", n_hashes=5, band_size=2)


def test_minhash_beyond_one_digest_is_nonempty_and_distinct(spark):
    """n_hashes > 8 must derive extra seeded digests — components past the
    32-hex boundary were silently '' before."""
    from prajna_spark.pipeline.dedup import minhash_signature

    docs = spark.range(5).selectExpr(
        "id AS doc_id", "concat('document number ', id, ' has words') AS text"
    )
    sig = minhash_signature(docs, "doc_id", "text", n_hashes=12).collect()
    for r in sig:
        for j in range(12):
            v = r[f"minhash_{j}"]
            assert isinstance(v, str) and len(v) == 4  # slice_len=4, never ''


def test_ngram_collision_pairs_semantics(spark):
    """Docs pair iff they share an exact n-token window; shorter docs and
    partial overlaps below n do not pair."""
    from prajna_spark.pipeline.dedup import ngram_collision_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # shares 4-gram 'c d e f' with 2
            (2, "x c d e f y"),
            (3, "c d e"),            # only 3 tokens: below n, never pairs
            (4, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    got = sorted(map(tuple, ngram_collision_pairs(docs, "doc_id", "text", n=4).collect()))
    assert got == [(1, 2)]


def test_blocked_pairs_cap_bounds_degenerate_block(spark):
    """1k identical-key rows would be ~500k pairs; the cap drops the hot
    block before pair expansion while normal blocks still pair up."""
    from prajna_spark.pipeline.dedup import blocked_pairs

    rows = [(i, "same", f"name {i}") for i in range(1000)]
    rows += [(2000, "rare", "alpha"), (2001, "rare", "alphb")]
    df = spark.createDataFrame(rows, "id long, block string, name string")

    capped = blocked_pairs(
        df, "block", "id", ("name",), max_block_size=10
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(2000, 2001)}
    assert capped[0].name_a == "alpha" and capped[0].name_b == "alphb"

    uncapped = blocked_pairs(df, "block", "id", max_block_size=None)
    assert uncapped.count() == 1000 * 999 // 2 + 1


def test_decontaminate_drops_planted_overlap(spark):
    """A training doc sharing an exact 8-token span with the eval set is
    dropped; unrelated docs survive; sub-8-token docs are never flagged.
    The eval gram set rides a broadcast join (no training-gram shuffle)."""
    from prajna_spark.pipeline.dedup import decontaminate

    span = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [
            (1, f"clean document with its own unique words number one {'x ' * 8}"),
            (2, f"leaked {span} appears inside this training document"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"benchmark question: {span} is the answer")],
        "doc_id long, text string",
    )
    out = decontaminate(train, eval_df, "doc_id", "text", n=8)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_scores_flags_boilerplate(spark):
    from prajna_spark.pipeline.dedup import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),   # one bigram, 5 occurrences
            (2, "all words here are fully distinct"),
            (3, "tiny"),                            # < 2 tokens: no row
        ],
        "doc_id long, text string",
    )
    got = {r.id: (r.top_gram_frac, r.n_grams) for r in
           repetition_scores(df, "doc_id", "text", n=2).collect()}
    assert got[1] == (1.0, 5)
    assert got[2][0] == 1.0 / 5 and got[2][1] == 5
    assert 3 not in got


def test_fixed_histogram_merge_invariant_and_error_bound(spark, sf_dir):
    """Sketch-of-union == sum-of-sketches (exact, the mergeability
    contract), and every quantile estimate lands within one bin width of
    the exact percentile (the monitoring-histogram guarantee)."""
    from prajna_spark.operators.sketch_rollup import (
        fixed_histogram,
        histogram_quantiles,
    )
    from prajna_spark.sources import load_table

    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    lo, hi, nb = 0.0, 1000.0, 100
    width = (hi - lo) / nb

    whole = fixed_histogram(ev, ["event_type"], "value", lo, hi, nb)
    h1 = fixed_histogram(
        ev.where(F.col("value") < 50), ["event_type"], "value", lo, hi, nb
    )
    h2 = fixed_histogram(
        ev.where(F.col("value") >= 50), ["event_type"], "value", lo, hi, nb
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    qs = [0.5, 0.95, 0.99]
    est = {
        (r.event_type, r.q): r.est
        for r in histogram_quantiles(whole, ["event_type"], qs, lo, hi, nb).collect()
    }
    # The sketch's guarantee is vs the ORDER STATISTIC it targets (the
    # smallest k with k >= q*N, under the same fp target), NOT vs the
    # interpolated percentile — in a sparse tail, adjacent order stats
    # can be many bin widths apart, and the sketch answers "smallest v
    # with count(<= v) >= q*N" to within one bin.
    import math

    by_type: dict[str, list[float]] = {}
    for r in ev.collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        vals.sort()
        for q in qs:
            k = math.ceil(q * len(vals))
            target_stat = vals[k - 1]
            assert abs(est[(t, q)] - target_stat) <= width, (
                t, q, est[(t, q)], target_stat,
            )


# --------------------------------------------------------------------------
# KMV sketch: exact merge invariant, below-k exactness, estimator accuracy
# --------------------------------------------------------------------------


def _kmv_events(spark, n=4000, users=700, hours=6, seed=13):
    import random

    rng = random.Random(seed)
    rows = [
        (rng.randrange(hours) * 3600 + rng.randrange(3600),
         "e%d" % rng.randrange(2),
         rng.randrange(users))
        for _ in range(n)
    ]
    return rows, spark.createDataFrame(rows, "t long, event_type string, user_id long")


def test_kmv_merge_invariant_is_exact(spark):
    """merge(finer partials) == partials built at the coarse width
    directly — EXACT sketch equality, the property that makes the finest
    level a sufficient statistic (cf. the HLL invariant, which is only
    library-exact; this one is arithmetic)."""
    from prajna_spark.operators.sketch_rollup import kmv_merge, kmv_partials

    _, df = _kmv_events(spark)
    fine = kmv_partials(df, "t", ["event_type"], "user_id", 3600, k=16)
    merged = {
        (r["event_type"], r["epoch_start"]): r["sketch"]
        for r in kmv_merge(fine, ["event_type"], 7200, k=16).collect()
    }
    direct = {
        (r["event_type"], r["epoch_start"]): r["sketch"]
        for r in kmv_partials(df, "t", ["event_type"], "user_id", 7200, k=16).collect()
    }
    assert merged == direct and merged


def test_kmv_estimate_exact_below_k(spark):
    from prajna_spark.operators.sketch_rollup import kmv_estimate, kmv_partials

    rows, df = _kmv_events(spark, n=300, users=40)
    sk = kmv_partials(df, "t", ["event_type"], "user_id", 86400, k=64)
    got = {r["event_type"]: r for r in kmv_estimate(sk, k=64).collect()}
    for et in ("e0", "e1"):
        exact = len({u for t, e, u in rows if e == et})
        assert exact < 64
        assert got[et]["n_kept"] == exact
        assert got[et]["approx_distinct"] == float(exact)


def test_kmv_estimate_accuracy_above_k(spark):
    """Bar-Yossef estimator stderr is ~1/sqrt(k-2) (~12.7% at k=64);
    assert a loose 4-sigma envelope so the test is stable, and that the
    sketch is full (n_kept == k) in the estimation regime."""
    from prajna_spark.operators.sketch_rollup import kmv_estimate, kmv_partials

    rows, df = _kmv_events(spark, n=20000, users=3000, hours=1)
    sk = kmv_partials(df, "t", [], "user_id", 86400, k=64)
    r = kmv_estimate(sk, k=64).collect()[0]
    exact = len({u for _, _, u in rows})
    assert r["n_kept"] == 64
    assert abs(r["approx_distinct"] - exact) / exact < 0.5


def test_kmv_shuffle_carries_only_k_per_group_per_partition(spark):
    """WindowGroupLimit discipline: the rank stage must carry a partial
    pre-shuffle limit so a hot bucket never funnels all its hashes
    through one task."""
    from prajna_spark.operators.sketch_rollup import kmv_partials
    from prajna_spark.plans.inspect import executed_plan_str

    _, df = _kmv_events(spark)
    plan = executed_plan_str(kmv_partials(df, "t", ["event_type"], "user_id", 3600, k=16))
    assert "WindowGroupLimit" in plan and "Partial" in plan


# --------------------------------------------------------------------------
# Count-min sketch: one-sided error, cellwise-additive merge, bounded size
# --------------------------------------------------------------------------


def _cm_df(spark, seed=7, n=3000, keys=40):
    import random

    rng = random.Random(seed)
    rows = [(rng.randrange(keys),) for _ in range(n)]
    return rows, spark.createDataFrame(rows, "k long")


def test_cm_estimate_never_underestimates(spark):
    from collections import Counter

    from prajna_spark.pipeline.heavyhitters import cm_estimate, cm_sketch

    rows, df = _cm_df(spark)
    true = Counter(k for (k,) in rows)
    sk = cm_sketch(df, "k", w=64, d=3)
    est = {r["k"]: r["est"] for r in cm_estimate(sk, df, "k", w=64, d=3).collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # 40 keys in 64 buckets: the min over 3 rows keeps most keys exact
    exact = sum(1 for k in true if est[k] == true[k])
    assert exact >= len(true) * 0.8


def test_cm_merge_is_cellwise_addition(spark):
    from prajna_spark.pipeline.heavyhitters import cm_sketch

    rows, df = _cm_df(spark)
    a, b = df.randomSplit([0.5, 0.5], seed=1)
    merged = (
        cm_sketch(a, "k", w=32, d=2)
        .unionAll(cm_sketch(b, "k", w=32, d=2))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cm_sketch(df, "k", w=32, d=2)
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    want = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    assert got == want


def test_cm_sketch_size_is_bounded(spark):
    from prajna_spark.pipeline.heavyhitters import cm_sketch

    _, df = _cm_df(spark, n=5000, keys=500)
    sk = cm_sketch(df, "k", w=16, d=4).collect()
    assert len(sk) <= 16 * 4
    assert sum(r["cnt"] for r in sk) == 5000 * 4  # every row lands in every hash row


def test_source_overlap_matrix_detects_planted_overlap(spark):
    """Sources A/B share half their docs; C is disjoint — the KMV matrix
    must rank (A,B) high and (A,C)/(B,C) at zero, with exact numbers in
    the below-k regime."""
    from prajna_spark.pipeline.dedup import source_overlap_kmv

    shared = [f"shared document number {i} with unique text" for i in range(20)]
    rows = (
        [("A", t) for t in shared]
        + [("A", f"only in a {i}") for i in range(20)]
        + [("B", t) for t in shared]
        + [("B", f"only in b {i}") for i in range(20)]
        + [("C", f"only in c {i}") for i in range(40)]
    )
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): (r["jaccard_est"], r["inter_est"])
        for r in source_overlap_kmv(df, "source", "text", k=64).collect()
    }
    # |A|=|B|=40 distinct, |A∩B|=20, |A∪B|=60 -> J=1/3 exactly (below k)
    j, inter = got[("A", "B")]
    assert abs(j - 20 / 60) < 1e-6 and abs(inter - 20.0) < 1e-4  # 6-dec rounding
    assert got[("A", "C")] == (0.0, 0.0) and got[("B", "C")] == (0.0, 0.0)
