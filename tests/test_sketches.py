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
