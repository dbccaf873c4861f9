"""Empty-input robustness: the round-5 operators must return empty
results (correct schemas, no exceptions) on empty frames — the shape a
partition-pruned or fully-filtered input produces in production.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.pagerank import pagerank
from prajna_spark.pipeline import heavyhitters, retrieval
from prajna_spark.pipeline.dedup import sorted_neighborhood_pairs


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_bm25_on_empty_corpus(spark):
    qt = spark.createDataFrame([("q", "apple")], "query_id string, term string")
    out = retrieval.bm25_topk(_empty_docs(spark), qt, k=5)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "doc_id", "score", "rk"}


def test_bm25_with_empty_query_set(spark):
    docs = spark.createDataFrame([(1, "apple pie")], "doc_id long, text string")
    qt = spark.createDataFrame([], "query_id string, term string")
    assert retrieval.bm25_topk(docs, qt, k=5).count() == 0


def test_rrf_on_empty_ranked_lists(spark):
    empty = spark.createDataFrame([], "query_id string, doc_id long, rk long")
    assert retrieval.rrf_fuse([empty, empty]).count() == 0


def test_heavy_hitters_on_empty_frame(spark):
    df = spark.createDataFrame([], "key string")
    out = heavyhitters.heavy_hitters_exact(df, "key", phi=0.5)
    assert out.count() == 0


def test_pagerank_on_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges, n_iter=2)
    assert out.count() == 0
    assert set(out.columns) == {"node_id", "pr"}


def test_sorted_neighborhood_on_empty_and_singleton(spark):
    empty = spark.createDataFrame([], "rid long, k string")
    assert sorted_neighborhood_pairs(empty, "rid", "k", window=3).count() == 0
    one = spark.createDataFrame([(1, "a")], "rid long, k string")
    assert sorted_neighborhood_pairs(one, "rid", "k", window=3).count() == 0


def test_hashed_tf_on_empty_and_empty_text(spark):
    assert retrieval.hashed_tf_features(_empty_docs(spark)).count() == 0
    blank = spark.createDataFrame([(1, "  !!  ")], "doc_id long, text string")
    # normalization strips everything -> zero tokens -> zero buckets
    assert retrieval.hashed_tf_features(blank).count() == 0


def test_scd2_on_empty_frame(spark):
    from prajna_spark.operators.intervals import scd2_intervals

    df = spark.createDataFrame([], "k long, t long, s string")
    out = scd2_intervals(df, ["k"], "s", "t")
    assert out.count() == 0
    assert {"effective_from", "effective_to", "version", "is_current"} <= set(
        out.columns
    )


def test_max_concurrency_on_empty_frame(spark):
    from prajna_spark.operators.intervals import max_concurrency

    df = spark.createDataFrame([], "k long, s long, e long")
    out = max_concurrency(df, ["k"], "s", "e")
    assert out.count() == 0
    assert set(out.columns) == {"k", "max_concurrent", "first_peak_t"}
