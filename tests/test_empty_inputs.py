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


def test_pq_trained_on_empty_and_tiny_corpus(spark):
    """pq_codebook_trained degrades like kmeans: fewer-than-k vectors
    train fewer entries; an EMPTY corpus yields an empty codebook and
    pq_encode raises cleanly rather than emitting garbage codes."""
    import pytest

    from prajna_spark.pipeline.pq import pq_codebook_trained, pq_encode

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    cb = pq_codebook_trained(empty, dim=16, m=4, k=8, n_iter=1)
    assert [len(s) for s in cb] == [0, 0, 0, 0]
    with pytest.raises(Exception):  # no codebook entries to encode against
        pq_encode(empty, cb).collect()

    tiny = spark.createDataFrame(
        [(0, [float(i) for i in range(16)]), (1, [float(i + 1) for i in range(16)])],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebook_trained(tiny, dim=16, m=4, k=8, n_iter=2)
    assert [len(s) for s in cb] == [2, 2, 2, 2]
    enc = pq_encode(tiny, cb).collect()
    assert sorted(r.vec_id for r in enc) == [0, 1]
    assert all(r.recon_err == 0.0 for r in enc)  # 2 vectors self-code


def test_png_meta_on_empty_docs(spark):
    from prajna_spark.pipeline.multimodal import decode_png_meta, synthesize_png

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = decode_png_meta(synthesize_png(empty))
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "width", "height", "bit_depth", "color_type", "gray_sum",
    }


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
