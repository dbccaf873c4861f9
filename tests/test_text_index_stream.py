"""Streaming inverted-index maintenance: live search == fresh batch build
at any drain point, replay idempotency, and mid-ingest consistency of the
derived df / mergeable corpus stats (mirrors test_ivf_index's streamed
tier for the lexical index).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.pipeline import retrieval
from prajna_spark.sources import load_table
from prajna_spark.streaming.text_index_stream import (
    append_text_batch,
    search_live_text_index,
    start_incremental_text_index,
)

QT = [("q_hash", "hash"), ("q_hash", "join"), ("q_rare", "dup")]


def _qt(spark):
    return spark.createDataFrame(QT, "query_id string, term string")


def test_streamed_build_matches_from_scratch_bm25(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    src = str(tmp_path / "doc_src")
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(src, mode="overwrite")
    docs.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    idx = str(tmp_path / "tidx_stream")
    q = start_incremental_text_index(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = sorted(
        map(tuple, search_live_text_index(spark, idx, _qt(spark), k=10).collect())
    )
    want = sorted(
        map(
            tuple,
            retrieval.bm25_topk(docs, _qt(spark), k=10)
            .select("query_id", "doc_id", "score", "rk")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_append_is_idempotent_and_consistent_mid_ingest(spark, sf_dir, tmp_path):
    """A replayed batch is a no-op; after EACH batch the live search
    equals a from-scratch BM25 over exactly the documents ingested so far
    (df and corpus stats are derived, so the index is never stale)."""
    docs = load_table(spark, "documents", sf_dir)
    idx = str(tmp_path / "tidx_replay")
    half0 = docs.where(F.col("doc_id") % 2 == 0)
    half1 = docs.where(F.col("doc_id") % 2 == 1)

    append_text_batch(half0, 0, idx)
    mid = sorted(
        map(tuple, search_live_text_index(spark, idx, _qt(spark), k=10).collect())
    )
    mid_want = sorted(
        map(
            tuple,
            retrieval.bm25_topk(half0, _qt(spark), k=10)
            .select("query_id", "doc_id", "score", "rk")
            .collect(),
        )
    )
    assert mid == mid_want

    n_postings = spark.read.parquet(f"{idx}/postings").count()
    append_text_batch(half0, 0, idx)  # replayed delivery
    assert spark.read.parquet(f"{idx}/postings").count() == n_postings
    assert sorted(
        map(tuple, search_live_text_index(spark, idx, _qt(spark), k=10).collect())
    ) == mid

    append_text_batch(half1, 1, idx)
    full = sorted(
        map(tuple, search_live_text_index(spark, idx, _qt(spark), k=10).collect())
    )
    full_want = sorted(
        map(
            tuple,
            retrieval.bm25_topk(docs, _qt(spark), k=10)
            .select("query_id", "doc_id", "score", "rk")
            .collect(),
        )
    )
    assert full == full_want
