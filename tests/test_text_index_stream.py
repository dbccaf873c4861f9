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


def test_null_text_docs_keep_live_equal_to_batch(spark, tmp_path):
    """avgdl divides by docs WITH text on both paths (batch F.avg skips
    NULLs); idf's N counts every doc on both paths. A NULL-text doc must
    therefore shift scores identically in the live and batch builds."""
    docs = spark.createDataFrame(
        [
            (1, "hash join hash", "en", "s", 14),
            (2, "dup dup", "en", "s", 7),
            (3, None, "en", "s", 0),
            (4, "hash", "en", "s", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    idx = str(tmp_path / "tidx_null")
    append_text_batch(docs, 0, idx)
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


def test_search_on_just_started_index_is_empty_not_a_crash(spark, tmp_path):
    """A stream that has started but ingested nothing (idle source /
    empty first batch) must answer searches with zero rows — the same
    result as a fresh batch build over zero documents."""
    src = str(tmp_path / "empty_src")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame([], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    idx = str(tmp_path / "tidx_empty")
    q = start_incremental_text_index(stream, idx, str(tmp_path / "ckpt_empty"))
    q.awaitTermination()
    out = search_live_text_index(spark, idx, _qt(spark), k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "doc_id",
        "score",
        "rk",
    ]
