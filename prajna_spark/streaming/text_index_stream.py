"""Streaming inverted-index maintenance — continuous document ingest into
a live lexical search layout.

The lexical twin of ``streaming.ann_stream``: micro-batches of documents
are tokenized into postings (doc_id, term, tf, dl) and APPENDED under
``bucket=<term-hash>/ingest_batch=<batch_id>/`` with dynamic partition
overwrite, so a replayed batch overwrites exactly its own leaves
(idempotent at-least-once delivery, same contract as append_ivf_batch).

Two deliberate differences from the static ``retrieval.build_text_index``
layout, both because corpus-GLOBAL quantities go stale under appends:

- document frequency is NOT stored per posting; the live search derives
  df from the (query-term-pruned) postings at probe time — pruned first,
  so the df aggregation touches only matching postings, not the index;
- corpus stats are maintained MERGEABLY: each batch writes one
  (n_docs, sum_dl) row under ``stats/ingest_batch=<id>/``; search sums
  this tiny table and derives avgdl = sum_dl / n_docs.

Result: search over the live index equals a fresh batch build over the
same documents at ANY drain point (tested) — the index is never stale,
only smaller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from prajna_spark.pipeline.retrieval import (
    BM25_B,
    BM25_K1,
    doc_postings,
    rank_topk,
    score_postings,
)
from prajna_spark.pipeline import textqa


def append_text_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Tokenize one micro-batch into postings and write them under
    ``bucket=*/ingest_batch=<batch_id>/``, plus the batch's mergeable
    corpus-stats row. Re-running with the same batch is an overwrite of
    its own leaves — replay-safe."""
    p = doc_postings(batch_df, id_col, text_col).withColumn(
        "bucket", F.pmod(F.hash("term"), F.lit(n_buckets))
    )
    (
        p.withColumn("ingest_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket", "ingest_batch")
        .parquet(f"{index_path}/postings")
    )
    stats = batch_df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(textqa.token_count(F.col(text_col))).cast("long").alias("sum_dl"),
    )
    (
        stats.withColumn("ingest_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(f"{index_path}/stats")
    )


def start_incremental_text_index(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint_path: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously feed the live index from a document stream."""

    def append(batch_df: DataFrame, batch_id: int) -> None:
        append_text_batch(
            batch_df, batch_id, index_path, n_buckets, id_col, text_col
        )

    writer = stream_docs.writeStream.foreachBatch(append).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def search_live_text_index(
    spark,
    index_path: str,
    query_terms: DataFrame,
    k: int = 10,
    n_buckets: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """BM25 top-k over the live layout: probe join prunes to the query
    terms' buckets, df is aggregated from the PRUNED postings (correct at
    any drain point), and corpus stats are the sum of the per-batch
    mergeable rows. Identical scoring arithmetic to ``bm25_scores``."""
    postings = spark.read.parquet(f"{index_path}/postings")
    stats = (
        spark.read.parquet(f"{index_path}/stats")
        .agg(
            F.sum("n_docs").cast("double").alias("n_docs"),
            (F.sum("sum_dl").cast("double") / F.sum("n_docs").cast("double")).alias(
                "avgdl"
            ),
        )
    )
    qt = query_terms.withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
    pruned = postings.join(F.broadcast(qt), ["bucket", "term"])
    dfreq = pruned.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = pruned.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    return rank_topk(score_postings(scored, k1, b, score_decimals), k)
