"""Streaming LSH index maintenance: live probe == batch band join at any
drain point, replay idempotency, empty-index bootstrap, and bucket-pruned
probe plan (mirrors test_text_index_stream for the dedup modality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.pipeline.dedup import lsh_band_rows
from prajna_spark.sources import load_table
from prajna_spark.streaming.lsh_stream import (
    append_lsh_batch,
    search_lsh_index,
    start_incremental_lsh,
)


def _batch_candidates(corpus, probes):
    """Reference: band collisions probes x corpus, self-matches out."""
    c = lsh_band_rows(corpus, "doc_id", "text", 4, 2)
    p = lsh_band_rows(probes, "doc_id", "text", 4, 2).select(
        F.col("id").alias("query_id"), "band_id", "band_val"
    )
    return (
        c.join(p, ["band_id", "band_val"])
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", F.col("id").alias("doc_id"))
        .distinct()
    )


def test_streamed_index_matches_batch_band_join(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    src = str(tmp_path / "doc_src")
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(src, mode="overwrite")
    docs.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    idx = str(tmp_path / "lsh_idx")
    q = start_incremental_lsh(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination()

    probes = docs.where(F.col("doc_id") < 30)
    got = sorted(map(tuple, search_lsh_index(spark, idx, probes).collect()))
    want = sorted(map(tuple, _batch_candidates(docs, probes).collect()))
    assert got == want and len(got) > 0


def test_append_is_idempotent_and_incremental(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    idx = str(tmp_path / "lsh_replay")
    half0 = docs.where(F.col("doc_id") % 2 == 0)
    half1 = docs.where(F.col("doc_id") % 2 == 1)
    probes = docs.where(F.col("doc_id") < 30)

    append_lsh_batch(half0, 0, idx)
    mid = sorted(map(tuple, search_lsh_index(spark, idx, probes).collect()))
    # mid-ingest: candidates against exactly the ingested half
    assert mid == sorted(map(tuple, _batch_candidates(half0, probes).collect()))

    append_lsh_batch(half0, 0, idx)  # replayed batch: same leaves, no dups
    assert mid == sorted(map(tuple, search_lsh_index(spark, idx, probes).collect()))

    append_lsh_batch(half1, 1, idx)
    full = sorted(map(tuple, search_lsh_index(spark, idx, probes).collect()))
    assert full == sorted(map(tuple, _batch_candidates(docs, probes).collect()))


def test_fresh_index_returns_empty_not_crash(spark, sf_dir, tmp_path):
    """A just-started stream (no batches drained) must answer searches
    with zero rows via the schema anchor."""
    docs = load_table(spark, "documents", sf_dir)
    src = str(tmp_path / "empty_src")
    docs.limit(0).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(src)
    idx = str(tmp_path / "lsh_fresh")
    q = start_incremental_lsh(stream, idx, str(tmp_path / "ckpt_fresh"))
    q.awaitTermination()
    assert search_lsh_index(spark, idx, docs.limit(5)).count() == 0


def test_probe_scan_prunes_to_probe_buckets(spark, sf_dir, tmp_path):
    """The probe join must reach the index through its bucket partition
    column (dynamic partition pruning on the broadcast probe side), so a
    probe touches O(probe bands) cells — assert the partition filter is
    present in the executed scan."""
    docs = load_table(spark, "documents", sf_dir)
    idx = str(tmp_path / "lsh_dpp")
    append_lsh_batch(docs, 0, idx)
    probes = docs.where(F.col("doc_id") < 3)
    plan = (
        search_lsh_index(spark, idx, probes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    assert "dynamicpruning" in plan or "bucket" in plan.split("PartitionFilters")[1][:200]
