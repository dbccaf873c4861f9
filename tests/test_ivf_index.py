"""Persisted IVF index: partition layout, dynamic partition pruning, and
exact agreement with the in-memory operator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from prajna_spark.pipeline.similarity import (
    build_ivf_index,
    knn_ivf,
    search_ivf_index,
)
from prajna_spark.sources import load_table


def _setup(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    cents = emb.where(F.col("vec_id") < 16)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, cents, path)
    return emb, cents, path


def test_index_layout_is_partitioned_by_centroid(spark, sf_dir, tmp_path):
    emb, cents, path = _setup(spark, sf_dir, tmp_path)
    parts = [d for d in os.listdir(path) if d.startswith("centroid_id=")]
    assert len(parts) > 1  # one directory per inverted list
    # every vector is in exactly one cell
    assert spark.read.parquet(path).count() == emb.count()


def test_search_matches_in_memory_operator(spark, sf_dir, tmp_path):
    emb, cents, path = _setup(spark, sf_dir, tmp_path)
    queries = emb.where(F.col("vec_id") < 5)
    expect = sorted(
        map(tuple, knn_ivf(emb, queries, cents, k=10, nprobe=4).collect())
    )
    got = sorted(
        map(
            tuple,
            search_ivf_index(spark, path, queries, cents, k=10, nprobe=4).collect(),
        )
    )
    assert got == expect


def test_search_plan_prunes_partitions_dynamically(spark, sf_dir, tmp_path):
    emb, cents, path = _setup(spark, sf_dir, tmp_path)
    queries = emb.where(F.col("vec_id") < 5)
    out = search_ivf_index(spark, path, queries, cents, k=10, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index scan carries a runtime pruning predicate on the partition
    # column — I/O is bounded by the probed cells, not the index size
    assert "dynamicpruning" in plan.lower()


def test_streamed_index_build_matches_batch_build(spark, sf_dir, tmp_path):
    """Draining a vector stream through start_incremental_ivf yields an
    index whose search results EQUAL the batch-built index's — appends
    commute (assignment is row-local, search reads whole cells), so the
    index can be fed continuously without a rebuild."""
    from prajna_spark.streaming.ann_stream import start_incremental_ivf

    emb = load_table(spark, "embeddings", sf_dir)
    cents = emb.where(F.col("vec_id") < 16)
    src = str(tmp_path / "vec_src")
    # two source files -> at least one multi-file drain through the sink
    emb.where(F.col("vec_id") % 2 == 0).write.parquet(src, mode="overwrite")
    emb.where(F.col("vec_id") % 2 == 1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    ).parquet(src)
    streamed_path = str(tmp_path / "ivf_streamed")
    q = start_incremental_ivf(
        stream, cents, streamed_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert spark.read.parquet(streamed_path).count() == emb.count()

    batch_path = str(tmp_path / "ivf_batch")
    build_ivf_index(emb, cents, batch_path)
    queries = emb.where(F.col("vec_id") < 5)
    got = sorted(map(tuple, search_ivf_index(
        spark, streamed_path, queries, cents, k=10, nprobe=4).collect()))
    want = sorted(map(tuple, search_ivf_index(
        spark, batch_path, queries, cents, k=10, nprobe=4).collect()))
    assert got == want and len(got) == 50


def test_streamed_append_is_idempotent_under_replay(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: a micro-batch can be re-delivered
    after its write committed but before the checkpoint recorded it.
    append_ivf_batch writes under ingest_batch=<id> leaves with dynamic
    partition overwrite, so a replay rewrites its own leaves instead of
    appending duplicates — and a genuinely new batch still appends."""
    from prajna_spark.streaming.ann_stream import append_ivf_batch

    emb = load_table(spark, "embeddings", sf_dir)
    cents = emb.where(F.col("vec_id") < 16)
    path = str(tmp_path / "ivf_replay")
    b0 = emb.where(F.col("vec_id") % 2 == 0)
    b1 = emb.where(F.col("vec_id") % 2 == 1)

    append_ivf_batch(b0, 0, cents, path)
    n_after_first = spark.read.parquet(path).count()
    append_ivf_batch(b0, 0, cents, path)  # replayed delivery
    assert spark.read.parquet(path).count() == n_after_first == b0.count()

    append_ivf_batch(b1, 1, cents, path)  # a new batch still appends
    assert spark.read.parquet(path).count() == emb.count()

    # replay must not have corrupted search: matches a batch-built index
    batch_path = str(tmp_path / "ivf_batch_ref")
    build_ivf_index(emb, cents, batch_path)
    queries = emb.where(F.col("vec_id") < 5)
    got = sorted(map(tuple, search_ivf_index(
        spark, path, queries, cents, k=10, nprobe=4).collect()))
    want = sorted(map(tuple, search_ivf_index(
        spark, batch_path, queries, cents, k=10, nprobe=4).collect()))
    assert got == want


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    """Dequantized codes reconstruct components within scale/2 (the
    symmetric-quantization error bound); codes stay in [-127, 127]; a zero
    vector quantizes to zeros with scale 0."""
    from prajna_spark.pipeline.similarity import quantize_int8

    rows = [
        (1, [0.5, -1.0, 0.25, 127.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [-3.5, 2.0, 1e-4, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.q8_scale, list(r.q8)) for r in
           quantize_int8(df, "embedding").collect()}

    assert got[2] == (0.0, [0, 0, 0, 0])
    for vid, vec in [(1, rows[0][1]), (3, rows[2][1])]:
        scale, codes = got[vid]
        assert all(-127 <= c <= 127 for c in codes)
        for x, c in zip(vec, codes):
            assert abs(c * scale - x) <= scale / 2 + 1e-12


def test_ivf_assign_tie_breaks_to_lowest_centroid_id(spark):
    # r12 single-traversal fold in _cell_expr: on EXACT rounded-cosine
    # ties the lowest centroid id must win (the former
    # array_position(array_max) first-maximum contract).
    from prajna_spark.pipeline.similarity import ivf_assign

    vecs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(3, [2.0, 0.0]), (7, [2.0, 0.0]), (5, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.centroid_id for r in ivf_assign(vecs, cents).collect()}
    # vec 10 ties between centroids 3 and 7 (identical vectors): 3 wins
    assert got == {10: 3, 11: 5}
