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
