"""session.scale_shuffle_partitions — the data-adaptive pre-coalesce
shuffle granularity (round 7: the 30x graph fixture OOM'd the wedge
shuffle at the fixed 32-partition default; AQE can only coalesce DOWN
from initialPartitionNum, so the initial number is the dial that bounds
per-task working sets as data grows)."""

from __future__ import annotations

from prajna_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS,
    scale_shuffle_partitions,
    tune,
)

_CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def test_small_input_resolves_to_default(spark, sf_dir):
    # sf0.001 lineitem (~6k rows) -> floor -> the unchanged default, so
    # bench/oracle runs at small scale keep byte-identical plans
    parts = scale_shuffle_partitions(spark, sf_dir)
    assert parts == DEFAULT_SHUFFLE_PARTITIONS
    assert spark.conf.get(_CONF) == str(DEFAULT_SHUFFLE_PARTITIONS)


def test_granularity_scales_with_rows_and_caps(spark, sf_dir, tmp_path):
    # synthetic "big" table: footer metadata drives the estimate, so a
    # small physical frame with many rows models the 30x shape
    d = str(tmp_path / "big.parquet")
    spark.range(200_000).write.parquet(d)
    parts = scale_shuffle_partitions(
        spark, str(tmp_path), table="big", rows_per_partition=1_000
    )
    assert parts == 200  # 200k rows / 1k per partition
    assert spark.conf.get(_CONF) == "200"
    capped = scale_shuffle_partitions(
        spark, str(tmp_path), table="big", rows_per_partition=10, cap=64
    )
    assert capped == 64


def test_tune_resets_the_granularity(spark, sf_dir, tmp_path):
    # every catalog query calls tune() at entry — a prior query's raised
    # granularity must not leak into the next query's plans
    d = str(tmp_path / "big2.parquet")
    spark.range(100_000).write.parquet(d)
    scale_shuffle_partitions(
        spark, str(tmp_path), table="big2", rows_per_partition=1_000
    )
    assert spark.conf.get(_CONF) != str(DEFAULT_SHUFFLE_PARTITIONS)
    tune(spark)
    assert spark.conf.get(_CONF) == str(DEFAULT_SHUFFLE_PARTITIONS)


def test_missing_table_degrades_to_default(spark, tmp_path):
    parts = scale_shuffle_partitions(spark, str(tmp_path), table="nope")
    assert parts == DEFAULT_SHUFFLE_PARTITIONS


def test_docs_and_emb_loaders_are_default_scale_noops(spark):
    """The shared documents/embeddings loaders size the pre-coalesce
    granularity from their tables' footers (round 8: the 30x dedup-tier
    hunt) — at driver scales (sf0.1 and below) both must resolve to the
    unchanged default so bench/oracle plans stay byte-identical."""
    from prajna_spark.queries.text import _docs
    from prajna_spark.queries.vectors import _emb

    for loader in (_docs, _emb):
        loader(spark, "/root/testdata/sf0.1")
        assert spark.conf.get(_CONF) == str(DEFAULT_SHUFFLE_PARTITIONS)


def test_pq_codebook_training_owns_its_cache(spark, sf_dir):
    """pq_codebook_trained persists its exploded sub-vector frame; with
    no caller persist_scope active the function must release it itself
    (round-6 ADVICE: the old spelling leaked an n*m-row cache for the
    session)."""
    from prajna_spark.pipeline import pq
    from prajna_spark.sources import load_table

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    emb = load_table(spark, "embeddings", sf_dir)
    book = pq.pq_codebook_trained(emb, dim=64, m=8, k=16, n_iter=1)
    assert len(book) == 8 and len(book[0]) == 16
    assert jsc.getPersistentRDDs().size() == before


def test_session_unprotects_storage_memory(spark):
    # Round-8 100x find: kcore's corpus-sized edge checkpoint sat in the
    # eviction-PROTECTED storage region (storageFraction default 0.5) and
    # hard-OOM'd the 32 concurrent shuffle-hash tasks sharing a 24 GB
    # heap. Every cache this engine takes is spill-safe MEMORY_AND_DISK,
    # so the session factory must keep storage evictable: pressure costs
    # a disk write, never the executor (session.py get_spark).
    assert spark.conf.get("spark.memory.storageFraction") == "0.1"
