"""persist_scope: operators that cache internally release on scope exit.

Assertions track the SPECIFIC cached-RDD ids created inside the scope —
comparing raw counts races with the async ContextCleaner collecting other
tests' leftover caches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.dset import DSet
from prajna_spark.operators.lifecycle import persist_scope, scoped_persist
from prajna_spark.operators.rollup_cascade import cascade_rollup
from prajna_spark.operators.zipindex import zip_with_index


def _cached_ids(spark) -> set[int]:
    return {
        info.id() for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_cascade_rollup_releases_on_scope_exit(spark):
    base = _cached_ids(spark)
    ev = spark.range(1000).selectExpr(
        "id * 60 AS ts", "CAST(id % 3 AS STRING) AS k", "CAST(id AS DOUBLE) AS v"
    )
    with persist_scope():
        out = cascade_rollup(ev, "ts", ["k"], "v", [3600, 86400])
        assert out.count() > 0
        created = _cached_ids(spark) - base
        assert created  # levels really were cached
    assert not (_cached_ids(spark) & created)  # ...and really were released


def test_bypass_and_zipindex_release_on_scope_exit(spark):
    base = _cached_ids(spark)
    with persist_scope():
        a, b = DSet(spark.range(100).selectExpr("id", "id % 5 AS k")).bypass(2)
        assert a.count() == 100 and b.count() == 100
        idx = zip_with_index(spark.range(50).toDF("x"), ["x"])
        assert idx.count() == 50
        created = _cached_ids(spark) - base
        assert created
    assert not (_cached_ids(spark) & created)


def test_unscoped_persist_is_session_owned(spark):
    """Outside a scope nothing changes: the cache stays until unpersist."""
    base = _cached_ids(spark)
    df = scoped_persist(spark.range(10).toDF("x"))
    try:
        df.count()
        created = _cached_ids(spark) - base
        assert len(created) == 1
    finally:
        df.unpersist(blocking=True)
    assert not (_cached_ids(spark) & created)


def test_scopes_nest_independently(spark):
    base = _cached_ids(spark)
    with persist_scope():
        outer = scoped_persist(spark.range(10).toDF("x"))
        outer.count()
        outer_ids = _cached_ids(spark) - base
        with persist_scope():
            inner = scoped_persist(spark.range(20).toDF("y"))
            inner.count()
            inner_ids = _cached_ids(spark) - base - outer_ids
            assert inner_ids
        assert not (_cached_ids(spark) & inner_ids)  # inner released
        assert outer_ids <= _cached_ids(spark)  # outer kept
    assert not (_cached_ids(spark) & outer_ids)


def test_release_local_checkpoint_actually_frees_blocks(spark):
    """Dataset.unpersist() is a silent no-op on localCheckpoint'd frames
    (the CacheManager never registered the checkpoint RDD) — probed here
    so an engine change flips the test, then release_local_checkpoint is
    asserted to truly free the blocks, including through a projection."""
    from prajna_spark.operators.lifecycle import release_local_checkpoint

    base = _cached_ids(spark)
    cp = spark.range(50).toDF("x").localCheckpoint(eager=True)
    created = _cached_ids(spark) - base
    assert created, "localCheckpoint should pin an RDD"
    cp.unpersist(blocking=True)
    assert created <= _cached_ids(spark), "engine change: unpersist works now"
    release_local_checkpoint(cp.select("x"), blocking=True)
    assert not (created & _cached_ids(spark))


def test_iterative_operators_leave_bounded_checkpoints(spark):
    """connected_components and pagerank release superseded generations
    and loop-invariant inputs: after a call, at most ONE new pinned RDD
    (the returned frame's own checkpoint) remains."""
    from prajna_spark.operators.lifecycle import release_local_checkpoint
    from prajna_spark.operators.pagerank import pagerank
    from prajna_spark.pipeline.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")

    base = _cached_ids(spark)
    cc = connected_components(edges, nodes)
    assert cc.count() == 6
    cc_new = _cached_ids(spark) - base
    assert len(cc_new) <= 1, f"CC left {len(cc_new)} pinned RDDs"
    release_local_checkpoint(cc, blocking=True)

    pr_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    base = _cached_ids(spark)
    pr = pagerank(pr_edges, n_iter=6)
    assert pr.count() == 4
    pr_new = _cached_ids(spark) - base
    assert len(pr_new) <= 1, f"pagerank left {len(pr_new)} pinned RDDs"
    release_local_checkpoint(pr, blocking=True)


def test_scope_exit_tolerates_concurrent_removal(spark, caplog):
    """Under periodic GC the ContextCleaner can race scope exit's
    blocking unpersist ("Block rdd_N_M does not exist" from the
    removeRdd RPC, observed live at 100x) — a query whose work
    succeeded must not fail in cleanup. The tolerant release retries
    non-blocking, then swallows. Only the KNOWN race is silent: any
    other failure must leave a warning signal (r10 advisory — a dead
    gateway leaving storage above baseline used to be invisible)."""
    import logging

    from prajna_spark.operators.lifecycle import _release_tolerant

    calls = []

    def racy_release(blocking):
        calls.append(blocking)
        if blocking:
            raise RuntimeError("Block rdd_9_9 does not exist")

    with caplog.at_level(logging.WARNING, "prajna_spark.operators.lifecycle"):
        _release_tolerant(racy_release)  # must not raise
    assert calls == [True, False]
    assert not caplog.records, "the known race must stay silent"

    def always_fails(blocking):
        calls.append(blocking)
        raise RuntimeError("gone")

    calls.clear()
    caplog.clear()
    with caplog.at_level(logging.WARNING, "prajna_spark.operators.lifecycle"):
        _release_tolerant(always_fails)  # still must not raise
    assert calls == [True, False]
    # unknown blocking failure + failed retry -> two warning signals
    assert len(caplog.records) == 2
    assert "retrying non-blocking" in caplog.records[0].getMessage()
    assert "gone" in caplog.records[1].getMessage()

    # and the happy path stays blocking-only and silent
    calls.clear()
    caplog.clear()
    _release_tolerant(lambda b: calls.append(b))
    assert calls == [True]
    assert not caplog.records


def test_scoped_local_checkpoint_blocks_are_serialized(spark):
    # localCheckpoint's JVM default caches DESERIALIZED row objects whose
    # block sizes are only estimated — the 100x kcore OOM (r9). The
    # helper must pin the serialized level so blocks are exact byte
    # buffers the memory manager can account and evict.
    from prajna_spark.operators.lifecycle import (
        persist_scope,
        scoped_local_checkpoint,
    )

    with persist_scope():
        c = scoped_local_checkpoint(spark.range(0, 1000, 1, 4))
        # the cached RDD is the LogicalRDD leaf the checkpoint planted
        # (c._jdf.rdd() would be a fresh uncached derivation of the plan)
        leaves = c._jdf.queryExecution().analyzed().collectLeaves()
        rdds = [
            leaves.apply(i).rdd()
            for i in range(leaves.size())
            if leaves.apply(i).getClass().getSimpleName() == "LogicalRDD"
        ]
        assert rdds, "checkpoint must plant a LogicalRDD leaf"
        lvl = rdds[0].getStorageLevel()
        assert lvl.useMemory() and lvl.useDisk()
        assert not lvl.deserialized(), (
            "checkpoint blocks must be SERIALIZED (exact accounting)"
        )
        assert c.count() == 1000
