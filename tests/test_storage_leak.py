"""Post-query storage cleanliness (r7 VERDICT item 4).

The r5 label-propagation edge-checkpoint leak shipped and survived TWO
rounds of green correctness gates because nothing asserted that a query
leaves executor storage empty: ``Dataset.unpersist()`` is a silent no-op
for localCheckpoint'd frames, so a forgotten release pins corpus-sized
blocks for the session lifetime and OOMs a LATER query's heap (found live
at 30x data). Two nets now exist:

- tools/determinism_check.py runs every catalog query under
  ``persist_scope`` and reports ``LEAK <name>`` if ``getPersistentRDDs``
  is non-empty after the scope closes — run pre-fix, it would have
  printed ``LEAK labelprop_part_communities: 1 persistent RDDs`` (the
  edge frame ``sym`` before labelprop.py released it);
- this suite asserts the MECHANISM: ``scoped_local_checkpoint`` registers
  checkpoints with the innermost ``persist_scope`` and scope exit
  actually frees the blocks (which plain unpersist cannot), the
  ``parent=True`` escape keeps a returned frame alive past its own
  function's scope, and the representative iterative operators leave
  storage empty end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import (
    persist_scope,
    scoped_local_checkpoint,
)


def _persistent_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_scope_releases_checkpoint_blocks(spark):
    before = _persistent_count(spark)
    with persist_scope():
        df = scoped_local_checkpoint(spark.range(1000).withColumn("x", F.lit(1)))
        assert df.count() == 1000
        assert _persistent_count(spark) > before  # blocks live inside
    assert _persistent_count(spark) == before  # released at exit


def test_unscoped_checkpoint_is_session_owned(spark):
    # outside any scope the behavior is plain localCheckpoint — the
    # session owns the blocks (one-shot jobs, the driver gate)
    before = _persistent_count(spark)
    df = scoped_local_checkpoint(spark.range(100))
    assert df.count() == 100
    assert _persistent_count(spark) > before
    from prajna_spark.operators.lifecycle import release_local_checkpoint

    release_local_checkpoint(df, blocking=True)
    assert _persistent_count(spark) == before


def test_parent_escape_survives_inner_scope(spark):
    """A checkpoint that materializes a function's return value inside
    that function's own scope must NOT be released at the inner exit —
    checkpointed frames cannot be recomputed (lineage truncated), so an
    inner-scope release would break the caller."""
    before = _persistent_count(spark)
    with persist_scope():  # the caller's scope
        with persist_scope():  # the function's own scope
            out = scoped_local_checkpoint(spark.range(500), parent=True)
        # inner scope closed: the frame must still be usable
        assert out.count() == 500
        assert _persistent_count(spark) > before
    # caller's scope closed: now it is released
    assert _persistent_count(spark) == before


def test_iterative_operators_leave_storage_empty(spark):
    """End-to-end: the operators whose loops checkpoint per round
    (the labelprop leak's family) leave getPersistentRDDs empty once the
    caller's scope closes — consumed INSIDE the scope, per contract."""
    from prajna_spark.operators.labelprop import label_propagation
    from prajna_spark.pipeline.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 6), (5, 4)], "src long, dst long"
    )
    nodes = edges.select(F.col("src").alias("nid")).unionAll(
        edges.select(F.col("dst").alias("nid"))
    ).distinct()

    before = _persistent_count(spark)
    with persist_scope():
        cc = connected_components(
            edges, nodes, id_col="nid", src_col="src", dst_col="dst"
        )
        assert cc.count() == 6
    assert _persistent_count(spark) == before

    with persist_scope():
        lp = label_propagation(edges, "src", "dst", n_iter=3)
        assert lp.count() > 0
    assert _persistent_count(spark) == before
