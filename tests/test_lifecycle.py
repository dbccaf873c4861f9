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
