"""persist_scope: operators that cache internally release on scope exit."""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.dset import DSet
from prajna_spark.operators.lifecycle import persist_scope, scoped_persist
from prajna_spark.operators.rollup_cascade import cascade_rollup
from prajna_spark.operators.zipindex import zip_with_index


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_cascade_rollup_releases_on_scope_exit(spark):
    base = _n_cached(spark)
    ev = spark.range(1000).selectExpr(
        "id * 60 AS ts", "CAST(id % 3 AS STRING) AS k", "CAST(id AS DOUBLE) AS v"
    )
    with persist_scope():
        out = cascade_rollup(ev, "ts", ["k"], "v", [3600, 86400])
        n = out.count()
        assert n > 0
        assert _n_cached(spark) > base  # levels really were cached
    assert _n_cached(spark) == base  # ...and really were released


def test_bypass_and_zipindex_release_on_scope_exit(spark):
    base = _n_cached(spark)
    with persist_scope():
        a, b = DSet(spark.range(100).selectExpr("id", "id % 5 AS k")).bypass(2)
        assert a.count() == 100 and b.count() == 100
        idx = zip_with_index(spark.range(50).toDF("x"), ["x"])
        assert idx.count() == 50
        assert _n_cached(spark) > base
    assert _n_cached(spark) == base


def test_unscoped_persist_is_session_owned(spark):
    """Outside a scope nothing changes: the cache stays until unpersist."""
    base = _n_cached(spark)
    df = scoped_persist(spark.range(10).toDF("x"))
    try:
        df.count()
        assert _n_cached(spark) == base + 1
    finally:
        df.unpersist(blocking=True)
    assert _n_cached(spark) == base


def test_scopes_nest_independently(spark):
    base = _n_cached(spark)
    with persist_scope():
        outer = scoped_persist(spark.range(10).toDF("x"))
        outer.count()
        with persist_scope():
            inner = scoped_persist(spark.range(20).toDF("y"))
            inner.count()
            assert _n_cached(spark) == base + 2
        assert _n_cached(spark) == base + 1  # inner released, outer kept
    assert _n_cached(spark) == base
