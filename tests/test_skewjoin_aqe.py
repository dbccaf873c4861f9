"""AQE skew-join vs manual salting — when do users need operators/salt.py?

session.py enables ``spark.sql.adaptive.skewJoin``: for SHUFFLE joins, AQE
detects an oversized post-shuffle partition at runtime and splits it across
tasks, so a zipfian probe key does not serialize the join. This test
demonstrates that path end-to-end on a hot-key fixture (mirroring
test_asof.py's) and pins the contract:

- the final adaptive plan really took the skew path (``skew=true`` on the
  sort-merge join), i.e. the demonstration isn't vacuously passing on a
  broadcast plan;
- the skew-split results EQUAL the manually salted spelling
  (operators.salt.salted_broadcast_join) and the plain join.

Manual salting remains for the cases AQE cannot fix (documented in
operators/salt.py): hot keys in large-state hash AGGREGATES, and broadcast
joins where one probe partition is hot before any shuffle exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prajna_spark.operators.salt import salted_broadcast_join

# AQE skew defaults target 256MB partitions; scale thresholds down so a
# local-size fixture (one ~MB hot partition vs ~KB medians) trips the
# same code path a TB-scale hot key would in production.
_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16384",
    # A skew split breaks the join output's hash-partitioning guarantee,
    # so by default AQE SKIPS it when a downstream operator (here: the
    # groupBy on a superset of the join key) would reuse that
    # partitioning. force= accepts the extra reshuffle to split anyway —
    # the right trade whenever the hot partition dwarfs the re-shuffle
    # (always true for real skew). Without this conf, a join feeding an
    # aggregate on its own key silently stays skewed — the main practical
    # reason users still reach for operators/salt.py.
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture()
def skew_session(spark):
    saved = {}
    for k, v in _SKEW_CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _fixture(spark):
    # ~91% of probe rows share key 0 — one post-shuffle partition is ~10x
    # the rest combined; dims have 64 distinct keys with attributes.
    probe = spark.range(0, 220_000).select(
        F.when(F.col("id") % 11 < 10, F.lit(0))
        .otherwise(F.col("id") % 64)
        .alias("k"),
        (F.col("id") * 3 % 997).alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    build = spark.range(0, 64).select(
        F.col("id").alias("k"), F.concat(F.lit("tag_"), F.col("id")).alias("tag")
    )
    return probe, build


def test_aqe_splits_the_skewed_join_and_matches_salted(skew_session):
    spark = skew_session
    probe, build = _fixture(spark)

    joined = probe.join(build, "k").groupBy("k", "tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    rows_aqe = {(r.k, r.tag): (r.n, r.sv) for r in joined.collect()}

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # the hot partition was detected and split at runtime — the SMJ node is
    # marked skew=true in the final adaptive plan
    assert "skew=true" in plan, plan

    salted = salted_broadcast_join(probe, build, ["k"]).groupBy("k", "tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    rows_salted = {(r.k, r.tag): (r.n, r.sv) for r in salted.collect()}
    assert rows_aqe == rows_salted
    assert len(rows_aqe) == 64
    # hot key really was hot (fixture sanity): ~10/11 of all probe rows
    assert rows_aqe[(0, "tag_0")][0] >= 200_000
