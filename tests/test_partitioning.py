"""Partitioned layout: pruning reaches the file listing."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from prajna_spark.plans.inspect import explain_str
from prajna_spark.sources import load_table
from prajna_spark.sources.partitioning import read_partitioned, write_partitioned


def test_partition_pruning_hits_listing(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, "events", sf_dir)
    write_partitioned(ev, path, ["event_type"], sort_col="user_id")

    back = read_partitioned(spark, path)
    one = back.where(F.col("event_type") == "click")

    text = explain_str(one)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    assert m and "event_type" in m.group(1), f"no partition filter:\n{text}"
    # pruned scan must match the unpruned filter exactly
    assert one.count() == ev.where(F.col("event_type") == "click").count()


def test_partitioned_roundtrip_content(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_rt")
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )
    write_partitioned(ev, path, ["event_type"])
    back = read_partitioned(spark, path).select("event_id", "event_type", "value")
    assert back.count() == ev.count()
    a = {r.event_id: (r.event_type, r.value) for r in back.collect()}
    b = {r.event_id: (r.event_type, r.value) for r in ev.collect()}
    assert a == b


def test_repartition_by_unique_key_isolates_each_key(spark):
    """DKV.fs:66-96 parity: after the eager repartition, every distinct
    key owns exactly one partition and no partition mixes keys."""
    from prajna_spark.dset import DSet

    d = DSet(
        spark.range(300).selectExpr("id % 7 AS k", "id AS v"), key_cols=("k",)
    ).repartition_by_unique_key()
    assert d.df.rdd.getNumPartitions() == 7

    def keys_per_part(it):
        ks = {r.k for r in it}
        yield len(ks)

    per_part = d.df.rdd.mapPartitions(keys_per_part).collect()
    assert sorted(per_part) == [1] * 7  # one key per partition, all present
    assert d.count() == 300


def test_hrw_rendezvous_minimal_disruption(spark):
    """Removing a shard must move ONLY that shard's keys — the property
    that distinguishes rendezvous hashing from mod-N (which reshuffles
    nearly everything on resize)."""
    from pyspark.sql import functions as F

    def assign(shards):
        key = F.col("id").cast("string")
        pairs = F.array(
            *[
                F.struct(
                    F.md5(F.concat(F.lit(f"{s}|"), key)).alias("h"),
                    F.lit(s).alias("shard"),
                )
                for s in shards
            ]
        )
        return {
            r["id"]: r["shard"]
            for r in spark.range(500)
            .select("id", F.array_max(pairs).getField("shard").alias("shard"))
            .collect()
        }

    full = assign(["s0", "s1", "s2", "s3", "s4"])
    reduced = assign(["s0", "s1", "s2", "s3"])  # s4 removed
    # balance sanity: every shard owns something
    assert {v for v in full.values()} == {"s0", "s1", "s2", "s3", "s4"}
    for k in full:
        if full[k] != "s4":
            assert reduced[k] == full[k], k  # untouched keys stay put
        else:
            assert reduced[k] != "s4"
