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
