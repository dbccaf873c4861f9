"""operators.maintenance — compaction atomicity + retention by
partition drop."""

from __future__ import annotations

import os

from prajna_spark.operators.maintenance import (
    compact,
    expire_partitions,
    list_partitions,
)


def _parquet_files(path):
    return sorted(f for f in os.listdir(path) if f.endswith(".parquet"))


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(10000).repartition(37).write.parquet(path)
    assert len(_parquet_files(path)) == 37
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    n = compact(spark, path, target_mb=128)
    assert n == len(_parquet_files(path)) == 1
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before
    # no temp/old residue
    assert not os.path.exists(path + ".__compact_tmp__")
    assert not os.path.exists(path + ".__compact_old__")


def test_compact_one_partition_of_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "id long, p int"
    ).repartition(11)
    df.write.partitionBy("p").parquet(path)
    target = os.path.join(path, "p=1")
    n_before = len(_parquet_files(target))
    assert n_before > 1
    compact(spark, target, target_mb=128)
    assert len(_parquet_files(target)) == 1
    got = sorted(r["id"] for r in spark.read.parquet(path).where("p = 1").collect())
    assert got == [i for i in range(300) if i % 3 == 1]


def test_expire_partitions_drops_only_aged(spark, tmp_path):
    path = str(tmp_path / "dated")
    df = spark.createDataFrame(
        [(i, d) for i in range(20) for d in ("2026-01-01", "2026-02-01", "2026-03-01")],
        "id long, day string",
    )
    df.write.partitionBy("day").parquet(path)
    dropped = expire_partitions(path, "day", keep_if=lambda v: v >= "2026-02-01")
    assert dropped == ["2026-01-01"]
    assert [v for v, _ in list_partitions(path, "day")] == [
        "2026-02-01", "2026-03-01"
    ]
    assert spark.read.parquet(path).count() == 40
