"""operators.upsert — CDC snapshot merge semantics + write-amplification
bounds."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from prajna_spark.operators.upsert import upsert, upsert_partitioned


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )


def test_upsert_replaces_and_inserts(spark):
    ups = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "id long, s string, v long"
    )
    got = {r["id"]: (r["s"], r["v"]) for r in upsert(_base(spark), ups, ["id"]).collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}


def test_upsert_last_write_wins(spark):
    ups = spark.createDataFrame(
        [(2, "old", 1, 1), (2, "new", 2, 5), (2, "mid", 3, 3)],
        "id long, s string, v long, ts long",
    )
    base = _base(spark).withColumn("ts", F.lit(0))
    got = {r["id"]: r["s"] for r in upsert(base, ups, ["id"], order_col="ts").collect()}
    assert got[2] == "new" and got[1] == "a"


def test_upsert_broadcasts_keyset_no_base_shuffle(spark):
    """With broadcast_keys=True the snapshot side must not shuffle: the
    anti join is a BroadcastHashJoin and no Exchange hashpartitioning
    appears above the base scan."""
    ups = spark.createDataFrame([(2, "B", 200)], "id long, s string, v long")
    plan = (
        upsert(_base(spark), ups, ["id"], broadcast_keys=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the only exchange is the keyset distinct (narrow: key column only);
    # the base/snapshot side reaches the anti join unshuffled
    assert plan.count("Exchange hashpartitioning") == 1


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, f"s{i}", i % 3) for i in range(30)], "id long, s string, p int"
    )
    base.write.partitionBy("p").parquet(path)

    def files(p):
        d = os.path.join(path, f"p={p}")
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    before = {p: files(p) for p in range(3)}
    # touch partition 1 only: one replace, one insert
    ups = spark.createDataFrame(
        [(1, "UPDATED", 1), (100, "NEW", 1)], "id long, s string, p int"
    )
    upsert_partitioned(spark, path, ups, ["id"], "p")

    got = {r["id"]: r["s"] for r in spark.read.parquet(path).collect()}
    assert got[1] == "UPDATED" and got[100] == "NEW" and got[0] == "s0"
    assert len(got) == 31
    # untouched partitions keep their exact original files
    assert files(0) == before[0] and files(2) == before[2]
    # touched partition was rewritten
    assert files(1) != before[1]


def test_upsert_versioned_replay_and_stale_safety(spark):
    """Newest-wins: a stale update cannot clobber a newer snapshot row;
    re-applying an identical batch is a no-op (base wins ties)."""
    from prajna_spark.operators.upsert import upsert_versioned

    base = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "id long, s string, ver long"
    )
    ups = spark.createDataFrame(
        [(1, "stale", 3), (2, "newer", 7), (3, "insert", 1)],
        "id long, s string, ver long",
    )
    once = upsert_versioned(base, ups, ["id"], "ver")
    got = {r["id"]: (r["s"], r["ver"]) for r in once.collect()}
    assert got == {1: ("a", 5), 2: ("newer", 7), 3: ("insert", 1)}
    twice = upsert_versioned(once, ups, ["id"], "ver")
    assert {r["id"]: (r["s"], r["ver"]) for r in twice.collect()} == got


def test_streaming_cdc_apply_matches_batch_merge(spark, tmp_path):
    """Draining an update stream through start_cdc_apply yields the same
    snapshot as one batch versioned merge of all updates — and replaying
    the drain (fresh checkpoint, same files) changes nothing."""
    from prajna_spark.operators.upsert import upsert_versioned
    from prajna_spark.streaming.upsert_stream import start_cdc_apply

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, f"s{i}", i % 4, 0) for i in range(40)],
        "id long, s string, p int, ver long",
    )
    base.write.partitionBy("p").parquet(snap)

    src = str(tmp_path / "updates")
    u1 = spark.createDataFrame(
        [(3, "u1", 3, 1), (100, "new1", 0, 1)], "id long, s string, p int, ver long"
    )
    u2 = spark.createDataFrame(
        [(3, "u2", 3, 2), (101, "new2", 1, 1)], "id long, s string, p int, ver long"
    )
    u1.write.parquet(src, mode="overwrite")
    u2.write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "id long, s string, p int, ver long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = start_cdc_apply(
        stream, snap, str(tmp_path / "ck1"), ["id"], "p", "ver"
    )
    q.awaitTermination()

    want_df = upsert_versioned(
        base, u1.unionByName(u2), ["id"], "ver"
    )
    want = sorted(map(tuple, want_df.collect()))
    got = sorted(
        map(tuple, spark.read.parquet(snap).select("id", "s", "p", "ver").collect())
    )
    assert got == want
    assert dict((r[0], r[1]) for r in got)[3] == "u2"

    # full redelivery: fresh checkpoint, same update files — no change
    stream2 = spark.readStream.schema(
        "id long, s string, p int, ver long"
    ).parquet(src)
    q2 = start_cdc_apply(
        stream2, snap, str(tmp_path / "ck2"), ["id"], "p", "ver"
    )
    q2.awaitTermination()
    again = sorted(
        map(tuple, spark.read.parquet(snap).select("id", "s", "p", "ver").collect())
    )
    assert again == want


def test_snapshot_diff_detects_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", None)],
        "id long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", None), (5, "e", 50)],
        "id long, s string, v long",
    )
    from prajna_spark.operators.upsert import snapshot_diff

    got = {r["id"]: r["change_type"] for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 unchanged (dropped), 4 unchanged-with-null (eqNullSafe), 2 update,
    # 3 delete, 5 insert
    assert got == {2: "update", 3: "delete", 5: "insert"}


def test_snapshot_diff_feeds_upsert_roundtrip(spark):
    """diff(old, new) applied back to old reproduces new exactly:
    upsert the update+insert rows, anti-join away the deletes."""
    from prajna_spark.operators.upsert import snapshot_diff, upsert

    old = spark.createDataFrame(
        [(i, f"s{i}", i) for i in range(50)], "id long, s string, v long"
    )
    new = spark.createDataFrame(
        [(i, ("X" if i % 7 == 0 else f"s{i}"), i) for i in range(10, 60)],
        "id long, s string, v long",
    )
    diff = snapshot_diff(old, new, ["id"])
    upserts = new.join(
        diff.where(F.col("change_type") != "delete").select("id"), "id", "left_semi"
    )
    deletes = diff.where(F.col("change_type") == "delete").select("id")
    rebuilt = upsert(old, upserts, ["id"]).join(deletes, "id", "left_anti")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_upsert_partitioned_preserves_null_partition_rows(spark, tmp_path):
    """isin() never matches NULL: without the explicit isNull branch, an
    update batch touching the NULL partition read ZERO base rows from it
    while dynamic overwrite rewrote the whole __HIVE_DEFAULT_PARTITION__
    directory — silently deleting every other NULL-partition key."""
    from prajna_spark.operators.upsert import upsert_partitioned

    path = str(tmp_path / "snap_null")
    base = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "c", "p1")],
        "k long, v string, part string",
    )
    base.write.partitionBy("part").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a2", None)], "k long, v string, part string"
    )
    upsert_partitioned(spark, path, updates, ["k"], "part")
    got = {
        (r.k, r.v, r.part) for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "a2", None), (2, "b", None), (3, "c", "p1")}
