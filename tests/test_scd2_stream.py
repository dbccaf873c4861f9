"""Streaming SCD2 maintenance: incremental drain == batch rebuild,
exactly, under late data and redelivery."""

from __future__ import annotations

from prajna_spark.operators.intervals import scd2_intervals
from prajna_spark.streaming.scd2_stream import (
    apply_scd2_batch,
    read_history,
    start_scd2_apply,
)

SCHEMA = "k long, t long, s string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def _cycle(spark, src, store, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = start_scd2_apply(stream, store, ckpt, ["k"], "s", "t", n_buckets=4)
    q.awaitTermination()


def _hist_set(df):
    return {
        (r.k, r.s, r.effective_from, r.effective_to, r.version, r.is_current)
        for r in df.collect()
    }


def test_streamed_scd2_converges_to_batch_rebuild(spark, tmp_path):
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    b1 = [(1, 10, "a"), (1, 20, "a"), (2, 5, "x")]
    b2 = [(1, 30, "b"), (2, 9, "y")]
    # batch 3 is LATE data: b@15 lands between a@10 and the collapsed-away
    # a@20 — the case that proves the raw point layer is required (a
    # maintainer storing only its collapsed output would lose a@20 and
    # miss the re-entry interval)
    b3 = [(1, 15, "b")]

    for batch in (b1, b2, b3):
        _write(spark, src, batch)
        _cycle(spark, src, store, ckpt)

    all_events = spark.createDataFrame(b1 + b2 + b3, SCHEMA)
    expected = _hist_set(scd2_intervals(all_events, ["k"], "s", "t"))
    assert _hist_set(read_history(spark, store)) == expected
    # the late re-entry interval exists: a reopens at t=20 after b@15
    assert (1, "a", 20, 30, 3, 0) in expected


def test_streamed_scd2_redelivery_is_a_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "x")], SCHEMA
    )
    apply_scd2_batch(batch, 0, store, ["k"], "s", "t", n_buckets=4)
    first = _hist_set(read_history(spark, store))
    # at-least-once: the exact same batch applies again (e.g. a crash
    # after the write, before the checkpoint commit)
    apply_scd2_batch(batch, 0, store, ["k"], "s", "t", n_buckets=4)
    assert _hist_set(read_history(spark, store)) == first
    # and the raw point layer holds exactly one row per (k, t)
    import os

    pts = spark.read.parquet(os.path.join(store, "points"))
    assert pts.count() == pts.select("k", "t").distinct().count() == 3


def test_streamed_scd2_only_touched_buckets_rewrite(spark, tmp_path):
    """Write amplification contract: a batch touching one key leaves the
    other buckets' files physically untouched (same file list)."""
    import os

    store = str(tmp_path / "store")
    seed = spark.createDataFrame(
        [(k, 10, "a") for k in range(20)], SCHEMA
    )
    apply_scd2_batch(seed, 0, store, ["k"], "s", "t", n_buckets=4)

    def files():
        out = {}
        hist = os.path.join(store, "history")
        for d in os.listdir(hist):
            if d.startswith("__scd2_bucket="):
                p = os.path.join(hist, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return out

    before = files()
    one = spark.createDataFrame([(7, 20, "b")], SCHEMA)
    apply_scd2_batch(one, 1, store, ["k"], "s", "t", n_buckets=4)
    after = files()
    from prajna_spark.streaming.scd2_stream import _bucket

    # derive the touched bucket through the operator's own formula so the
    # test tracks any change to it
    touched = (
        spark.createDataFrame([(7,)], "k long")
        .select(_bucket(["k"], 4).alias("b"))
        .collect()[0]
        .b
    )
    for d, fl in before.items():
        if d != f"__scd2_bucket={touched}":
            assert after[d] == fl, f"untouched bucket {d} rewritten"
    assert after[f"__scd2_bucket={touched}"] != before[f"__scd2_bucket={touched}"]


def test_streamed_scd2_within_batch_duplicates_collapse(spark, tmp_path):
    """At-least-once sources can repeat a (key, ts) INSIDE one micro-batch
    (the redelivery test only covers cross-batch repeats). The point store
    must stay (key, ts)-unique and ties at an instant must resolve
    deterministically (greatest state wins; NULL loses to any state)."""
    import os

    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "a"), (1, 20, "b"), (1, 20, None), (2, 5, "x")],
        SCHEMA,
    )
    apply_scd2_batch(batch, 0, store, ["k"], "s", "t", n_buckets=4)
    pts = {
        (r.k, r.t, r.s)
        for r in spark.read.parquet(os.path.join(store, "points"))
        .select("k", "t", "s")
        .collect()
    }
    assert pts == {(1, 10, "a"), (1, 20, "b"), (2, 5, "x")}
    assert (1, "b", 20, None, 2, 1) in _hist_set(read_history(spark, store))


def test_streamed_scd2_recovers_from_crashed_first_write(spark, tmp_path):
    """A crash during the FIRST point-store write leaves only _temporary
    residue; the redelivered batch must bootstrap over it, not wedge on
    errorIfExists forever."""
    import os

    store = str(tmp_path / "store")
    residue = os.path.join(store, "points", "_temporary", "0")
    os.makedirs(residue)
    with open(os.path.join(residue, "task_123.parquet.inprogress"), "w") as f:
        f.write("partial")
    batch = spark.createDataFrame([(1, 10, "a"), (2, 5, "x")], SCHEMA)
    apply_scd2_batch(batch, 0, store, ["k"], "s", "t", n_buckets=4)
    assert _hist_set(read_history(spark, store)) == {
        (1, "a", 10, None, 1, 1),
        (2, "x", 5, None, 1, 1),
    }


def test_streamed_scd2_empty_batch_is_a_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    seeded = spark.createDataFrame([(1, 10, "a")], SCHEMA)
    apply_scd2_batch(seeded, 0, store, ["k"], "s", "t", n_buckets=4)
    before = _hist_set(read_history(spark, store))
    empty = spark.createDataFrame([], SCHEMA)
    apply_scd2_batch(empty, 1, store, ["k"], "s", "t", n_buckets=4)
    assert _hist_set(read_history(spark, store)) == before
