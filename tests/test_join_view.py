"""Incrementally-maintained join view: after every delta application the
view equals the batch join of the CURRENT side stores; redelivery is a
no-op; the streaming drain path converges identically."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from prajna_spark.streaming.join_view import (
    JoinViewSpec,
    apply_a_batch,
    apply_b_batch,
    drain_a,
    drain_b,
    read_view,
)

VIEW_COLS = ["a_id", "k", "ap", "b_val", "bp"]


def _spec(tmp_path):
    return JoinViewSpec(
        str(tmp_path / "jv"),
        join_col="k",
        a_pk="a_id",
        b_pk="k",
        a_part="ap",
        b_part="bp",
        view_part="ap",
        view_cols=VIEW_COLS,
    )


def _mk_a(spark, rows):  # (a_id, k, ap)
    return spark.createDataFrame(rows, "a_id long, k long, ap int")


def _mk_b(spark, rows):  # (k, b_val, bp)
    return spark.createDataFrame(rows, "k long, b_val string, bp int")


def _expected(a_state, b_state):
    out = []
    for a_id, (k, ap) in a_state.items():
        if k in b_state:
            b_val, bp = b_state[k]
            out.append((a_id, k, ap, b_val, bp))
    return sorted(out)


def _view(spark, spec):
    try:
        return sorted(map(tuple, read_view(spark, spec).collect()))
    except FileNotFoundError:
        return []


def test_view_tracks_batch_join_under_interleaved_deltas(spark, tmp_path):
    rng = random.Random(2)
    spec = _spec(tmp_path)
    a_state, b_state = {}, {}
    for step in range(8):
        if step % 2 == 0:  # A-side batch: inserts + value updates
            rows = [
                (rng.randrange(30), rng.randrange(8), rng.randrange(3))
                for _ in range(6)
            ]
            rows = list({r[0]: r for r in rows}.values())  # unique a_id
            apply_a_batch(_mk_a(spark, rows), step, spec)
            for a_id, k, ap in rows:
                a_state[a_id] = (k, ap)
        else:  # B-side batch: dim updates regenerate referencing rows
            rows = [
                (rng.randrange(8), f"v{step}_{i}", rng.randrange(2))
                for i in range(3)
            ]
            rows = list({r[0]: r for r in rows}.values())
            apply_b_batch(_mk_b(spark, rows), step, spec)
            for k, b_val, bp in rows:
                b_state[k] = (b_val, bp)
        assert _view(spark, spec) == _expected(a_state, b_state), f"step {step}"


def test_redelivered_batch_is_noop(spark, tmp_path):
    spec = _spec(tmp_path)
    a = _mk_a(spark, [(1, 10, 0), (2, 11, 1)])
    b = _mk_b(spark, [(10, "x", 0), (11, "y", 0)])
    apply_b_batch(b, 0, spec)
    apply_a_batch(a, 1, spec)
    before = _view(spark, spec)
    apply_a_batch(a, 1, spec)  # redelivery: byte-identical rows
    apply_b_batch(b, 0, spec)
    assert _view(spark, spec) == before and len(before) == 2


def test_left_row_appears_when_partner_arrives(spark, tmp_path):
    spec = _spec(tmp_path)
    apply_a_batch(_mk_a(spark, [(1, 99, 0)]), 0, spec)  # no customer yet
    assert _view(spark, spec) == []
    apply_b_batch(_mk_b(spark, [(99, "late", 1)]), 1, spec)
    assert _view(spark, spec) == [(1, 99, 0, "late", 1)]


def test_streaming_drains_converge(spark, tmp_path):
    spec = _spec(tmp_path)
    a_src, b_src = str(tmp_path / "a_src"), str(tmp_path / "b_src")
    a_rows = [(i, i % 5, i % 3) for i in range(40)]
    b_rows = [(k, f"b{k}", k % 2) for k in range(5)]
    _mk_b(spark, b_rows[:2]).write.parquet(b_src, mode="overwrite")
    _mk_a(spark, a_rows).write.parquet(a_src, mode="overwrite")

    q = drain_b(
        spark.readStream.schema("k long, b_val string, bp int").parquet(b_src),
        spec, str(tmp_path / "ckb"),
    )
    q.awaitTermination()
    q = drain_a(
        spark.readStream.schema("a_id long, k long, ap int").parquet(a_src),
        spec, str(tmp_path / "cka"),
    )
    q.awaitTermination()
    _mk_b(spark, b_rows[2:]).write.mode("append").parquet(b_src)
    q = drain_b(
        spark.readStream.schema("k long, b_val string, bp int").parquet(b_src),
        spec, str(tmp_path / "ckb"),
    )
    q.awaitTermination()

    want = _expected(
        {a: (k, ap) for a, k, ap in a_rows},
        {k: (v, bp) for k, v, bp in b_rows},
    )
    assert _view(spark, spec) == want and len(want) == 40
