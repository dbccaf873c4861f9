"""operators.intervals — SCD2 history build + interval concurrency.

Unit tests mirror the reference's one-input NUnit style (SURVEY §5);
hypothesis differentials compare against independent local models, the
discipline the catalog's other custom operators follow
(tests/test_properties.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prajna_spark.operators.intervals import max_concurrency, scd2_intervals

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------- SCD2 ----------


def _scd2_local(rows):
    """Local model: per key, sort by ts; keep state CHANGES only; each
    change is valid until the next change (None = open)."""
    by_key = {}
    for k, t, s in rows:
        by_key.setdefault(k, []).append((t, s))
    out = []
    for k, seq in by_key.items():
        seq.sort()
        changes = []
        for t, s in seq:
            if not changes or changes[-1][1] != s:
                changes.append((t, s))
        for i, (t, s) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.append((k, s, t, nxt, i + 1, 1 if nxt is None else 0))
    return sorted(out, key=lambda r: (r[0], r[2]))


def test_scd2_basic(spark):
    rows = [
        (1, 10, "a"),
        (1, 20, "a"),  # duplicate state: collapses into the first interval
        (1, 30, "b"),
        (1, 40, "a"),
        (2, 5, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, s string")
    got = sorted(
        (
            r.k,
            r.s,
            r.effective_from,
            r.effective_to,
            r.version,
            r.is_current,
        )
        for r in scd2_intervals(df, ["k"], "s", "t").collect()
    )
    assert got == [
        (1, "a", 10, 30, 1, 0),
        (1, "a", 40, None, 3, 1),
        (1, "b", 30, 40, 2, 0),
        (2, "x", 5, None, 1, 1),
    ]


scd2_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=40),  # ts
        st.sampled_from(["a", "b", None]),  # state (None is a legal state)
    ),
    min_size=1,
    max_size=30,
)


@given(rows=scd2_strategy)
@settings(**SETTINGS)
def test_scd2_matches_local_model(spark, rows):
    # the operator's contract requires (key, ts) unique — dedupe to the
    # largest state at a tied instant (None ordered below any string)
    def srank(s):
        return (s is not None, s or "")

    m = {}
    for k, t, s in rows:
        m[(k, t)] = max(s, m.get((k, t), s), key=srank)
    rows_d = [(k, t, s) for (k, t), s in m.items()]
    df = spark.createDataFrame(rows_d, "k long, t long, s string")
    order = lambda r: (r[0], r[2])  # noqa: E731 — (key, effective_from)
    got = sorted(
        (
            (r.k, r.s, r.effective_from, r.effective_to, r.version, r.is_current)
            for r in scd2_intervals(df, ["k"], "s", "t").collect()
        ),
        key=order,
    )
    expected = sorted(
        ((k, s, f, to, v, cur) for k, s, f, to, v, cur in _scd2_local(rows_d)),
        key=order,
    )
    assert got == expected


def test_scd2_intervals_tile_time(spark):
    """Structural invariants: per key, intervals are disjoint, ordered by
    version, each closed interval's end == next interval's start, and
    exactly one open (current) interval exists."""
    rows = [(k, t, ["a", "b"][(t // 3) % 2]) for k in (1, 2) for t in range(20)]
    df = spark.createDataFrame(rows, "k long, t long, s string")
    hist = scd2_intervals(df, ["k"], "s", "t").collect()
    for k in (1, 2):
        ivs = sorted(
            (r.version, r.effective_from, r.effective_to)
            for r in hist
            if r.k == k
        )
        assert [v for v, _, _ in ivs] == list(range(1, len(ivs) + 1))
        for (_, _, e0), (_, f1, _) in zip(ivs, ivs[1:]):
            assert e0 == f1
        opens = [r for r in hist if r.k == k and r.is_current == 1]
        assert len(opens) == 1 and opens[0].effective_to is None


# ---------- max concurrency ----------


def _conc_local(intervals):
    """Local model: per key, sweep over [s, e) interval boundaries and
    track the running open count; report (max, first t at max). An
    interval with e=None is open: it opens at s and never closes."""
    by_key = {}
    for k, s, e in intervals:
        by_key.setdefault(k, []).append((s, e))
    out = {}
    for k, ivs in by_key.items():
        deltas = {}
        for s, e in ivs:
            deltas[s] = deltas.get(s, 0) + 1
            if e is not None:
                deltas[e] = deltas.get(e, 0) - 1
        cur = best = 0
        best_t = None
        for t in sorted(deltas):
            cur += deltas[t]
            if cur > best:
                best, best_t = cur, t
        out[k] = (best, best_t)
    return out


def test_max_concurrency_basic(spark):
    # k=1: [0,10) [5,15) [14,20) -> peak 2 first at t=5
    # k=2: [0,1) [1,2) back-to-back (end-exclusive) -> peak 1 at t=0
    rows = [(1, 0, 10), (1, 5, 15), (1, 14, 20), (2, 0, 1), (2, 1, 2)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.k: (r.max_concurrent, r.first_peak_t)
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got == {1: (2, 5), 2: (1, 0)}


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=30),  # start
        # length: None = open-ended interval (still running), the shape
        # scd2_intervals' current rows produce
        st.one_of(st.none(), st.integers(min_value=1, max_value=10)),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=intervals_strategy)
@settings(**SETTINGS)
def test_max_concurrency_matches_local_model(spark, rows):
    ivs = [(k, s, None if ln is None else s + ln) for k, s, ln in rows]
    df = spark.createDataFrame(ivs, "k long, s long, e long")
    got = {
        r.k: (r.max_concurrent, r.first_peak_t)
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got == _conc_local(ivs)


def test_scd2_null_states_are_real_states(spark):
    """NULL is a legal state: transitions to/from NULL open intervals and
    consecutive NULLs collapse (the three-valued != would silently drop
    the NULL interval and leave duplicate adjacent states)."""
    rows = [(1, 10, "a"), (1, 20, None), (1, 30, "a"), (1, 40, None), (1, 50, None)]
    df = spark.createDataFrame(rows, "k long, t long, s string")
    got = sorted(
        (
            (r.s, r.effective_from, r.effective_to, r.version, r.is_current)
            for r in scd2_intervals(df, ["k"], "s", "t").collect()
        ),
        key=lambda r: r[1],
    )
    assert got == [
        ("a", 10, 20, 1, 0),
        (None, 20, 30, 2, 0),
        ("a", 30, 40, 3, 0),
        (None, 40, None, 4, 1),
    ]


def test_max_concurrency_open_intervals_count_forever(spark):
    """NULL end == still open: counts from its start onward — the shape
    scd2_intervals' current rows produce. Also proves the open interval
    does NOT leak into the NEXT key's running sum (the sentinel close
    keeps per-key deltas cancelling)."""
    rows = [(1, 0, 10), (1, 5, None), (2, 0, 5), (2, 3, 8)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.k: (r.max_concurrent, r.first_peak_t)
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got == {1: (2, 5), 2: (2, 3)}


def test_max_concurrency_null_keys_form_their_own_group(spark):
    rows = [(None, 0, 10), (None, 5, 15), (2, 0, 5)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.k: (r.max_concurrent, r.first_peak_t)
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got == {None: (2, 5), 2: (1, 0)}


def test_max_concurrency_null_starts_dropped(spark):
    rows = [(1, None, 10), (1, 0, 10)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.k: r.max_concurrent
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }
    assert got == {1: 1}


def test_max_concurrency_no_broadcast_hint_path(spark):
    rows = [(1, 0, 10), (1, 5, 15)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.k: (r.max_concurrent, r.first_peak_t)
        for r in max_concurrency(
            df, ["k"], "s", "e", broadcast_peaks=False
        ).collect()
    }
    assert got == {1: (2, 5)}


# --------------------------------------------------------------------------
# burst_first (debounce)
# --------------------------------------------------------------------------


def test_burst_first_keeps_burst_heads_only(spark):
    from prajna_spark.operators.intervals import burst_first

    rows = [
        # key 1: bursts {0,5,9}, {20}, {27,30} with gap 6
        (1, 0), (1, 5), (1, 9), (1, 20), (1, 27), (1, 30),
        # key 2: single event
        (2, 100),
    ]
    df = spark.createDataFrame(rows, "k int, t long")
    got = sorted(
        (r["k"], r["t"]) for r in burst_first(df, ["k"], "t", 6).collect()
    )
    assert got == [(1, 0), (1, 20), (1, 27), (2, 100)]


def test_burst_first_gap_boundary_is_inclusive(spark):
    from prajna_spark.operators.intervals import burst_first

    df = spark.createDataFrame([(1, 0), (1, 6), (1, 13)], "k int, t long")
    got = sorted(r["t"] for r in burst_first(df, ["k"], "t", 6).collect())
    assert got == [0, 13]  # gap == 6 chains (<=), 7 breaks
