"""Property-based differential tests (hypothesis).

The reference's NUnit suite checks each operator on ONE hand-built input
(SURVEY §5); these go further: random inputs, with the distributed result
compared against an independent local model of the semantics. Examples are
kept small (Spark jobs per example) — the value is in the adversarial
shapes hypothesis finds (ties, empty groups, single-element inputs,
all-identical keys), not in volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts, value) events: few keys + tight ts range force ties and
# hot keys; value is the right-side payload being carried.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


def _asof_local(left_rows, right_rows):
    """Local model: for each left (k, t), the payload of the latest right
    row with same k and rt <= t, ties on rt broken by LARGEST value (the
    distributed operator's ordering is (ts, marker) with last() carrying
    the final struct, so the last-sorted right row at a tied ts wins —
    we make the model deterministic by deduping ties to max value)."""
    out = {}
    for k, t, _ in left_rows:
        best = None
        for rk, rt, rv in right_rows:
            if rk == k and rt <= t and (best is None or (rt, rv) > best):
                best = (rt, rv)
        out[(k, t)] = best[1] if best else None
    return out


@given(left=events_strategy, right=events_strategy, width=st.sampled_from([1, 7, 3600]))
@settings(**SETTINGS)
def test_asof_bucketed_matches_plain_and_model(spark, left, right, width):
    """asof_join_bucketed is exact for ANY bucket width (its docstring
    contract) and both spellings match the local model. Right side is
    deduped per (k, ts) to max value so tie order is deterministic."""
    from prajna_spark.operators.asof import asof_join, asof_join_bucketed

    # dedupe right per (k, t) -> max v (mirrors catalog usage, makes ties
    # well-defined for all three implementations)
    rmap = {}
    for k, t, v in right:
        rmap[(k, t)] = max(v, rmap.get((k, t), v))
    right_d = [(k, t, v) for (k, t), v in rmap.items()]

    ldf = spark.createDataFrame(
        [(k, t) for k, t, _ in left], "k long, t long"
    ).distinct()
    rdf = spark.createDataFrame(right_d, "k long, t long, v long")

    expected = _asof_local([(k, t, 0) for k, t in {(k, t) for k, t, _ in left}],
                           right_d)

    plain = {
        (r.k, r.t): r.v_asof
        for r in asof_join(ldf, rdf, on=["k"], ts="t", right_cols=["v"]).collect()
    }
    bucketed = {
        (r.k, r.t): r.v_asof
        for r in asof_join_bucketed(
            ldf, rdf, on=["k"], ts="t", right_cols=["v"], bucket_width=width
        ).collect()
    }
    assert plain == expected
    assert bucketed == expected


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from prajna_spark.pipeline.dedup import connected_components

    nodes = list(range(10))
    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # canonical label = min node id per component
    comp_min = {}
    for i in nodes:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {i: comp_min[find(i)] for i in nodes}

    e = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    nd = spark.createDataFrame([(i,) for i in nodes], "id long")
    got = {
        r.id: r.component_id for r in connected_components(e, nd).collect()
    }
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # id (may repeat -> distinct)
            st.integers(min_value=0, max_value=3),   # block
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_blocked_pairs_matches_naive_self_join(spark, rows):
    from prajna_spark.pipeline.dedup import blocked_pairs

    uniq = {}
    for i, b in rows:
        uniq[i] = b
    expected = {
        (a, c)
        for a in uniq
        for c in uniq
        if a < c and uniq[a] == uniq[c]
    }
    df = spark.createDataFrame(list(uniq.items()), "id long, block long")
    got = {
        (r.id_a, r.id_b)
        for r in blocked_pairs(df, "block", "id").collect()
    }
    assert got == expected


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25),
    budget=st.integers(min_value=5, max_value=60),
)
@settings(**SETTINGS)
def test_packing_invariants(spark, tokens, budget):
    """pack_sequences == the sequential concatenation model: cum_before is
    the exact running sum in order, pack_id = cum_before // budget, every
    doc packed exactly once."""
    from prajna_spark.pipeline.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc long, n_tok long"
    )
    got = {
        r.doc: (r.cum_before, r.pack_id, r.pack_offset)
        for r in pack_sequences(df, "n_tok", budget, order_by=["doc"]).collect()
    }
    assert sorted(got) == list(range(len(tokens)))  # exactly once
    cum = 0
    for i, t in enumerate(tokens):
        assert got[i] == (cum, cum // budget, cum - (cum // budget) * budget)
        cum += t


@given(
    points=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=10,
    ),
    width=st.sampled_from([1, 7, 50, 1000]),
)
@settings(**SETTINGS)
def test_interval_join_matches_naive_for_any_bin_width(
    spark, points, intervals, width
):
    """The bin-quantized interval join is exact for ANY bin width —
    including widths larger than the whole domain (every row in one bin)
    and width 1 (maximal fan-out)."""
    from prajna_spark.operators.rangejoin import interval_join

    pts = sorted(set(points))
    ivs = [(i, s, s + d) for i, (s, d) in enumerate(intervals)]
    expected = {
        (p, i) for p in pts for i, s, e in ivs if s <= p <= e
    }
    pdf = spark.createDataFrame([(p,) for p in pts], "p long")
    idf = spark.createDataFrame(ivs, "iid long, s long, e long")
    got = {
        (r.p, r.iid)
        for r in interval_join(pdf, "p", idf, "s", "e", bin_width=width).collect()
    }
    assert got == expected


@given(
    n=st.integers(min_value=0, max_value=40),
    chunk=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
@settings(**SETTINGS)
def test_chunk_documents_matches_local_model(spark, n, chunk, data):
    """chunk_documents == the local sliding-window model: starts at
    1, 1+stride, ... plus one trailing start when the tail would
    otherwise be uncovered; every token covered; chunk_id is the grid
    ordinal."""
    from prajna_spark.pipeline.packing import chunk_documents

    stride = data.draw(st.integers(min_value=1, max_value=chunk))
    toks = [f"w{i}" for i in range(n)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk, stride).collect(),
        key=lambda r: r.chunk_id,
    )

    # local model
    expected = []
    if n > 0:
        starts = list(range(1, max(n - (chunk - 1), 1) + 1, stride))
        last_end = starts[-1] + chunk - 1
        if last_end < n:
            starts.append(starts[-1] + stride)
        starts = [s for s in starts if s <= n]
        expected = [
            (i, " ".join(toks[s - 1 : s - 1 + chunk]), min(chunk, n - s + 1))
            for i, s in enumerate(starts)
        ]

    got = [(r.chunk_id, r.chunk_text, r.n_tokens) for r in rows]
    assert got == expected
    covered = {t for _, text, _ in got for t in text.split(" ") if t}
    assert covered == set(toks)
