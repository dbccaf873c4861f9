"""Lexical/hybrid retrieval: BM25 semantics, salient-term queries, RRF
fusion — unit-level checks beyond the catalog's DuckDB oracle parity
(bm25_topk_docs, hybrid_rrf_search).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prajna_spark.pipeline import retrieval


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "apple banana apple"),          # tf(apple)=2, dl=3
        (1, "apple cherry"),                # dl=2
        (2, "banana banana banana cherry"),  # dl=4
        (3, "durian"),                      # rare term, dl=1
        (4, "apple banana cherry durian"),  # dl=4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _local_bm25(corpus_rows, qterms, k1=1.2, b=0.75):
    """Reference BM25 on plain Python dicts."""
    toks = {d: t.split() for d, t in corpus_rows}
    n = float(len(toks))
    avgdl = sum(len(v) for v in toks.values()) / n
    scores: dict[int, float] = {}
    for term in qterms:
        df = float(sum(term in t for t in toks.values()))
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = float(t.count(term))
            if tf == 0:
                continue
            part = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
            scores[d] = scores.get(d, 0.0) + idf * part
    return scores


def test_bm25_matches_local_model(spark, corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    qt = spark.createDataFrame(
        [("q0", "apple"), ("q0", "durian")], "query_id string, term string"
    )
    got = {
        r.doc_id: r.score
        for r in retrieval.bm25_topk(corpus, qt, k=10).collect()
    }
    want = _local_bm25(rows, ["apple", "durian"])
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-6)


def test_bm25_rare_term_outranks_common(spark, corpus):
    """A doc matching the rare term must beat docs matching only the
    common term (idf dominance) — the property BM25 exists for."""
    qt = spark.createDataFrame(
        [("q", "apple"), ("q", "durian")], "query_id string, term string"
    )
    top = retrieval.bm25_topk(corpus, qt, k=10).orderBy("rk").collect()
    durian_docs = {3, 4}
    assert {r.doc_id for r in top[:2]} == durian_docs


def test_salient_terms_deterministic(spark, corpus):
    st = retrieval.salient_terms(corpus, n_terms=2).collect()
    by_q = {}
    for r in st:
        by_q.setdefault(r.query_id, []).append(r.term)
    # doc 0: apple(2) then banana(1); doc 2: banana(3) then cherry(1)
    assert sorted(by_q[0]) == ["apple", "banana"]
    assert sorted(by_q[2]) == ["banana", "cherry"]
    # ties broken by term: doc 4 has four tf=1 terms -> first two alphabetical
    assert sorted(by_q[4]) == ["apple", "banana"]


def test_rrf_fusion_matches_hand_computation(spark):
    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2)], "query_id string, doc_id long, rk long"
    )
    b = spark.createDataFrame(
        [("q", 11, 1), ("q", 12, 2)], "query_id string, doc_id long, rk long"
    )
    got = {r.doc_id: (r.rrf, r.n_systems) for r in retrieval.rrf_fuse([a, b]).collect()}
    assert got[11][1] == 2 and got[10][1] == 1 and got[12][1] == 1
    assert got[11][0] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert got[10][0] == pytest.approx(1 / 61, abs=1e-6)
    # doc in both lists outranks docs in one
    ranks = {r.doc_id: r.rk for r in retrieval.rrf_fuse([a, b]).collect()}
    assert ranks[11] == 1


def test_bm25_plan_prunes_and_bounds(spark, corpus):
    """Scale shape: query-term broadcast join prunes postings, and the
    final top-k is the engine's pre-shuffle-bounded window rewrite."""
    qt = spark.createDataFrame([("q", "apple")], "query_id string, term string")
    plan = (
        retrieval.bm25_topk(corpus, qt, k=5)
        ._jdf.queryExecution()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_persisted_index_matches_from_scratch_and_prunes(spark, corpus, tmp_path):
    """build_text_index + search_text_index returns exactly bm25_topk's
    result, its layout is bucket-partitioned, and the probe join prunes
    scan partitions (the lexical twin of the IVF DPP test)."""
    qt = spark.createDataFrame(
        [("q0", "apple"), ("q0", "durian")], "query_id string, term string"
    )
    path = str(tmp_path / "tidx")
    retrieval.build_text_index(corpus, path, n_buckets=8)
    import os

    leaves = [d for d in os.listdir(f"{path}/postings") if d.startswith("bucket=")]
    assert leaves, "index must be partitioned by term bucket"

    got = retrieval.search_text_index(spark, path, qt, k=10, n_buckets=8)
    want = retrieval.bm25_topk(corpus, qt, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_tfidf_keywords_match_local_model(spark):
    import math
    from collections import Counter

    from prajna_spark.pipeline.retrieval import tfidf_keywords

    docs = [
        (0, "spark shuffles data and spark joins data"),
        (1, "duckdb scans data fast"),
        (2, "spark streams windows"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in tfidf_keywords(df, k=2).collect():
        got.setdefault(r.doc_id, []).append((r.rk, r.term, r.tf, r.df, r.tfidf))
    n = len(docs)
    tf = {i: Counter(t.split()) for i, t in docs}
    dfs = Counter()
    for c in tf.values():
        for term in c:
            dfs[term] += 1
    for i, _ in docs:
        scored = sorted(
            (
                (-math.floor(c * math.log(n / dfs[t]) * 1e6 + 0.5) / 1e6, t, c)
                for t, c in tf[i].items()
            )
        )[:2]
        want = [
            (rk + 1, t, c, dfs[t], -s) for rk, (s, t, c) in enumerate(scored)
        ]
        assert sorted(got[i]) == want, i


def test_tfidf_suppresses_ubiquitous_terms(spark):
    from prajna_spark.pipeline.retrieval import tfidf_keywords

    # 'data' is in every doc -> idf = ln(1) = 0: never a keyword even
    # with the highest tf; the rarer term wins
    docs = [(i, "data data data unique" + str(i)) for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top1 = {
        r.doc_id: r.term
        for r in tfidf_keywords(df, k=1).collect()
    }
    assert top1 == {i: f"unique{i}" for i in range(4)}
