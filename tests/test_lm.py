"""Bigram LM scoring (pipeline/lm.py): local-model differential,
smoothing normalization invariant, and edge cases."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import persist_scope
from prajna_spark.pipeline.lm import bigram_counts, score_documents


def _tok(text):
    return [w for w in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if w]


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the cat food"),
    (2, "dogs chase the cat"),
    (3, "one"),   # single token: no bigrams
    (4, ""),      # empty
    (5, "zzz qqq zzz qqq zzz"),  # self-contained loop
]


def _local_scores(k=0.5):
    toks = {d: _tok(t) for d, t in DOCS}
    bigrams = [(w1, w2) for ts in toks.values() for w1, w2 in zip(ts, ts[1:])]
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    v = len({w for ts in toks.values() for w in ts})
    out = {}
    for d, ts in toks.items():
        bs = list(zip(ts, ts[1:]))
        if not bs:
            continue
        nll = [-math.log((c12[b] + k) / (c1[b[0]] + k * v)) for b in bs]
        out[d] = (len(bs), sum(nll) / len(nll))
    return out


def test_score_documents_matches_local_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with persist_scope():
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in score_documents(df, k=0.5).collect()
        }
    ref = _local_scores(k=0.5)
    assert set(got) == set(ref)  # docs with <2 tokens absent from both
    for d in ref:
        assert got[d][0] == ref[d][0]
        assert math.isclose(got[d][1], ref[d][1], rel_tol=1e-12)


def test_smoothed_model_normalizes_per_history(spark):
    """sum over ALL w2 in vocab of P(w2|w1) == 1 for every history w1 —
    the invariant that makes add-k a proper conditional distribution
    (c1 counts w1 as bigram history, NOT raw unigram occurrences)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    k = 0.5
    with persist_scope():
        _, c12, c1, vocab = bigram_counts(df)
        v = vocab.collect()[0]["v_size"]
        c12_m = {(r["w1"], r["w2"]): r["c12"] for r in c12.collect()}
        c1_m = {r["w1"]: r["c1"] for r in c1.collect()}
        all_tokens = {w for d, t in DOCS for w in _tok(t)}
    assert v == len(all_tokens)
    for w1, n1 in c1_m.items():
        total = sum(
            (c12_m.get((w1, w2), 0) + k) / (n1 + k * v) for w2 in all_tokens
        )
        assert math.isclose(total, 1.0, rel_tol=1e-12)


def test_repetitive_doc_scores_lower_nll_than_rare_transitions(spark):
    # doc 5's transitions are fully predictable within the corpus model;
    # its avg_nll must undercut doc 2's one-off transitions
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with persist_scope():
        got = {r["doc_id"]: r["avg_nll"] for r in score_documents(df).collect()}
    assert got[5] < got[2]
