"""Naive Bayes classifier: exact-score differential vs a local model,
separable-corpus accuracy, and smoothing/edge semantics."""

from __future__ import annotations

import math
import re
from collections import Counter

from prajna_spark.pipeline.classify import nb_predict, nb_train

TRAIN = [
    (1, "spark shuffle partition join agg", "dist"),
    (2, "join shuffle broadcast partition", "dist"),
    (3, "executor shuffle spill partition", "dist"),
    (4, "sonnet rhyme meter verse stanza", "poem"),
    (5, "verse rhyme couplet stanza poem", "poem"),
    (6, "meter stanza poem verse lyric", "poem"),
]
TEST = [
    (10, "partition shuffle join", "dist"),
    (11, "stanza verse rhyme", "poem"),
    (12, "poem meter couplet", "poem"),
    (13, "broadcast spill executor", "dist"),
    (14, "zzz unseen words only", None),  # scores on smoothing + prior
    (15, "", None),  # zero tokens -> prior alone
]


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _local_model():
    wc = Counter()
    dl = Counter()
    for _, t, c in TRAIN:
        dl[c] += 1
        for w in _toks(t):
            wc[(c, w)] += 1
    t_l = Counter()
    for (c, w), n in wc.items():
        t_l[c] += n
    vocab = {w for (_, w) in wc}
    v = len(vocab)
    d = len(TRAIN)

    def score(text, c):
        s = math.log(dl[c] / d)
        for w, n in Counter(_toks(text)).items():
            s += n * math.log((wc.get((c, w), 0) + 1) / (t_l[c] + v))
        return s

    return score, sorted(dl)


def test_nb_matches_local_model_exactly(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    test = spark.createDataFrame(TEST, "doc_id long, text string, lang string")
    word_ll, stats = nb_train(train, "text", "lang")
    got = {
        r["doc_id"]: (r["pred_label"], r["score"])
        for r in nb_predict(test, word_ll, stats, round_decimals=9).collect()
    }
    score, labels = _local_model()
    for doc_id, text, _ in TEST:
        want = max(labels, key=lambda c: (round(score(text, c), 9), -ord(c[0])))
        # tie-break label asc: recompute explicitly
        best = sorted(
            ((round(score(text, c), 9), c) for c in labels),
            key=lambda t: (-t[0], t[1]),
        )[0]
        assert got[doc_id][0] == best[1], (doc_id, got[doc_id], best)
        assert math.isclose(got[doc_id][1], best[0], abs_tol=1e-9)


def test_nb_separable_corpus_is_fully_correct(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, lang string")
    test = spark.createDataFrame(
        [r for r in TEST if r[2] is not None],
        "doc_id long, text string, lang string",
    )
    word_ll, stats = nb_train(train, "text", "lang")
    pred = nb_predict(test, word_ll, stats)
    rows = test.join(pred, "doc_id").collect()
    assert all(r["lang"] == r["pred_label"] for r in rows)


def test_nb_empty_doc_predicts_majority_prior(spark):
    train = spark.createDataFrame(TRAIN + [(7, "extra dist doc", "dist")],
                                  "doc_id long, text string, lang string")
    test = spark.createDataFrame([(20, "")], "doc_id long, text string")
    word_ll, stats = nb_train(train, "text", "lang")
    rows = nb_predict(test, word_ll, stats).collect()
    assert rows[0]["pred_label"] == "dist"  # 4 of 7 train docs
