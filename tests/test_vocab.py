"""Vocabulary build + encode (pipeline/vocab.py): rank semantics,
round-trip, OOV/empty-doc edges, and a local-model differential."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import persist_scope
from prajna_spark.pipeline.vocab import build_vocab, encode_documents


def _tok(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if w]


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog ate the cat food"),
    (2, "cats are not dogs!"),
    (3, ""),          # zero tokens
    (4, "???"),       # normalizes to zero tokens
    (5, "the the the"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _local_vocab(min_count=1):
    cnt = Counter(t for _, text in DOCS for t in _tok(text))
    items = sorted(
        ((c, t) for t, c in cnt.items() if c >= min_count),
        key=lambda x: (-x[0], x[1]),
    )
    return {t: i for i, (c, t) in enumerate(items)}


def test_vocab_ids_are_contiguous_frequency_ranks(spark):
    with persist_scope():
        rows = build_vocab(_df(spark), "text").collect()
    got = {r["token"]: (r["cnt"], r["token_id"]) for r in rows}
    ref = _local_vocab()
    assert {t: i for t, (_, i) in got.items()} == ref
    assert sorted(i for _, i in got.values()) == list(range(len(ref)))


def test_vocab_min_count_cutoff(spark):
    with persist_scope():
        rows = build_vocab(_df(spark), "text", min_count=2).collect()
    assert {r["token"] for r in rows} == {
        t for t, c in Counter(t for _, x in DOCS for t in _tok(x)).items() if c >= 2
    }


def test_encode_matches_local_model_and_handles_oov_empty(spark):
    df = _df(spark)
    with persist_scope():
        vocab = build_vocab(df, "text", min_count=2)
        enc = {
            r["doc_id"]: r["token_ids"]
            for r in encode_documents(df, vocab, oov_id=-1).collect()
        }
    ref = _local_vocab(min_count=2)
    for doc_id, text in DOCS:
        assert enc[doc_id] == [ref.get(t, -1) for t in _tok(text)], doc_id
    assert enc[3] == [] and enc[4] == []  # empty docs keep empty arrays


def test_encode_shuffle_join_path_matches_broadcast(spark):
    df = _df(spark)
    with persist_scope():
        vocab = build_vocab(df, "text")
        a = {
            r["doc_id"]: r["token_ids"]
            for r in encode_documents(df, vocab, broadcast_vocab=True).collect()
        }
        b = {
            r["doc_id"]: r["token_ids"]
            for r in encode_documents(df, vocab, broadcast_vocab=False).collect()
        }
    assert a == b


def test_encode_then_pack_composes(spark):
    """The intended pipeline shape: encode -> pack_sequences consumes the
    id arrays' length as the token budget input."""
    from prajna_spark.pipeline.packing import pack_sequences

    df = _df(spark)
    with persist_scope():
        vocab = build_vocab(df, "text")
        enc = encode_documents(df, vocab).withColumn(
            "n_tokens", F.size("token_ids").cast("long")
        )
        packed = pack_sequences(enc, "n_tokens", budget=8, order_by=["doc_id"])
        rows = packed.collect()
    assert {r["doc_id"] for r in rows} == {d for d, _ in DOCS}
