"""N-gram language-model scoring — corpus-level fluency signals for
curation (a document whose token transitions are improbable under the
corpus's own bigram statistics is boilerplate, ciphertext, or noise; the
classic cheap perplexity filter).

- :func:`bigram_counts` — corpus bigram + unigram (as-history) counts.
- :func:`score_documents` — per-document mean negative log-likelihood
  under the add-k-smoothed bigram model
  ``P(w2|w1) = (c12 + k) / (c1 + k*V)``.

Scale shapes: bigrams are zipped map-side out of each document's token
array (no explode-then-window, no doc-keyed shuffle); every join keys on
the narrow (w1, w2) / w1 token strings with map-side-combined counts. Cross-engine exactness: counts are integers, the smoothed
probability is one IEEE division, ``ln`` is libm-identical — only the
per-document sum order varies (rounded by the caller).

Reference parity: Prajna has no statistical-NLP surface (SURVEY §2);
declared Spark-native north-star addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import scoped_local_checkpoint
from prajna_spark.pipeline.textqa import tokens


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) for every adjacent token pair in each document —
    zipped MAP-SIDE out of each doc's token array (slice + zip_with).
    The former spelling posexploded to token rows and ran a lead window,
    which shuffled the whole exploded token frame by doc id for what is
    a per-row computation (r11; same rewrite as the BPE pair counter).
    Docs with < 2 tokens produce no rows, as before."""
    tk = tokens(F.col(text_col))
    n1 = F.greatest(F.size(tk) - 1, F.lit(0))
    return docs.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(tk, 1, n1),
                F.slice(tk, 2, n1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("__p"),
    ).select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))


def bigram_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Returns (bigrams_df, c12_df, c1_df, vocab_size_df): the per-doc
    bigram stream plus corpus statistics. ``c1`` counts w1 as a bigram
    HISTORY (i.e. over the same bigram population c12 marginalizes), so
    sum over w2 of P(w2|w1) is exactly 1 under add-k smoothing.
    ``vocab_size_df`` is a one-row frame (distinct token count) meant to
    be consumed via a broadcast cross join — never collected."""
    from prajna_spark.operators.fanout import fan_out

    # single-split corpora tokenize serially — spread the raw rows
    # before the map-heavy bigram zip and the vocab explode (conditional
    # no-op on many-split tables at scale; r11, guide §2.5)
    docs = fan_out(docs)
    # eager checkpoint: the bigram stream feeds c12, c1, AND the scoring
    # join's probe side in ONE job — a lazy persist let those branches
    # race to compute the tokenization up to three times (r11)
    bigrams = scoped_local_checkpoint(_doc_bigrams(docs, id_col, text_col))
    c12 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.countDistinct("t").cast("long").alias("v_size"))
    )
    return bigrams, c12, c1, vocab


def score_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """(id, n_bigrams, avg_nll): mean negative log-likelihood of each
    document's bigrams under the corpus model with add-k smoothing.
    Documents with < 2 tokens have no bigrams and are absent (they carry
    no transition evidence). Joins: bigram-keyed (narrow strings) for
    c12, history-keyed for c1, one-row broadcast for V."""
    bigrams, c12, c1, vocab = bigram_counts(docs, id_col, text_col)
    scored = (
        bigrams.join(c12, ["w1", "w2"])  # every bigram exists in the corpus
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__nll",
            -F.log(
                (F.col("c12") + F.lit(k))
                / (F.col("c1") + F.lit(k) * F.col("v_size"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.avg("__nll").alias("avg_nll"),
    )
