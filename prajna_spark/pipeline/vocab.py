"""Vocabulary build + document encoding — the token→id step of a
training-data pipeline (the stage between curation and sequence packing:
``encode → pack_sequences`` turns a curated corpus into model-ready id
streams).

- :func:`build_vocab`: corpus token counts → contiguous frequency-ranked
  ids (0 = most frequent; ties broken by token text so the mapping is
  deterministic). The ranking is a GLOBAL total order — spelled through
  ``operators.zipindex.zip_with_index``, not a partition-collapsing
  ``row_number() OVER (ORDER BY ...)``, so a 100 TB corpus's vocab ranks
  without a single-task sort. Corpus-sized work is one map-combined
  wordcount shuffle; everything after runs on #vocab rows.

- :func:`encode_documents`: token arrays → id arrays via the vocab
  mapping (unknown tokens → ``oov_id``). The vocab is broadcast by
  default (an id mapping at ~16 bytes/row broadcasts comfortably at
  millions of entries); pass ``broadcast_vocab=False`` to shuffle-join on
  the token instead. One data-sized shuffle: the positional re-assembly
  groupBy. Tokenization is ``pipeline.textqa.tokens`` — the same
  normalization every other text operator uses, so ids are consistent
  with the dedup/quality tiers.

Reference parity: Prajna has no NLP/encoding surface (SURVEY §2);
declared Spark-native north-star addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prajna_spark.operators.zipindex import zip_with_index
from prajna_spark.pipeline.textqa import tokens


def build_vocab(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """``(token, cnt, token_id)`` with token_id a 0-based contiguous rank
    by (cnt desc, token asc). ``min_count`` prunes the long tail before
    ranking (the standard vocab cutoff)."""
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    return zip_with_index(
        counts, [F.col("cnt").desc(), F.col("token")], "token_id"
    ).select("token", "cnt", "token_id")


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """``(id_col, token_ids array<long>)`` — each document's tokens mapped
    through the vocab in position order; out-of-vocabulary tokens become
    ``oov_id``. Documents with zero tokens keep an empty array (restored
    by a join back to the id spine — a groupBy over exploded tokens would
    silently drop them)."""
    mapping = vocab.select("token", "token_id")
    if broadcast_vocab:
        mapping = F.broadcast(mapping)
    tok = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token")
    )
    encoded = (
        tok.join(mapping, "token", "left")
        .select(
            id_col,
            "pos",
            F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("long").alias("tid"),
        )
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))), lambda s: s.tid
            ).alias("token_ids")
        )
    )
    spine = docs.select(id_col)
    return spine.join(encoded, id_col, "left").select(
        id_col,
        F.coalesce(
            F.col("token_ids"), F.array().cast("array<long>")
        ).alias("token_ids"),
    )
