"""Multinomial Naive Bayes over token counts — train and predict as
pure DataFrame algebra.

The classifier a 100 TB curation pipeline actually ships: cheap,
streaming-friendly (the model is three small aggregates), and fully
expressible as joins + hash aggregations — no ML runtime, no Python in
the hot path, so both training and scoring ride whole-stage codegen.

Model (Laplace-smoothed):
  logprior(c)   = ln(docs_c / docs_total)
  ll(w, c)      = ln((count(w, c) + 1) / (tokens_c + V))
  default_ll(c) = ln(1 / (tokens_c + V))          -- unseen words
  score(d, c)   = logprior(c) + sum_w n(d, w) * ll(w, c)

Every term is integer counts through libm ``ln`` and IEEE division —
bit-identical cross-engine (see the verify notes); only the final
per-(doc, class) SUM is order-sensitive, handled by the catalog's
standard portable rounding before the argmax.

Scale notes:
- the model is (vocab x classes) rows of (word, label, ll) — one narrow
  shuffle keyed on (label, word) to build, shuffle-hash-joinable against
  scoring traffic at any corpus size (class count and priors are
  broadcast one-row/`n_classes`-row frames);
- scoring = token explode -> per-(doc, word) count -> one join to the
  model -> one hash agg per (doc, class) -> one doc-keyed window for the
  argmax. No collect, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.pipeline.textqa import tokens


def _doc_word_counts(docs: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    return (
        docs.select(*id_cols, F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy(*id_cols, "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def nb_train(
    train: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> tuple[DataFrame, DataFrame]:
    """-> (word_ll, class_stats).

    word_ll: (label, word, ll) for every (train-vocab word x class).
    class_stats: (label, logprior, default_ll) — n_classes rows.
    Materializing the full vocab x class grid keeps scoring a single
    left join (absent pair == unseen == default_ll, coalesced there).
    """
    from prajna_spark.operators.lifecycle import scoped_local_checkpoint

    from prajna_spark.operators.fanout import fan_out

    # checkpointed eagerly: the (label, word, n) counts feed
    # tokens_per_label, the vocab, AND the likelihood grid join — without
    # materialization the exploding tokenization + aggregation ran once
    # per consumer (r11; 23 static shuffles down to the model algebra).
    # fan_out first: a single-split corpus tokenized serially inside the
    # cut (conditional no-op at scale; r11, guide §2.5)
    wc = scoped_local_checkpoint(
        _doc_word_counts(fan_out(train), [label_col], text_col).withColumnRenamed(
            label_col, "label"
        )
    )
    tokens_per_label = wc.groupBy("label").agg(F.sum("n").alias("t_l"))
    vocab = wc.select("word").distinct()
    v = vocab.agg(F.count(F.lit(1)).alias("v"))

    grid = vocab.crossJoin(F.broadcast(tokens_per_label)).crossJoin(F.broadcast(v))
    word_ll = (
        grid.join(wc, ["label", "word"], "left")
        .select(
            "label",
            "word",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + 1)
                / (F.col("t_l") + F.col("v")).cast("double")
            ).alias("ll"),
        )
    )

    doc_counts = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("d_l")
    )
    total = train.agg(F.count(F.lit(1)).alias("d"))
    class_stats = (
        doc_counts.crossJoin(F.broadcast(total))
        .join(tokens_per_label, "label")
        .crossJoin(F.broadcast(v))
        .select(
            "label",
            F.log(F.col("d_l") / F.col("d").cast("double")).alias("logprior"),
            F.log(F.lit(1.0) / (F.col("t_l") + F.col("v")).cast("double")).alias(
                "default_ll"
            ),
        )
    )
    # n_classes rows, but its lineage re-runs two train-table aggregates
    # per consumer and nb_predict broadcasts it twice — one trivial
    # materialization job ends that (r11)
    return word_ll, scoped_local_checkpoint(class_stats)


def nb_predict(
    docs: DataFrame,
    word_ll: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_decimals: int = 6,
) -> DataFrame:
    """-> (id_col, pred_label, score): argmax_c of the rounded NB score,
    ties broken by label ascending. Docs with zero tokens score on the
    prior alone (plus nothing), still deterministic."""
    from prajna_spark.functions.rounding import pround

    dw = _doc_word_counts(docs, [id_col], text_col)
    labelled = dw.crossJoin(F.broadcast(class_stats.select("label", "default_ll")))
    token_ll = labelled.join(
        word_ll.hint("SHUFFLE_HASH"), ["label", "word"], "left"
    ).select(
        id_col,
        "label",
        (F.col("n") * F.coalesce(F.col("ll"), F.col("default_ll"))).alias("part"),
    )
    doc_scores = token_ll.groupBy(id_col, "label").agg(F.sum("part").alias("s"))
    # docs with no tokens still need a row per class: right-join the
    # (doc x class) grid derived from the docs frame itself
    grid = docs.select(id_col).crossJoin(
        F.broadcast(class_stats.select("label", "logprior"))
    )
    scored = grid.join(doc_scores, [id_col, "label"], "left").select(
        id_col,
        "label",
        pround(
            F.col("logprior") + F.coalesce(F.col("s"), F.lit(0.0)), round_decimals
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("pred_label"), "score")
    )
