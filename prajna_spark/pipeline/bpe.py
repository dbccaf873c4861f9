"""BPE merge learning — tokenizer training as a dataflow.

Byte-pair encoding trains on the WORD-FREQUENCY table, not the raw
corpus: a 100 TB corpus reduces to |vocab| rows (word, freq) in one
aggregate, and every merge round then counts adjacent symbol pairs over
that reduced table weighted by freq — the shape that makes tokenizer
training a Spark job instead of a single-machine pass.

Merging uses classic BPE greedy-left non-overlapping semantics, spelled
POSITIONALLY so it is a pure window/array computation identical on both
engines: a position is a candidate iff (tok, next) == (la, lb); when
la != lb candidates can never be adjacent, so every candidate merges;
when la == lb candidates form runs inside maximal equal-token islands
and greedy takes every OTHER one from the island start (even relative
parity). A token is dropped iff its predecessor merged. (A first cut
spelled the merge as a substring replace over spaced symbols; the
hypothesis differential against a local greedy learner caught that
replace consumes the shared boundary — ``a a a a`` became ``[aa, a, a]``
instead of BPE's ``[aa, aa]`` — and the DuckDB oracle shared the
blindspot. The positional spelling is exact.)

Driver state is the merge list itself (n_merges rows — the MODEL, same
adjudication as k-means centroids); pair counting stays distributed.

Reference parity: Prajna has no text tooling at all (SURVEY §2.10);
this is north-star LLM-pipeline surface alongside pipeline.vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import scoped_local_checkpoint


def char_tokens(word) -> F.Column:
    """array<string> of the word's characters."""
    return F.split(
        F.trim(F.regexp_replace(word, "(.)", "$1 ")), " "
    )


def merge_pair(corpus: DataFrame, la: str, lb: str) -> DataFrame:
    """Apply ONE greedy-left merge of (la, lb) to a (word, freq, toks)
    frame — the positional spelling (see module docstring)."""
    t = corpus.select(
        "word",
        "freq",
        F.posexplode("toks").alias("pos0", "t"),
    ).withColumn("pos", F.col("pos0") + 1)
    w_ord = Window.partitionBy("word").orderBy("pos")
    t = t.withColumn("nxt", F.lead("t").over(w_ord)).withColumn(
        "__isl",
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("word", "t").orderBy("pos")
        ),
    )
    t = t.withColumn(
        "__istart",
        F.min("pos").over(Window.partitionBy("word", "t", "__isl")),
    )
    cand = (F.col("t") == la) & (F.col("nxt") == lb)
    if la == lb:
        taken = cand & ((F.col("pos") - F.col("__istart")) % 2 == 0)
    else:
        taken = cand
    t = t.withColumn("__taken", taken).withColumn(
        "__prev_taken",
        F.coalesce(F.lag("__taken").over(w_ord), F.lit(False)),
    )
    out = t.select(
        "word",
        "freq",
        "pos",
        F.when(F.col("__taken"), F.lit(la + lb))
        .when(F.col("__prev_taken"), F.lit(None))
        .otherwise(F.col("t"))
        .alias("tok"),
    ).where(F.col("tok").isNotNull())
    return out.groupBy("word", "freq").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s["tok"],
        ).alias("toks")
    )


def _top_pair(corpus: DataFrame):
    """Most frequent adjacent pair (freq-weighted), ties to smallest
    (left, right). Returns a one-row list or []."""
    t = corpus.select(
        "word", "freq", F.posexplode("toks").alias("pos", "t")
    )
    nxt = t.select(
        F.col("word").alias("w2"),
        (F.col("pos") - 1).alias("p2"),
        F.col("t").alias("t2"),
    )
    return (
        t.join(
            nxt,
            (F.col("w2") == F.col("word")) & (F.col("p2") == F.col("pos")),
        )
        .groupBy(F.col("t").alias("left"), F.col("t2").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left", "right")
        .limit(1)
        .collect()
    )


def learn_bpe_merges(
    words: DataFrame,
    word_col: str,
    freq_col: str,
    n_merges: int = 8,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a (word, freq)
    table. Returns (round, left, right, pair_count) — the ordered merge
    list that defines the tokenizer."""
    spark = words.sparkSession
    corpus = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
        char_tokens(F.col(word_col)).alias("toks"),
    ).transform(scoped_local_checkpoint)
    merges = []
    for rnd in range(1, n_merges + 1):
        top = _top_pair(corpus)
        if not top:
            break
        la, lb, c = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rnd, la, lb, int(c)))
        nxt = merge_pair(corpus, la, lb).transform(scoped_local_checkpoint)
        corpus.unpersist()
        corpus = nxt
    return spark.createDataFrame(
        merges, "round long, left string, right string, pair_count long"
    )


def apply_merges(words: DataFrame, word_col: str, merges: list) -> DataFrame:
    """Segment each word with an ordered merge list [(left, right), ...]
    — the same positional greedy merge the learner ran, applied round by
    round. Adds ``bpe_tokens`` and ``n_tokens``."""
    corpus = words.select(
        F.col(word_col).alias("word"),
        F.lit(1).cast("long").alias("freq"),
        char_tokens(F.col(word_col)).alias("toks"),
    )
    for la, lb in merges:
        corpus = merge_pair(corpus, la, lb)
    return (
        corpus.select(
            F.col("word").alias(word_col),
            F.col("toks").alias("bpe_tokens"),
            F.size("toks").cast("long").alias("n_tokens"),
        )
    )
