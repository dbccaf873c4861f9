"""BPE merge learning — tokenizer training as a dataflow.

Byte-pair encoding trains on the WORD-FREQUENCY table, not the raw
corpus: a 100 TB corpus reduces to |vocab| rows (word, freq) in one
aggregate, and every merge round then counts adjacent symbol pairs over
that reduced table weighted by freq — the shape that makes tokenizer
training a Spark job instead of a single-machine pass.

Representation: each word is a spaced symbol string with sentinel
padding (`` t a b l e ``); a merge of pair (a, b) is a plain substring
``replace(' a b ', ' ab ')``. Plain replace scans left-to-right
non-overlapping on BOTH engines (probed: ``' a a a '`` -> ``' aa a '``),
which is exactly BPE's greedy-left merge order — so the whole learned
merge sequence is deterministic and replayable in SQL as a fixed-depth
ladder. Argmax ties break on (count desc, left, right).

Driver state is the merge list itself (n_merges rows — the MODEL, same
adjudication as k-means centroids); pair counting stays distributed.

Reference parity: Prajna has no text tooling at all (SURVEY §2.10);
this is north-star LLM-pipeline surface alongside pipeline.vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spaced_symbols(word):
    """`` t a b l e `` — symbols spaced, sentinel spaces both ends."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


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
        F.col(word_col).alias("__w"),
        F.col(freq_col).cast("long").alias("__f"),
        spaced_symbols(F.col(word_col)).alias("__s"),
    ).localCheckpoint()
    merges = []
    for rnd in range(1, n_merges + 1):
        toks = corpus.select(
            "__w",
            "__f",
            F.posexplode(F.split(F.trim("__s"), " ")).alias("__p", "__t"),
        )
        right = toks.select(
            F.col("__w").alias("__w2"),
            F.col("__p").alias("__p2"),
            F.col("__t").alias("__t2"),
        )
        top = (
            toks.join(
                right,
                (F.col("__w2") == F.col("__w"))
                & (F.col("__p2") == F.col("__p") + 1),
            )
            .groupBy(
                F.col("__t").alias("left"), F.col("__t2").alias("right")
            )
            .agg(F.sum("__f").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        la, lb, c = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rnd, la, lb, int(c)))
        nxt = corpus.withColumn(
            "__s",
            F.replace(
                "__s", F.lit(f" {la} {lb} "), F.lit(f" {la}{lb} ")
            ),
        ).localCheckpoint()
        corpus.unpersist()
        corpus = nxt
    return spark.createDataFrame(
        merges, "round long, left string, right string, pair_count long"
    )


def apply_merges(words: DataFrame, word_col: str, merges: list) -> DataFrame:
    """Segment each word with an ordered merge list [(left, right), ...]:
    the same greedy-left replace chain the learner ran, applied as one
    lazy column expression pipeline (no jobs). Adds ``bpe_tokens`` (the
    symbol array) and ``n_tokens``."""
    s = spaced_symbols(F.col(word_col))
    for la, lb in merges:
        s = F.replace(s, F.lit(f" {la} {lb} "), F.lit(f" {la}{lb} "))
    toks = F.split(F.trim(s), " ")
    return words.withColumn("bpe_tokens", toks).withColumn(
        "n_tokens", F.size(toks).cast("long")
    )
