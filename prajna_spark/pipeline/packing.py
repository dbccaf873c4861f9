"""Sequence packing — the token-budget batching step of LLM pretraining.

Pretraining concatenates shuffled documents into fixed-size token windows
(packs); a document may straddle two packs. The pack assignment is pure
arithmetic over the GLOBAL running token count in a chosen order:

    pack_id(doc)     = floor(cum_before / budget)
    pack_offset(doc) = cum_before - pack_id * budget

where cum_before = sum of token counts of all earlier documents.

The scale problem is the global prefix sum. A naive ``Window.orderBy``
funnels the whole table through ONE partition; instead
``global_prefix_sum`` uses the two-pass range-partition pattern (the same
shape as operators.zipindex):

  1. range-partition + sort by the order key; per-partition running sums
     (window over the partition's own rows — no global funnel);
  2. per-partition TOTALS (one row each) prefix-summed on #partitions
     rows, broadcast back as offsets.

Combined with pipeline.sampling's hash gate this gives the full
shuffle -> pack pipeline deterministically: order by md5(seed|id) is a
reproducible global shuffle, so the same corpus packs identically on
every run — auditable pretraining batches at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.operators.fanout import fan_out
from prajna_spark.operators.lifecycle import scoped_persist


def global_prefix_sum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global running sum of ``value_col`` in ``order_by`` order
    (each row sees the sum of STRICTLY earlier rows). Distributed two-pass:
    no data-sized single-partition window."""
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = scoped_persist(
        sorted_df.withColumn(
            "__local_before", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
        )
    )
    totals = local.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_prefix = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )  # #partitions rows only
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__tot").over(w_prefix), F.lit(0))
    ).select("__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__offset") + F.col("__local_before"))
        .drop("__pid", "__local_before", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_by: list[Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its pack id and in-pack offset for
    fixed-``budget`` token windows in ``order_by`` order (straddling
    documents spill into the next pack, as concatenation-packing does).
    Adds ``pack_id``, ``pack_offset``, and ``cum_before``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    cum = global_prefix_sum(df, order_by, token_col, "cum_before", num_partitions)
    return cum.withColumn(
        "pack_id", F.floor(F.col("cum_before") / budget).cast("long")
    ).withColumn(
        "pack_offset",
        (F.col("cum_before") - F.col("pack_id") * budget).cast("long"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-token chunks with overlap (stride <
    chunk_tokens) — the embedding-pipeline preprocessing step: long
    documents become multiple windows so no content falls outside the
    encoder's context, and the overlap keeps boundary-spanning phrases
    intact in at least one chunk.

    All JVM: tokenize once per row, explode chunk START positions
    (1, 1+stride, 1+2*stride, ... — the Generate keeps tokenization
    evaluated once, the same barrier pattern as ngram_hashes), slice and
    re-join each window. Output grows by ~len/stride — the explode fans
    out with the input partitioning, no shuffle at all; a chunk never
    leaves the task that read its document."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError(f"need 0 < stride <= chunk_tokens, got {stride}, {chunk_tokens}")
    from prajna_spark.pipeline.textqa import tokens as _tokens

    staged = fan_out(
        df.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__tk"))
    ).where(F.size("__tk") > 0)
    # start positions 1, 1+stride, ...: the last chunk starts at or before
    # the final token, so every token lands in >= 1 chunk
    starts = staged.select(
        "id",
        "__tk",
        F.posexplode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("__tk") - (chunk_tokens - 1), F.lit(1))
                + F.when(
                    (F.size("__tk") > chunk_tokens)
                    & ((F.size("__tk") - chunk_tokens) % stride != 0),
                    F.lit(stride),
                ).otherwise(F.lit(0)),
                F.lit(stride),
            )
        ).alias("chunk_id", "__start"),
    ).where(F.col("__start") <= F.size("__tk"))
    piece = F.slice(F.col("__tk"), F.col("__start"), chunk_tokens)
    return starts.select(
        F.col("id").alias(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )
