"""Streaming heavy hitters — incremental Misra-Gries summary maintenance
(the frequent-keys twin of ``kmv_stream``'s distinct counts).

Each micro-batch appends its own MG summaries (pipeline.heavyhitters.
mg_summaries) to a delta store; the read side merges by summing ests and
epses across every (batch, partition) slice. The Mergeable Summaries
bound survives the append-only layout: a key's true count in any slice is
<= est_slice + eps_slice (est 0 when the slice dropped it), so summing
over slices gives true_total <= sum(est) + sum(eps) = upper — no merge
truncation pass is needed for CORRECTNESS, only for summary size (the
store grows by <= m rows per batch partition; ``compact_mg_store`` folds
it back down with the standard subtract-the-(m+1)-th merge whenever read
cost matters).

Replay safety comes from the sketch-then-verify structure itself: a
retried micro-batch that double-appends its summaries only INFLATES upper
bounds — candidates stay a superset of the true heavy hitters, and the
exact confirmation pass (which counts the immutable source, not the
store) removes every false positive. At-least-once appends therefore
yield exactly the batch answer with no batch-id bookkeeping — the same
robustness argument as the KMV store's idempotent merge, reached via
verification instead of idempotence.

Reference parity: Prajna's telemetry loop re-folds live counters on every
analytic cycle (paper §5.2); this store is the bounded-memory version of
that loop for frequency queries. Sketch math: Agarwal et al., "Mergeable
Summaries" (PODS'12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from prajna_spark.pipeline.heavyhitters import mg_summaries


def start_incremental_mg(
    stream: DataFrame,
    key_col: str,
    m: int,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Append each micro-batch's per-partition MG summaries to the store
    as ``(batch_id, part_id, key, est, eps)``. ``batch_id`` namespaces
    ``part_id`` (partition ids repeat across batches) — the read side
    treats every (batch_id, part_id) pair as one summary slice."""

    def append_summaries(batch_df: DataFrame, batch_id: int) -> None:
        (
            mg_summaries(batch_df, key_col, m)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("append")
            .parquet(store_path)
        )

    writer = (
        stream.writeStream.foreachBatch(append_summaries)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def candidates_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Global candidate bounds from the delta store: ``(key, lower,
    upper)``. Identical reasoning to pipeline.heavyhitters.candidate_keys,
    with the slice id being (batch_id, part_id) instead of part_id.

    Bound validity: ``upper`` is a true upper bound even under this
    module's at-least-once replay model — a retried micro-batch that
    double-appends its summaries inflates sum(est) AND total_eps
    together, and est <= true-count-within-slice keeps every appended
    copy conservative upward. ``lower`` is a valid lower bound ONLY
    under exactly-once appends: a double-appended summary inflates
    sum(est) above the true streamed count. The heavy-hitter gate
    consumes only ``upper``; callers needing a replay-safe lower bound
    must dedup the store on (batch_id, part_id) first."""
    store = spark.read.parquet(store_path)
    per_slice_eps = store.groupBy("batch_id", "part_id").agg(
        F.first("eps").alias("eps")
    )
    total = per_slice_eps.agg(F.sum("eps").alias("total_eps"))
    return (
        store.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("lower"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "lower",
            (F.col("lower") + F.col("total_eps")).alias("upper"),
        )
    )


def heavy_hitters_from_store(
    source: DataFrame,
    spark: SparkSession,
    store_path: str,
    key_col: str,
    phi: float,
) -> DataFrame:
    """EXACT keys with count > phi*N, streamed-sketch first: candidates
    from the store's merged upper bounds, exact confirmation counts from
    ``source`` (the immutable table the stream ingested — never the
    store, which is why retried appends cannot corrupt the answer).
    Hash-equal to the batch ``heavy_hitters_exact`` on the same data.
    NULL keys are counted exactly outside the sketch, as in the batch
    path."""
    total = source.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    cands = (
        candidates_from_store(spark, store_path)
        .crossJoin(F.broadcast(total))
        .where(F.col("upper").cast("double") > F.col("n_total") * phi)
        .select(F.col("key").alias(key_col))
    )
    non_null = (
        source.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    null_grp = (
        source.where(F.col(key_col).isNull())
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") > 0)
        .select(
            F.lit(None).cast(dict(source.dtypes)[key_col]).alias(key_col), "n"
        )
    )
    return (
        non_null.unionByName(null_grp)
        .crossJoin(F.broadcast(total))
        .where(F.col("n").cast("double") > F.col("n_total") * phi)
        .select(key_col, "n")
    )


def compact_mg_store(spark: SparkSession, store_path: str, m: int) -> int:
    """Fold the delta store down to ONE m-counter summary (slice id
    batch_id=-1, part_id=0): sum ests per key, subtract the (m+1)-th
    largest so only m counters remain, accumulate the subtraction into
    eps — the standard MG merge, applied store-wide. Bounds after
    compaction are the bounds the merged summary implies (errors add);
    read results stay a superset-of-heavy-hitters certificate, and the
    exact confirmation pass is unaffected. Returns rows written."""
    store = spark.read.parquet(store_path)
    eps_total = (
        store.groupBy("batch_id", "part_id")
        .agg(F.first("eps").alias("eps"))
        .agg(F.sum("eps").alias("e"))
    )
    summed = (
        store.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )
    # the summed frame is summary-sized (<= m x #slices rows), so the
    # single-task global rank is driver-bounded by construction
    ranked = summed.withColumn(
        "__rk",
        F.row_number().over(Window.orderBy(F.col("est").desc(), F.col("key"))),
    )
    cutoff = (
        ranked.where(F.col("__rk") == m + 1)
        .select(F.col("est").alias("c"))
        .unionByName(
            ranked.sparkSession.createDataFrame([(0,)], "c long")
        )
        .agg(F.max("c").alias("c"))
    )
    folded = (
        ranked.crossJoin(F.broadcast(cutoff))
        .where(F.col("__rk") <= m)
        .select(
            F.lit(-1).alias("batch_id"),
            F.lit(0).alias("part_id"),
            "key",
            (F.col("est") - F.col("c")).alias("est"),
        )
        .where(F.col("est") > 0)
        .crossJoin(F.broadcast(eps_total.crossJoin(cutoff).select(
            (F.col("e") + F.col("c")).alias("eps")
        )))
        .select("batch_id", "part_id", "key", "est", "eps")
    )
    pdf = folded.toPandas()
    n = len(pdf)
    spark.createDataFrame(
        pdf, "batch_id int, part_id int, key " +
        dict(store.dtypes)["key"] + ", est long, eps long"
    ).coalesce(1).write.mode("overwrite").parquet(store_path)
    return n
