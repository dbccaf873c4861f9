"""Sequence packing — the token-budget batching step of LLM pretraining.

Pretraining concatenates shuffled documents into fixed-size token windows
(packs); a document may straddle two packs. The pack assignment is pure
arithmetic over the GLOBAL running token count in a chosen order:

    pack_id(doc)     = floor(cum_before / budget)
    pack_offset(doc) = cum_before - pack_id * budget

where cum_before = sum of token counts of all earlier documents.

The scale problem is the global prefix sum. A naive ``Window.orderBy``
funnels the whole table through ONE partition; instead
``global_prefix_sum`` distributes it with ONE data-sized shuffle:

  1. sample range boundaries driver-side (the hash-minimal keys via a
     bounded TakeOrderedAndProject, one narrow job) and turn them into a
     bucket-id EXPRESSION monotone in key order;
  2. hash-repartition by bucket; per-bucket running sums (the window's
     clustering requirement is satisfied by that same exchange — the
     range-partition + window-by-partition-id spelling shuffled twice);
  3. per-bucket TOTALS (one row each) prefix-summed on #buckets rows,
     broadcast back as offsets.

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


_SAMPLES_PER_BUCKET = 20


def _boundary_sort_key(row) -> tuple:
    """Python sort key replicating Spark's tuple ordering: per field,
    NULLS FIRST, then the value, with float NaN LAST (Spark orders NaN
    greater than any other double; Python NaN comparisons are unordered,
    so it gets its own top tier)."""
    out = []
    for v in row:
        if v is None:
            out.append((0, 0))
        elif isinstance(v, float) and v != v:
            out.append((2, 0))
        else:
            out.append((1, v))
    return tuple(out)


def _sampled_buckets(df: DataFrame, names: list[str], n: int):
    """Driver-side sampled range boundaries over the composite key
    (RangePartitioner's job, done once here so the bucket id can be a
    plain column EXPRESSION): the ``_SAMPLES_PER_BUCKET * n`` hash-minimal keys — a
    deterministic uniform-ish sample via TakeOrderedAndProject
    (per-partition bounded heap + driver merge; no full sort, no count
    job) — then n-1 evenly spaced picks from the sorted sample. Returns
    (key_struct_col, bucket_expr, n_buckets)."""
    key = F.struct(*[F.col(c) for c in names])
    samp = (
        df.select(key.alias("__k"))
        .withColumn("__h", F.hash("__k"))
        .orderBy("__h", "__k")
        .limit(_SAMPLES_PER_BUCKET * n)
        .select("__k")
        .collect()
    )
    keys = sorted((r["__k"] for r in samp), key=_boundary_sort_key)
    bounds: list = []
    for i in range(1, n if keys else 0):
        b = keys[(i * len(keys)) // n]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    if not bounds:  # empty input or single distinct key: one bucket
        return key, F.lit(0), 1
    ktype = df.select(key.alias("__k")).schema["__k"].dataType
    expr = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        blit = F.struct(
            *[
                F.lit(bounds[i][j]).cast(f.dataType).alias(f.name)
                for j, f in enumerate(ktype.fields)
            ]
        )
        expr = F.when(key < blit, F.lit(i)).otherwise(expr)
    return key, expr, len(bounds) + 1


def global_prefix_sum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global running sum of ``value_col`` in ``order_by`` order
    (each row sees the sum of STRICTLY earlier rows). Distributed, and the
    data crosses the wire ONCE.

    Fast path (all ``order_by`` entries plain ascending column names): a
    sampled-boundary bucket id makes the global order explicit as an
    expression, so ONE hash repartition on the bucket satisfies both the
    shuffle and the local window's clustering requirement. The obvious
    ``repartitionByRange`` + window-by-``spark_partition_id`` spelling
    shuffles the data TWICE — Catalyst cannot see that range partitioning
    already clusters by partition id, so it inserts a second data-sized
    Exchange for the window (measured; same fix as operators.zipindex).
    Bucket ids are monotone in key order by construction, and because
    Spark's struct ``<`` uses full ordering semantics (NULLS FIRST per
    field, NaN last — probed, mirrored in ``_boundary_sort_key``), the
    path is exact for null/NaN keys too. Boundary quality only affects
    BALANCE, never correctness.

    Fallback (sort-expression entries, e.g. ``F.col(x).desc()``): the
    two-pass range-partition spelling.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # both paths execute df twice (a boundary-sampling job, then the main
    # shuffle); persist so the upstream — often a join/agg — runs once
    df = scoped_persist(df)
    names = [c for c in order_by if isinstance(c, str)]
    if len(names) == len(order_by):
        key, bucket, n_buckets = _sampled_buckets(df, names, n)
        w_local = (
            Window.partitionBy("__b")
            .orderBy(*names)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local = scoped_persist(
            df.withColumn("__b", bucket)
            .repartition(n_buckets, "__b")
            .withColumn(
                "__local_before",
                F.coalesce(F.sum(value_col).over(w_local), F.lit(0)),
            )
        )
        part_key = "__b"
    else:
        cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
        sorted_df = (
            df.repartitionByRange(n, *cols)
            .sortWithinPartitions(*cols)
            .withColumn("__b", F.spark_partition_id())
        )
        w_local = (
            Window.partitionBy("__b")
            .orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        local = scoped_persist(
            sorted_df.withColumn(
                "__local_before",
                F.coalesce(F.sum(value_col).over(w_local), F.lit(0)),
            )
        )
        part_key = "__b"
    totals = local.groupBy(part_key).agg(F.sum(value_col).alias("__tot"))
    w_prefix = (
        Window.orderBy(part_key).rowsBetween(Window.unboundedPreceding, -1)
    )  # #buckets rows only
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__tot").over(w_prefix), F.lit(0))
    ).select(part_key, "__offset")
    return (
        local.join(F.broadcast(offsets), part_key)
        .withColumn(out_col, F.col("__offset") + F.col("__local_before"))
        .drop(part_key, "__local_before", "__offset")
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


SENTENCE_PATTERN = r"[^.!?]+[.!?]*"  # in the Java-regex / RE2 intersection


def chunk_by_sentence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 64,
) -> DataFrame:
    """Sentence-boundary chunking — the RAG-style alternative to
    :func:`chunk_documents`'s fixed token windows: chunks never split a
    sentence; a sentence belongs to the chunk its token PREFIX starts in
    (the same start-offset convention as pack_sequences, so a long
    sentence may overflow its chunk rather than be cut).

    Returns ``(id_col, chunk_id, n_sentences, n_tokens)``. Plan:
    sentence split + token counts are one projection (Generate keeps the
    regex pass linear); the running prefix is a per-DOCUMENT window
    (document-sized partitions — never global). The sentence regex lives
    in the Java/RE2 intersection so the SQL oracle tokenizes identically.
    """
    from prajna_spark.pipeline.textqa import token_count

    sents = docs.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_PATTERN), 0)
        ).alias("pos", "sent"),
    ).where(F.trim(F.col("sent")) != "")
    toks = sents.select(id_col, "pos", token_count(F.col("sent")).alias("nt"))
    w_rank = Window.partitionBy(id_col).orderBy("pos")
    ranked = toks.withColumn("rn", F.row_number().over(w_rank) - 1)
    w_cum = (
        Window.partitionBy(id_col)
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = ranked.withColumn("cb", F.coalesce(F.sum("nt").over(w_cum), F.lit(0)))
    return (
        cum.withColumn("chunk_id", F.floor(F.col("cb") / budget).cast("long"))
        .groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sentences"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )
