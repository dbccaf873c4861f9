"""Item-item co-occurrence similarity (collaborative filtering).

"Users who bought X also bought Y" over basket data — the canonical
recommendation primitive a deployment of the reference's aggregation
tier would build from its order stream (SURVEY §2.6 groupBy family;
the reference computes the same co-occurrence shape imperatively in its
`mapReduce` examples, `/root/reference/samples/WordCount` being the
1-item degenerate case).

Scale discipline — the all-pairs trap: pair generation inside a basket
is |basket|² and real baskets are skewed (one crawl session can touch
millions of items). The cap is therefore structural, not advisory: each
basket keeps its ``cap`` lowest item ids (deterministic, replayable)
BEFORE the self-join, bounding the blow-up at cap²/2 rows per basket.
Every shuffle after that carries narrow keys — (basket) for the
self-join, (item, item) for the pair count — never baskets themselves.
Cosine over capped-basket counts: sim(i,j) = c_ij / sqrt(c_i * c_j),
IEEE-exact on integer counts (product < 2^52), so both engines rank the
same doubles; a portable round before ranking absorbs nothing but keeps
the catalog convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import pround


def capped_baskets(
    items: DataFrame, basket_col: str, item_col: str, cap: int
) -> DataFrame:
    """Distinct (basket, item) pairs, keeping each basket's ``cap``
    lowest item ids. The row_number window rewrites to WindowGroupLimit:
    a PARTIAL limit bounds each partition's survivors before the shuffle
    (same plan shape the stratified sampler asserts in
    tests/test_sampling.py)."""
    d = items.select(basket_col, item_col).distinct()
    w = Window.partitionBy(basket_col).orderBy(item_col)
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def item_pair_counts(
    baskets: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Co-occurrence counts c_ij (i < j) from a capped basket frame: an
    equi-self-join on the basket key (one narrow shuffle — both sides
    are the same scope-persisted frame) then a pair-keyed count."""
    a = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_i")
    )
    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item_j")
    )
    return (
        a.join(b, "_b")
        .where(F.col("item_i") < F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ij"))
    )


def item_similarity_topk(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    cap: int = 16,
    k: int = 5,
    sim_decimals: int = 6,
) -> DataFrame:
    """Top-``k`` most-similar items per item by co-occurrence cosine.

    Pipeline: cap baskets -> pair counts -> symmetrize (each undirected
    pair serves both endpoints' candidate lists) -> attach item
    frequencies (computed over the SAME capped frame so the cosine is
    internally consistent) -> rank per item with a deterministic
    (sim desc, neighbor asc) tie-break. Returns
    (item, neighbor, c_pair, c_item, c_neighbor, sim, rk).
    """
    from prajna_spark.operators.lifecycle import scoped_local_checkpoint

    # checkpointed EAGERLY (not lazily persisted): the self-join below
    # reads the capped frame on BOTH sides, and lazy persist let the two
    # join-input stages race to populate the cache — the whole
    # window+shuffle subtree executed twice (measured r11: the two
    # duplicate 12.5 MB-write stages in the profile). An eager
    # materialization costs one small job and both sides then read the
    # stored partitions.
    capped = scoped_local_checkpoint(
        capped_baskets(items, basket_col, item_col, cap)
    )
    # symmetric pair counts in ONE pass: the former spelling unioned the
    # (i < j) pair aggregate with its flipped copy, which ran the basket
    # self-join + aggregation TWICE (both union branches). Counting both
    # orientations directly doubles the join's output rows but halves
    # the number of joins/aggregations — identical total volume, one
    # pass (guide §2.4). Map-side partial aggregation bounds the shuffle
    # at distinct-pairs per map partition either way.
    a = capped.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("item")
    )
    b = capped.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("neighbor")
    )
    sym = (
        a.join(b, "_b")
        .where(F.col("item") != F.col("neighbor"))
        .groupBy("item", "neighbor")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ij"))
    )
    freq = capped.groupBy(item_col).agg(
        F.count(F.lit(1)).cast("long").alias("_ci")
    )
    # join order is deliberate: neighbor-keyed lookup FIRST, item-keyed
    # lookup second — the final window partitions by item, so the last
    # join's hash partitioning on item satisfies the window's clustering
    # and the plan needs no third pair-cardinality exchange.
    scored = (
        sym.join(
            freq.select(
                F.col(item_col).alias("neighbor"), F.col("_ci").alias("c_neighbor")
            ),
            "neighbor",
        )
        .join(freq.withColumnRenamed(item_col, "item"), "item")
        .withColumnRenamed("_ci", "c_item")
        .select(
            "item",
            "neighbor",
            F.col("c_ij").alias("c_pair"),
            "c_item",
            "c_neighbor",
            pround(
                F.col("c_ij").cast("double")
                / F.sqrt(
                    F.col("c_item").cast("double") * F.col("c_neighbor").cast("double")
                ),
                sim_decimals,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("sim").desc(), F.col("neighbor"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
