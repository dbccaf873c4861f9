"""Distributed global ranking — ntile / dense_rank without the
single-partition window funnel.

Spark's ``ntile(n) OVER (ORDER BY ...)`` / ``dense_rank() OVER (ORDER BY
...)`` with no PARTITION BY move the whole input through ONE task
(WindowExec warns "Moving all data to a single partition"); at 100 TB that
is a non-starter. The reference has no window machinery at all (SURVEY.md
§2.11) — these are declared upgrades, built scale-first:

- ``global_ntile``: 0-based global index from operators.zipindex (range
  repartition + per-partition ordinals + #partitions-sized prefix sum),
  then the exact SQL NTILE bucket arithmetic (first ``cnt % n`` tiles get
  one extra row) applied per-row from a broadcast 1-row count. Everything
  but the tiny count/offset tables stays fully parallel.
- ``global_dense_rank``: dense rank depends only on the DISTINCT ranking
  keys — rank the (small) distinct set with zip_with_index and join back;
  AQE broadcasts the rank table when it is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prajna_spark.operators.zipindex import zip_with_index


def global_ntile(
    df: DataFrame,
    order_by: list[str | Column],
    n: int,
    tile_col: str = "tile",
) -> DataFrame:
    """SQL-exact ``NTILE(n) OVER (ORDER BY order_by)`` — distributed.

    ``order_by`` must be a unique composite key (ties would make any
    global row ordering, including Spark's own window, nondeterministic).
    """
    idx = "__ntile_idx"
    # the global count rides zip_with_index's own offsets broadcast
    # (total_col): no separate count branch. The former df.agg(count)
    # branch re-inlined the caller's whole upstream subtree into the
    # analyzed plan once per ntile call — chained ntiles
    # (rfm_customer_segments: 3 levels) doubled the plan per level, and
    # Catalyst planning time with it (143 static Exchanges; r11
    # optimization — now one subtree, zero extra joins or jobs).
    indexed = zip_with_index(
        df, order_by=order_by, index_col=idx, total_col="__cnt"
    )
    # SQL NTILE: q = cnt div n, r = cnt mod n; the first r tiles hold q+1
    # rows, the rest hold q. With a 0-based idx the tile boundary sits at
    # r*(q+1); the q == 0 branch (cnt < n) is fully covered by the first
    # arm, so the q-divisor arm never divides by zero.
    q = (F.col("__cnt") / n).cast("long")
    r = F.col("__cnt") % n
    threshold = r * (q + 1)
    i = F.col(idx)
    tile = (
        F.when(i < threshold, (i / (q + 1)).cast("long"))
        .otherwise(r + ((i - threshold) / F.greatest(q, F.lit(1))).cast("long"))
        + 1
    )
    return (
        indexed.withColumn(tile_col, tile.cast("long")).drop(idx, "__cnt")
    )


def global_dense_rank(
    df: DataFrame,
    order_by: list[str],
    rank_col: str = "rank",
) -> DataFrame:
    """SQL-exact ``DENSE_RANK() OVER (ORDER BY order_by)`` — distributed.

    Ranks the distinct ranking-key set (cardinality ≪ rows for any key
    worth dense-ranking) and equi-joins the ranks back on the keys.
    ``order_by`` must be column names (they double as the join keys);
    ascending order. Keys must be NON-NULL: the equi-join would drop
    NULL-keyed rows, and NULL sort position differs between engines
    anyway (Spark ASC is NULLS FIRST, DuckDB NULLS LAST) — pre-filter or
    coalesce NULLs to a sentinel before ranking.
    """
    distinct_keys = df.select(*order_by).distinct()
    ranked = zip_with_index(
        distinct_keys, order_by=list(order_by), index_col="__dr"
    ).withColumn(rank_col, (F.col("__dr") + 1).cast("long")).drop("__dr")
    return df.join(ranked, on=list(order_by), how="inner")
