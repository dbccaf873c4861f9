"""Distributed 2-D skyline (Pareto frontier).

Semantics: minimize ``x``, maximize ``y`` (other orientations are a sign
flip at the call site). A point p is DOMINATED iff some q has
``q.x <= p.x AND q.y >= p.y`` with at least one inequality strict; the
skyline is the set of non-dominated points. Exact duplicates do not
dominate each other, so the result is one row per distinct surviving
``(x, y)`` pair with its multiplicity — the standard skyline contract.

Algorithm — monotone prefix-max over the ``(x asc, y desc)`` total order:
among DISTINCT pairs, the points ordered strictly before p are exactly
``{q : q.x < p.x, or q.x = p.x and q.y > p.y}`` — precisely p's candidate
dominators. So p is on the frontier iff ``p.y > max(y)`` over the strict
prefix (or the prefix is empty). One linear scan after a sort; no
pairwise dominance join.

The naive window spelling of that scan is a GLOBAL order — every row
through one reducer. This module distributes it exactly like
``pipeline.packing.global_prefix_sum``: driver-sampled range boundaries
become a bucket-id EXPRESSION (monotone in the sort order by
construction), one hash repartition on the bucket satisfies the local
window's clustering, and the cross-bucket carry is a prefix-max over the
#buckets-row bucket summary, broadcast back. Distinct pairs cross the
wire once; at 100 TB the only data-sized costs are the distinct
pre-aggregation (map-side combined) and that single repartition.

Reference parity: Prajna ships no skyline/preference operator (SURVEY
§2); declared Spark-native addition in the analytics tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.operators.lifecycle import scoped_persist
from prajna_spark.pipeline.packing import _sampled_buckets


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pareto frontier minimizing ``x_col``, maximizing ``y_col`` (both
    numeric, nulls excluded — dominance is undefined against null).
    Returns ``(x_col, y_col, n_rows)``: the distinct frontier points and
    how many input rows sit on each."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    pts = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn("__yneg", -F.col(y_col))
    )
    # executed twice: once for boundary sampling, once for the main pass
    pts = scoped_persist(pts)
    _, bucket, _ = _sampled_buckets(pts, [x_col, "__yneg"], n)
    b = pts.withColumn("__b", bucket).repartition(n, "__b")
    # strict-prefix max within the bucket (rows clustered by the same
    # repartition the window needs — no second exchange, as in packing)
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col(x_col).asc(), F.col("__yneg").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("__lmax", F.max(y_col).over(w))
    # cross-bucket carry: max y of every STRICTLY earlier bucket — a
    # #buckets-row aggregate, so the global window over it is trivial
    wc = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        local.groupBy("__b")
        .agg(F.max(y_col).alias("__bmax"))
        .withColumn("__cmax", F.max("__bmax").over(wc))
        .select("__b", "__cmax")
    )
    prev = F.greatest("__lmax", "__cmax")  # greatest() skips nulls
    return (
        local.join(F.broadcast(carry), "__b")
        .where(prev.isNull() | (F.col(y_col) > prev))
        .select(x_col, y_col, "n_rows")
    )
