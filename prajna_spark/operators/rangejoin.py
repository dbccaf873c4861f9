"""Scalable interval (range-containment) join.

SURVEY.md §2.8: the reference has no as-of / range / interval joins —
declared upgrades. operators.asof covers as-of; this module covers
point-in-interval: pair every point p with every interval [s, e] such that
s <= p <= e, with NO equi-key.

Spark has no native range-join optimization: the built-in plan for a pure
inequality join is BroadcastNestedLoopJoin (fine only while one side fits
in memory) or a cartesian product. The scalable spelling is the standard
binning technique: quantize the domain into fixed-width bins, explode each
interval to the bins it overlaps, map each point to its single bin, then
equi-join on the bin id (a plain shuffled hash join Catalyst handles) and
apply the exact containment predicate. Each qualifying (point, interval)
pair meets in exactly one bin — the point's — so no dedup pass is needed.

Cost model: the interval side is replicated by a factor of
(interval_length / bin_width + 1); pick ``bin_width`` near the typical
interval length so the blow-up stays ~2x. Dense bins (hot ranges) are
ordinary join skew — AQE skew-join splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def interval_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_width: int,
    spread_points: int | None = None,
) -> DataFrame:
    """Inner-join ``points`` x ``intervals`` on
    ``start_col <= point_col <= end_col`` (all integral columns in one
    shared domain, e.g. day numbers or epoch seconds).

    Returns one row per qualifying pair carrying the columns of both
    inputs (names must not collide).

    ``spread_points``: explicit partition count for the points side
    before the join. The probe's COMPUTE is pair-cardinality (every
    point scans its bin's candidate intervals) while the points side's
    BYTES can be tiny — a distinct-day frame is a few KB at any data
    size — so AQE's byte-based coalescing serializes the whole
    containment probe into one task (measured r12 at the 10x fixture:
    10.3 s single-task probe in a 12.9 s query, core-count ratio 1.0).
    Callers whose points side is bounded pass an INPUT-scaled count
    (the r11 rolling_distinct pattern, guide §2.5); a repartition
    before an inner join cannot change its rows.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    p = points.withColumn(_BIN, F.floor(F.col(point_col) / bin_width))
    if spread_points:
        # keyless ROUND-ROBIN, deliberately: a hash repartition on
        # point_col is removed as redundant when the caller's points
        # frame is already hash-partitioned on that key (e.g. by a
        # distinct), and the surviving ENSURE_REQUIREMENTS exchange is
        # then AQE-coalesced right back to one task. REPARTITION_BY_NUM
        # round-robin is never elided or coalesced; the pre-repartition
        # local sort (sortBeforeRepartition, retry-determinism) is paid
        # on the tiny points frame only.
        p = p.repartition(spread_points)
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width),
                F.floor(F.col(end_col) / bin_width),
            )
        ),
    )
    return (
        p.join(i, _BIN)
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop(_BIN)
    )
