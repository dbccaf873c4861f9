"""As-of join (point-in-time join) — a custom operator Spark lacks.

The reference has no as-of/range joins either (SURVEY §2.8 'no as-of /
range / interval joins'); this is a declared upgrade, implemented as a
composition of existing DataFrame ops (the (a) strategy from the build
contract — no Pandas UDF needed):

    union both sides → one range shuffle per key → running last-non-null

For each left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key:

1. both sides are union'd with a side marker (right sorts before left on
   ties, giving the inclusive <= semantics);
2. the right payload travels as ONE struct column; a window PARTITIONed BY
   key ORDERed BY (ts, marker) carries the last non-null struct forward
   with ``last(..., ignorenulls)`` over UNBOUNDED PRECEDING..CURRENT ROW —
   a running accumulator, computed in one pass per partition. The single
   struct guarantees all attached values come from the SAME right row even
   when individual payload columns are NULL (per-column fills would mix
   rows — the DuckDB ASOF JOIN divergence);
3. left rows are kept, the struct is expanded into the suffixed columns.

Scale shape: ONE shuffle (the window's hash partition on key), state per
row is O(payload) — never a per-key sort-merge in Python, never an
expanded inequality join. Hot keys: AQE's skew handling splits JOIN
partitions, not window partitions, so a dominant key lands on one task;
the mitigation is a two-level as-of — window over (key, coarse time
bucket) first, then a per-(key, bucket) boundary carry of each bucket's
last right struct into the next bucket (O(#buckets) rows, tiny second
pass). Apply it when a key's row count breaks the per-task memory budget;
the one-shuffle spelling below is right whenever keys are un-degenerate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_sec: float | None = None,
    include_right_ts: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row + ``right_cols`` from the
    matched ``right`` row, matched on ``on``. ``direction`` picks the
    match (the full pandas ``merge_asof`` surface):

    - ``backward`` (default): latest right at-or-before left's ``ts``;
    - ``forward``: earliest right at-or-after;
    - ``nearest``: whichever of the two is closer in time (exact ties
      resolve backward, pandas's rule).

    ``tolerance_sec`` (seconds; ts may be numeric-seconds or timestamp)
    rejects matches farther than the bound — they come back NULL, they
    don't fall through to a farther row (the carry already holds the
    closest candidate in that direction, so filtering it IS rejecting
    the match). ``include_right_ts`` appends the matched row's timestamp
    as ``<ts><suffix>``.

    ``left`` and ``right`` must both have the ``on`` and ``ts`` columns;
    attached columns are renamed ``<col><suffix>``. All attached values
    come from the same matched right row (single-struct carry), including
    its NULLs. Plan: ONE hash shuffle on the key for every direction;
    ``nearest`` adds a second in-partition sort (opposite order), never a
    second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    on = list(on)
    l_tagged = left.withColumn(_MARK, F.lit(1))
    r_tagged = right.select(
        *on,
        ts,
        F.struct(
            F.col(ts).alias("__rts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias(_PAYLOAD),
    ).withColumn(_MARK, F.lit(0))

    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    def carry(descending: bool):
        # right (marker 0) sorts before left at equal ts either way —
        # that is what makes both bounds inclusive
        order = F.col(ts).desc() if descending else F.col(ts).asc()
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col(_MARK))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_PAYLOAD, ignorenulls=True).over(w)

    lsec = F.col(ts).cast("double")

    def bounded(match, delta):
        if tolerance_sec is None:
            return match
        return F.when(delta <= F.lit(float(tolerance_sec)), match)

    if direction in ("backward", "forward"):
        m = carry(descending=(direction == "forward"))
        delta = (
            (lsec - m["__rts"].cast("double"))
            if direction == "backward"
            else (m["__rts"].cast("double") - lsec)
        )
        filled = u.select("*", bounded(m, delta).alias("__f"))
    else:
        b, f = carry(False), carry(True)
        db = lsec - b["__rts"].cast("double")
        df_ = f["__rts"].cast("double") - lsec
        b, f = bounded(b, db), bounded(f, df_)
        pick = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(df_ < db, f)  # exact tie -> backward
            .otherwise(b)
        )
        filled = u.select("*", pick.alias("__f"))
    out_cols = list(right_cols) + (["__rts"] if include_right_ts else [])
    names = list(right_cols) + ([ts] if include_right_ts else [])
    return (
        filled.where(F.col(_MARK) == 1)
        .select(
            *left.columns,
            *[
                F.col(f"__f.{c}").alias(f"{n}{suffix}")
                for c, n in zip(out_cols, names)
            ],
        )
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    bucket_width: int = 3600,
) -> DataFrame:
    """Hot-key-safe as-of join: identical semantics to :func:`asof_join`,
    sharded by coarse time bucket.

    The one-shuffle spelling windows PARTITION BY key — a key holding a
    material fraction of the data lands on ONE task (AQE cannot split
    window partitions). This variant:

    1. windows within (key, floor(ts / bucket_width)) — the hot key is
       spread across its time buckets, bounding any task at one bucket's
       rows;
    2. reduces each bucket to its LAST right payload (one narrow row per
       (key, bucket) that has right rows);
    3. carries the latest earlier-bucket payload into each bucket with an
       EXCLUSIVE running last over the per-bucket rows — a window on the
       key again, but over O(#buckets) rows, not O(events);
    4. a left row's match = within-bucket fill, else the bucket carry-in.

    ``bucket_width`` (``ts`` units) tunes the shard: pick it so a hot
    key's densest bucket fits a task. Exact for any width.
    """
    on = list(on)
    bkt = "__asof_bucket"

    def with_bucket(df: DataFrame) -> DataFrame:
        return df.withColumn(bkt, F.floor(F.col(ts) / bucket_width))

    l_tagged = with_bucket(left).withColumn(_MARK, F.lit(1))
    r_tagged = with_bucket(
        right.select(
            *on,
            ts,
            F.struct(*[F.col(c).alias(c) for c in right_cols]).alias(_PAYLOAD),
        )
    ).withColumn(_MARK, F.lit(0))
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w_in = (
        Window.partitionBy(*on, bkt)
        .orderBy(F.col(ts), F.col(_MARK))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", F.last(_PAYLOAD, ignorenulls=True).over(w_in).alias("__fin")
    )

    # last right payload per (key, bucket) -> exclusive carry into later
    # buckets (tiny second pass: one row per non-empty (key, bucket)).
    # Grouped over the UNION so every bucket a left row lives in gets a
    # carry row even when it holds no right rows (max_by's ordering
    # expression is NULL for left rows, which max_by ignores).
    bucket_last = u.groupBy(*on, bkt).agg(
        F.max_by(
            _PAYLOAD, F.when(F.col(_MARK) == 0, F.col(ts))
        ).alias("__bl")
    )
    w_carry = (
        Window.partitionBy(*on)
        .orderBy(bkt)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = bucket_last.select(
        *on, bkt, F.last("__bl", ignorenulls=True).over(w_carry).alias("__cin")
    )

    out = (
        filled.where(F.col(_MARK) == 1)
        .join(carries, on + [bkt], "left")
        .withColumn("__f", F.coalesce("__fin", "__cin"))
    )
    return out.select(
        *left.columns,
        *[F.col(f"__f.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
