"""Keyed snapshot upsert (CDC merge) — maintain a mutable logical table
on immutable storage.

The reference's datasets are immutable once stored (DSet save paths,
`/root/reference/src/CoreLib/DSet.fs` store/saveToHDD tier; re-storing
means rewriting the whole DSet). A 100 TB corpus cannot rewrite itself
to apply a day of updates, so this module provides the merge primitive
Spark-first:

- :func:`upsert` — pure-DataFrame merge: rows in ``updates`` replace
  same-key rows in ``base``; unseen keys insert. The base side is only
  ANTI-JOINED against the update keyset — when updates are small
  (the overwhelmingly common CDC case) the keyset broadcasts and the
  base table is never shuffled at all.
- :func:`upsert_partitioned` — the bounded-write-amplification form:
  only partitions that actually contain updated keys are read, merged,
  and dynamically overwritten; untouched partitions are not rewritten
  (asserted in tests/test_upsert.py by file identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(
    updates: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """Collapse an update stream to one row per key — the LAST write
    wins by ``order_col``. row_number window on the key: narrow shuffle
    of the updates only (WindowGroupLimit bounds it pre-shuffle)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    broadcast_keys: bool | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``base`` by ``keys``: replace matches,
    insert the rest. With ``order_col``, multi-row-per-key update
    batches collapse to the latest first.

    Scale shape: base is LEFT ANTI joined against the distinct update
    keyset — never a full-outer join (which would shuffle BOTH sides on
    the key). ``broadcast_keys=True`` forces the keyset broadcast (the
    common small-CDC-batch case: the snapshot is then never shuffled at
    all); the default ``None`` lets Catalyst/AQE pick, which broadcasts
    automatically under the threshold and falls back to a shuffled anti
    join for genuinely huge update batches."""
    if order_col is not None:
        updates = latest_per_key(updates, keys, order_col)
    updates = updates.select(*base.columns)
    keyset = updates.select(*keys).distinct()
    if broadcast_keys:
        keyset = F.broadcast(keyset)
    survivors = base.join(keyset, keys, "left_anti")
    return survivors.unionByName(updates)


def upsert_versioned(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Newest-wins merge: for each key keep the single highest-``version_col``
    row WHETHER IT COMES FROM BASE OR UPDATES (base wins version ties —
    re-applying an already-applied batch must be a no-op). Unlike
    :func:`upsert`, a stale update can never clobber a newer snapshot
    row, which makes the merge idempotent under ARBITRARY redelivery —
    the property the streaming CDC sink relies on.

    Cost: the union shuffles on the key (row_number window) — apply it
    to the TOUCHED slice of the snapshot (see :func:`upsert_partitioned`),
    never the whole table."""
    tagged = base.select(*base.columns).withColumn(
        "__src", F.lit(0)
    ).unionByName(updates.select(*base.columns).withColumn("__src", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").asc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def upsert_partitioned(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str,
    order_col: str | None = None,
    version_col: str | None = None,
) -> None:
    """Apply ``updates`` to a ``partition_col``-partitioned parquet
    snapshot in place, rewriting ONLY the partitions that contain
    updated keys (plus any partitions new keys land in).

    Mechanics: the distinct update partition values prune the snapshot
    scan (partition filter — untouched partitions are never read), the
    pruned slice merges via :func:`upsert`, and
    ``partitionOverwriteMode=dynamic`` overwrites exactly the written
    partition directories. Write amplification is O(touched partitions),
    not O(table) — the property that makes daily CDC viable at 100 TB.

    With ``version_col`` the merge is :func:`upsert_versioned`
    (newest-wins against the snapshot itself — idempotent under any
    redelivery); otherwise :func:`upsert` (updates always win — the
    cheaper plan, correct for exactly-once feeds).

    The update batch must carry ``partition_col`` (it is part of the
    row). Updates that MOVE a key between partitions are out of scope
    (delete-from-old-partition requires a tombstone feed; documented
    limitation, same as Hive dynamic-partition merges). The driver-side
    partition list is bounded by #touched partitions.
    """
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # NULL partition values need an explicit isNull branch: isin() never
    # matches NULL, so without it the NULL-partition base slice would be
    # excluded from the merge while dynamic overwrite still rewrites
    # __HIVE_DEFAULT_PARTITION__ with update-only rows — silently
    # deleting every pre-existing NULL-partition key not in the batch.
    non_null = [p for p in parts if p is not None]
    cond = (
        F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    )
    if len(non_null) != len(parts):
        cond = cond | F.col(partition_col).isNull()
    base = spark.read.parquet(base_path).where(cond)
    if version_col is not None:
        merged = upsert_versioned(base, updates, keys, version_col)
    else:
        merged = upsert(base, updates, keys, order_col=order_col)
    # per-writer option, not a session-conf flip: no global state to
    # save/restore, and concurrent jobs on the session are unaffected
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(partition_col).parquet(base_path)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """CDC GENERATION — the inverse of :func:`upsert`: diff two keyed
    snapshots into a change feed. Output = key columns + ``change_type``
    ('insert' | 'delete' | 'update'); unchanged rows are dropped.

    Implementation: one full-outer join on the key with null-safe
    struct comparison of the non-key columns — change detection is a
    single JVM expression, no hashing round-trip, and the join is the
    unavoidable shuffle (both sides keyed; AQE handles skew). The output
    is a KEY certificate, not self-contained CDC (no value columns ride
    along): to replay, semi-join ``new`` on the update+insert keys and
    feed THOSE rows to :func:`upsert` — that round trip reproduces
    ``new`` from ``old`` exactly (asserted in tests/test_upsert.py)."""
    val_cols = [c for c in old.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, keys, "full_outer")
    o_key = F.col(f"o.{keys[0]}")
    n_key = F.col(f"n.{keys[0]}")
    o_val = F.struct(*[F.col(f"o.{c}") for c in val_cols])
    n_val = F.struct(*[F.col(f"n.{c}") for c in val_cols])
    return (
        joined.withColumn(
            "change_type",
            F.when(o_key.isNull(), "insert")
            .when(n_key.isNull(), "delete")
            .when(~o_val.eqNullSafe(n_val), "update"),
        )
        .where(F.col("change_type").isNotNull())
        .select(
            *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
            "change_type",
        )
    )
