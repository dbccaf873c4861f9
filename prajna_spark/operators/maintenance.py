"""Table maintenance — compaction and retention for parquet layouts.

Streaming sinks (rollup_stream, ann_stream, upsert_stream) and
micro-batch appends accumulate small files; retention policies drop aged
partitions. Both are routine at 100 TB and both are provided here as
plain filesystem+DataFrame operators (no table-format dependency):

- :func:`compact` — rewrite a directory (or one partition directory)
  into ~target-sized files, atomically: write to a sibling temp dir,
  validate row count, rename-swap. Readers see the old layout or the
  new one, never a mix — same swap discipline as
  streaming/rollup_stream's store compaction.
- :func:`expire_partitions` — drop whole ``col=value`` partition
  directories older than a cutoff. Deleting a partition is a directory
  remove — zero data rewrite, the reason date-partitioned layouts are
  the retention-friendly shape.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
) -> int:
    """Rewrite ``path``'s parquet files into ceil(bytes/target) files.
    Returns the new file count. Atomic via temp-dir + rename-swap;
    row count is validated before the swap (a failed write leaves the
    original untouched)."""
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    n_rows = df.count()
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    df.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)
    if spark.read.parquet(tmp).count() != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction row-count mismatch for {path}")
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )


def list_partitions(path: str, partition_col: str) -> list[tuple[str, str]]:
    """(value, dirpath) for each ``partition_col=value`` leaf directory."""
    prefix = f"{partition_col}="
    out = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isdir(full) and name.startswith(prefix):
            out.append((name[len(prefix):], full))
    return out


def expire_partitions(
    path: str,
    partition_col: str,
    keep_if,
) -> list[str]:
    """Drop partition directories whose VALUE fails ``keep_if(value)``
    (values are the directory-name strings, e.g. '2026-01-03'; lexical
    comparison is correct for ISO dates and zero-padded numbers).
    Returns the dropped values. Directory removal only — no rewrite of
    surviving data."""
    dropped = []
    for value, full in list_partitions(path, partition_col):
        if not keep_if(value):
            shutil.rmtree(full)
            dropped.append(value)
    return dropped
