"""Table maintenance — compaction and retention for parquet layouts.

Streaming sinks (rollup_stream, ann_stream, upsert_stream) and
micro-batch appends accumulate small files; retention policies drop aged
partitions. Both are routine at 100 TB and both are provided here as
plain filesystem+DataFrame operators (no table-format dependency):

- :func:`compact` — rewrite a directory (partition-aware: a partitioned
  root compacts per partition directory, preserving the layout) into
  ~target-sized files: write to a sibling temp dir, validate row count,
  guard against concurrent appends, rename-swap. Single-maintainer
  contract: the two-rename swap has a brief missing-path window on
  POSIX (healed on the next compact() entry), so run it from the same
  scheduler slot as the sink it maintains — the discipline every
  non-transactional layout requires.
- :func:`expire_partitions` — drop whole ``col=value`` partition
  directories older than a cutoff. Deleting a partition is a directory
  remove — zero data rewrite, the reason date-partitioned layouts are
  the retention-friendly shape.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _parquet_files(path: str) -> set[str]:
    return {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }


def _heal_interrupted_swap(path: str) -> None:
    """Recover from a compact() killed mid-swap: if only the ``old``
    snapshot exists the first rename landed but the second did not —
    restore it (nothing was lost; the tmp result is discarded). If both
    exist the swap completed and ``old`` is releasable residue."""
    old = path.rstrip("/") + ".__compact_old__"
    tmp = path.rstrip("/") + ".__compact_tmp__"
    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)
    elif os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)


def compact(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
) -> int:
    """Rewrite ``path``'s parquet files into ~``target_mb``-sized files.
    Returns the new file count.

    - A PARTITIONED root (``col=value`` subdirectories) is compacted one
      partition directory at a time, preserving the layout exactly — a
      flat rewrite of the root would fold the partition columns into the
      data files and silently destroy pruning/retention.
    - Crash-safe: an interrupted previous swap is healed on entry (the
      two-rename swap has an unavoidable missing-path window on POSIX —
      single-maintainer contract, same as every non-transactional
      layout).
    - Concurrent-append guard: the file set is re-listed immediately
      before the swap; if a streaming sink appended since the read, the
      compaction ABORTS (tmp discarded, store untouched) rather than
      silently dropping the new files. Run compaction from the same
      scheduler slot as the sink's trigger, not beside it.
    - Driver-local filesystems only (os.rename swap); remote URIs fail
      loudly up front instead of after a full rewrite.
    """
    if "://" in path:
        raise NotImplementedError(
            "compact() is driver-local-POSIX only (rename swap); for object "
            "stores use a transactional table format's OPTIMIZE instead"
        )
    _heal_interrupted_swap(path)
    part_dirs = [
        os.path.join(path, name)
        for name in sorted(os.listdir(path))
        if "=" in name and os.path.isdir(os.path.join(path, name))
    ]
    if part_dirs:
        return sum(compact(spark, d, target_mb) for d in part_dirs)
    before = _parquet_files(path)
    size = sum(os.path.getsize(f) for f in before)
    n_files = max(1, -(-size // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    n_rows = df.count()
    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    df.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)
    if spark.read.parquet(tmp).count() != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction row-count mismatch for {path}")
    if _parquet_files(path) != before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"concurrent modification of {path} during compaction; aborted"
        )
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
