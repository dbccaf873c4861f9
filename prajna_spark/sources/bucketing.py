"""Bucketed tables — co-located, shuffle-free joins for repeated big joins.

The reference's only co-location tool is its two-DSet correlated-mix
contract (equal partition count + mapping enforced at plan time,
/root/reference/src/CoreLib/DSetGenerics.fs:113-129) — it has no persisted
partitioning. Spark's bucketing IS persisted co-location: both tables
hash-bucketed on the join key at WRITE time; every later join/aggregate on
that key skips the exchange entirely.

At 100 TB this is the difference between shuffling both fact tables on
every query and never shuffling them again: bucket once, join free
forever. Rules enforced here:

- both sides bucketed by the SAME key into the SAME bucket count;
- ``spark.sql.sources.bucketing.enabled`` stays default-on; readers must
  not re-shuffle (asserted in tests via plan inspection);
- bucket count chosen for target file sizes (128-512 MB per bucket-file
  at production scale), not for core count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-within-bucket) table.
    Sorting within buckets additionally enables merge-join without even a
    sort (the reference's binSortByKey-then-merge-join pipeline,
    DKV.fs:205-214, as a storage property). ``path`` makes it an external
    table (bucketing metadata still lives in the catalog)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table, format="parquet")


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
