"""Adaptive fan-out before work-multiplying operators.

A small input file scans as ONE split; everything downstream of a
work-multiplying operator (explode, regex tokenization, per-row hashing)
then runs single-threaded no matter how many cores exist. At 100 TB the
same table has thousands of splits and the repartition would be a pure
waste — so the fan-out is conditional: shuffle the (cheap, pre-explosion)
rows only when the scan's partition count is below the cluster
parallelism. The shuffle moves the small staged rows, never the exploded
output.

Catalyst cannot make this call for us: AQE coalesces partitions downward
but never splits a too-small scan upward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to cluster parallelism iff it currently has
    fewer partitions — call immediately BEFORE an explode/flatMap whose
    output is much larger than its input."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # JVM-side RDD partition metadata: no Python-serializer plan is
        # constructed (df.rdd would build the javaToPython conversion).
        current = df._jdf.rdd().getNumPartitions()
    except Exception:  # pragma: no cover - non-standard DataFrame impls
        current = df.rdd.getNumPartitions()
    return df.repartition(target) if current < target else df
