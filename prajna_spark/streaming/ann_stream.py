"""Streaming ANN index maintenance — continuous ingest into the
persisted IVF layout.

``pipeline.similarity.build_ivf_index`` materializes inverted lists as a
parquet table PARTITIONED BY centroid_id; this module keeps that layout
continuously fed from a vector stream: each micro-batch is assigned to
its nearest centroid (broadcast argmax — map-side, no shuffle) and
APPENDED into the partition directories. Because the index is partitioned
by centroid_id, an append only touches the cells the batch lands in, and
``search_ivf_index`` keeps working unchanged mid-ingest — probes prune to
nprobe cells by partition filter exactly as for a batch-built index.

The batch/stream equivalence (tested): draining a vector stream through
this sink yields an index whose search results are IDENTICAL to building
the index from the same vectors in one batch — appends commute because
assignment is row-local and search reads whole cells.

No reference equivalent: Prajna has neither vector search nor streaming
state (SURVEY §2.12); this is the north-star continuous-curation slot for
the embedding modality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)
from pyspark.sql.streaming import StreamingQuery

from prajna_spark.pipeline.similarity import ivf_assign


def start_incremental_ivf(
    stream_vectors: DataFrame,
    centroids: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously append ``stream_vectors`` to the partitioned IVF index
    at ``index_path``. Centroids are fixed for the index lifetime (re-run
    k-means + rebuild to re-center — the standard IVF maintenance split:
    cheap continuous appends, periodic offline rebuilds)."""

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        assign = ivf_assign(batch_df, centroids, id_col, vec_col)
        (
            batch_df.join(assign, id_col)
            .write.mode("append")
            .partitionBy("centroid_id")
            .parquet(index_path)
        )

    writer = (
        stream_vectors.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
