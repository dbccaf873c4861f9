"""Multimodal catalog queries (north-star LLM-pipeline surface).

Payloads are deterministic fake media (pipeline.multimodal: ASCII
``FAKEIMG`` header + document text, so byte offset == char offset) — which
lets a pure-SQL DuckDB oracle check the REAL Spark plumbing: the
Arrow-batched ``mapInPandas`` decode path and the JVM-side binary frame
slicing are both hash-compared against the oracle, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import R
from prajna_spark.operators.fanout import fan_out
from prajna_spark.pipeline import multimodal
from prajna_spark.queries import query
from prajna_spark.session import tune
from prajna_spark.sources import load_table

# The same fake payload, constructed in SQL (documents.text is ASCII —
# asserted in tests — so encode() is byte-identical to Spark's payload).
_PAYLOAD_SQL = (
    "'FAKEIMG|w=' || CAST(16 + doc_id % 49 AS VARCHAR)"
    " || '|h=' || CAST(16 + (doc_id * 7) % 33 AS VARCHAR)"
    " || '|' || text"
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    # fan out so the Arrow decode / frame explode parallelizes even when
    # the documents file scans as one split
    return multimodal.synthesize_media(fan_out(load_table(spark, "documents", sf_dir)))


@query(
    "multimodal_decode_meta",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_PAYLOAD_SQL} AS payload FROM documents)
    SELECT doc_id,
           CAST(16 + doc_id % 49 AS INT)        AS width,
           CAST(16 + (doc_id * 7) % 33 AS INT)  AS height,
           CAST(octet_length(encode(payload)) AS BIGINT) AS payload_bytes,
           sha256(payload)                      AS payload_sha
    FROM m
    """,
    tags=("multimodal", "decode", "pandas-udf"),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media-metadata decode (mapInPandas): header parse +
    payload sha256 per document. Exercises the full binary-column Python
    path — schema, batch shape, zero-copy bytes — against an exact oracle."""
    return multimodal.decode_media_meta(_media(spark, sf_dir))


@query(
    "multimodal_frame_sample",
    oracle=f"""
    -- closed form (DuckDB 1.0 generate_series takes no lateral args):
    -- frames start at 1, 401, 801, ...; every frame is 100 bytes except
    -- possibly the last, which holds olen - (n_frames-1)*400 bytes.
    WITH m AS (
      SELECT doc_id, payload, octet_length(encode(payload)) AS olen
      FROM (SELECT doc_id, {_PAYLOAD_SQL} AS payload FROM documents)
    ), f AS (
      SELECT doc_id, payload, olen, (olen - 1) // 400 + 1 AS n_frames FROM m
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST((n_frames - 1) * 100
                + least(100, olen - (n_frames - 1) * 400) AS BIGINT) AS sampled_bytes,
           md5(substring(payload, 1, 100)) AS first_frame_md5
    FROM f
    """,
    tags=("multimodal", "video", "frame-sample"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling (every 4th 100-byte frame), pure JVM
    slicing (sequence+substr+posexplode), then a per-doc rollup. The
    explode inherits the scan's partitioning, so the fan-out scales with
    input splits — no single-task hotspot at 100 TB."""
    frames = multimodal.sample_frames(_media(spark, sf_dir), frame_size=100, stride=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_bytes").alias("sampled_bytes"),
        F.md5(F.min_by("frame", "frame_no")).alias("first_frame_md5"),
    )


@query(
    "grouped_zscore_pandas",
    oracle=f"""
    SELECT event_id, event_type,
           {R('''(value - avg(value) OVER (PARTITION BY event_type))
              / stddev_samp(value) OVER (PARTITION BY event_type)''', 4)}
           AS zscore
    FROM events
    """,
    tags=("applyInPandas", "grouped-map", "pandas-udf"),
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via ``applyInPandas`` — the grouped-map UDF
    surface (Prajna's arbitrary-closure-over-a-key-group, the UDTF slot of
    SURVEY §2.13). Checked against a pure-SQL window oracle.

    SCALE NOTE: grouped-map materializes one whole group per task; it is
    the right tool when groups are plentiful and bounded. For
    low-cardinality keys over huge data (like this 5-value event_type at
    100 TB) the pure-window spelling of the SAME semantics (the oracle) is
    the production plan — this query exists to exercise and verify the
    Python grouped path against it.
    """
    import math

    import pandas as pd

    tune(spark)
    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=1)
        z = (pdf["value"] - m) / s
        # same portable IEEE half-up rounding as functions.rounding.pround
        pdf = pdf.assign(
            zscore=(z * 1e4 + 0.5).apply(math.floor).astype("float64") / 1e4
        )
        return pdf[["event_id", "event_type", "zscore"]]

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, zscore double"
    )
