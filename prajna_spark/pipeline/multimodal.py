"""Multimodal columns: opaque binary payloads + typed metadata at scale.

The reference has no media pipeline (its closest analog is the
folder-of-bytes source, /root/reference/src/CoreLib/DSet.fs:2936-2983
``FolderRecursiveSeq`` yielding ``seq<string*byte[]>``); this module is the
north-star extension: image/audio/video travel as ``binary`` columns with a
typed metadata struct, and every per-payload step is Arrow-batched
(``mapInPandas``) or JVM-side binary slicing — never row-at-a-time Python.

Scale notes (the 100 TB contract):
- payloads stay opaque bytes end-to-end; Spark never interprets them, so
  scans prune to (doc_id, payload) only when asked;
- decode/feature steps are ``mapInPandas`` over Arrow record batches —
  per-batch Python dispatch, zero-copy byte views;
- frame sampling is pure JVM (``sequence`` + ``substring`` + ``explode``),
  so the work-multiplying step stays in whole-stage codegen and the
  explode's output partitioning fans out with the input;
- real codec decode (PIL/libav) is STUBBED: the container has no media
  libs. ``decode_image`` raises NotImplementedError; the deterministic
  fake path (``FAKEIMG`` header) keeps schema/partitioning/UDF
  signature/batch shape real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic fake payload: ASCII header + the document text as body.
# ASCII-only by construction => byte offset == char offset, which keeps the
# DuckDB oracle exact (documents.text is ASCII; verified in tests).
HEADER_FMT = "FAKEIMG|w={w}|h={h}|"

DECODED_META_SCHEMA = (
    "doc_id long, width int, height int, payload_bytes long, payload_sha string"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, payload binary).

    Stand-in for a real binary ingest (``spark.read.format('binaryFile')``
    maps straight onto this schema: path->doc_id, content->payload). Width/
    height are deterministic functions of doc_id so the decode step has
    real header fields to parse.
    """
    w = (F.lit(16) + F.col("doc_id") % 49).cast("int")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 33).cast("int")
    header = F.concat(
        F.lit("FAKEIMG|w="), w.cast("string"), F.lit("|h="), h.cast("string"), F.lit("|")
    )
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.concat(header, F.col("text")), "utf-8").alias("payload"),
    )


try:  # real codec, if the environment ships one (this container doesn't)
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - exercised only where PIL exists
    _PILImage = None


def decode_image(payload: bytes):
    """Real image decode, gated on PIL availability at import time.

    With PIL present: decode and return (width, height, mode) — the
    metadata contract ``decode_media_meta`` exposes. Without it: raise
    NotImplementedError (the container ships no image libraries; the
    Spark-side plumbing — schema, batching, partitioning — is covered by
    the FAKEIMG path either way, so the catalog never depends on this)."""
    if _PILImage is None:
        raise NotImplementedError(
            "image codec libraries are not available in this environment; "
            "decode_media_meta covers the fake-header path end-to-end"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as img:
        return img.width, img.height, img.mode


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata decode: parse the FAKEIMG header + hash the
    payload. One Python dispatch per Arrow batch; bytes are zero-copy
    views. Output schema is fixed (DECODED_META_SCHEMA) so downstream
    plans are stable regardless of payload contents."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            widths, heights, sizes, shas = [], [], [], []
            for b in payloads:
                b = bytes(b)
                # header: FAKEIMG|w=<w>|h=<h>|
                parts = b.split(b"|", 3)
                widths.append(int(parts[1][2:]))
                heights.append(int(parts[2][2:]))
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "payload_bytes": pd.array(sizes, dtype="int64"),
                    "payload_sha": shas,
                }
            )

    return media.mapInPandas(decode, schema=DECODED_META_SCHEMA)


def sample_frames(
    media: DataFrame, frame_size: int = 100, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling, pure JVM: treat the payload as a stream
    of ``frame_size``-byte frames and keep every ``stride``-th one.
    ``sequence`` generates the 1-based byte offsets, ``substring`` slices
    the binary, ``explode`` fans frames out with the input partitioning —
    no Python in the loop, codegen end-to-end."""
    step = frame_size * stride
    offsets = F.sequence(F.lit(1), F.octet_length("payload"), F.lit(step))
    return (
        media.select(
            "doc_id",
            F.posexplode(offsets).alias("frame_no", "off"),
            "payload",
        )
        .select(
            "doc_id",
            "frame_no",
            F.col("payload").substr(F.col("off"), F.lit(frame_size)).alias("frame"),
        )
        .withColumn("frame_bytes", F.octet_length("frame").cast("long"))
    )
