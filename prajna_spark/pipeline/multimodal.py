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


#: audio synth parameters: 8 kHz mono 16-bit PCM; n_samples is a
#: deterministic function of doc_id so oracles can recompute chunk math
#: from first principles (no binary parsing in SQL).
AUDIO_RATE = 8000
AUDIO_WIDTH = 2  # bytes per sample (16-bit)

AUDIO_META_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, sample_width int, n_samples long"
)


def audio_n_samples_col() -> F.Column:
    """The synth's sample-count formula, exposed so SQL oracles can mirror
    it: 400 + (doc_id * 37) % 1200."""
    return (F.lit(400) + (F.col("doc_id") * 37) % 1200).cast("long")


def synthesize_audio(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, payload) where payload is a REAL
    RIFF/WAVE PCM file built with the stdlib ``wave`` module — not a fake
    header. Samples are a deterministic int16 sawtooth seeded by doc_id,
    so decode tests can replay them exactly. Arrow-batched construction;
    at ingest time this column is what ``binaryFile`` would deliver."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 400 + (int(doc_id) * 37) % 1200
                i = np.arange(n, dtype=np.int64)
                samples = (((i * 13 + int(doc_id)) % 256) - 128).astype(np.int16) * 64
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(AUDIO_WIDTH)
                    w.setframerate(AUDIO_RATE)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id long, media_type string, payload binary"
    )


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """REAL audio metadata decode via the stdlib ``wave`` parser (RIFF
    chunk walk — the same shape a soundfile/libav decode would have), one
    Python dispatch per Arrow batch. This is the non-stubbed counterpart
    of ``decode_image``: the container has no image codecs but WAV needs
    none, so the audio tier exercises a genuine encode->decode roundtrip
    end-to-end."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rates, chans, widths, counts = [], [], [], []
            for b in pdf["payload"]:
                with wave.open(io.BytesIO(bytes(b)), "rb") as w:
                    rates.append(w.getframerate())
                    chans.append(w.getnchannels())
                    widths.append(w.getsampwidth())
                    counts.append(w.getnframes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_channels": pd.array(chans, dtype="int32"),
                    "sample_width": pd.array(widths, dtype="int32"),
                    "n_samples": pd.array(counts, dtype="int64"),
                }
            )

    return media.mapInPandas(decode, schema=AUDIO_META_SCHEMA)


def chunk_audio(meta: DataFrame, chunk_ms: int = 50) -> DataFrame:
    """Fixed-duration chunk plan from decoded metadata — pure JVM integer
    arithmetic (sequence + posexplode, codegen end-to-end): per chunk the
    sample span and millisecond bounds. The plan is what a feature
    extractor (or a byte slicer: offset = 44 + start_sample*width) maps
    over; chunk fan-out inherits the input partitioning like
    ``sample_frames``."""
    # INTEGER samples-per-chunk (floor), and n_chunks derived from the
    # SAME truncated value — deriving n_chunks from the fractional ratio
    # while bounding chunks with the floor silently dropped trailing
    # samples whenever sample_rate*chunk_ms wasn't divisible by 1000
    # (e.g. 44.1 kHz at 33 ms); floor-everywhere matches audio_chunk_rms
    # and covers every sample: the last chunk is simply short.
    spc = F.floor((F.col("sample_rate").cast("long") * chunk_ms) / 1000).cast("long")
    n_chunks = F.ceil(F.col("n_samples") / spc.cast("double")).cast("long")
    # empty audio yields no chunks — guarded because Spark's
    # sequence(0, -1) DESCENDS to [0, -1] instead of being empty
    return (
        meta.where((F.col("n_samples") > 0) & (spc >= 1))
        .select(
            "doc_id",
            "sample_rate",
            "n_samples",
            spc.cast("long").alias("spc"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no", "_c"),
        )
        .select(
            "doc_id",
            F.col("chunk_no").cast("long").alias("chunk_no"),
            (F.col("chunk_no") * F.col("spc")).alias("start_sample"),
            F.least(
                (F.col("chunk_no") + 1) * F.col("spc"), F.col("n_samples")
            ).alias("end_sample"),
            ((F.col("chunk_no") * F.col("spc") * 1000).cast("long")
             / F.col("sample_rate").cast("long")).cast("long").alias("start_ms"),
        )
        .withColumn(
            "n_in_chunk", (F.col("end_sample") - F.col("start_sample")).cast("long")
        )
    )


def audio_chunk_rms(media: DataFrame, chunk_ms: int = 50) -> DataFrame:
    """Per-chunk RMS energy — real DSP over the decoded PCM (numpy
    ``frombuffer`` on the wave frames, vectorized per Arrow batch):
    (doc_id, chunk_no, rms double). The feature-extraction slot a VAD or
    loudness gate fills at scale; Python touches each payload once per
    batch, never per chunk."""

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import wave

        import numpy as np

        for pdf in batches:
            doc_ids, chunk_nos, vals = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(b)), "rb") as w:
                    rate = w.getframerate()
                    samples = np.frombuffer(
                        w.readframes(w.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                spc = rate * chunk_ms // 1000
                for c in range(0, len(samples), spc):
                    win = samples[c : c + spc]
                    # INTEGER sum of squares: exact and order-independent,
                    # so sqrt(ss/n) is bit-identical on any engine that
                    # replays the same samples — no rounding slack needed
                    # for summation order (int16^2 * 400 fits int64).
                    ss = int(np.sum(win * win))
                    doc_ids.append(doc_id)
                    chunk_nos.append(c // spc)
                    vals.append(math.sqrt(ss / len(win)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(doc_ids, dtype="int64"),
                    "chunk_no": pd.array(chunk_nos, dtype="int64"),
                    "rms": pd.array(vals, dtype="float64"),
                }
            )

    return media.mapInPandas(rms, schema="doc_id long, chunk_no long, rms double")


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
