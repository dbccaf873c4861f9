"""Multimodal plumbing: binary payload synthesis, Arrow-batched decode,
JVM frame slicing, stubbed codec."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from prajna_spark.pipeline import multimodal
from prajna_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return multimodal.synthesize_media(docs).persist()


def test_documents_are_ascii(spark, sf_dir):
    # The SQL-oracle exactness of the multimodal queries depends on this.
    docs = load_table(spark, "documents", sf_dir)
    n_bad = docs.where(F.encode("text", "utf-8") != F.encode("text", "us-ascii")).count()
    assert n_bad == 0


def test_payload_schema_and_header(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
    }
    row = media.where(F.col("doc_id") == 3).collect()[0]
    assert bytes(row.payload).startswith(b"FAKEIMG|w=19|h=37|")  # 16+3, 16+21


def test_decode_meta_matches_local(media):
    decoded = {r.doc_id: r for r in multimodal.decode_media_meta(media).collect()}
    for row in media.collect():
        b = bytes(row.payload)
        d = decoded[row.doc_id]
        assert d.payload_bytes == len(b)
        assert d.payload_sha == hashlib.sha256(b).hexdigest()
        assert f"|w={d.width}|h={d.height}|".encode() in b[:30]


def test_decode_image_gated_on_pil():
    """Stub raises without PIL; with PIL it returns (w, h, mode)."""
    if multimodal._PILImage is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"FAKEIMG|w=1|h=1|x")
    else:
        import io

        img = multimodal._PILImage.new("RGB", (3, 2))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        assert multimodal.decode_image(buf.getvalue()) == (3, 2, "RGB")


def test_frame_sample_covers_payload(media):
    frames = multimodal.sample_frames(media, frame_size=100, stride=4)
    got = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("frame_bytes").alias("maxb"),
    )
    lens = {r.doc_id: len(bytes(r.payload)) for r in media.collect()}
    for r in got.collect():
        expected_frames = (lens[r.doc_id] - 1) // 400 + 1
        assert r.n == expected_frames
        assert r.maxb <= 100
    # frame content is a true byte slice (pick a doc long enough for frame 1)
    long_doc = max(lens, key=lambda d: lens[d])
    assert lens[long_doc] > 500, "fixture corpus should have a >500-byte doc"
    one = frames.where(
        (F.col("doc_id") == long_doc) & (F.col("frame_no") == 1)
    ).collect()[0]
    full = [bytes(r.payload) for r in media.where(F.col("doc_id") == long_doc).collect()][0]
    assert bytes(one.frame) == full[400:500]


def test_grouped_zscore_degenerate_groups_yield_null(spark, tmp_path):
    """Single-row and zero-variance groups produce NULL zscores (no
    math.floor-on-NaN crash), matching the oracle's CASE guard."""
    import pandas as pd

    from prajna_spark.queries.multimodal import grouped_zscore_pandas

    sf = str(tmp_path)
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [1, 2, 2, 3, 3],
            "value": [9.0, 4.0, 4.0, 1.0, 3.0],  # u1: 1 row; u2: var=0
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{sf}/events.parquet")
    got = {r.event_id: r.zscore for r in grouped_zscore_pandas(spark, sf).collect()}
    assert got[1] is None          # single-row group
    assert got[2] is None and got[3] is None  # zero-variance group
    assert got[4] == -0.7071 and got[5] == 0.7071


def test_audio_decode_roundtrip_independent_fixture(spark):
    """decode_audio_meta parses a WAV we build here by hand (different
    rate/length from the synth path) — the decoder is generic, not
    coupled to synthesize_audio."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x01\x00" * 1234)
    df = spark.createDataFrame(
        [(7, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    row = multimodal.decode_audio_meta(df).collect()[0]
    assert (row.sample_rate, row.n_channels, row.sample_width, row.n_samples) == (
        16000, 1, 2, 1234,
    )


def test_audio_chunking_exact_multiple_has_no_empty_tail(spark):
    """n_samples == k * chunk gives exactly k chunks, the last one full."""
    meta = spark.createDataFrame(
        [(1, 8000, 1, 2, 800)],
        "doc_id long, sample_rate int, n_channels int, sample_width int, n_samples long",
    )
    rows = sorted(
        multimodal.chunk_audio(meta, chunk_ms=50).collect(),
        key=lambda r: r.chunk_no,
    )
    assert len(rows) == 2
    assert rows[-1].n_in_chunk == 400 and rows[-1].end_sample == 800
    assert rows[-1].start_ms == 50


def test_audio_rms_constant_signal(spark):
    """A constant-amplitude signal's RMS is exactly that amplitude."""
    import io
    import wave

    import numpy as np

    amp = 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.full(800, amp, dtype=np.int16).tobytes())
    df = spark.createDataFrame(
        [(3, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    rows = multimodal.audio_chunk_rms(df, chunk_ms=50).collect()
    assert len(rows) == 2
    assert all(r.rms == float(amp) for r in rows)


def test_audio_chunking_covers_all_samples_at_awkward_rates(spark):
    """Regression: 44.1 kHz at 33 ms (samples-per-chunk not integral)
    must still cover every sample — n_chunks and bounds both derive from
    the same floored samples-per-chunk, the last chunk is just short."""
    meta = spark.createDataFrame(
        [(1, 44100, 1, 2, 5821)],
        "doc_id long, sample_rate int, n_channels int, sample_width int, n_samples long",
    )
    rows = sorted(
        multimodal.chunk_audio(meta, chunk_ms=33).collect(), key=lambda r: r.chunk_no
    )
    assert sum(r.n_in_chunk for r in rows) == 5821
    assert rows[-1].end_sample == 5821
    # contiguity: each chunk starts where the previous ended
    for a, b in zip(rows, rows[1:]):
        assert b.start_sample == a.end_sample
