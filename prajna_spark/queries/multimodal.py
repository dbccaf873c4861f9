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


# The image synth's dimension/pixel formulas, replayed in SQL (contract
# documented at pipeline.multimodal.IMG_CLASSES). ``dims`` is per-doc;
# ``g`` evaluates the pixel formula at the dHash sample grid.
_IMG_DIMS_SQL = """
    dims AS (
      SELECT doc_id, doc_id % 89 AS seed,
             16 + (doc_id % 89) % 17 AS w,
             12 + ((doc_id % 89) * 3) % 11 AS h
      FROM documents
    )
"""

_DHASH_SQL = """
    g AS (
      SELECT d.doc_id, gy.i AS gy, gx.i AS gx,
             (d.seed*31 + ((gx.i*d.w)//9)*13 + ((gy.i*d.h)//7)*7
              + CASE WHEN (d.doc_id*11 + ((gx.i*d.w)//9)*5
                           + ((gy.i*d.h)//7)*3) % 199 = 0
                     THEN 96 ELSE 0 END) % 256 AS v
      FROM dims d, range(0, 9) gx(i), range(0, 7) gy(i)
    ),
    hashes AS (
      SELECT a.doc_id,
             CAST(sum(CASE WHEN n.v > a.v THEN 1::BIGINT ELSE 0::BIGINT END
                      << (a.gy*8 + a.gx)) AS BIGINT) AS dhash
      FROM g a
      JOIN g n ON n.doc_id = a.doc_id AND n.gy = a.gy AND n.gx = a.gx + 1
      WHERE a.gx < 8
      GROUP BY a.doc_id
    )
"""


@query(
    "image_bmp_meta",
    oracle=f"""
    -- first-principles replay of the BMP tier: the Spark side builds a
    -- REAL 24-bit BMP per doc, struct-parses the headers back, and
    -- checksums the DECODED pixel plane; the oracle recomputes all of it
    -- from the synth formula (rowsize = ((3w+3)//4)*4 padded rows,
    -- file = 54 header bytes + h*rowsize) — equality proves the
    -- encode->decode roundtrip, not just arithmetic
    WITH {_IMG_DIMS_SQL},
    px AS (
      SELECT d.doc_id,
             (d.seed*31 + x.i*13 + y.i*7
              + CASE WHEN (d.doc_id*11 + x.i*5 + y.i*3) % 199 = 0
                     THEN 96 ELSE 0 END) % 256 AS v
      FROM dims d
      JOIN range(0, 33) x(i) ON x.i < d.w
      JOIN range(0, 23) y(i) ON y.i < d.h
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           CAST(54 + d.h * ((3*d.w + 3) // 4 * 4) AS BIGINT) AS file_bytes,
           s.gray_sum
    FROM dims d
    JOIN (SELECT doc_id, CAST(sum(v) AS BIGINT) AS gray_sum
          FROM px GROUP BY doc_id) s USING (doc_id)
    """,
    tags=("multimodal", "image", "bmp", "decode", "pandas-udf"),
)
def image_bmp_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image plumbing end-to-end: synthesize 24-bit BMP payloads
    (struct+numpy, Arrow-batched — no codec lib needed, unlike the
    PIL-gated ``decode_image``), then walk the BITMAPINFOHEADER back and
    decode the padded bottom-up pixel array. ``gray_sum`` is an exact
    integer checksum of the decoded plane, so a pixel-order or padding
    bug hash-fails, not just a header bug."""
    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_bmp(fan_out(docs))
    return multimodal.decode_bmp_meta(media)


@query(
    "image_png_roundtrip_meta",
    oracle=f"""
    -- first-principles replay of the PNG tier: the Spark side deflates a
    -- REAL grayscale PNG per doc (row filters cycling through all five
    -- PNG filter types), walks the chunks back (CRC-verified), inflates,
    -- reconstructs every scanline, and checksums the decoded plane; the
    -- oracle recomputes dimensions + gray_sum from the synth formula —
    -- equality proves the zlib+filter roundtrip, not just arithmetic
    WITH {_IMG_DIMS_SQL},
    px AS (
      SELECT d.doc_id,
             (d.seed*31 + x.i*13 + y.i*7
              + CASE WHEN (d.doc_id*11 + x.i*5 + y.i*3) % 199 = 0
                     THEN 96 ELSE 0 END) % 256 AS v
      FROM dims d
      JOIN range(0, 33) x(i) ON x.i < d.w
      JOIN range(0, 23) y(i) ON y.i < d.h
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(0 AS INT) AS color_type,
           s.gray_sum
    FROM dims d
    JOIN (SELECT doc_id, CAST(sum(v) AS BIGINT) AS gray_sum
          FROM px GROUP BY doc_id) s USING (doc_id)
    """,
    tags=("multimodal", "image", "png", "decode", "pandas-udf"),
)
def image_png_roundtrip_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG plumbing end-to-end with NO codec library: synthesize
    grayscale PNGs (stdlib zlib deflate; the scanline filter cycles
    through all five PNG filter types keyed by (doc_id + row) % 5), then
    decode them back — CRC-checked chunk walk, inflate, full five-filter
    reconstruction (pipeline.multimodal._png_decode). ``gray_sum`` is an
    exact integer checksum of the decoded plane, so any filter-math,
    inflate, or row-order bug hash-fails against the oracle's
    closed-form pixel replay. Same Arrow-batched mapInPandas shape as
    the BMP tier: payloads never shuffle, one Python dispatch per batch."""
    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_png(fan_out(docs))
    return multimodal.decode_png_meta(media)


@query(
    "image_dhash_dedup",
    oracle=f"""
    -- perceptual-hash dup groups: same-seed docs are near-identical
    -- images (sparse per-doc perturbation), so unperturbed members of a
    -- class share a dHash exactly; the oracle replays NN-resampling at
    -- the 9x7 grid (sx=gx*w//9, sy=gy*h//7) + the 56-bit difference
    -- hash directly from the pixel formula
    WITH {_IMG_DIMS_SQL},
    {_DHASH_SQL}
    SELECT dhash, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM hashes GROUP BY dhash HAVING count(*) > 1
    """,
    tags=("multimodal", "image", "dedup", "perceptual-hash", "pandas-udf"),
)
def image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dHash image dedup: decode every BMP, 56-bit dHash the pixel
    plane (nearest-neighbor 9x7 grid, strictly-brighter comparisons),
    group identical hashes. The hash is one long per image — after the
    Arrow decode pass the shuffle carries 16 bytes/row regardless of
    image size, the property that makes perceptual dedup tractable at
    100 TB of media."""
    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_bmp(fan_out(docs))
    hashes = multimodal.image_dhash(media)
    return (
        hashes.groupBy("dhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


@query(
    "image_dhash_hamming_pairs",
    oracle=f"""
    -- near-dup pairs within hamming <= 3, via 4x14-bit band blocking —
    -- EXACT by pigeonhole (<=3 differing bits leave >=1 band intact);
    -- the oracle mirrors the banding so both engines enumerate the same
    -- bounded candidate set, never all-pairs
    WITH {_IMG_DIMS_SQL},
    {_DHASH_SQL},
    bands AS (
      SELECT doc_id, dhash, t.i AS band,
             (dhash >> CAST(t.i*14 AS INT)) & 16383 AS bv
      FROM hashes, range(0, 4) t(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.dhash AS ha, b.dhash AS hb
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    """,
    tags=("multimodal", "image", "dedup", "lsh", "hamming", "pandas-udf"),
)
def image_dhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-dup pairs: band-blocked hamming join over the
    56-bit dHashes (pipeline.multimodal.dhash_hamming_pairs). Candidates
    come only from shared 14-bit band buckets — bucket-bounded like every
    other blocking operator in this engine — and the distance check is
    one xor+bit_count per candidate, fully JVM-side."""
    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_bmp(fan_out(docs))
    hashes = multimodal.image_dhash(media)
    return multimodal.dhash_hamming_pairs(hashes)


@query(
    "grouped_zscore_pandas",
    oracle=f"""
    SELECT event_id, user_id,
           {R('''CASE WHEN count(*) OVER (PARTITION BY user_id) > 1
                      AND stddev_samp(value) OVER (PARTITION BY user_id) > 0
                 THEN (value - avg(value) OVER (PARTITION BY user_id))
                    / stddev_samp(value) OVER (PARTITION BY user_id) END''', 4)}
           AS zscore
    FROM events
    """,
    tags=("applyInPandas", "grouped-map", "pandas-udf"),
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via ``applyInPandas`` — the grouped-map UDF
    surface (Prajna's arbitrary-closure-over-a-key-group, the UDTF slot of
    SURVEY §2.13). Checked against a pure-SQL window oracle.

    SCALE NOTE: grouped-map materializes one whole group per task, so it
    is keyed on the HIGH-cardinality user_id (groups stay small and
    plentiful as data grows — the shape grouped-map is for). Normalizing
    by a low-cardinality key (event_type) must instead use the pure-window
    spelling: see window_zscore_events, the production plan and the bench
    headline entry. Degenerate groups (one row / zero variance) yield
    NULL, matching the oracle's CASE guard.
    """
    import math

    import pandas as pd

    tune(spark)
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=1)
        if len(pdf) > 1 and math.isfinite(s) and s > 0:
            z = (pdf["value"] - m) / s
            # portable IEEE half-up rounding, as functions.rounding.pround
            zr = (z * 1e4 + 0.5).apply(math.floor).astype("float64") / 1e4
            zr = zr.astype("Float64")
        else:
            zr = pd.array([pd.NA] * len(pdf), dtype="Float64")
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": zr}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, zscore double"
    )


@query(
    "window_zscore_events",
    oracle=f"""
    SELECT event_id, event_type,
           {R('''(value - avg(value) OVER (PARTITION BY event_type))
              / stddev_samp(value) OVER (PARTITION BY event_type)''', 4)}
           AS zscore
    FROM events
    """,
    tags=("window", "zscore", "normalization"),
)
def window_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score as a pure window plan — the production
    spelling of grouped normalization over a low-cardinality key: both
    window aggregates share one hash partition on event_type, everything
    stays in whole-stage codegen, and no task ever materializes a group
    (contrast grouped_zscore_pandas, the Python grouped-map surface)."""
    from pyspark.sql import Window

    from prajna_spark.functions.rounding import pround

    tune(spark)
    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return ev.select("event_id", "event_type", pround(z, 4).alias("zscore"))


@query(
    "audio_chunk_plan",
    oracle="""
    -- first-principles replay of the audio chunk plan: the Spark side
    -- synthesizes REAL PCM WAV payloads, decodes them with the stdlib
    -- wave parser, and derives chunks from the DECODED metadata; the
    -- oracle recomputes from the synth formula (n_samples =
    -- 400 + (doc_id*37) % 1200, 8 kHz, 50 ms chunks = 400 samples) —
    -- equality proves the encode->decode roundtrip, not just arithmetic
    WITH m AS (
      SELECT doc_id, 400 + (doc_id * 37) % 1200 AS n_samples FROM documents
    )
    SELECT m.doc_id,
           CAST(t.i AS BIGINT) AS chunk_no,
           CAST(t.i * 400 AS BIGINT) AS start_sample,
           CAST(least((t.i + 1) * 400, m.n_samples) AS BIGINT) AS end_sample,
           CAST(t.i * 50 AS BIGINT) AS start_ms,
           CAST(least((t.i + 1) * 400, m.n_samples) - t.i * 400 AS BIGINT)
             AS n_in_chunk
    FROM m JOIN range(0, 4) t(i)
      ON t.i < CAST(ceil(m.n_samples / 4e2) AS BIGINT)
    """,
    tags=("multimodal", "audio", "chunking", "pandas-udf"),
)
def audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio plumbing end-to-end: synthesize RIFF/WAVE PCM payloads
    (stdlib wave writer, Arrow-batched), decode their headers back with
    the stdlib wave parser (the non-stubbed decode path — WAV needs no
    external codec), then derive a 50 ms chunk plan in pure JVM integer
    arithmetic (pipeline.multimodal.chunk_audio). The oracle recomputes
    every chunk bound from the generative formula, so a decode bug
    (wrong rate/count/width) hash-fails."""
    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_audio(fan_out(docs))
    meta = multimodal.decode_audio_meta(media)
    return multimodal.chunk_audio(meta, chunk_ms=50)


@query(
    "audio_chunk_rms",
    oracle="""
    -- per-chunk RMS replayed from the synth sawtooth: sample i of doc d
    -- is (((i*13 + d) % 256) - 128) * 64; the INTEGER sum of squares is
    -- exact and order-independent, so sqrt(ss/n) is bit-identical to the
    -- Spark side's numpy computation over the DECODED PCM bytes
    WITH s AS (
      SELECT d.doc_id, t.i // 400 AS chunk_no,
             (((t.i * 13 + d.doc_id) % 256) - 128) * 64 AS v
      FROM (SELECT doc_id, 400 + (doc_id * 37) % 1200 AS n_samples
            FROM documents) d
      JOIN range(0, 1600) t(i) ON t.i < d.n_samples
    )
    SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
           (floor(sqrt(CAST(CAST(sum(v * v) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE)) * 1e6 + 5e-1) / 1e6) AS rms
    FROM s GROUP BY doc_id, chunk_no
    """,
    tags=("multimodal", "audio", "dsp", "pandas-udf"),
)
def audio_chunk_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk RMS energy over REAL decoded PCM (numpy frombuffer on
    the wave frames — the loudness/VAD feature-extraction slot): Python
    touches each payload once per Arrow batch, chunks are sliced
    vectorized. Cross-engine exactness comes from integer sum-of-squares
    (order-independent) + bit-identical sqrt/division, checked against a
    pure-SQL replay of the synth waveform."""
    from prajna_spark.functions.rounding import pround

    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_audio(fan_out(docs))
    out = multimodal.audio_chunk_rms(media, chunk_ms=50)
    return out.select("doc_id", "chunk_no", pround(F.col("rms"), 6).alias("rms"))


@query(
    "image_resize_half_meta",
    oracle=f"""
    -- the resize round trip replayed from the synth formula: [::2, ::2]
    -- nearest-neighbor keeps EVEN source coordinates, so output dims are
    -- ceil-halves and the resized checksum sums even-coordinate pixels;
    -- file_bytes re-derives the padded-row BMP layout at the new dims
    WITH {_IMG_DIMS_SQL},
    rp AS (
      SELECT d.doc_id,
             (d.seed*31 + x.i*13 + y.i*7
              + CASE WHEN (d.doc_id*11 + x.i*5 + y.i*3) % 199 = 0
                     THEN 96 ELSE 0 END) % 256 AS v
      FROM dims d
      JOIN range(0, 33) x(i) ON x.i < d.w AND x.i % 2 = 0
      JOIN range(0, 23) y(i) ON y.i < d.h AND y.i % 2 = 0
    )
    SELECT d.doc_id,
           CAST((d.w + 1) // 2 AS INT) AS width,
           CAST((d.h + 1) // 2 AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           CAST(54 + ((d.h + 1) // 2)
                * ((3 * ((d.w + 1) // 2) + 3) // 4 * 4) AS BIGINT)
             AS file_bytes,
           s.gray_sum
    FROM dims d
    JOIN (SELECT doc_id, CAST(sum(v) AS BIGINT) AS gray_sum
          FROM rp GROUP BY doc_id) s USING (doc_id)
    """,
    tags=("multimodal", "image", "resize", "bmp", "pandas-udf"),
)
def image_resize_half_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image TRANSFORM end-to-end
    (pipeline.multimodal.resize_bmp_half): decode every BMP, numpy
    nearest-neighbor half-scale, re-encode a genuine BMP, then decode the
    RESULT for its header walk + exact pixel checksum — four codec
    passes, all verified against the formula replay. The thumbnail-pass
    shape for a binary image column: Arrow-batched numpy per row,
    metadata and grouping JVM-side."""
    tune(spark)
    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_bmp(fan_out(docs))
    return multimodal.decode_bmp_meta(multimodal.resize_bmp_half(media))


@query(
    "video_keyframe_dhash",
    oracle=f"""
    -- video tier replay: every 2nd frame of each FAKEVID container
    -- (n = 4 + doc_id % 5 real BMP frames), dHash per sampled frame from
    -- the pixel formula + the f*17 motion term, and the scene-change
    -- hamming distance to the previous keyframe. Equality proves the
    -- whole chain: container build, JVM substring frame slicing, real
    -- BMP decode, perceptual hash, temporal window.
    WITH {_IMG_DIMS_SQL},
    vf AS (
      SELECT d.doc_id, d.seed, d.w, d.h, f.i AS frame_no
      FROM dims d, range(0, 8) f(i)
      WHERE f.i < 4 + d.doc_id % 5 AND f.i % 2 = 0
    ),
    g AS (
      SELECT v.doc_id, v.frame_no, gy.i AS gy, gx.i AS gx,
             (v.seed*31 + ((gx.i*v.w)//9)*13 + ((gy.i*v.h)//7)*7
              + v.frame_no*17
              + CASE WHEN (v.doc_id*11 + ((gx.i*v.w)//9)*5
                           + ((gy.i*v.h)//7)*3) % 199 = 0
                     THEN 96 ELSE 0 END) % 256 AS val
      FROM vf v, range(0, 9) gx(i), range(0, 7) gy(i)
    ),
    hashes AS (
      SELECT a.doc_id, CAST(a.frame_no AS BIGINT) AS frame_no,
             CAST(sum(CASE WHEN n.val > a.val THEN 1::BIGINT ELSE 0::BIGINT
                      END << (a.gy*8 + a.gx)) AS BIGINT) AS dhash
      FROM g a
      JOIN g n ON n.doc_id = a.doc_id AND n.frame_no = a.frame_no
              AND n.gy = a.gy AND n.gx = a.gx + 1
      WHERE a.gx < 8
      GROUP BY a.doc_id, a.frame_no
    )
    SELECT doc_id, frame_no, dhash,
           CAST(bit_count(xor(dhash,
                lag(dhash) OVER (PARTITION BY doc_id ORDER BY frame_no)))
             AS INT) AS hamming_prev
    FROM hashes
    """,
    tags=("multimodal", "video", "frame-sample", "perceptual-hash",
          "pandas-udf"),
)
def video_keyframe_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video keyframe analysis end-to-end: synthesize a real multi-frame
    BMP container per doc (pipeline.multimodal.synthesize_video), slice
    every 2nd frame with pure JVM substring arithmetic off the ASCII
    header (dropped frames never reach Arrow — the property that matters
    when frames are MBs), decode each sampled frame for real, 56-bit
    dHash it, and attach the hamming distance to the previous keyframe —
    the shot-boundary signal. One narrow long per sampled frame after
    the decode pass; the temporal window keys on (doc_id), the same
    partitioning the explode inherited."""
    tune(spark)
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    media = multimodal.synthesize_video(fan_out(docs))
    frames = multimodal.sample_video_frames(media, stride=2)
    hashes = multimodal.video_frame_dhash(frames)
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    return hashes.select(
        "doc_id",
        "frame_no",
        "dhash",
        F.bit_count(
            F.col("dhash").bitwiseXOR(F.lag("dhash").over(w))
        ).cast("int").alias("hamming_prev"),
    )
