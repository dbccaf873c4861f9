"""Image tier: real BMP encode/decode + 56-bit dHash near-dup.

The BMP container logic (struct walk, 4-byte row padding, bottom-up row
order) and the perceptual hash are verified three ways: a pure-local
roundtrip against the synth formula, a Spark-vs-local-model differential,
and a hypothesis proof of the band-blocking pigeonhole guarantee the
hamming-pairs operator's exactness rests on.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from prajna_spark.pipeline import multimodal as mm


def _formula_pixels(doc_id: int) -> np.ndarray:
    seed = doc_id % mm.IMG_CLASSES
    w = 16 + seed % 17
    h = 12 + (seed * 3) % 11
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            pert = 96 if (doc_id * 11 + x * 5 + y * 3) % 199 == 0 else 0
            out[y, x] = (seed * 31 + x * 13 + y * 7 + pert) % 256
    return out.astype(np.uint8)


def _local_dhash(gray: np.ndarray) -> int:
    h, w = gray.shape
    bits = 0
    for gy in range(7):
        sy = gy * h // 7
        for gx in range(8):
            a = int(gray[sy, gx * w // 9])
            b = int(gray[sy, (gx + 1) * w // 9])
            if b > a:
                bits |= 1 << (gy * 8 + gx)
    return bits


@pytest.mark.parametrize("doc_id", [0, 1, 88, 89, 197, 4999])
def test_bmp_roundtrip_matches_formula(doc_id):
    """encode->decode is the identity on the pixel plane, including the
    padded-row / bottom-up cases (w=16 -> rowsize 48, no padding; w=17 ->
    rowsize 52, 1 pad byte; both appear in the seed range)."""
    px = mm._img_pixels(doc_id)
    assert np.array_equal(px, _formula_pixels(doc_id))
    payload = mm._bmp_encode(px)
    assert payload[:2] == b"BM"
    seed = doc_id % mm.IMG_CLASSES
    w, h = 16 + seed % 17, 12 + (seed * 3) % 11
    assert len(payload) == 54 + h * ((3 * w + 3) // 4 * 4)
    assert np.array_equal(mm._bmp_decode(payload), px)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(ft):
    """encode->decode is the identity under EVERY PNG scanline filter
    (None/Sub/Up/Average/Paeth), on adversarial planes: random bytes,
    constant, gradients, and the synth formula."""
    rng = np.random.default_rng(ft)
    planes = [
        rng.integers(0, 256, size=(11, 17)).astype(np.uint8),
        np.full((5, 5), 200, dtype=np.uint8),
        (np.arange(9 * 13).reshape(9, 13) % 256).astype(np.uint8),
        mm._img_pixels(4999),
    ]
    for px in planes:
        payload = mm._png_encode(px, row_filter=lambda y: ft)
        assert payload[:8] == mm._PNG_SIG
        gray, (depth, ctype) = mm._png_decode(payload)
        assert (depth, ctype) == (8, 0)
        assert np.array_equal(gray, px)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=18),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filters=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=18),
)
def test_png_roundtrip_property(w, h, seed, filters):
    """Hypothesis roundtrip: decode(encode(x)) == x on arbitrary planes
    (including 1-pixel-wide/tall edges, where the Sub/Average/Paeth left
    and up terms vanish) under arbitrary per-row filter schedules."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    payload = mm._png_encode(px, row_filter=lambda y: filters[y % len(filters)])
    gray, (depth, ctype) = mm._png_decode(payload)
    assert (depth, ctype) == (8, 0)
    assert np.array_equal(gray, px)


def test_png_roundtrip_mixed_filters_matches_formula():
    for doc_id in (0, 1, 88, 89, 197, 4999):
        px = mm._img_pixels(doc_id)
        payload = mm._png_encode(px, row_filter=lambda y: (doc_id + y) % 5)
        assert np.array_equal(mm._png_decode(payload)[0], px)


def test_png_golden_fixture_pixel_exact():
    """Decode a hand-assembled PNG (bytes built here chunk by chunk, NOT
    via _png_encode) — proves the decoder against the spec, independent
    of the encoder: 3x2 gray8, row 0 filter Sub, row 1 filter Up."""
    import struct
    import zlib

    # target pixels: [[10, 20, 30], [13, 24, 35]]
    # row 0 Sub:  10, 20-10, 30-20 -> 10, 10, 10
    # row 1 Up:   13-10, 24-20, 35-30 -> 3, 4, 5
    raw = bytes([1, 10, 10, 10]) + bytes([2, 3, 4, 5])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    payload = (
        mm._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    gray, _ = mm._png_decode(payload)
    assert np.array_equal(gray, np.array([[10, 20, 30], [13, 24, 35]], dtype=np.uint8))
    # corrupt one IDAT byte -> CRC check must fail loudly
    bad = bytearray(payload)
    idat_off = payload.index(b"IDAT") + 4
    bad[idat_off] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm._png_decode(bytes(bad))


def test_png_decoder_rejects_unsupported_variants():
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    rgb_ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)  # color type 2
    payload = (
        mm._PNG_SIG
        + chunk(b"IHDR", rgb_ihdr)
        + chunk(b"IDAT", zlib.compress(bytes([0, 1, 2, 3, 4, 5, 6])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="gray8"):
        mm._png_decode(payload)
    with pytest.raises(ValueError, match="not a PNG"):
        mm._png_decode(b"JUNK" * 4)


def test_decode_gray_dispatches_by_magic():
    px = mm._img_pixels(42)
    assert np.array_equal(mm._decode_gray(mm._png_encode(px)), px)
    assert np.array_equal(mm._decode_gray(mm._bmp_encode(px)), px)
    # decode_image's public surface agrees on dims/mode
    h, w = px.shape
    assert mm.decode_image(mm._png_encode(px)) == (w, h, "L")
    assert mm.decode_image(mm._bmp_encode(px)) == (w, h, "RGB")


def test_png_spark_meta_matches_local(spark, sf_dir):
    from prajna_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).limit(40)
    meta = {
        r.doc_id: r
        for r in mm.decode_png_meta(mm.synthesize_png(docs)).collect()
    }
    for doc_id, r in meta.items():
        px = mm._img_pixels(doc_id)
        assert (r.height, r.width) == px.shape
        assert (r.bit_depth, r.color_type) == (8, 0)
        assert r.gray_sum == int(px.astype(np.int64).sum())


def test_dhash_matches_local_model():
    for doc_id in (0, 7, 89, 1234):
        g = mm._img_pixels(doc_id)
        assert mm._dhash56(g) == _local_dhash(g)
        assert 0 <= mm._dhash56(g) < 1 << 56


def test_same_seed_unperturbed_docs_hash_identically():
    """Docs whose perturbation misses every dHash sample point collapse to
    their class hash — the dup-group mechanism the catalog query relies
    on. doc 0 and doc 89*k share seed 0; find two with equal hashes."""
    hashes = [mm._dhash56(mm._img_pixels(89 * k)) for k in range(12)]
    assert len(set(hashes)) < len(hashes)


def test_spark_dhash_and_meta_match_local(spark, sf_dir):
    from prajna_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).limit(40)
    media = mm.synthesize_bmp(docs)
    meta = {r["doc_id"]: r for r in mm.decode_bmp_meta(media).collect()}
    hashes = {r["doc_id"]: r["dhash"] for r in mm.image_dhash(media).collect()}
    for doc_id, row in meta.items():
        px = _formula_pixels(doc_id)
        assert (row["height"], row["width"]) == px.shape
        assert row["bpp"] == 24
        assert row["gray_sum"] == int(px.astype(np.int64).sum())
        assert hashes[doc_id] == _local_dhash(px)


def test_hamming_pairs_spark_matches_bruteforce(spark, sf_dir):
    """Band-blocked pairs == brute-force all-pairs at hamming <= 3 (the
    pigeonhole exactness claim, checked on real data)."""
    from prajna_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).limit(200)
    hashes_df = mm.image_dhash(mm.synthesize_bmp(docs))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm.dhash_hamming_pairs(hashes_df).collect()
    }
    hs = {r["doc_id"]: r["dhash"] for r in hashes_df.collect()}
    ids = sorted(hs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hs[a] ^ hs[b]).count("1")
            if d <= 3:
                want.add((a, b, d))
    assert got == want


def test_hamming_pairs_rejects_unsound_threshold():
    with pytest.raises(ValueError):
        mm.dhash_hamming_pairs(None, n_bands=4, band_bits=14, max_hamming=4)


def test_hamming_pairs_no_self_pairs_on_multihash_doc(spark):
    """A contract-violating input (one doc with TWO nearby hashes) must
    not emit a doc_a == doc_b self-pair from the cross expansion (r10
    advisory — the guard is a free codegen filter)."""
    rows = [(1, 0b1010), (1, 0b1011), (2, 0b1010)]
    hashes_df = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = mm.dhash_hamming_pairs(hashes_df).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in got)
    # the legitimate cross-doc pairs survive
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(1, 2)}


@settings(max_examples=300, deadline=None)
@given(
    h=st.integers(min_value=0, max_value=(1 << 56) - 1),
    flips=st.lists(st.integers(min_value=0, max_value=55), min_size=0, max_size=3),
)
def test_band_pigeonhole_guarantee(h, flips):
    """Any two 56-bit hashes differing in <= 3 bits share at least one of
    the 4 disjoint 14-bit bands — the property that makes band blocking
    EXACT (zero false negatives) at max_hamming=3."""
    other = h
    for f in flips:
        other ^= 1 << f
    shares = any(
        (h >> (band * 14)) & 16383 == (other >> (band * 14)) & 16383
        for band in range(4)
    )
    assert shares


def test_resize_half_is_pixelwise_nearest_neighbor(spark):
    """decode(resize(encode(img))) == img[::2, ::2] exactly, per doc —
    the whole four-pass codec chain, pixel-for-pixel."""
    import numpy as np

    from prajna_spark.pipeline.multimodal import (
        _bmp_decode,
        _img_pixels,
        resize_bmp_half,
        synthesize_bmp,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = resize_bmp_half(synthesize_bmp(docs)).collect()
    assert len(out) == 12
    for r in out:
        got = _bmp_decode(bytes(r["payload"]))
        want = _img_pixels(int(r["doc_id"]))[::2, ::2]
        assert got.shape == want.shape
        assert np.array_equal(got, want), r["doc_id"]


def test_video_container_slicing_and_decode(spark):
    from prajna_spark.pipeline import multimodal as mm

    docs = spark.createDataFrame([(7,), (12,)], "doc_id long")
    media = mm.synthesize_video(docs)
    # container structure: header + n equal frames
    row = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for d, payload in row.items():
        n = mm._vid_n_frames(d)
        head = payload[: mm.VID_HEADER_LEN].decode()
        assert head.startswith("FAKEVID|") and int(head[8:12]) == n
        fsize = int(head[13:21])
        assert len(payload) == mm.VID_HEADER_LEN + n * fsize

    # JVM-sliced sampled frames decode to exactly the synth pixels
    frames = mm.sample_video_frames(media, stride=2).collect()
    import numpy as np

    for r in frames:
        gray = mm._bmp_decode(bytes(r["frame"]))
        assert np.array_equal(gray, mm._vid_pixels(r["doc_id"], r["frame_no"]))
    # stride semantics: frames 0, 2, ... < n per doc
    got = sorted((r["doc_id"], r["frame_no"]) for r in frames)
    want = sorted(
        (d, f)
        for d in row
        for f in range(0, mm._vid_n_frames(d), 2)
    )
    assert got == want
