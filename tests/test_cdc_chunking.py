"""Content-defined chunking: exact text coverage, the edit-locality
property that motivates CDC, and UDTF == pure-Python reference."""

from __future__ import annotations

import hashlib
import random
import string

from prajna_spark.pipeline.cdc_chunking import (
    W,
    chunk_content_defined,
    content_chunks,
)


def _rand_text(rng, n):
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def test_chunks_tile_the_text_exactly():
    rng = random.Random(5)
    for n in (0, 1, W - 1, W, 200, 1000):
        text = _rand_text(rng, n)
        chunks = content_chunks(text)
        if n == 0:
            assert chunks == []
            continue
        assert chunks[0][1] == 1
        assert sum(c[2] for c in chunks) == n
        pos = 1
        for idx, (ci, start, ln, h) in enumerate(chunks):
            assert ci == idx and start == pos and ln >= 1
            seg = text[start - 1 : start - 1 + ln]
            assert h == hashlib.md5(seg.encode()).hexdigest()
            pos += ln


def test_edit_locality():
    """An insertion near the start must only perturb chunk hashes up to
    the first boundary past the edit — the tail realigns (this is the
    whole point of CDC vs fixed windows)."""
    rng = random.Random(9)
    text = _rand_text(rng, 4000)
    edited = text[:17] + "XYZ" + text[17:]
    h1 = [c[3] for c in content_chunks(text)]
    h2 = [c[3] for c in content_chunks(edited)]
    # common suffix: all but the first few chunks are identical
    k = 0
    while k < min(len(h1), len(h2)) and h1[-1 - k] == h2[-1 - k]:
        k += 1
    assert k >= len(h1) - 3, f"tail realignment failed: only {k} common"
    # a FIXED-window chunker would shift everything: sanity-check the
    # edit really did change some front chunk
    assert h1 != h2


def test_udtf_matches_reference(spark):
    rng = random.Random(11)
    rows = [(i, _rand_text(rng, rng.randrange(0, 400))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_content_defined(df).collect()
    got_map = {}
    for r in got:
        got_map.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_pos, r.n_chars, r.chunk_md5)
        )
    for i, text in rows:
        want = [
            (ci, s, ln, h) for ci, s, ln, h in content_chunks(text)
        ]
        assert sorted(got_map.get(i, [])) == want, f"doc {i}"


def test_short_and_boundary_free_docs():
    assert len(content_chunks("ab")) == 1  # < W: single chunk, no scan
    one = content_chunks("x" * (W - 1))
    assert one[0][:3] == (0, 1, W - 1)
