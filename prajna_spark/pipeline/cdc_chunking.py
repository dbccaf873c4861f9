"""Content-defined chunking (CDC) — rolling-hash boundary detection.

The third chunking mode next to :func:`packing.chunk_documents` (fixed
token windows) and :func:`packing.chunk_by_sentence` (sentence budgets):
boundaries are placed where a Rabin rolling fingerprint of the last
``W`` characters hits a mask, so an insertion near the start of a
document only perturbs chunk boundaries LOCALLY — the property that
makes CDC the dedup-friendly chunking for incrementally edited corpora
(rsync/LBFS lineage), where fixed windows would shift every downstream
chunk hash.

This is also the package's native Python UDTF exemplar (SURVEY §2.13
row 57 — UDF/UDAF/UDTF): the boundary scan is a genuinely sequential
O(n) stateful recurrence per document (the rolling update), which is
exactly the shape Spark 4's ``@udtf`` + ``DataFrame.lateralJoin`` is
for — one input row fanning out to a variable number of chunk rows.
The SQL oracle replays the SAME fingerprints non-incrementally (an
O(n·w) positional expansion), so cross-engine equality checks both the
closed form and the rolling update against each other.

Scale shape: the UDTF is per-document and stateless across rows — it
parallelizes embarrassingly over partitions, holds O(1) state, and the
output carries (doc_id, chunk coords, md5) only, never the text.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

W = 8  # rolling window (chars)
B = 257  # polynomial base
M = 1_000_000_007  # modulus
MASK = 64  # boundary when fp % MASK == 0 -> expected chunk ~ MASK chars

#: B^k mod M for k = 0..W-1 — the oracle's closed-form weights.
POWERS = [pow(B, k, M) for k in range(W)]


def content_chunks(text: str) -> list[tuple[int, int, int, str]]:
    """Pure-Python reference chunker: (chunk_idx, start_pos(1-based),
    n_chars, chunk_md5) for one document. Single O(n) pass with the
    Rabin rolling update fp' = (fp - c_out*B^(W-1))*B + c_in (mod M)."""
    n = len(text)
    if n == 0:
        return []
    bounds: list[int] = []  # 1-based positions p: boundary AFTER char p
    if n >= W:
        fp = 0
        for i in range(W):
            fp = (fp * B + ord(text[i])) % M
        if fp % MASK == 0:
            bounds.append(W)
        top = POWERS[W - 1]
        for p in range(W, n):  # char text[p] enters; window ends at p+1
            fp = ((fp - ord(text[p - W]) * top) * B + ord(text[p])) % M
            if fp % MASK == 0:
                bounds.append(p + 1)
    starts = [1] + [p + 1 for p in bounds if p < n]
    out = []
    for idx, s in enumerate(starts):
        e = starts[idx + 1] if idx + 1 < len(starts) else n + 1
        seg = text[s - 1 : e - 1]
        out.append((idx, s, e - s, hashlib.md5(seg.encode()).hexdigest()))
    return out


@udtf(
    # field is named chunk_len (not n_chars) so a lateral join against the
    # documents table, which has its own n_chars, is never ambiguous
    returnType="chunk_idx: bigint, start_pos: bigint, chunk_len: bigint, chunk_md5: string"
)
class ContentChunksUDTF:
    """Native Python UDTF: one (text) row in, one row per CDC chunk out."""

    def eval(self, text: str):  # noqa: D102 — contract is the class doc
        for row in content_chunks(text or ""):
            yield row


def chunk_content_defined(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Lateral-join the CDC UDTF over a document frame. Returns
    (id_col, chunk_idx, start_pos, n_chars, chunk_md5)."""
    col: Column = F.col(text_col).outer()
    return docs.lateralJoin(ContentChunksUDTF(col)).select(
        id_col,
        "chunk_idx",
        "start_pos",
        F.col("chunk_len").alias("n_chars"),
        "chunk_md5",
    )


def cdc_fingerprint_sql(char_rel: str = "ch") -> str:
    """Closed-form fingerprint of the window ending at ``c0.p`` as a SQL
    expression over ``W`` self-join aliases c0..c{W-1} of a (doc_id, p,
    code) relation (c_k at offset p-k). Stepwise mod keeps every
    intermediate below M + 255*M < 2^63."""
    expr = f"(c{W - 1}.code * {POWERS[W - 1]}) % {M}"
    for k in range(W - 2, -1, -1):
        expr = f"(({expr}) + c{k}.code * {POWERS[k]}) % {M}"
    return f"({expr})"


def cdc_joins_sql(char_rel: str = "ch") -> str:
    """FROM/JOIN clause wiring the W offset aliases."""
    parts = [f"{char_rel} c0"]
    for k in range(1, W):
        parts.append(
            f"JOIN {char_rel} c{k} ON c{k}.doc_id = c0.doc_id"
            f" AND c{k}.p = c0.p - {k}"
        )
    return "\n      ".join(parts)
