"""PII detection and redaction over text columns.

A 100 TB training-data ingest scrubs personally-identifiable strings
before anything else sees the text. Everything here is pure JVM column
expressions (`regexp_replace` / `regexp_count`) — no Python in the hot
path, so redaction rides whole-stage codegen over the corpus scan.

The reference engine has no text layer at all (it is a typed-closure
dataflow engine, SURVEY §0); this module is part of the north-star
pipeline extensions, not operator parity.

Pattern portability: every regex below is written in the dialect
intersection of Java regex (Spark) and RE2 (DuckDB) — `\\d`, `\\b`,
bounded quantifiers, no lookbehind — so the DuckDB oracle can apply the
IDENTICAL pattern strings with `regexp_replace(..., 'g')`. Replacement
ORDER is part of the contract (email before ip before phone before
card before phone: a 13-16 digit card number must be consumed whole
before the looser phone pattern can eat a prefix of it) and is fixed by
PII_PATTERNS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters and is mirrored verbatim
# by oracle_redact_sql()/oracle_count_sql().
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{13,16}\b", "<CARD>"),
    ("phone", r"\+?\d[\d\- ]{7,14}\d", "<PHONE>"),
]


def redact(col: Column | str) -> Column:
    """Replace every PII match with its placeholder, in contract order.
    One chained column expression — Catalyst fuses the four rewrites
    into a single codegen stage over the scan."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column | str) -> list[Column]:
    """Per-category match counts (long), aliased ``n_<name>``.

    Counts are taken against the PROGRESSIVELY redacted text exactly as
    :func:`redact` would see it — category N counts matches left after
    categories < N were replaced — so n_email+n_ipv4+... equals the
    number of placeholder insertions redact() performs. (Counting every
    pattern against the raw text would double-count, e.g. the digits of
    an IP inside a longer token.)

    NULL text counts as 0 matches, not NULL: without the coalesce a
    NULL-text document gets pii_total NULL and vanishes from BOTH sides
    of any gate (pii_total == 0 and pii_total > 0 both evaluate NULL) —
    uncounted as clean or dirty. Mirrored in oracle_count_sql."""
    cur = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, repl in PII_PATTERNS:
        out.append(
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out


def redact_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level scrub: replaces ``text_col`` with its redacted form
    and appends per-category counts plus a ``pii_total`` flag column the
    quality gate can filter on."""
    counts = pii_counts(text_col)
    out = df.select(
        "*",
        *counts,
    ).withColumn(text_col, redact(text_col))
    total = sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS)
    return out.withColumn("pii_total", total.cast("long"))


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def oracle_redact_sql(expr: str) -> str:
    """DuckDB SQL fragment computing exactly :func:`redact` on ``expr``
    (RE2 'g' flag = Java replace-all)."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, {_sql_quote(pat)}, '{repl}', 'g')"
    return out


def oracle_count_sql(expr: str) -> list[str]:
    """DuckDB fragments mirroring :func:`pii_counts` (progressive
    counting over the partially-redacted text)."""
    cur = expr
    frags = []
    for name, pat, repl in PII_PATTERNS:
        frags.append(
            f"CAST(COALESCE(length(regexp_extract_all({cur}, {_sql_quote(pat)})),"
            f" 0) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, {_sql_quote(pat)}, '{repl}', 'g')"
    return frags
