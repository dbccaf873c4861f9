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


# --------------------------------------------------------------------------
# Anonymized release: k-anonymity suppression + seeded-Laplace DP counts
# --------------------------------------------------------------------------

def kanon_release(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity release over quasi-identifier columns: aggregate to
    equivalence classes and SUPPRESS classes smaller than ``k`` (their
    members would be re-identifiable). Returns the released classes with
    their sizes. One hash aggregation on the quasi tuple — map-side
    partial combine makes it one narrow shuffle at any corpus size."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") >= k)
    )


def laplace_noise(key: Column, seed: str, scale: float) -> Column:
    """Deterministic Laplace(0, scale) noise via inverse-CDF over an
    md5-derived uniform — the SEEDED twin of the DP Laplace mechanism so
    oracle tests can replay it bit-for-bit (md5 hex parses, IEEE
    division, and libm ln are cross-engine identical; see
    functions.rounding notes). Production DP MUST use real entropy — a
    replayable seed breaks the privacy guarantee by definition; this
    spelling exists to make the MECHANISM (sensitivity/epsilon/scale
    arithmetic) a testable operator.

    u = (h + 1) / (2^60 + 2) in (0,1), h = 60 md5 bits of seed|key;
    X = scale * ln(2u) for u < 1/2, else -scale * ln(2 - 2u).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float((1 << 60) + 2))
    return F.when(u < 0.5, F.lit(scale) * F.log(2.0 * u)).otherwise(
        F.lit(-scale) * F.log(2.0 - 2.0 * u)
    )


def oracle_laplace_sql(key_expr: str, seed: str, scale_sql: str) -> str:
    """The DuckDB replay of laplace_noise — same md5 bits, same inverse
    CDF, scale spelled in scientific notation (``scale_sql``) so both
    engines parse it as DOUBLE."""
    h = (
        f"CAST('0x' || substring(md5('{seed}|' || CAST({key_expr} AS VARCHAR)),"
        " 1, 15) AS BIGINT)"
    )
    u = f"(({h} + 1) / 1152921504606846978e0)"
    return (
        f"(CASE WHEN {u} < 5e-1 THEN {scale_sql} * ln(2e0 * {u}) "
        f"ELSE -({scale_sql}) * ln(2e0 - 2e0 * {u}) END)"
    )


def dp_noisy_counts(
    df: DataFrame, group_col: str, epsilon: float, seed: str
) -> DataFrame:
    """Per-group counts released through the Laplace mechanism at
    sensitivity 1: noisy_count = count + Laplace(1/epsilon). The noise
    is seeded per group key (see laplace_noise's caveat: replayable
    noise is for testing the mechanism, not for production privacy)."""
    scale = 1.0 / epsilon
    return df.groupBy(group_col).agg(F.count(F.lit(1)).alias("true_n")).select(
        group_col,
        (F.col("true_n") + laplace_noise(F.col(group_col), seed, scale)).alias(
            "noisy_count"
        ),
    )


def ldiversity_audit(
    df, quasi_cols: list[str], sensitive_col: str, l_min: int
):
    """l-diversity audit — k-anonymity's companion check: a class of
    k identical quasi-identifier rows still leaks the sensitive value
    if all k share it. Reports every equivalence class with its size
    and distinct-sensitive count plus the pass verdict; release
    pipelines suppress (or generalize) the failing classes. One exact
    distinct-aggregate per class — count_distinct partials keep it
    map-side combined."""
    from pyspark.sql import functions as F

    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
        (F.countDistinct(sensitive_col) >= F.lit(int(l_min))).alias("diverse"),
    )
