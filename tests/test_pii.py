"""pipeline.pii — PII detection/redaction contract tests.

The catalog query (redact_pii_documents) proves Spark/DuckDB regex
parity on planted PII; these tests pin the OPERATOR semantics on
adversarial strings the synthetic corpus never contains.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prajna_spark.pipeline.pii import (
    PII_PATTERNS,
    pii_counts,
    redact,
    redact_documents,
)

CASES = [
    # (raw, expected redacted, expected per-category counts)
    ("mail me at jo.doe+x@sub.example.org now",
     "mail me at <EMAIL> now",
     {"n_email": 1, "n_ipv4": 0, "n_card": 0, "n_phone": 0}),
    ("server 192.168.0.1 and 10.0.255.254",
     "server <IP> and <IP>",
     {"n_email": 0, "n_ipv4": 2, "n_card": 0, "n_phone": 0}),
    # 16-digit card must be consumed WHOLE by the card pattern, not
    # partially by the looser phone pattern (ordering contract)
    ("pay 4111111111111111 thanks",
     "pay <CARD> thanks",
     {"n_email": 0, "n_ipv4": 0, "n_card": 1, "n_phone": 0}),
    ("call +1 555-0147312 today",
     "call <PHONE> today",
     {"n_email": 0, "n_ipv4": 0, "n_card": 0, "n_phone": 1}),
    ("clean text with no pii at all",
     "clean text with no pii at all",
     {"n_email": 0, "n_ipv4": 0, "n_card": 0, "n_phone": 0}),
    # all four at once
    ("a@b.io 1.2.3.4 4000000000000002 +44 20-7946-0958",
     "<EMAIL> <IP> <CARD> <PHONE>",
     {"n_email": 1, "n_ipv4": 1, "n_card": 1, "n_phone": 1}),
]


def test_redact_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _, _) in enumerate(CASES)],
                               "id long, text string")
    got = {r["id"]: r["red"] for r in
           df.select("id", redact("text").alias("red")).collect()}
    for i, (_, want, _) in enumerate(CASES):
        assert got[i] == want, (i, got[i])


def test_counts_progressive(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _, _) in enumerate(CASES)],
                               "id long, text string")
    rows = df.select("id", *pii_counts("text")).collect()
    for row in rows:
        want = CASES[row["id"]][2]
        for k, v in want.items():
            assert row[k] == v, (row["id"], k, row[k], v)


def test_counts_sum_equals_placeholder_insertions(spark):
    """n_email+n_ipv4+n_card+n_phone == number of placeholders actually
    inserted by redact() — the invariant progressive counting exists for."""
    df = spark.createDataFrame([(i, r) for i, (r, _, _) in enumerate(CASES)],
                               "id long, text string")
    rows = redact_documents(df, "text").select("text", "pii_total").collect()
    for r in rows:
        n_placeholders = sum(
            r["text"].count(repl) for _, _, repl in PII_PATTERNS
        )
        assert r["pii_total"] == n_placeholders, r


def test_redact_idempotent(spark):
    """Redacting already-redacted text is a no-op (placeholders contain
    no redactable substrings)."""
    df = spark.createDataFrame([(i, r) for i, (r, _, _) in enumerate(CASES)],
                               "id long, text string")
    once = df.select("id", redact("text").alias("text"))
    twice = once.select("id", redact("text").alias("text"))
    assert sorted(r["text"] for r in once.collect()) == sorted(
        r["text"] for r in twice.collect()
    )


def test_null_text_counts_zero_and_survives_gates(spark):
    """NULL text must count as 0 matches: with NULL counts, pii_total is
    NULL and the doc vanishes from BOTH gate branches (== 0 and > 0)."""
    from pyspark.sql import functions as F

    from prajna_spark.pipeline.pii import redact_documents

    df = spark.createDataFrame(
        [(1, "mail me a@b.co"), (2, None)], "id long, text string"
    )
    out = redact_documents(df)
    rows = {r.id: r for r in out.collect()}
    assert rows[2].pii_total == 0 and rows[2].n_email == 0
    assert rows[2].text is None
    assert rows[1].pii_total == 1
    kept = out.where(F.col("pii_total") == 0).count()
    quarantined = out.where(F.col("pii_total") > 0).count()
    assert kept + quarantined == 2
