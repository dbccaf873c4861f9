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


# --------------------------------------------------------------------------
# anonymized release tier
# --------------------------------------------------------------------------


def test_kanon_suppresses_small_classes(spark):
    from prajna_spark.pipeline.pii import kanon_release

    rows = [("a", 1)] * 5 + [("b", 1)] * 4 + [("b", 2)] * 2
    df = spark.createDataFrame(rows, "seg string, nat int")
    out = {
        (r["seg"], r["nat"]): r["class_size"]
        for r in kanon_release(df, ["seg", "nat"], k=5).collect()
    }
    # only the size-5 class survives; k-1-sized and smaller are suppressed
    assert out == {("a", 1): 5}


def test_laplace_noise_is_centered_and_symmetricish(spark):
    """Inverse-CDF over md5 uniforms: over many keys the sample mean of
    Laplace(0, 2) is near 0 and the spread matches scale*sqrt(2) within
    a loose tolerance — catches a one-sided or mis-scaled CDF branch."""
    import math

    from pyspark.sql import functions as F

    from prajna_spark.pipeline.pii import laplace_noise

    df = spark.range(0, 4000).select(
        laplace_noise(F.col("id"), "t", 2.0).alias("x")
    )
    row = df.agg(
        F.avg("x").alias("m"), F.stddev_samp("x").alias("s"),
        F.min("x").alias("lo"), F.max("x").alias("hi"),
    ).first()
    assert abs(row["m"]) < 0.2
    assert abs(row["s"] - 2.0 * math.sqrt(2)) < 0.3
    assert row["lo"] < -4 and row["hi"] > 4  # both tails realized


def test_laplace_noise_is_deterministic_per_key_and_seed(spark):
    from pyspark.sql import functions as F

    from prajna_spark.pipeline.pii import laplace_noise

    df = spark.range(0, 50).select(
        laplace_noise(F.col("id"), "s1", 1.0).alias("a"),
        laplace_noise(F.col("id"), "s1", 1.0).alias("b"),
        laplace_noise(F.col("id"), "s2", 1.0).alias("c"),
    )
    rows = df.collect()
    assert all(r["a"] == r["b"] for r in rows)
    assert any(r["a"] != r["c"] for r in rows)
