"""Lexical retrieval: inverted postings, BM25 scoring, salient-term query
extraction, and reciprocal-rank fusion for hybrid (lexical + vector) search.

The training-data-curation use: retrieval-based quality filtering, targeted
decontamination ("find everything that looks like this eval set"), and the
hybrid BM25+ANN recall stage of a RAG-corpus build. The reference has no
retrieval surface at all (its text work lives in .NET sample closures,
WordCount.fs:36); this module is the declared Spark-native upgrade.

Scale design (what survives 100 TB):
- the inverted index is ``tokens -> explode -> groupBy(doc, term)`` — two
  narrow-key shuffles carrying (doc_id, term, tf) rows, never document text;
- query terms are broadcast and postings are PRUNED to them *before* any
  aggregation, so df/idf/scoring all run over postings-of-query-terms only
  (classic postings-list retrieval — corpus-sized work happens once, at
  index build, not per query);
- corpus-level scalars (N, avgdl) ride a one-row broadcast cross join, never
  a driver collect;
- top-k per query is a row_number window that Spark rewrites to
  WindowGroupLimit (partial pre-shuffle limit — same plan shape as
  ``sampling.topk_per_stratum``).

Engine-portable determinism: scores are summed over <= |query terms| float
contributions, rounded via the portable ``pround`` spelling BEFORE ranking,
with doc_id tiebreaks — so DuckDB replays the exact ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prajna_spark.functions.rounding import pround
from prajna_spark.operators.lifecycle import scoped_persist
from prajna_spark.pipeline import textqa

#: Lucene/Robertson BM25 defaults
BM25_K1 = 1.2
BM25_B = 0.75


def doc_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted postings ``(doc_id, term, tf, dl)`` in ONE pass: tokenize,
    attach the document length, explode, count per (doc, term). ``dl``
    rides the explode so no second join against a lengths table is needed.

    The tokenize+explode is the expensive map side and a single-file
    corpus scans as ONE split — spread the raw rows first (conditional:
    a many-split table at scale, or an upstream that already
    repartitioned, is untouched — r11, guide §2.5)."""
    from prajna_spark.operators.fanout import fan_out

    docs = fan_out(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        textqa.tokens(F.col(text_col)).alias("toks"),
    ).select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    return toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row frame ``(n_docs, avgdl)`` — joined in by broadcast cross
    join wherever the BM25 formula needs corpus scalars (in-plan; no
    driver round-trip, so the stats track the corpus)."""
    return docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(textqa.token_count(F.col(text_col))).alias("avgdl"),
    )


def bm25_contribution(k1: float = BM25_K1, b: float = BM25_B):
    """The BM25 contribution of ONE posting row — the single shared
    arithmetic spelling behind every scoring path (from-scratch,
    persisted index, streamed live index). All three are proven
    result-identical by one shared catalog oracle, so this expression
    must exist exactly once: an idf tweak applied to one copy would
    silently break that invariant. Requires columns tf, dl, df, n_docs,
    avgdl in scope."""
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    tf_part = (tf * (k1 + 1.0)) / (
        tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    return idf * tf_part


def score_postings(
    scored: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """Sum per-posting BM25 contributions into (query_id, doc_id, score)
    with the portable rounding every ranking path shares."""
    return (
        scored.select("query_id", "doc_id", bm25_contribution(k1, b).alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(pround(F.sum("contrib"), score_decimals).alias("score"))
    )


def rank_topk(scores: DataFrame, k: int, exclude_self: bool = False) -> DataFrame:
    """Deterministic top-k per query: rounded-score desc, doc_id
    tiebreak, WindowGroupLimit plan shape. Shared by every search path."""
    if exclude_self:
        scores = scores.where(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scores.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def bm25_scores(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
) -> DataFrame:
    """BM25 score per (query_id, doc_id) over ``query_terms (query_id,
    term)``. Postings are pruned to query terms FIRST (broadcast hash
    join on the tiny query side), so document frequency and scoring
    aggregate only postings that can contribute."""
    # persisted: the pruned postings feed BOTH the document-frequency
    # broadcast build and the scoring join — the df job materializes the
    # cache (full-partition consumption), the scoring job reads blocks,
    # so the postings aggregation runs once instead of once per consumer
    # (r11)
    pruned = scoped_persist(
        postings.join(
            F.broadcast(query_terms.select("term").distinct()), "term"
        )
    )
    dfreq = pruned.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        pruned.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(query_terms), "term")
        .crossJoin(F.broadcast(stats))
    )
    return score_postings(scored, k1, b, score_decimals)


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k documents per query by BM25: ``(query_id, doc_id, score, rk)``.
    ``exclude_self`` drops doc_id == query_id matches (more-like-this mode,
    where queries are themselves corpus documents).

    Tokenization runs ONCE: postings and corpus stats both derive from a
    shared scope-persisted token frame (the pmi_collocations lesson —
    spelled as separate doc_postings + corpus_stats calls, every stats/
    broadcast branch re-tokenized the corpus). ``token_count`` is
    ``size(tokens(text))`` by definition, so ``avg(size(__toks))`` is the
    identical avgdl, NULL-text docs skipped on both spellings."""
    toks = scoped_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            textqa.tokens(F.col(text_col)).alias("__toks"),
        )
    )
    postings = (
        toks.select(
            "doc_id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    scores = bm25_scores(
        postings,
        stats,
        query_terms,
        k1=k1,
        b=b,
        score_decimals=score_decimals,
    )
    return rank_topk(scores, k, exclude_self)


def salient_terms(
    docs: DataFrame,
    n_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ``n_terms`` highest-tf terms of each document (ties by term) —
    a deterministic "more like this" query representation: feed the result
    into :func:`bm25_topk` as ``query_terms`` with query_id = doc_id.
    Same WindowGroupLimit top-k shape as every rank+filter here."""
    p = doc_postings(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_terms)
        .select(F.col("doc_id").alias("query_id"), "term")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 10,
    c: int = 60,
    rank_col: str = "rk",
    doc_col: str = "doc_id",
    score_decimals: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): fused(q, d) = sum over
    systems of 1 / (c + rank). Each input holds (query_id, ``doc_col``,
    ``rank_col``); a doc absent from a system's list simply contributes
    nothing (union-then-aggregate — no outer join). The union carries only
    (query, doc, contrib) rows — k·|queries|·|systems| of them — so fusion
    cost is independent of corpus size."""
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = None
    for r in ranked_lists:
        part = r.select(
            "query_id",
            F.col(doc_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col).cast("double"))).alias(
                "contrib"
            ),
        )
        contribs = part if contribs is None else contribs.unionByName(part)
    fused = contribs.groupBy("query_id", "doc_id").agg(
        pround(F.sum("contrib"), score_decimals).alias("rrf"),
        F.count(F.lit(1)).cast("long").alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the inverted index PARTITIONED BY term-hash bucket —
    the production layout for repeated queries (the lexical twin of
    ``similarity.build_ivf_index``). Every scoring input is precomputed
    per posting at build time: tf, dl, and the term's document frequency
    (so search does NO corpus-wide aggregation at all); corpus stats land
    in a sibling ``<path>/stats`` one-row table. A probe-time join on
    bucket prunes the scan to the query terms' buckets via dynamic
    partition pruning — I/O scales with |query terms|/n_buckets of the
    index, not its size."""
    p = doc_postings(docs, id_col, text_col)
    dfreq = p.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    (
        p.join(dfreq, "term")
        .withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    corpus_stats(docs, text_col).write.mode("overwrite").parquet(f"{path}/stats")


def search_text_index(
    spark,
    path: str,
    query_terms: DataFrame,
    k: int = 10,
    n_buckets: int = 16,
    k1: float = BM25_K1,
    b: float = BM25_B,
    score_decimals: int = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """BM25 top-k over a :func:`build_text_index` layout. Query terms are
    bucketed with the same hash and broadcast; the (bucket, term) join
    prunes index partitions at runtime, and since df/dl/tf are stored per
    posting the whole search is scan -> broadcast join -> one groupBy ->
    WindowGroupLimit top-k. Results are IDENTICAL to the from-scratch
    ``bm25_topk`` (same arithmetic over the same precomputed inputs) —
    the property the shared catalog oracle checks."""
    postings = spark.read.parquet(f"{path}/postings")
    stats = spark.read.parquet(f"{path}/stats")
    qt = query_terms.withColumn("bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
    scored = (
        postings.join(F.broadcast(qt), ["bucket", "term"])
        .crossJoin(F.broadcast(stats))
    )
    return rank_topk(
        score_postings(scored, k1, b, score_decimals), k, exclude_self
    )


def hashed_tf_features(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature hashing (the Weinberger et al. hashing trick): model-free
    text vectorization into ``dim`` signed term-count buckets —
    ``(doc_id, bucket, val)`` sparse form. Bucket and sign come from md5
    hex slices (portable: Spark ``conv(h,16,10)`` == DuckDB
    ``CAST('0x'||h AS BIGINT)``), values are integer sign sums — exact,
    order-independent, engine-identical. Row-local until one narrow
    (doc, bucket) groupBy; no vocabulary state, so the featurizer needs
    no fit pass and is stable as the corpus grows — the property that
    makes it the cheap baseline vectorizer for dedup/clustering before
    any learned embedding exists."""
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(textqa.tokens(F.col(text_col))).alias("term"),
    ).withColumn("__h", F.md5("term"))
    bucket = (F.conv(F.substring("__h", 1, 8), 16, 10).cast("long") % dim).alias(
        "bucket"
    )
    sign = F.when(
        F.conv(F.substring("__h", 9, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        t.select("doc_id", bucket, sign.alias("sign"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("long").alias("val"))
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    dec: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — :func:`salient_terms`'s
    corpus-aware upgrade (raw tf surfaces stopwords; the idf factor
    ln(N / df) suppresses terms every document shares). Returns
    (doc_id, term, tf, df, tfidf, rk).

    Plan: one postings pass (doc-keyed), a term-keyed df count (narrow
    (term, df) rows joined back BY TERM — term cardinality, not corpus
    cardinality), a one-row broadcast for N, then the standard
    WindowGroupLimit top-k. ln is engine-bit-identical (libm), tf/df
    are integers and N/df one exact division, so ranking doubles match
    the oracle before the portable round."""
    p = scoped_persist(doc_postings(docs, id_col, text_col))
    df_counts = p.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = (
        p.join(df_counts, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            "df",
            pround(
                F.col("tf").cast("double")
                * F.log(F.col("__n") / F.col("df").cast("double")),
                dec,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )
