"""Deterministic-sampling / corpus-mixing catalog queries over the
``documents`` table (north-star LLM-pipeline surface).

Oracle parity technique: the keep-predicate is the SAME md5-hex string
comparison on both engines (pipeline.sampling.hash_gate / hash_gate_sql),
so the sampled sets are exactly equal — not statistically similar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prajna_spark.pipeline import sampling
from prajna_spark.queries import query
from prajna_spark.session import tune
from prajna_spark.sources import load_table

#: the data-mixing recipe under test: per-language keep rates
_MIX_RATES = {"en": 0.8, "es": 0.5, "de": 0.5, "fr": 0.25, "zh": 0.25}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, "documents", sf_dir)


@query(
    "sample_documents_deterministic",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {sampling.hash_gate_sql("doc_id", 0.25, seed="split1")}
    """,
    tags=("sampling", "deterministic", "pipeline"),
)
def sample_documents_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 25% Bernoulli sample by content-hash gate
    (pipeline.sampling.hash_gate): row-local predicate, pushes to the
    scan, no shuffle, identical selection on every engine/run/partitioning
    — the property per-partition RNG (DSet.sample, storage.fs:55-74)
    cannot give. The shape every dataset-card 'we sampled X%' claim needs
    to be auditable at 100 TB."""
    docs = _docs(spark, sf_dir)
    return docs.where(
        sampling.hash_gate(F.col("doc_id"), 0.25, seed="split1")
    ).select("doc_id", "lang", "n_chars")


@query(
    "mix_corpus_stratified",
    oracle=f"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {sampling.stratified_gate_sql("lang", "doc_id", _MIX_RATES, seed="mix1")}
    GROUP BY lang
    """,
    tags=("sampling", "mixing", "stratified", "pipeline"),
)
def mix_corpus_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: each language sampled at its own deterministic rate
    (en 0.8, es/de 0.5, fr/zh 0.25) in ONE scan-local predicate
    (pipeline.sampling.stratified_gate) — the training-mixture rebalance
    with no shuffle, no RNG, and bit-reproducible selection; summarized
    per language for the oracle check."""
    docs = _docs(spark, sf_dir)
    kept = docs.where(
        sampling.stratified_gate(F.col("lang"), F.col("doc_id"), _MIX_RATES, seed="mix1")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
