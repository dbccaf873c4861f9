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
    "sample_topk_per_lang",
    oracle="""
    -- exact-k deterministic per-stratum sample: k smallest md5 draws per
    -- language, key tiebreak (md5 collisions aside, ties are impossible)
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('evalset1|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    tags=("sampling", "stratified", "exact-k", "pipeline"),
)
def sample_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (k=20) deterministic sample per language
    (pipeline.sampling.topk_per_stratum) — the held-out-eval-set builder:
    Bernoulli gates give reproducible RATES, this gives reproducible
    COUNTS. A single row_number window that Spark rewrites to
    WindowGroupLimit: a PARTIAL limit runs per input partition BEFORE the
    shuffle, so at most k x #partitions survivors per stratum cross the
    wire — a hot language never funnels its full data through one task.
    (A hand-built two-stage rank measured strictly worse; see
    topk_per_stratum's docstring and tests/test_sampling.py.)"""
    docs = _docs(spark, sf_dir)
    return sampling.topk_per_stratum(
        docs, "lang", "doc_id", k=20, seed="evalset1"
    ).select("doc_id", "lang")


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


_TOKS_SQL = (
    "list_filter(string_split_regex("
    "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +'),"
    " w -> w <> '')"
)
_PACK_BUDGET = 512


@query(
    "pack_training_sequences",
    oracle=f"""
    -- deterministic global shuffle (order by md5) -> running token count
    -- -> fixed-budget pack assignment with straddling (pretraining's
    -- concatenation packing)
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
             md5('shuf1|' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS cum_before
      FROM t
    )
    SELECT doc_id, n_tokens, cum_before,
           cum_before // {_PACK_BUDGET} AS pack_id,
           cum_before % {_PACK_BUDGET} AS pack_offset
    FROM c
    """,
    tags=("packing", "pipeline", "prefix-sum", "shuffle"),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle -> pack: documents globally shuffled by a deterministic
    md5 order, then concatenation-packed into 512-token windows
    (pipeline.packing.pack_sequences). The global running token count is
    a distributed single-shuffle prefix sum — sampled buckets + local windows +
    broadcast per-partition offsets; the only global window in the plan
    runs over #partitions rows. The DuckDB oracle computes the same
    packing with a single-node window — exact equality, including
    straddling documents."""
    from prajna_spark.pipeline import packing, textqa

    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id",
        textqa.token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("shuf1|"), F.col("doc_id").cast("string"))).alias("__h"),
    )
    packed = packing.pack_sequences(
        t, "n_tokens", _PACK_BUDGET, order_by=["__h", "doc_id"]
    )
    return packed.select(
        "doc_id", "n_tokens", F.col("cum_before").cast("long").alias("cum_before"),
        "pack_id", "pack_offset",
    )


def _weighted_oracle() -> str:
    key = sampling.es_key_sql("doc_id", "n_chars", seed="wsample1")
    return f"""
    -- Efraimidis-Spirakis weighted sample: k smallest -ln(u)/w keys,
    -- u = 48-bit md5 slice (identical hex parse + bit-identical libm ln
    -- on both engines, so the selected SET matches exactly)
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars, {key} AS es
      FROM documents
      ORDER BY es, doc_id LIMIT 300
    )
    """


@query(
    "sample_weighted_docs",
    oracle=_weighted_oracle(),
    tags=("sampling", "weighted", "exact-k", "pipeline"),
)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-without-replacement sampling
    (pipeline.sampling.weighted_topk): keep 300 documents with
    inclusion probability scaling with n_chars — 'sample proportionally
    to token count', the corpus-mixing primitive the Bernoulli gates
    (uniform) and topk_per_stratum (per-group uniform) cannot express.
    The Efraimidis-Spirakis key -ln(u)/w with a deterministic md5
    uniform makes the draw reproducible, partition-independent, and
    engine-portable (bit-identical libm ln, verified by this oracle).
    Plans as TakeOrderedAndProject: each task forwards its local top-k
    only — no global sort at any scale."""
    docs = _docs(spark, sf_dir)
    return sampling.weighted_topk(
        docs, "doc_id", "n_chars", k=300, seed="wsample1"
    ).select("doc_id", "lang", "n_chars")


@query(
    "profile_events_quantiles",
    oracle="""
    -- exact grouped quantiles: Spark percentile == DuckDB quantile_cont
    -- (both linearly-interpolated order statistics, bit-identical)
    SELECT event_type,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY 1
    """,
    tags=("profiling", "quantiles", "validation", "pipeline"),
)
def profile_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value quantiles (pipeline.validate.
    profile_quantiles): p50/p95/p99 in ONE sort-based aggregation job —
    the distribution profile an ingest gate reads before accepting a
    delivery (latency percentiles, payload-size tails). Exact, not
    sketched: Spark `percentile` and DuckDB `quantile_cont` compute the
    same interpolated order statistic bit-identically, so this is
    hash-checked like any relational query; swap to approx_percentile
    only when a single group exceeds ~10^8 rows."""
    from prajna_spark.pipeline.validate import profile_quantiles

    tune(spark)
    ev = load_table(spark, "events", sf_dir)
    return profile_quantiles(ev, ["event_type"], "value", [0.50, 0.95, 0.99])


_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query(
    "split_train_val_test",
    oracle=f"""
    -- deterministic 3-way split: cumulative md5-hex ranges, identical
    -- CASE on both engines; per-split counts prove coverage+disjointness
    SELECT {sampling.split_assign_sql('doc_id', _SPLITS, seed='split1')} AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    tags=("sampling", "split", "pipeline"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment
    (pipeline.sampling.split_assign): one md5 draw per document against
    cumulative thresholds — every doc lands in EXACTLY one split (total
    coverage and disjointness by construction), re-running on a grown
    corpus keeps every previously-assigned document in its split (the
    draw depends only on doc_id), and no shuffle happens at all: the
    assignment is a row-local expression; the rollup here exists only to
    give the oracle a compact certificate."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            sampling.split_assign(F.col("doc_id"), _SPLITS, seed="split1"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _temp_mix_oracle(alpha: float, target: int, seed: str) -> str:
    rate = (
        f"least(1e0, {float(target)} * pow(CAST(n AS DOUBLE), {alpha}) / z"
        f" / CAST(n AS DOUBLE))"
    )
    thr = sampling.threshold_hex_sql("rate")
    return f"""
    -- temperature-mixing certificate: p_s ∝ n_s^{alpha}, rates and hex
    -- thresholds computed in-plan with the identical floor/hex spelling
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY 1
    ), norm AS (
      -- sequential fold in stratum order: bit-identical to Spark's
      -- sort_array + aggregate spelling (a plain sum's addition order is
      -- engine- and run-dependent, and z feeds a hard md5 gate)
      SELECT list_reduce(
               list(pow(CAST(n AS DOUBLE), {alpha}) ORDER BY lang NULLS FIRST),
               (acc, x) -> acc + x) AS z
      FROM counts
    ), rates AS (
      SELECT lang, {rate} AS rate FROM counts, norm
    )
    SELECT d.lang, count(*) AS n_kept
    FROM documents d JOIN rates r ON r.lang = d.lang
    WHERE substring(md5('{seed}|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
          <= {thr}
    GROUP BY 1
    """


@query(
    "mix_corpus_temperature",
    oracle=_temp_mix_oracle(0.5, 300, "temp1"),
    tags=("sampling", "temperature", "mixing", "pipeline"),
)
def mix_corpus_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus rebalancing
    (pipeline.sampling.temperature_gate, alpha=0.5, target≈300): keep
    rates p_s ∝ n_s^0.5 up-weight tail languages — the standard
    multilingual mixing knob — with BOTH the rates and the md5 gate
    thresholds computed inside the plan (a |strata|-row broadcast; no
    driver round-trip, so the recipe tracks corpus growth). The oracle
    recomputes the identical floor/hex threshold spelling: double->int
    casts truncate in Spark but round in DuckDB, so floor() before the
    cast is what keeps the gates bit-identical."""
    docs = _docs(spark, sf_dir)
    kept = sampling.temperature_gate(
        docs, "lang", "doc_id", alpha=0.5, target_rows=300, seed="temp1"
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "split_grouped_by_source",
    oracle=f"""
    -- leakage-safe splitting: the split key is the SOURCE, not the doc,
    -- so every document of a source lands in the same split (group-aware
    -- holdout); certificate proves source-level purity per split
    SELECT {sampling.split_assign_sql('source', _SPLITS, seed='gsplit3')} AS split,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources
    FROM documents GROUP BY 1
    """,
    tags=("sampling", "split", "leakage", "pipeline"),
)
def split_grouped_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test splitting: the md5 draw keys on
    ``source`` instead of ``doc_id``, so all documents from one source
    land in the same split — the leakage guard for near-duplicate
    content within a source (a per-doc split leaks template text across
    train and eval; a grouped split cannot). Same zero-shuffle
    row-local assignment as split_train_val_test; the certificate's
    count(DISTINCT source) per split proves the partition is
    source-pure (the three counts sum to the corpus's distinct-source
    total)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            sampling.split_assign(F.col("source"), _SPLITS, seed="gsplit3"),
            "source",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query(
    "bootstrap_ci_total_price",
    oracle=f"""
    -- Poisson-bootstrap 95% CI for the mean order total: 32 replicates,
    -- each row's multiplicity an independent Poisson(1) draw inverted
    -- from a deterministic md5-uniform — the distributed bootstrap
    -- (classic with-replacement resampling needs a global index; the
    -- Poisson form is a pure per-row decision). Replicate means round
    -- portably; the CI is an exact percentile over those 32 values.
    WITH reps AS (
      SELECT b.i AS rep,
             {sampling.bootstrap_sql("o_orderkey", "b.i")} AS w,
             o_totalprice AS v
      FROM orders, range(0, 32) b(i)
    ), m AS (
      SELECT rep,
             (floor((sum(w * v) / CAST(sum(w) AS DOUBLE)) * 1e6 + 5e-1)
              / 1e6) AS mean
      FROM reps GROUP BY rep
    )
    SELECT CAST(32 AS BIGINT) AS n_reps,
           quantile_cont(mean, 0.025) AS ci_lo,
           quantile_cont(mean, 0.975) AS ci_hi,
           (SELECT (floor(avg(o_totalprice) * 1e6 + 5e-1) / 1e6)
            FROM orders) AS point_est
    FROM m
    """,
    tags=("bootstrap", "statistics", "sampling", "orders"),
)
def bootstrap_ci_total_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for mean(o_totalprice) via the
    Poisson bootstrap (pipeline.sampling.poisson_bootstrap_means) — the
    resampling scheme that actually distributes: each row draws an
    independent Poisson(1) multiplicity per replicate from a
    deterministic md5-uniform, so no global index and no shuffle until
    the 32-group aggregate (map-side partials collapse every partition
    to 32 rows). The CI is an exact percentile over the 32 portably-
    rounded replicate means, so the whole pipeline hash-matches the SQL
    replay."""
    tune(spark)
    orders = load_table(spark, "orders", sf_dir)
    from prajna_spark.functions.rounding import pround

    m = sampling.poisson_bootstrap_means(
        orders, "o_orderkey", "o_totalprice", b=32
    )
    point = orders.agg(pround(F.avg("o_totalprice"), 6).alias("point_est"))
    return (
        m.agg(
            F.count(F.lit(1)).alias("n_reps"),
            F.percentile("mean", 0.025).alias("ci_lo"),
            F.percentile("mean", 0.975).alias("ci_hi"),
        )
        .crossJoin(F.broadcast(point))
        .select("n_reps", "ci_lo", "ci_hi", "point_est")
    )
