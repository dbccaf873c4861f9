"""Demonstrate the LSH bucket-size cap — the production skew control —
ENGAGED on the hostile near-dup-dense fixture (r10 VERDICT item 2).

The four documents-LSH 100x exclusions (connected components / verified /
canonical docs / cluster histogram) are fixture artifacts: the synthetic
corpus is near-dup-dense by construction, so uncapped band buckets go
quadratic (~1.3e9 candidate pairs at 100x; canonical_docs OOM'd a 24 GB
heap). The operator has the knob for exactly this —
``lsh_band_pairs(max_bucket_size=...)`` drops pathological buckets BEFORE
pair expansion — but no measurement showed the knob engaged. This tool
produces that measurement, converting "excluded as artifact" into
"bounded by the documented knob, cost quantified":

  probe  <sf_dir>         bucket-size distribution + the candidate-pair
                          count sum(C(b,2)) uncapped and under a ladder of
                          caps — the cheap aggregate that predicts whether
                          the graph is bounded (no pairs materialized).
  recall <sf_dir> <cap>   EXACT recall at a scale where the uncapped truth
                          is computable (sf0.1): capped-vs-uncapped on
                          (a) true verified pairs (Jaccard >= 0.6),
                          (b) docs with at least one true near-dup, and
                          (c) dedup REMOVAL decisions (non-canonical
                          cluster members) — the metric a production
                          dedup actually ships on. Cap only DROPS buckets,
                          so capped results are subsets: recall is a
                          count ratio on joined sets.
  scale  <sf_dir> <cap>   the capped pipeline end-to-end at the hostile
                          100x fixture: candidates -> connected
                          components -> canonical docs -> cluster
                          histogram, per-stage wall times, in a bounded
                          session. Plus a seeded pair-sample estimate of
                          how many true pairs live in the DROPPED buckets
                          (the uncapped truth is uncomputable there —
                          that is the point).

Usage: python tools/lsh_cap_demo.py probe /tmp/prajna_scale/sf10.0
       python tools/lsh_cap_demo.py recall /root/testdata/sf0.1 64
       python tools/lsh_cap_demo.py scale /tmp/prajna_scale/sf10.0 64
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "300s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from prajna_spark.operators.lifecycle import persist_scope  # noqa: E402
from prajna_spark.pipeline import dedup  # noqa: E402
from prajna_spark.session import get_spark  # noqa: E402
from prajna_spark.sources import load_table  # noqa: E402

N_HASHES, BAND_SIZE = 4, 2  # the catalog queries' parameters
THRESHOLD = 0.6
CAP_LADDER = (16, 64, 256, 1024)


def _docs(spark, sf_dir: str) -> DataFrame:
    return load_table(spark, "documents", sf_dir)


def _bucket_sizes(docs: DataFrame) -> DataFrame:
    bands = dedup.lsh_band_rows(docs, "doc_id", "text", N_HASHES, BAND_SIZE)
    return bands.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).alias("b")
    )


def probe(spark, sf_dir: str) -> int:
    t0 = time.time()
    sizes = _bucket_sizes(_docs(spark, sf_dir)).persist()
    pairs_of = F.col("b") * (F.col("b") - 1) / 2
    row = sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("b").alias("max_bucket"),
        F.sum(pairs_of).cast("long").alias("uncapped_pairs_bound"),
        *[
            F.sum(F.when(F.col("b") <= cap, pairs_of).otherwise(0))
            .cast("long")
            .alias(f"capped_{cap}")
            for cap in CAP_LADDER
        ],
        *[
            F.sum(F.when(F.col("b") > cap, F.col("b")).otherwise(0))
            .cast("long")
            .alias(f"dropped_rows_{cap}")
            for cap in CAP_LADDER
        ],
    ).collect()[0]
    print(f"probe {sf_dir}: {row['buckets']} buckets, max bucket "
          f"{row['max_bucket']}, uncapped candidate bound "
          f"{row['uncapped_pairs_bound']:,} pairs [{time.time()-t0:.1f}s]")
    for cap in CAP_LADDER:
        print(f"  cap={cap:<5} candidate bound {row[f'capped_{cap}']:>15,} "
              f"pairs; band rows in dropped buckets "
              f"{row[f'dropped_rows_{cap}']:,}")
    # top of the distribution — the pathology by name
    print("  largest buckets:")
    for r in sizes.orderBy(F.desc("b")).limit(8).collect():
        print(f"    band {r['band_id']} size {r['b']:,}")
    sizes.unpersist()
    return 0


def _removals(comp: DataFrame, docs: DataFrame) -> DataFrame:
    """Docs a dedup pass REMOVES: non-canonical members of multi-doc
    clusters, canonical = longest member (doc_id tiebreak) — the
    dedup_canonical_docs decision rule."""
    joined = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id")
    )


def recall(spark, sf_dir: str, cap: int) -> int:
    docs = _docs(spark, sf_dir)
    with persist_scope():
        pairs_u = dedup.lsh_band_pairs(
            docs, "doc_id", "text", N_HASHES, BAND_SIZE
        ).persist()
        pairs_c = dedup.lsh_band_pairs(
            docs, "doc_id", "text", N_HASHES, BAND_SIZE, max_bucket_size=cap
        ).persist()

        t0 = time.time()
        truth = dedup.verify_pairs_jaccard(
            docs, pairs_u, threshold=THRESHOLD
        ).persist()
        n_truth = truth.count()
        t_truth = time.time() - t0

        t0 = time.time()
        capped = dedup.verify_pairs_jaccard(
            docs, pairs_c, threshold=THRESHOLD
        ).persist()
        n_capped = capped.count()
        t_capped = time.time() - t0

        # (a) true-pair recall — capped is a subset (cap only drops
        # buckets), so the ratio IS the recall
        print(f"recall {sf_dir} cap={cap}")
        print(f"  true pairs   uncapped {n_truth:,} [{t_truth:.1f}s]  "
              f"capped {n_capped:,} [{t_capped:.1f}s]  "
              f"pair recall {n_capped/max(n_truth,1):.4f}")

        # (b) has-a-near-dup doc recall
        dup_docs = truth.select(F.col("id_a").alias("doc_id")).unionAll(
            truth.select(F.col("id_b").alias("doc_id"))
        ).distinct().persist()
        dup_docs_capped = capped.select(
            F.col("id_a").alias("doc_id")
        ).unionAll(
            capped.select(F.col("id_b").alias("doc_id"))
        ).distinct()
        n_dup = dup_docs.count()
        n_dup_kept = dup_docs.join(dup_docs_capped, "doc_id", "left_semi").count()
        print(f"  flagged docs uncapped {n_dup:,}  capped-still-flagged "
              f"{n_dup_kept:,}  doc recall {n_dup_kept/max(n_dup,1):.4f}")

        # (c) removal-decision recall — CC over the RAW pairs (the exact
        # shape of dedup_canonical_docs) + the same canonical rule
        comp_u = dedup.connected_components(
            pairs_u, docs.select("doc_id"), id_col="doc_id"
        )
        rem_u = _removals(comp_u, docs).persist()
        comp_c = dedup.connected_components(
            pairs_c, docs.select("doc_id"), id_col="doc_id"
        )
        rem_c = _removals(comp_c, docs)
        n_rem = rem_u.count()
        n_rem_kept = rem_u.join(rem_c, "doc_id", "left_semi").count()
        print(f"  removals     uncapped {n_rem:,}  capped-agree "
              f"{n_rem_kept:,}  removal recall {n_rem_kept/max(n_rem,1):.4f}")
    return 0


def scale(spark, sf_dir: str, cap: int) -> int:
    docs = _docs(spark, sf_dir)
    with persist_scope():
        t0 = time.time()
        pairs = dedup.lsh_band_pairs(
            docs, "doc_id", "text", N_HASHES, BAND_SIZE, max_bucket_size=cap
        ).persist()
        n_pairs = pairs.count()
        print(f"scale {sf_dir} cap={cap}: capped candidates {n_pairs:,} "
              f"[{time.time()-t0:.1f}s]", flush=True)

        t0 = time.time()
        verified = dedup.verify_pairs_jaccard(
            docs, pairs, threshold=THRESHOLD
        ).persist()
        n_ver = verified.count()
        print(f"  verified pairs (jaccard>={THRESHOLD}) {n_ver:,} "
              f"[{time.time()-t0:.1f}s]", flush=True)

        # CC over the RAW capped candidates — the exact shape of the four
        # excluded catalog queries (dedup_connected_components /
        # canonical_docs / cluster_size_histogram consume unverified LSH
        # pairs), so their 100x exclusion converts directly
        t0 = time.time()
        comp = dedup.connected_components(
            pairs, docs.select("doc_id"), id_col="doc_id"
        ).persist()
        n_comp = comp.select("component_id").distinct().count()
        print(f"  connected components: {n_comp:,} clusters "
              f"[{time.time()-t0:.1f}s]", flush=True)

        t0 = time.time()
        rem = _removals(comp, docs)
        n_rem = rem.count()
        print(f"  canonical selection: {n_rem:,} docs removed "
              f"[{time.time()-t0:.1f}s]", flush=True)

        t0 = time.time()
        hist = (
            comp.groupBy("component_id").count()
            .groupBy("count").agg(F.count(F.lit(1)).alias("n_clusters"))
            .orderBy(F.desc("count")).limit(10).collect()
        )
        print(f"  cluster-size histogram top [{time.time()-t0:.1f}s]:")
        for r in hist:
            print(f"    size {r['count']:,}: {r['n_clusters']:,} clusters")

        # Dropped-bucket true-pair estimate: seeded sample of candidate
        # pairs from buckets ABOVE the cap, exact-verified — estimates the
        # true-pair mass the cap traded away (uncomputable exactly here).
        t0 = time.time()
        bands = dedup.lsh_band_rows(docs, "doc_id", "text", N_HASHES, BAND_SIZE)
        big = (
            bands.withColumn(
                "b", F.count(F.lit(1)).over(
                    Window.partitionBy("band_id", "band_val")
                )
            )
            .where(F.col("b") > cap)
        )
        # one seeded pseudo-random mate per row: pair row i with the row
        # whose in-bucket index is h(id) mod bucket-size — deterministic,
        # uniform enough for a mass estimate
        wb = Window.partitionBy("band_id", "band_val").orderBy("id")
        idx = big.select(
            "band_id", "band_val", "id", "b",
            (F.row_number().over(wb) - 1).alias("i"),
        )
        mate = (F.abs(F.hash(F.col("id"), F.lit(42))) % (F.col("b") - 1)
                + F.col("i") + 1) % F.col("b")
        lhs = idx.select(
            "band_id", "band_val", F.col("id").alias("id_l"),
            mate.alias("j"),
        )
        rhs = idx.select(
            "band_id", "band_val", F.col("id").alias("id_r"),
            F.col("i").alias("j"),
        )
        SAMPLE_MAX = 200_000
        sampled = (
            lhs.join(rhs, ["band_id", "band_val", "j"])
            .select(
                F.least("id_l", "id_r").alias("id_a"),
                F.greatest("id_l", "id_r").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
            .limit(SAMPLE_MAX)
            .persist()  # limit is non-deterministic: pin ONE sample for
            # both the count job and the verify job
        )
        ver_s = dedup.verify_pairs_jaccard(docs, sampled, threshold=THRESHOLD)
        n_s = sampled.count()
        n_s_true = ver_s.count()
        rate = n_s_true / max(n_s, 1)
        print(f"  dropped-bucket sample: {n_s:,} pairs, {n_s_true:,} true "
              f"(rate {rate:.3f}) [{time.time()-t0:.1f}s] — the cap trades "
              f"~this fraction of the dropped candidate mass; template-"
              f"bucket pairs are the ones exact dedup/boilerplate filters "
              f"target anyway", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    mode, sf_dir = sys.argv[1], sys.argv[2]
    spark = get_spark("prajna-lsh-cap-demo")
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "probe":
        return probe(spark, sf_dir)
    cap = int(sys.argv[3])
    if mode == "recall":
        return recall(spark, sf_dir, cap)
    if mode == "scale":
        return scale(spark, sf_dir, cap)
    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    raise SystemExit(main())
