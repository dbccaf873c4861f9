"""Scale-up fixture generator for the local scaling appendix.

Replicates /root/testdata/sf0.1 k-fold into /tmp/prajna_scale/sf{0.1*k}
by key-shifting each copy, preserving the join graph exactly:

- fact PKs/FKs (orderkey, custkey, partkey, suppkey, event_id, user_id,
  doc_id, vec_id) shift by copy_index * (max_key + 1) per key domain, so
  every copy joins only within itself — selectivities, join fan-outs and
  group cardinalities scale linearly, which is what a wall-time scaling
  measurement needs.
- nation/region stay fixed (as in TPC-H proper); customer/supplier/part
  scale with the facts.
- documents.text gets a per-copy suffix token so exact-dup/MinHash
  selectivity is not artificially quadratic across copies (copies are
  near-dups, still bucketed+capped, not byte-identical corpus-wide).

Usage: python tools/gen_scale.py 3      # writes /tmp/prajna_scale/sf0.3
       python tools/gen_scale.py 10     # writes /tmp/prajna_scale/sf1.0
       python tools/gen_scale.py 30 lineitem supplier
           # tier-scoped fixture: scale only the named tables (plus the
           # fixed nation/region) — e.g. a 30x edge set for the graph
           # tier without paying for 30x documents/embeddings

CAVEAT for tier-scoped fixtures (r7 ADVICE): key shifting applies only
to the SELECTED tables, so the join graph is preserved only AMONG them.
A key domain split across scaled and unscaled tables (e.g. scaling
lineitem without part splits the partkey domain) produces dangling
foreign keys in copies 2..k — fine for single-table perf proxies, wrong
for cross-tier joins. main() warns when a KEY_SITES domain is split.

This is a perf proxy only — correctness oracles always run on the
driver-generated data, never on this.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"

# key domain -> (table, column) sites sharing that shift
KEY_SITES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
SCALED_TABLES = (
    "customer orders lineitem part supplier events documents embeddings".split()
)
FIXED_TABLES = ["nation", "region"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    scaled = [t for t in SCALED_TABLES if not only or t in only]
    if only:
        # tier-scoped: warn on key domains split across scaled/unscaled
        # tables — joins across that split dangle in copies 2..k
        for dom, sites in KEY_SITES.items():
            tables = {t for t, _ in sites}
            inside = tables & set(scaled)
            if inside and tables - set(scaled):
                print(
                    f"WARNING: key domain {dom!r} split — scaled "
                    f"{sorted(inside)} vs unscaled {sorted(tables - set(scaled))}; "
                    "cross-tier joins on it will dangle in copies 2..k"
                )
    out = f"/tmp/prajna_scale/sf{round(0.1 * k, 1)}"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("gen-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = {t: spark.read.parquet(f"{SRC}/{t}.parquet") for t in scaled}
    # one offset per key domain = max(key)+1, read in one tiny job each
    offsets = {}
    for dom, sites in KEY_SITES.items():
        sites = [(t, c) for t, c in sites if t in src]
        if not sites:
            continue
        t, c = sites[0]
        offsets[dom] = src[t].agg(F.max(c)).first()[0] + 1

    shift_cols = {}  # table -> [(col, offset)]
    for dom, sites in KEY_SITES.items():
        if dom not in offsets:
            continue
        for t, c in sites:
            if t in src:
                shift_cols.setdefault(t, []).append((c, offsets[dom]))

    for t in scaled:
        parts = []
        for i in range(k):
            df = src[t]
            for c, off in shift_cols.get(t, []):
                df = df.withColumn(c, F.col(c) + F.lit(i * off))
            if t == "documents" and i > 0:
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copymark{i}"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"wrote {out}/{t}.parquet x{k}")

    for t in FIXED_TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"wrote {out}/{t}.parquet (fixed)")
    print(out)


if __name__ == "__main__":
    main()
