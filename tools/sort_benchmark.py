"""GraySort-analog sort benchmark CLI (reference parity:
samples/SortBenchmark, the 2.5 TB gensort run — ReadMe.txt:2).

Generates n gensort-shaped 100-byte records distributed (no driver
loop), range-partition-sorts them (operators/graysort.py — sampled
boundaries, the component the reference's README says it lacks), runs
the valsort-analog verification, and prints ONE JSON line with
records/s and logical MB/s for the sort pass.

Timing protocol: the generated input is persisted and materialized
first so the measured sort pass reads memory-resident input (the
reference reads gensort files from local disk; both exclude generation
cost). Verification runs after the clock stops.

Usage: python tools/sort_benchmark.py [n_records] [n_partitions] [disk] [codec]
       default 25_000_000 records (2.5 GB logical = 1/1000 of the
       reference's GraySort) across 64 output partitions.

``disk`` mode is the true GraySort protocol — input rests on disk
(parquet), the timed pass is read+sort+WRITE of the sorted output, and
validation runs over the written files (operators/graysort.py
validate_sorted_files). The input is fingerprinted before the sort and
deleted right after it so the 25 GB rung fits this VM's disk
(input + shuffle + output would not fit alongside a second input pass).

``codec`` (disk mode only; default snappy) sets the parquet compression
for input AND output: the hex-text records compress ~2x, so a stronger
codec pushes more LOGICAL records through the same disk-bandwidth
budget — the ladder row that shows where CPU takes over from I/O on a
single-VM disk (~430 MB/s aggregate). The report includes the physical
on-disk bytes of input and sorted output so the logical-vs-physical
ratio (and therefore the bottleneck) is named in the row itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402

from prajna_spark.operators.graysort import (  # noqa: E402
    RECORD_BYTES,
    _multiset_fingerprint,
    gen_records,
    gray_sort,
    validate_sorted,
    validate_sorted_files,
)
from prajna_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nump = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    disk = len(sys.argv) > 3 and sys.argv[3] == "disk"
    codec = sys.argv[4] if len(sys.argv) > 4 else "snappy"
    spark = get_spark("prajna-sort-benchmark")
    spark.sparkContext.setLogLevel("ERROR")
    in_bytes = out_bytes = -1

    if disk:
        import shutil

        def _tree_bytes(path: str) -> int:
            total = 0
            for root, _, files in os.walk(path):
                for f in files:
                    total += os.path.getsize(os.path.join(root, f))
            return total

        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        base = os.environ.get("SPARK_GRAFT_SORT_DIR", "/tmp/prajna_sort")
        in_dir = os.path.join(base, "input")
        out_dir = os.path.join(base, "output")
        shutil.rmtree(base, ignore_errors=True)

        t0 = time.time()
        gen_records(spark, n).write.mode("overwrite").parquet(in_dir)
        gen_s = time.time() - t0
        in_bytes = _tree_bytes(in_dir)
        # fingerprint the on-disk input BEFORE sorting so it can be
        # deleted right after the timed pass (disk headroom at 25 GB)
        in_fp = _multiset_fingerprint(spark.read.parquet(in_dir), "key", "payload")

        # timed pass = the true GraySort protocol: read input files,
        # range-partition sort, WRITE sorted output to disk
        t0 = time.time()
        gray_sort(spark.read.parquet(in_dir), nump).write.mode(
            "overwrite"
        ).parquet(out_dir)
        sort_s = time.time() - t0
        out_bytes = _tree_bytes(out_dir)

        shutil.rmtree(in_dir, ignore_errors=True)
        v = validate_sorted_files(spark, out_dir, in_fp)
        shutil.rmtree(base, ignore_errors=True)
    else:
        t0 = time.time()
        records = gen_records(spark, n).persist(StorageLevel.MEMORY_AND_DISK)
        records.write.mode("overwrite").format("noop").save()
        gen_s = time.time() - t0

        # Persist the sorted output and TIME its materialization, then
        # validate THAT execution — not a fresh re-run (repartitionByRange
        # resamples boundaries per execution, so validating a recomputation
        # would certify a different sort than the one benchmarked; it also
        # re-ran the whole shuffle+sort once per validation pass).
        t0 = time.time()
        sorted_df = gray_sort(records, nump).persist(StorageLevel.MEMORY_AND_DISK)
        sorted_df.write.mode("overwrite").format("noop").save()
        sort_s = time.time() - t0

        v = validate_sorted(records, sorted_df)
        sorted_df.unpersist()
        records.unpersist()

    out = {
        "benchmark": "graysort_analog",
        "protocol": "disk" if disk else "persist",
        "records": n,
        "record_bytes": RECORD_BYTES,
        "logical_mb": round(n * RECORD_BYTES / 1e6, 1),
        "codec": codec if disk else None,
        "input_disk_mb": round(in_bytes / 1e6, 1) if in_bytes >= 0 else None,
        "output_disk_mb": round(out_bytes / 1e6, 1) if out_bytes >= 0 else None,
        "partitions": nump,
        "gen_sec": round(gen_s, 2),
        "sort_sec": round(sort_s, 2),
        "rows_per_sec": round(n / sort_s),
        "mb_per_sec": round(n * RECORD_BYTES / 1e6 / sort_s, 1),
        "valsort": {
            "ok": v.ok,
            "count_match": v.in_count == v.out_count,
            "checksum_match": v.in_checksum == v.out_checksum,
            "intra_partition_violations": v.intra_partition_violations,
            "boundary_violations": v.boundary_violations,
        },
    }
    print(json.dumps(out))
    return 0 if v.ok else 1


if __name__ == "__main__":
    sys.exit(main())
