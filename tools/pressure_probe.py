"""Cross-query JVM pressure probe (VERDICT r8 "What's wrong" #1).

Repro: kcore_parts_dense + labelprop_part_communities +
modularity_part_communities back-to-back in ONE 24 GB local[32] session
at the 100x fixture dies on the third query, even though each is green
alone and tracked storage (getPersistentRDDs) is empty after every
scope exit. Hypothesis space: accumulated broadcast/shuffle cleanup
debt (ContextCleaner only acts when driver GC enqueues dead weak
references — a large heap may simply never collect the old gen within
the run), shuffle-file bookkeeping, AQE plan-state retention.

This probe runs the sequence and, between queries, snapshots the JVM
structures each hypothesis predicts would grow:

- registered shuffles: ``MapOutputTrackerMaster.shuffleStatuses.size``
  (each holds MapStatus arrays — driver memory — AND pins shuffle files
  on disk until ContextCleaner removes it);
- broadcast blocks in the block manager (count + bytes);
- RDD blocks (count + bytes) — should be 0 by the storage contract;
- JVM heap used / max;
- shuffle scratch on disk (du over spark.local.dir blockmgr dirs).

Modes (argv[1]):
  repro       no intervention (expected to die on query 3)
  gc          System.gc() between queries (tests the cleanup-debt theory
              surgically: if GC alone saves query 3, the structure that
              grows is whatever the collector releases — weakly-reachable
              shuffle/broadcast state)
  periodic    spark.cleaner.periodicGC.interval=60s set at session build
              (the deployable spelling of the same mechanism)

Usage: python tools/pressure_probe.py [repro|gc|periodic] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "kcore_parts_dense",
    "labelprop_part_communities",
    "modularity_part_communities",
]


def _jvm_snapshot(spark) -> dict:
    # core gauges shared with tests/test_storage_leak.py
    from prajna_spark.plans.jvmstate import jvm_state_snapshot

    snap = jvm_state_snapshot(spark)
    # shuffle scratch on disk (tool-only: needs du); localDirsString is a
    # private accessor that may not be py4j-reachable on every Spark
    # build — fall back to -1 like the other probes rather than killing
    # the whole snapshot.
    disk_mb = -1
    try:
        env = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
        local_dirs = env.blockManager().diskBlockManager().localDirsString()
        disk_mb = 0
        for d in local_dirs:
            try:
                out = subprocess.run(
                    ["du", "-sm", d], capture_output=True, text=True, timeout=120
                )
                disk_mb += int(out.stdout.split()[0])
            except Exception:
                pass
    except Exception:
        pass
    snap["shuffle_disk_mb"] = disk_mb
    return snap


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "repro"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prajna_scale/sf10.0"
    if mode == "periodic":
        # static-ish conf: must precede JVM start
        os.environ["SPARK_GRAFT_PERIODIC_GC"] = "60s"

    from prajna_spark.operators.lifecycle import persist_scope
    from prajna_spark.queries import queries
    from prajna_spark.session import get_spark

    spark = get_spark(f"pressure-probe-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    cat = queries()
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "baseline": _jvm_snapshot(spark)}), flush=True)
    for name in QUERIES:
        t0 = time.time()
        try:
            with persist_scope():
                cat[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            status = "ok"
        except Exception as exc:
            status = f"FAIL: {type(exc).__name__}: {str(exc)[:200]}"
        dt = round(time.time() - t0, 1)
        snap = _jvm_snapshot(spark)
        print(json.dumps({"query": name, "sec": dt, "status": status, "after": snap}), flush=True)
        if status != "ok":
            return 1
        if mode == "gc":
            spark.sparkContext._jvm.System.gc()
            time.sleep(5)  # let ContextCleaner drain its reference queue
            print(json.dumps({"query": name, "after_gc": _jvm_snapshot(spark)}), flush=True)
    print("ALL GREEN", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
