"""Driver-JVM state snapshot — the cross-query pressure probes.

A long-lived analytics session (the reference's always-on telemetry
loop, paper §1/§5.2; our driver's repeated catalog runs) accumulates
state that no single query leaks: registered shuffles
(MapOutputTrackerMaster holds MapStatus arrays AND pins shuffle files on
disk until ContextCleaner acts), broadcast blocks, and cached RDD blocks.
ContextCleaner only runs when driver GC enqueues dead weak references —
a large heap may not collect old gen for the whole run, so the debt
shows up as the r9 "in-sequence penalty": shuffle scratch competing for
page cache made triangle_count 3x slower as query 7 of a session than
solo.

:func:`jvm_state_snapshot` reads the structures each hypothesis predicts
would grow; :func:`drain_to_baseline` forces the GC → ContextCleaner →
release cycle and polls until the session is back at a given baseline
(or times out). tools/pressure_probe.py uses the snapshot for
diagnosis; tests/test_storage_leak.py pins the invariant that the cycle
actually returns to baseline after real catalog queries.
"""

from __future__ import annotations

import time


def jvm_state_snapshot(spark) -> dict:
    """Best-effort read of driver-JVM pressure gauges; each gauge falls
    back to -1 independently (private accessors differ across builds)."""
    jvm = spark.sparkContext._jvm
    env = jvm.org.apache.spark.SparkEnv.get()
    try:
        n_shuffles = env.mapOutputTracker().shuffleStatuses().size()
    except Exception:
        n_shuffles = -1
    rt = jvm.java.lang.Runtime.getRuntime()
    heap_used_mb = (rt.totalMemory() - rt.freeMemory()) // (1024 * 1024)
    heap_max_mb = rt.maxMemory() // (1024 * 1024)
    n_bcast = n_rdd = -1
    bcast_mb = rdd_mb = -1.0
    try:
        status = env.blockManager().master().getStorageStatus()
        n_bcast = n_rdd = 0
        bcast_b = rdd_b = 0
        for st in status:
            it = st.blocks().iterator()
            while it.hasNext():
                kv = it.next()
                bid = kv._1().toString()
                sz = kv._2().memSize() + kv._2().diskSize()
                if bid.startswith("broadcast_"):
                    n_bcast += 1
                    bcast_b += sz
                elif bid.startswith("rdd_"):
                    n_rdd += 1
                    rdd_b += sz
        bcast_mb = round(bcast_b / 1e6, 1)
        rdd_mb = round(rdd_b / 1e6, 1)
    except Exception:
        pass
    return {
        "shuffles_registered": n_shuffles,
        "heap_used_mb": int(heap_used_mb),
        "heap_max_mb": int(heap_max_mb),
        "broadcast_blocks": n_bcast,
        "broadcast_mb": bcast_mb,
        "rdd_blocks": n_rdd,
        "rdd_mb": rdd_mb,
    }


def drain_to_baseline(
    spark,
    baseline: dict,
    timeout_sec: float = 60.0,
    rdd_slack: int = 0,
    shuffle_slack: int = 0,
    bcast_slack: int = 2,
) -> dict:
    """Force System.gc() and poll until registered shuffles / broadcast
    blocks / cached RDD blocks are back at ``baseline`` (within the given
    slacks — ContextCleaner is asynchronous and a couple of long-lived
    broadcasts, e.g. session-level configs, are legitimate survivors).
    Returns the final snapshot; the caller asserts on it. Re-triggers GC
    every ~5 s because one collection may not enqueue every dead weak
    reference."""
    deadline = time.time() + timeout_sec
    jvm = spark.sparkContext._jvm
    gauges = ("shuffles_registered", "rdd_blocks", "broadcast_blocks")
    while True:
        jvm.System.gc()
        time.sleep(1.0)
        snap = jvm_state_snapshot(spark)
        # An unreadable gauge reads -1, and -1 <= baseline+slack is
        # trivially true — convergence would be vacuous (r10 advisory).
        # Unreadable gauges are NOT ok: keep polling (the accessor can be
        # transiently unreachable mid-cleanup) and let the caller see the
        # -1 in the timed-out snapshot instead of a fake success.
        readable = all(snap[g] >= 0 and baseline[g] >= 0 for g in gauges)
        ok = readable and (
            snap["shuffles_registered"]
            <= baseline["shuffles_registered"] + shuffle_slack
            and snap["rdd_blocks"] <= baseline["rdd_blocks"] + rdd_slack
            and snap["broadcast_blocks"]
            <= baseline["broadcast_blocks"] + bcast_slack
        )
        if ok or time.time() > deadline:
            return snap
        time.sleep(4.0)
