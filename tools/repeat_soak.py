"""Repeat-execution stability soak: the same suite, N times, ONE session.

The reference's deployment profile is an always-on analytics loop that
re-runs the same queries continuously (paper §1/§5.2). The one-pass
catalog soak (tools/scale_smoke.py) tests breadth; this tests the OTHER
soak dimension — whether per-iteration wall time stays flat across many
repetitions in one long-lived session (r10 VERDICT item 6). Creep here
means accumulating driver-JVM state (registered shuffles, broadcast
blocks, ContextCleaner debt — the r9 "in-sequence penalty" class) that
one pass can't see.

Each iteration runs the full headline suite under a persist_scope (the
hygiene mechanism the always-on profile relies on) and prints one line;
the final summary compares the first-k/last-k iteration means and the
fitted per-iteration slope so "flat vs creeping" is a number, not a
squint. A post-run jvm_state_snapshot records what the session
accumulated end-to-end.

Usage: python tools/repeat_soak.py [sf_dir] [n_iter]
       (defaults: /tmp/prajna_scale/sf1.0, 20)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "300s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prajna_spark.operators.lifecycle import persist_scope  # noqa: E402
from prajna_spark.plans.jvmstate import jvm_state_snapshot  # noqa: E402
from prajna_spark.queries import queries  # noqa: E402
from prajna_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prajna_scale/sf1.0"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("prajna-repeat-soak")
    spark.sparkContext.setLogLevel("ERROR")
    cat = queries()
    base = jvm_state_snapshot(spark)
    print(f"repeat_soak: {len(HEADLINE)} headline queries x {n_iter} "
          f"iterations at {sf_dir}; baseline jvm state {base}", flush=True)
    times: list[float] = []
    for i in range(n_iter):
        t0 = time.time()
        slowest_name, slowest_dt = "", 0.0
        for name in HEADLINE:
            tq = time.time()
            with persist_scope():
                cat[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            dq = time.time() - tq
            if dq > slowest_dt:
                slowest_name, slowest_dt = name, dq
        dt = time.time() - t0
        times.append(dt)
        print(f"iter {i + 1:>3}/{n_iter}: {dt:7.1f}s  "
              f"(slowest {slowest_name} {slowest_dt:.1f}s)", flush=True)

    k = max(1, min(3, n_iter // 4))
    first_k = sum(times[:k]) / k
    last_k = sum(times[-k:]) / k
    n = len(times)
    xbar = (n - 1) / 2
    ybar = sum(times) / n
    sxx = sum((i - xbar) ** 2 for i in range(n))
    slope = (
        sum((i - xbar) * (t - ybar) for i, t in enumerate(times)) / sxx
        if sxx
        else 0.0
    )
    final = jvm_state_snapshot(spark)
    print(f"\nfirst-{k} mean {first_k:.1f}s, last-{k} mean {last_k:.1f}s "
          f"(ratio {last_k / first_k:.3f}); fitted slope "
          f"{slope:+.2f} s/iter ({100 * slope / ybar:+.2f}%/iter of the "
          f"{ybar:.1f}s mean)")
    print(f"jvm state baseline -> final: {base} -> {final}")
    verdict = "FLAT" if last_k <= first_k * 1.10 else "CREEPING"
    print(f"verdict: {verdict} (flat = last-{k} mean within 10% of "
          f"first-{k})")
    return 0 if verdict == "FLAT" else 1


if __name__ == "__main__":
    raise SystemExit(main())
