"""8-vs-32-core scaling probe at a LARGER scale factor (r11 VERDICT
item 9): at sf0.1 every headline ratio is ~1 because per-query fixed
cost (driver/Catalyst/scheduling) dominates, so the driver's scaling
block carries no signal there. At the 10x fixture the data term is big
enough for core-count scaling to mean something.

Runs the bench HEADLINE list (min-of-N, noop sink, persist leak
semantics identical to bench.py's headline tier) once per core count,
each in a FRESH process with SPARK_GRAFT_CPUS set, and prints the
per-query low/high wall ratio (<1 = query does not spread; >1 = more
cores help).

Usage:
  python tools/core_scaling_probe.py [--sf-dir DIR] [--cpus-high N]
                                     [--cpus-low N] [--reps N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(sf_dir: str, reps: int) -> int:
    sys.path.insert(0, REPO)
    import bench
    from prajna_spark.queries import queries
    from prajna_spark.session import get_spark

    spark = get_spark("prajna-core-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    cat = queries()
    cat["fold_global_stats"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    out: dict[str, float] = {}
    for _ in range(max(1, reps)):
        for name in bench.HEADLINE:
            t0 = time.time()
            try:
                cat[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as exc:  # noqa: BLE001
                print(f"scaling: {name} FAILED: {exc}", file=sys.stderr)
                out.setdefault(name, -1.0)
                continue
            dt = round(time.time() - t0, 3)
            prev = out.get(name)
            out[name] = dt if prev is None or prev < 0 else min(prev, dt)
    print("SCALERESULT " + json.dumps(out), flush=True)
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--_run":
        return _run(argv[1], int(argv[2]))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/prajna_scale/sf1.0")
    hi, lo, reps = 32, 8, 2
    it = iter(argv)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--cpus-high":
            hi = int(next(it))
        elif a == "--cpus-low":
            lo = int(next(it))
        elif a == "--reps":
            reps = int(next(it))
        else:
            raise SystemExit(__doc__)
    results = {}
    for cpus in (hi, lo):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_run", sf_dir,
             str(reps)],
            capture_output=True, text=True, env=env,
        )
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("SCALERESULT "):
                results[cpus] = json.loads(line[len("SCALERESULT "):])
                break
        else:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"scaling: no result for cpus={cpus}")
    hi_map, lo_map = results[hi], results[lo]
    width = max(len(n) for n in hi_map)
    print(f"\nsf_dir={sf_dir} min-of-{reps}, fresh process per core count")
    print(f"{'query':<{width}}  {f'{hi}c(s)':>8}  {f'{lo}c(s)':>8}  "
          f"{'lo/hi':>6}")
    ratios = {}
    for name in hi_map:
        h, l = hi_map[name], lo_map.get(name, -1.0)
        r = l / h if h > 0 and l > 0 else float("nan")
        ratios[name] = round(r, 2)
        print(f"{name:<{width}}  {h:>8.3f}  {l:>8.3f}  {r:>6.2f}")
    th = sum(v for v in hi_map.values() if v > 0)
    tl = sum(v for v in lo_map.values() if v > 0)
    print(f"{'TOTAL':<{width}}  {th:>8.3f}  {tl:>8.3f}  {tl / th:>6.2f}")
    print("\nSCALEVERDICT " + json.dumps(
        {"sf_dir": sf_dir, "cpus_high": hi, "cpus_low": lo, "reps": reps,
         "total_high": round(th, 3), "total_low": round(tl, 3),
         "ratios": ratios}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
