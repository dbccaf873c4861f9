"""Cold-path probe: rep-1 (cold first-compile) vs warm floor per query.

The headline bench's min-of-N only ever sees WARM floors (r11 VERDICT
"What's wrong" #2): a change that trades +3 s of cold Catalyst/codegen
for a faster warm loop is invisible there. This tool makes the cold cost
a first-class measurement:

  1. FRESH process per tree (same isolation discipline as bench_ab).
  2. Each query runs ``reps`` times in that process; rep-1 is the cold
     number (JVM warm from the session warm-up, but the QUERY's plan
     has never been analyzed/optimized/compiled), min-of-rest the warm
     floor.
  3. Per-rep Catalyst phase durations (analysis / optimization /
     planning, from QueryExecution.tracker) attribute the cold-warm gap
     to driver-side plan work vs execution (codegen + run).

Usage:
  python tools/cold_probe.py <query> [query ...] [--sf-dir DIR]
                             [--reps N] [--commit SHA]

With --commit, the old tree runs back-to-back in its own fresh process
(git archive, same protocol as bench_ab) so cold-vs-cold is a same-
machine A/B.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _phases(df) -> dict[str, int]:
    """QueryExecution tracker phase durations (ms) for a DataFrame."""
    try:
        tracker = df._jdf.queryExecution().tracker()
        phases = tracker.phases()
        it = phases.iterator()
        out = {}
        while it.hasNext():
            kv = it.next()
            summary = kv._2()
            out[str(kv._1())] = int(
                summary.endTimeMs() - summary.startTimeMs()
            )
        return out
    except Exception:
        return {}


def _run_tree(tree: str, sf_dir: str, reps: int, names: list[str]) -> int:
    sys.path.insert(0, tree)
    from prajna_spark.operators.lifecycle import persist_scope
    from prajna_spark.queries import queries
    from prajna_spark.session import get_spark

    spark = get_spark("prajna-cold-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cat = queries()
    # Session warm-up on a query OUTSIDE the probe set: JVM/codegen
    # infrastructure and parquet footer caches are warm, the probed
    # queries' own plans are not.
    cat["fold_global_stats"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        if name not in cat:
            out[name] = {"error": "absent"}
            continue
        rep_times: list[float] = []
        rep_phases: list[dict] = []
        build_times: list[float] = []
        plan_times: list[float] = []
        write_times: list[float] = []
        for _ in range(max(2, reps)):
            t0 = time.time()
            with persist_scope():
                df = cat[name](spark, sf_dir)
                t_built = time.time()
                # force analysis+optimization+physical planning of the
                # DataFrame's own QueryExecution (the noop write builds
                # its own, so this isolates driver-side plan work
                # without executing anything)
                df._jdf.queryExecution().executedPlan()
                t_planned = time.time()
                df.write.mode("overwrite").format("noop").save()
                t_done = time.time()
                rep_times.append(round(t_done - t0, 3))
                build_times.append(round(t_built - t0, 3))
                plan_times.append(round(t_planned - t_built, 3))
                write_times.append(round(t_done - t_planned, 3))
                rep_phases.append(_phases(df))
        out[name] = {
            "cold": rep_times[0],
            "warm_min": min(rep_times[1:]),
            "reps": rep_times,
            "build": build_times,
            "plan": plan_times,
            "write": write_times,
            "phases_ms": rep_phases,
        }
    print("COLDRESULT " + json.dumps(out), flush=True)
    return 0


def _time_tree(tree: str, sf_dir: str, reps: int, names: list[str]) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--_run", tree,
        sf_dir, str(reps), *names,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("COLDRESULT "):
            return json.loads(line[len("COLDRESULT "):])
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    raise SystemExit(f"cold_probe: runner for {tree} produced no result")


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--_run":
        return _run_tree(argv[1], argv[2], int(argv[3]), argv[4:])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 4
    commit = None
    names: list[str] = []
    it = iter(argv)
    for arg in it:
        if arg == "--sf-dir":
            sf_dir = next(it)
        elif arg == "--reps":
            reps = int(next(it))
        elif arg == "--commit":
            commit = next(it)
        elif arg.startswith("--"):
            raise SystemExit(f"cold_probe: unknown flag {arg!r}")
        else:
            names.append(arg)
    if not names:
        raise SystemExit(__doc__)

    trees = [("new", REPO)]
    if commit:
        sha = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", commit],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        old_tree = f"/tmp/cold_probe_{sha}"
        if os.path.exists(old_tree):
            shutil.rmtree(old_tree)
        os.makedirs(old_tree)
        tar = subprocess.Popen(
            ["tar", "-x", "-C", old_tree], stdin=subprocess.PIPE
        )
        subprocess.run(
            ["git", "-C", REPO, "archive", commit],
            stdout=tar.stdin, check=True,
        )
        tar.stdin.close()
        if tar.wait() != 0:
            raise SystemExit("cold_probe: git archive | tar failed")
        trees.insert(0, (f"old({sha})", old_tree))

    try:
        l1, l5, _ = os.getloadavg()
        print(f"cold_probe: start loadavg 1m={l1:.2f} 5m={l5:.2f}")
    except OSError:
        pass
    results = {label: _time_tree(tree, sf_dir, reps, names)
               for label, tree in trees}
    width = max(len(n) for n in names)
    for label, res in results.items():
        print(f"\n== {label} ==")
        print(f"{'query':<{width}}  {'cold(s)':>8}  {'warm(s)':>8}  "
              f"  per-rep build/plan/write")
        for name in names:
            r = res.get(name, {})
            if "error" in r or not r:
                print(f"{name:<{width}}  absent")
                continue
            per = " ".join(
                f"[{b:.2f}/{p:.2f}/{w:.2f}]"
                for b, p, w in zip(r["build"], r["plan"], r["write"])
            )
            print(f"{name:<{width}}  {r['cold']:>8.3f}  "
                  f"{r['warm_min']:>8.3f}  {per}")
    print("\nCOLDVERDICT " + json.dumps(
        {"sf_dir": sf_dir, "reps": reps, "results": results}
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
