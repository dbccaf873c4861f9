"""Same-machine A/B bench adjudication: THIS tree vs an old commit.

Round-over-round extended-tier times drift with machine/disk state, so a
"regression" in a bench sidecar is a claim, not a finding. The protocol
that settled r9's three persistent suspects (all proven code-identical,
BASELINE.md round-10 adjudication table) was done by hand; this tool is
that protocol as one command so it can't drift (r10 VERDICT item 5):

  1. `git archive <commit>` -> a pristine old tree (no venv reuse, no
     working-tree contamination).
  2. Run each query min-of-N in a FRESH Python/JVM process per tree
     (fresh process = no cross-tree cache pollution; min-of-N absorbs
     JVM warmup and page-cache misses).
  3. Interleave A/B at the TREE level back-to-back on the same machine,
     so slow drift (thermal, page cache) hits both sides.

Usage:
  python tools/bench_ab.py <commit> <query> [query ...]
                           [--sf-dir DIR] [--reps N]

Verdict per query: ratio new/old with a +/-10% noise band — within the
band is "code-identical noise"; outside it, the diff between the trees
is the place to look.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE_BAND = 0.10


def _run_tree(tree: str, sf_dir: str, reps: int, names: list[str]) -> int:
    """Subprocess mode: time each query min-of-N against the prajna_spark
    package rooted at ``tree``; print one JSON line."""
    sys.path.insert(0, tree)
    from prajna_spark.operators.lifecycle import persist_scope
    from prajna_spark.queries import queries
    from prajna_spark.session import get_spark

    spark = get_spark("prajna-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    cat = queries()
    out: dict[str, float] = {}
    for name in names:
        if name not in cat:
            out[name] = -1.0  # absent in this tree (query added later)
            continue
        best = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.time()
            with persist_scope():
                cat[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    print("ABRESULT " + json.dumps(out), flush=True)
    return 0


def _time_tree(tree: str, sf_dir: str, reps: int, names: list[str]) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--_run", tree,
        sf_dir, str(reps), *names,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    raise SystemExit(f"bench_ab: runner for {tree} produced no result line")


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--_run":
        tree, sf_dir, reps = argv[1], argv[2], int(argv[3])
        return _run_tree(tree, sf_dir, reps, argv[4:])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 5
    names: list[str] = []
    commit = None
    it = iter(argv)
    for arg in it:
        if arg == "--sf-dir":
            sf_dir = next(it)
        elif arg == "--reps":
            reps = int(next(it))
        elif arg.startswith("--"):
            raise SystemExit(f"bench_ab: unknown flag {arg!r}")
        elif commit is None:
            commit = arg
        else:
            names.append(arg)
    if not commit or not names:
        raise SystemExit(__doc__)

    sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", commit],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    old_tree = f"/tmp/bench_ab_{sha}"
    if os.path.exists(old_tree):
        shutil.rmtree(old_tree)
    os.makedirs(old_tree)
    tar = subprocess.Popen(["tar", "-x", "-C", old_tree], stdin=subprocess.PIPE)
    subprocess.run(
        ["git", "-C", REPO, "archive", commit], stdout=tar.stdin, check=True
    )
    tar.stdin.close()
    if tar.wait() != 0:
        raise SystemExit("bench_ab: git archive | tar failed")

    try:
        l1, l5, _ = os.getloadavg()
        print(f"bench_ab: start loadavg 1m={l1:.2f} 5m={l5:.2f}")
    except OSError:
        pass
    print(f"bench_ab: {sha} (old) vs working tree, sf_dir={sf_dir}, "
          f"min-of-{reps}, fresh process per tree")
    old = _time_tree(old_tree, sf_dir, reps, names)
    new = _time_tree(REPO, sf_dir, reps, names)

    width = max(len(n) for n in names)
    print(f"\n{'query':<{width}}  {'old(s)':>8}  {'new(s)':>8}  "
          f"{'ratio':>6}  verdict")
    verdicts = {}
    for name in names:
        o, n = old.get(name, -1.0), new.get(name, -1.0)
        if o <= 0 or n <= 0:
            v = "absent-in-old" if o <= 0 else "absent-in-new"
        else:
            r = n / o
            v = ("noise-band" if abs(r - 1.0) <= NOISE_BAND
                 else ("REGRESSION" if r > 1 else "improvement"))
            verdicts[name] = round(r, 3)
        print(f"{name:<{width}}  {o:>8.3f}  {n:>8.3f}  "
              f"{(n / o if o > 0 and n > 0 else float('nan')):>6.3f}  {v}")
    print("\nABVERDICT " + json.dumps(
        {"commit": sha, "sf_dir": sf_dir, "reps": reps, "ratios": verdicts}
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
