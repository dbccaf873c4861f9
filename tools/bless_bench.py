"""Bless a bench sidecar as the committed quiet-machine reference.

The r9 review found a sidecar blessed as "quiet machine" whose own
provenance stamp recorded loadavg_1m 15.23 — the blessing step was a bare
`cp` that never looked at the stamp. This tool is the gate:

  python tools/bless_bench.py            # bless BENCH_full.latest.json
  python tools/bless_bench.py --force "reason"   # override, reason recorded

It refuses to copy a sidecar whose provenance says reference_grade=false
(the run started above SPARK_GRAFT_QUIET_LOAD_MAX, default 4.0, on the
1-minute load average — sampled BEFORE the Spark session, so bench's own
local[32] load can't mask contention). On success it prints the provenance
stamp formatted for pasting into the blessing commit message, as the r9
VERDICT requires.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LATEST = os.path.join(REPO, "BENCH_full.latest.json")
BLESSED = os.path.join(REPO, "BENCH_full.json")


def is_blessable(prov: dict) -> bool:
    """The quiet-reference rule: the stamp says reference grade AND both
    start averages are independently verifiable as quiet (r10 VERDICT
    item 4 — a sidecar from an older bench.py, which graded on the
    1-minute average alone, must not bless under the old rule)."""
    if prov.get("reference_grade") is not True:
        return False
    quiet_max = float(prov.get("quiet_load_max", 4.0))
    start_1m = prov.get("loadavg_start_1m", -1.0)
    start_5m = prov.get("loadavg_start_5m", -1.0)
    return (
        isinstance(start_1m, (int, float))
        and isinstance(start_5m, (int, float))
        and 0.0 <= start_1m <= quiet_max
        and 0.0 <= start_5m <= 2 * quiet_max
    )


def main() -> int:
    force = len(sys.argv) > 1 and sys.argv[1] == "--force"
    if force and len(sys.argv) < 3:
        print("bless_bench: --force requires a reason argument", file=sys.stderr)
        return 2
    if not os.path.exists(LATEST):
        print(f"bless_bench: no sidecar at {LATEST} — run bench.py first", file=sys.stderr)
        return 2
    with open(LATEST) as f:
        full = json.load(f)
    prov = full.get("provenance", {})
    if not is_blessable(prov) and not force:
        print(
            "bless_bench: REFUSING — sidecar is not reference grade "
            f"(provenance: {json.dumps(prov)}).\n"
            "Re-run bench.py on a quiet machine (loadavg_1m at start <= "
            f"{prov.get('quiet_load_max', 4.0)}), or override with "
            "--force \"reason\" (the reason is written into the blessed file).",
            file=sys.stderr,
        )
        return 1
    if force:
        prov["force_blessed_reason"] = sys.argv[2]
        full["provenance"] = prov
        with open(LATEST, "w") as f:
            json.dump(full, f, indent=1)
    shutil.copyfile(LATEST, BLESSED)
    print(f"blessed {LATEST} -> {BLESSED}")
    print("paste into the blessing commit message:")
    print(f"  provenance: {json.dumps(prov)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
