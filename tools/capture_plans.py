"""Capture .explain("formatted") output for catalog queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> query [query ...]
Writes <out_dir>/<query>_<suffix>.txt for each query (the optimization
rounds' before/after plan evidence; the judge checks plan claims against
these files).
"""

from __future__ import annotations

import os
import sys

# the tree THIS file sits in, not a hardcoded path — so the tool can
# capture an old tree's plans from a git-archive copy (r12)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prajna_spark.operators.lifecycle import persist_scope  # noqa: E402
from prajna_spark.queries import queries  # noqa: E402
from prajna_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("prajna-plans")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = queries()
    for name in names:
        try:
            with persist_scope():
                df = catalog[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
