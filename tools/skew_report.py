#!/usr/bin/env python3
"""Per-stage task-skew report for catalog queries.

Runs named catalog queries (default: the headline set) against a noop
sink and prints each stage's task-quantile spread from
``plans.metrics.stage_task_skew`` — the diagnostic for work that stage
TOTALS can't see: a hot key funneling 90% of a window/join into one
task looks identical to a balanced stage in the totals, but its
max/median shuffle-read ratio explodes.

Usage:
    python tools/skew_report.py [sf_dir] [query ...]
    python tools/skew_report.py /root/testdata/sf0.1 window_rank_orders

Reads fail loudly; a query with no qualifying stages (all coalesced to
<4 tasks — tiny inputs) prints "no multi-task stages". Ratios above
``ALERT_RATIO`` are flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prajna_spark.operators.lifecycle import persist_scope  # noqa: E402
from prajna_spark.plans.metrics import (  # noqa: E402
    max_skew_ratio,
    stage_task_skew,
    stage_totals,
)
from prajna_spark.queries import queries  # noqa: E402
from prajna_spark.session import get_spark  # noqa: E402

ALERT_RATIO = 8.0

DEFAULT_QUERIES = [
    "window_rank_orders",
    "window_ntile_dense_rank",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_left_customer_orders",
    "asof_join_purchase_view",
    "dedup_minhash_signatures",
    "zip_index_orders",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_QUERIES
    spark = get_spark("skew-report")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = queries()
    flagged = []
    for name in names:
        if name not in catalog:
            print(f"{name}: UNKNOWN query")
            continue
        before = stage_totals(spark)
        with persist_scope():
            catalog[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        skew = stage_task_skew(spark, min_stage_id=before["max_stage_id"])
        if not skew:
            print(f"{name}: no multi-task stages (or metrics unavailable)")
            continue
        worst = max_skew_ratio(skew)
        mark = "  <-- SKEW" if worst > ALERT_RATIO else ""
        print(f"{name}: worst max/median shuffle-read ratio {worst:.1f}{mark}")
        for sid, row in sorted(skew.items()):
            qs = row["quantiles"]
            sr = row["shuffle_read_bytes"]
            rt = row["run_ms"]
            med, mx = sr[qs.index(0.5)], sr[qs.index(1.0)]
            print(
                f"  stage {sid}: tasks={int(row['n_tasks'][0])} "
                f"shuffle_read med/max = {int(med)}/{int(mx)} B, "
                f"run_ms med/max = {int(rt[qs.index(0.5)])}/"
                f"{int(rt[qs.index(1.0)])}"
            )
        if worst > ALERT_RATIO:
            flagged.append(name)
    if flagged:
        print(f"\nflagged (> {ALERT_RATIO}x): {flagged}")
        print(
            "remedy: pass the measured ratio to "
            "operators.salt.window_agg_auto(df, keys, aggs, skew_ratio=R) — "
            "whole-partition window aggregates rewrite to hash-agg + "
            "join-back (map-side combine absorbs the hot key; AQE skew-join "
            "splits the join-back). Joins: AQE skewJoin (on by default) or "
            "salted_broadcast_join; groupBy: already absorbed by partial "
            "aggregation unless per-key state is large (collect_list/"
            "percentile) — use salted_agg there. The diagnose->remedy loop "
            "is tested in tests/test_skew_remedy.py."
        )
    else:
        print("\nno stage exceeds the skew alert ratio")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
