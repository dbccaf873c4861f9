"""Scale smoke: run EVERY catalog query end-to-end at a scaled fixture
(default /tmp/prajna_scale/sf1.0 from tools/gen_scale.py) with the noop
sink. No oracle — correctness lives at sf0.01; this is the
does-it-survive-10x net that caught the connected-components broadcast
OOM. Prints one line per query and a final summary; exit 1 on any
failure.

Usage: python tools/scale_smoke.py [sf_dir] [name_substring ...]
                                   [--skip substring ...]

``--skip`` excludes queries whose name contains any of the following
substrings — for the documented pair-quadratic exclusions (fixture
artifacts whose candidate set or OUTPUT is quadratic at the scaled
fixture; BASELINE.md round-8/round-10 adjudications) when sweeping the
whole catalog. The 100x family, measured r10:

    --skip dedup_connected_components dedup_lsh_verified \
           dedup_canonical_docs dedup_cluster_size_histogram \
           image_dhash_hamming_pairs

(the first four all consume the documents-LSH candidate graph, ~1.3e9
pairs at 100x — dedup_canonical_docs OOM'd a 24 GB heap and took the
session with it; the fifth's OUTPUT is 4.2e9 pairs. Every OTHER
documents-dedup query — PPJoin exact join, sorted-neighborhood,
exact/fingerprint/ngram/decontaminate, entity resolution — is
measured green at 100x in one session.)
"""

from __future__ import annotations

import os
import sys
import time

# Scaled fixtures are memory-bound, not oracle-bound: give the single
# local JVM a bigger heap than the 8g bench default unless the caller
# pinned one (the 30x graph tier OOMs an 8 GB heap; correctness/bench
# runs keep their own defaults for round-over-round comparability).
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
# Long multi-query sessions accumulate ContextCleaner debt (shuffle
# scratch competing for page cache/disk): with periodic GC the 100x
# wedge-family queries run at their SOLO speed in-sequence (triangle
# 447.6 s -> 136.9 s, clustering 532.9 s -> 269.8 s; BASELINE.md
# round-10 appendix), so the knob is the default here. persist_scope's
# tolerant release absorbs the cleaner-vs-scope unpersist race the
# knob exposes (lifecycle._release_tolerant).
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "300s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prajna_spark.operators.lifecycle import persist_scope  # noqa: E402
from prajna_spark.queries import queries  # noqa: E402
from prajna_spark.session import get_spark  # noqa: E402


def parse_args(argv: list[str]) -> tuple[str, list[str], list[str]]:
    """(sf_dir, only, skip). The sf_dir positional is optional; a leading
    ``--skip`` must not be consumed as sf_dir (r10 advisory: `scale_smoke
    --skip foo` used to sweep dir '--skip' with 'foo' as an include
    filter). Any other ``--`` argument is rejected loudly."""
    if argv and not argv[0].startswith("--"):
        sf_dir, rest = argv[0], argv[1:]
    else:
        sf_dir, rest = "/tmp/prajna_scale/sf1.0", argv
    only: list[str] = []
    skip: list[str] = []
    bucket = only
    for arg in rest:
        if arg == "--skip":
            bucket = skip
            continue
        if arg.startswith("--"):
            raise SystemExit(f"scale_smoke: unknown flag {arg!r} (only --skip)")
        bucket.append(arg)
    return sf_dir, only, skip


def main() -> int:
    sf_dir, only, skip = parse_args(sys.argv[1:])
    spark = get_spark("prajna-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    attempted = 0
    cat = queries()
    for name, fn in cat.items():
        if only and not any(s in name for s in only):
            continue
        if skip and any(s in name for s in skip):
            print(f"SKIP {name} (--skip)", flush=True)
            continue
        attempted += 1
        t0 = time.time()
        try:
            # scope: release each query's internal persists/checkpoints
            # before the next one — at 30x data, cross-query storage
            # accumulation alone OOM'd an 8 GB heap on the dedup tier
            # (each query green in isolation), exactly the long-lived-
            # driver leak class the scoped-release mechanism bounds
            with persist_scope():
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            # same post-query cleanliness assertion as determinism_check:
            # a leak that is invisible at oracle scale is exactly the one
            # that kills a later query here
            leaked = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
            if leaked:
                print(f"LEAK {name}: {leaked} persistent RDDs after scope exit",
                      flush=True)
                failed.append(name)
                # force-release so one leak doesn't taint later queries
                it = spark.sparkContext._jsc.getPersistentRDDs().values().iterator()
                while it.hasNext():
                    it.next().unpersist(True)
                continue
            print(f"OK   {name} [{time.time() - t0:.1f}s]", flush=True)
        except Exception as exc:
            failed.append(name)
            msg = str(exc).split("\n")[0][:160]
            print(f"FAIL {name}: {msg}", flush=True)
    print(f"\n{len(failed)} failed of {attempted} attempted ({len(cat)} in catalog)")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
