"""Executed-plan VOLUME instrumentation — shuffle/input bytes per action.

The plan lints in ``plans.inspect`` catch SHAPE regressions (a Cartesian
product, a Python eval in the hot path); this module catches VOLUME
regressions: an operator whose plan looks right but shuffles the corpus
instead of its narrow keys. It reads Spark's ``AppStatusStore`` (the store
behind the status REST API — populated by ``AppStatusListener`` whether or
not the UI is enabled), summing stage-level shuffle/input/output metrics.

Usage::

    before = stage_totals(spark)
    df.write.format("noop").mode("overwrite").save()
    delta = totals_delta(before, stage_totals(spark))
    assert delta["shuffle_write_bytes"] < some_bound

Attribution is by before/after snapshot, so callers must not run
concurrent jobs on the session while measuring (true for bench.py and the
test suite). Accessing the store goes through py4j internals; every entry
degrades to zeros with ``available: False`` if the interface changes, so
measurement can never break the bench itself.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

METRIC_KEYS = (
    "shuffle_write_bytes",
    "shuffle_write_records",
    "shuffle_read_bytes",
    "shuffle_read_records",
    "input_bytes",
    "input_records",
    "output_bytes",
)


def stage_totals(spark: SparkSession) -> dict[str, int]:
    """Cumulative per-app totals of stage metrics (all stages seen so far,
    any status — before/after deltas cancel everything but the measured
    action's stages)."""
    totals = dict.fromkeys(METRIC_KEYS, 0)
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jvm = spark._jvm
        empty = jvm.java.util.ArrayList()
        quantiles = sc._gateway.new_array(jvm.double, 0)
        stages = store.stageList(empty, False, False, quantiles, empty)
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            totals["shuffle_write_bytes"] += s.shuffleWriteBytes()
            totals["shuffle_write_records"] += s.shuffleWriteRecords()
            totals["shuffle_read_bytes"] += s.shuffleReadBytes()
            totals["shuffle_read_records"] += s.shuffleReadRecords()
            totals["input_bytes"] += s.inputBytes()
            totals["input_records"] += s.inputRecords()
            totals["output_bytes"] += s.outputBytes()
        totals["available"] = True
    except Exception:  # py4j surface drift — degrade, never break the caller
        totals["available"] = False
    return totals


def totals_delta(before: dict[str, int], after: dict[str, int]) -> dict[str, int]:
    delta = {k: after.get(k, 0) - before.get(k, 0) for k in METRIC_KEYS}
    delta["available"] = bool(before.get("available")) and bool(after.get("available"))
    return delta


def measure_action(
    spark: SparkSession, action: Callable[[], None]
) -> dict[str, int]:
    """Run ``action`` (anything that triggers jobs) and return the stage
    metric deltas it caused."""
    before = stage_totals(spark)
    action()
    return totals_delta(before, stage_totals(spark))
