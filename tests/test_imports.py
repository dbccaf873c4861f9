"""Service-import source (DSet.Import/ImportN parity) — live contract
invocation per analytic cycle.

Mirrors the reference scenario (DSetGenerics.fs:788-840, paper §5.2): a
service exports a live stats provider; the analytics side imports it and
folds; a second cycle observes the service's NEW state with no
re-plumbing.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from prajna_spark.sources.imports import (
    export_seq_function,
    import_source,
    import_source_n,
    telemetry_cycle,
    unregister_seq_function,
)

STATS_SCHEMA = "node string, metric string, value double"


def _file_backed_provider(path):
    """A 'live service': each invocation reads the stats file NOW —
    state lives at the endpoint, not in the pickled closure."""

    def provider(pid: int):
        with open(path) as f:
            stats = json.load(f)
        return [
            {"node": f"node{pid}", "metric": k, "value": float(v)}
            for k, v in stats.items()
        ]

    return provider


def test_import_two_cycles_see_live_state(spark, tmp_path):
    stats = tmp_path / "stats.json"
    stats.write_text(json.dumps({"cpu": 10.0, "mem": 50.0}))
    export_seq_function("vmstats", _file_backed_provider(str(stats)), STATS_SCHEMA)
    try:
        # cycle 1: Import -> fold (partial agg of the live snapshot)
        c1 = {
            r.metric: r.total
            for r in telemetry_cycle(
                spark, "vmstats", ["metric"],
                [F.sum("value").alias("total")], n_partitions=3,
            )
        }
        assert c1 == {"cpu": 30.0, "mem": 150.0}  # 3 provider instances

        # the service's state changes...
        stats.write_text(json.dumps({"cpu": 20.0, "mem": 50.0}))

        # cycle 2 re-invokes the SAME import and sees the new state
        c2 = {
            r.metric: r.total
            for r in telemetry_cycle(
                spark, "vmstats", ["metric"],
                [F.sum("value").alias("total")], n_partitions=3,
            )
        }
        assert c2 == {"cpu": 60.0, "mem": 150.0}
        assert c1 != c2
    finally:
        unregister_seq_function("vmstats")


def test_import_partition_shape_one_instance_per_partition(spark):
    export_seq_function(
        "pids",
        lambda pid: [{"node": f"n{pid}", "metric": "pid", "value": float(pid)}],
        STATS_SCHEMA,
    )
    try:
        df = import_source(spark, "pids", n_partitions=5)
        assert df.rdd.getNumPartitions() == 5
        got = sorted(r.value for r in df.collect())
        assert got == [0.0, 1.0, 2.0, 3.0, 4.0]  # provider(i) per partition
    finally:
        unregister_seq_function("pids")


def test_import_n_unions_contracts(spark):
    for name in ("svc_a", "svc_b"):
        export_seq_function(
            name,
            (lambda n: lambda pid: [{"node": n, "metric": "up", "value": 1.0}])(name),
            STATS_SCHEMA,
        )
    try:
        df = import_source_n(spark, ["svc_a", "svc_b"], n_partitions_each=2)
        got = df.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
        assert {r.node: r.n for r in got} == {"svc_a": 2, "svc_b": 2}
    finally:
        unregister_seq_function("svc_a")
        unregister_seq_function("svc_b")


def test_import_unknown_contract_raises(spark):
    import pytest

    with pytest.raises(KeyError, match="no exported contract"):
        import_source(spark, "nope")
