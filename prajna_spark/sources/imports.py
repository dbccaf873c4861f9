"""Service-import source — ``DSet.Import`` / ``ImportN`` parity.

Reference semantics (/root/reference/src/CoreLib/DSetGenerics.fs:788-840,
contracts.fs ``ExportSeqFunction``/``ImportSeqFunction``): a running
service exports a named sequence-function contract; an analytics job
imports it as a dataset where EACH NODE runs one local instance of the
delegate and contributes one partition. Re-running the analysis re-invokes
the delegates, so every cycle folds the service's CURRENT state — the
paper's §5.2 VM-Hub telemetry loop (import -> RowsReorg -1 ->
MapByCollection -> Fold).

Spark-first translation:
- the contract store is a named registry of ``provider(partition_id) ->
  iterable-of-dict`` callables plus their row schema;
- ``import_source`` builds a DataFrame of ``n_partitions`` one-row seeds
  (``spark.range``) and invokes the provider inside ``mapInPandas`` — the
  provider runs IN the executors, one instance per partition, exactly the
  reference's one-delegate-per-node shape, and it runs AT JOB TIME: every
  action (each analytic cycle) re-invokes it, so a provider that reads a
  live endpoint (file, socket, service API) yields fresh results per
  cycle with NO re-plumbing;
- liveness caveat, same as the reference's: the delegate observes state
  where it RUNS. Driver-side Python objects captured in the closure are
  snapshotted at pickle time; live state must be read inside the provider
  (the reference's delegates likewise read their service's local memory,
  not the submitting client's).

At scale: the source is embarrassingly parallel (no shuffle, no driver
data path); ``n_partitions`` maps to the service fleet size. The follow-on
fold is a map-side partial aggregation — the entire cycle moves only
aggregate rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: name -> (provider, schema DDL). Module-level on the driver; the
#: provider itself is shipped to executors inside the mapInPandas closure.
_CONTRACT_STORE: dict[str, tuple[Callable[[int], Iterable[dict]], str]] = {}


def export_seq_function(
    name: str, provider: Callable[[int], Iterable[dict]], schema: str
) -> None:
    """Export a named sequence-function contract (ExportSeqFunction twin).

    ``provider(partition_id)`` returns this instance's current rows as
    dicts matching ``schema`` (a DDL string). Re-exporting a name
    replaces the contract — the reference's store has the same
    last-writer-wins behavior for re-registration.
    """
    _CONTRACT_STORE[name] = (provider, schema)


def unregister_seq_function(name: str) -> None:
    _CONTRACT_STORE.pop(name, None)


def import_source(
    spark: SparkSession, name: str, n_partitions: int = 4
) -> DataFrame:
    """Import a contract as a live distributed source (DSet.Import twin).

    Returns a DataFrame with ``n_partitions`` partitions; partition ``i``
    holds whatever ``provider(i)`` yields AT ACTION TIME. Each analytic
    cycle (count/fold/collect/write) re-invokes every provider instance —
    the interactive re-fold loop of paper §5.2.
    """
    try:
        provider, schema = _CONTRACT_STORE[name]
    except KeyError:
        raise KeyError(
            f"no exported contract {name!r}; call export_seq_function first"
        ) from None

    import pandas as pd

    def invoke(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for pid in pdf["id"].tolist():
                rows = list(provider(int(pid)))
                if rows:
                    yield pd.DataFrame(rows)

    seeds = spark.range(0, n_partitions, numPartitions=n_partitions)
    return seeds.mapInPandas(invoke, schema)


def import_source_n(
    spark: SparkSession, names: Iterable[str], n_partitions_each: int = 1
) -> DataFrame:
    """Import several contracts into ONE dataset (DSet.ImportN twin:
    N nodes x num contracts partitions). All schemas must match."""
    dfs = [import_source(spark, n, n_partitions_each) for n in names]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def telemetry_cycle(
    spark: SparkSession,
    name: str,
    group_cols: list[str],
    aggs: list,
    n_partitions: int = 4,
) -> list[Any]:
    """One analytic cycle over a live import: the reference's
    ``Import -> RowsReorg -1 -> MapByCollection -> Fold`` pipeline
    (paper §5.2), Spark-first: the RowsReorg/MapByCollection pair is how
    Prajna hand-built a partial aggregation; Spark's groupBy does the
    map-side combine natively, so the cycle is one partial-agg shuffle of
    aggregate rows only. Returns the folded rows (driver-side, tiny)."""
    src = import_source(spark, name, n_partitions)
    return src.groupBy(*group_cols).agg(*aggs).collect()
