"""DistributedValue — named cluster-wide value store.

Reference parity: /root/reference/src/CoreLib/builtinfunction.fs:60-97
(``DistributedValueStore`` / ``DistributedValue<'T>``): a value is SET in
the app, stored under an id on every container, and GET from remote
data-analytic routines. Prajna ships it through its distributed-function
machinery; the exact Spark analog is a broadcast variable, which this
module wraps with the reference's named put/get surface.

Semantics mirrored:
- set-in-app / read-from-remote: ``.value`` works on the driver and inside
  any task closure (Spark's torrent broadcast delivers it to executors);
- re-set replaces the value cluster-wide *for subsequently defined jobs*:
  a new broadcast is issued and the old one is unpersisted (tasks already
  pickled keep the value they captured — same read-your-write-era
  semantics as the reference, where in-flight routines hold the object
  they fetched);
- ``get_value`` of an unset name returns None (the reference returns
  null / Unchecked.defaultof).

Scale note: broadcast is the right transport — O(value) per executor via
torrent protocol, not O(value x tasks) through task serialization.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


class DistributedValue:
    """Handle to a named broadcast value (DistributedValue<'T> twin).

    Capture the handle (or its ``.broadcast``) in task closures; reading
    ``.value`` inside a task pulls the executor-local broadcast copy.
    """

    def __init__(self, name: str, broadcast) -> None:
        self.name = name
        self.broadcast = broadcast

    @property
    def value(self) -> Any:
        return self.broadcast.value


_STORE: dict[str, DistributedValue] = {}


def put_value(spark: SparkSession, name: str, value: Any) -> DistributedValue:
    """Set a named distributed value (StoreValue/SetValue twin). Replaces
    and unpersists any previous broadcast under this name."""
    old = _STORE.get(name)
    bv = spark.sparkContext.broadcast(value)
    _STORE[name] = DistributedValue(name, bv)
    if old is not None:
        old.broadcast.unpersist(blocking=False)
    return _STORE[name]


def get_value(name: str) -> DistributedValue | None:
    """Get the named value's handle (GetValue twin); None when unset."""
    return _STORE.get(name)


def remove_value(name: str) -> None:
    """Drop the named value and release its executor-side blocks."""
    old = _STORE.pop(name, None)
    if old is not None:
        old.broadcast.unpersist(blocking=False)
