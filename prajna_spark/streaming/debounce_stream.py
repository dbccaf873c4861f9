"""Stateful streaming THROTTLE debounce — the sequential twin of the
batch ``operators.intervals.burst_first``.

Two debounce flavors (burst_first's docstring contract):

- chain ("burst-first", batch): a row survives iff the gap from the
  PREVIOUS ROW exceeds the bound — window-expressible, stateless.
- throttle (this module): a row survives iff the gap from the last KEPT
  row exceeds the bound — inherently sequential state (each decision
  depends on the previous decision), so it lives here as an
  ``applyInPandasWithState`` operator: per-(key) last-kept timestamp,
  O(1) state, event-time timeout GC (once the watermark passes
  last_kept + gap the state can no longer affect any future decision —
  a later event is kept regardless).

Example, gap 6 over ts {0, 5, 9}: chain keeps {0} (5 chains to 0, 9
chains to 5); throttle keeps {0, 9} (9 is 9 > 6 past the last KEPT 0).

Ordering contract: events are folded in event-time order WITHIN each
micro-batch; cross-batch order holds when the source replays in time
order (AvailableNow file drains, time-ordered logs). Out-of-order
arrivals ACROSS batches see throttle state from the future — the same
in-order contract the reference's own mix/zip operators demand of their
inputs (DSetGenerics.fs:113-129).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

THROTTLE_OUTPUT_SCHEMA = "user_id long, event_type string, t long"
THROTTLE_STATE_SCHEMA = "last_kept long"


def throttle_fold(ts_sorted, last_kept, gap_sec):
    """The shared sequential rule: keep t iff t - last_kept > gap (first
    event always kept). Returns (kept_list, new_last_kept). Plain Python
    so tests replay the exact engine arithmetic."""
    kept = []
    for t in ts_sorted:
        if last_kept is None or t - last_kept > gap_sec:
            kept.append(t)
            last_kept = t
    return kept, last_kept


def _throttle_fn(gap_sec: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cols = ["user_id", "event_type", "t"]
        user_id, event_type = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(
                pdf["ts"].to_numpy().astype("datetime64[s]").astype("int64").tolist()
            )
        last = state.get[0] if state.exists else None
        kept, last = throttle_fold(sorted(ts), last, gap_sec)
        if last is not None:
            state.update((last,))
            state.setTimeoutTimestamp((last + gap_sec) * 1000)
        yield pd.DataFrame(
            [(user_id, event_type, t) for t in kept], columns=cols
        )

    return fn


def throttle_debounce_stream(
    events: DataFrame, gap_sec: int = 300, watermark: str = "1 hour"
) -> DataFrame:
    """Kept events per (user_id, event_type) under throttle semantics.
    ``events`` needs (user_id, event_type, ts timestamp). State shards
    with the shuffle key; the store holds ONE long per live key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _throttle_fn(gap_sec),
            outputStructType=THROTTLE_OUTPUT_SCHEMA,
            stateStructType=THROTTLE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
