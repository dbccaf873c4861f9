"""Stateful streaming CUSUM — live level-shift alerting.

The streaming twin of :func:`operators.changepoint.cusum_integer_fixed`:
a monitor watching a metric stream wants the alarm WHEN the drift
happens, not at the next batch rollup. State per series is two BIGINTs —
the running cumsum ``ct`` of (x - slack) and the running prefix minimum
``minc`` (seeded with 0) — because the chart identity

    S_t = ct_t - min(0, min_{j<=t} ct_j)

needs nothing else: O(1) state per live series, integer-exact, no
floats, so a clean AvailableNow drain equals the batch chart ROW FOR
ROW (asserted in tests/test_cusum_stream.py).

Ordering contract (same as throttle_debounce_stream): rows fold in
(event-time, tiebreak) order within each micro-batch; cross-batch order
holds when the source replays in time order (AvailableNow file drains,
time-ordered logs).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_OUTPUT_SCHEMA = (
    "k string, t long, tb long, x long, cusum long, is_alarm boolean"
)
CUSUM_STATE_SCHEMA = "ct long, minc long"


def cusum_fold(rows, ct, minc, slack, threshold):
    """Shared sequential rule on (t, tb, x) tuples ALREADY sorted:
    returns (out_rows, ct, minc). Plain Python so tests and the UDF run
    the exact same arithmetic."""
    out = []
    for t, tb, x in rows:
        ct += x - slack
        if ct < minc:
            minc = ct
        s = ct - (minc if minc < 0 else 0)
        out.append((t, tb, x, s, s > threshold))
    return out, ct, minc


def _cusum_fn(slack: int, threshold: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cols = ["k", "t", "tb", "x", "cusum", "is_alarm"]
        (k,) = key
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            state.remove()
            yield pd.DataFrame([], columns=cols)
            return
        rows: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            ts = pdf["ts"].to_numpy().astype("datetime64[s]").astype("int64")
            rows.extend(
                zip(
                    ts.tolist(),
                    pdf["tb"].astype("int64").tolist(),
                    pdf["x"].astype("int64").tolist(),
                )
            )
        ct, minc = (state.get[0], state.get[1]) if state.exists else (0, 0)
        out, ct, minc = cusum_fold(sorted(rows), ct, minc, slack, threshold)
        state.update((ct, minc))
        yield pd.DataFrame(
            [(k, t, tb, x, s, a) for t, tb, x, s, a in out], columns=cols
        )

    return fn


def cusum_stream(
    events: DataFrame,
    slack: int,
    threshold: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Live CUSUM chart per key. ``events`` needs (k string, ts
    timestamp, tb long tiebreak, x long). State shards with the shuffle
    key; the store holds TWO longs per live series forever (a CUSUM
    monitor never expires — an old series can always drift later), so
    state is O(#series), not O(#events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("k")
        .applyInPandasWithState(
            _cusum_fn(slack, threshold),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
