"""Stateful streaming sessionization — custom per-key state via
``applyInPandasWithState``.

Groups an event stream into activity sessions (gap > timeout starts a new
session). This is the operator class Structured Streaming's built-in
windows can't express (session bounds depend on data, not the clock), so
it carries explicit per-key state: the open session's (start, last_seen,
count, sum). State size is O(active keys); processing-time timeouts close
idle sessions and emit them, bounding memory on unbounded streams.

A batch twin (:func:`sessionize_batch`) computes identical sessions with
window functions — used by tests to pin stream/batch agreement, and the
right tool when the data is already at rest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), False),
    StructField("session_end", TimestampType(), False),
    StructField("n_events", LongType(), False),
    StructField("sum_value", DoubleType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), False),
    StructField("last_us", LongType(), False),
    StructField("n", LongType(), False),
    StructField("total", DoubleType(), True),
])


def _sessionize_group(key: Any, pdfs: Iterator[pd.DataFrame],
                      state: GroupState, gap_s: float) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = int(gap_s * 1_000_000)
    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [user_id],
                            "session_start": [pd.Timestamp(start_us, unit="us")],
                            "session_end": [pd.Timestamp(last_us, unit="us")],
                            "n_events": [n], "sum_value": [total]})
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    out = []
    cur = list(state.get) if state.exists else None
    for ts, value in zip(rows["ts"], rows["value"]):
        us = int(ts.value // 1000)
        if cur is None:
            cur = [us, us, 1, float(value)]
        elif us - cur[1] > gap_us:
            out.append((user_id, cur[0], cur[1], cur[2], cur[3]))
            cur = [us, us, 1, float(value)]
        else:
            cur[1] = us
            cur[2] += 1
            cur[3] += float(value)
    state.update(tuple(cur))
    try:
        state.setTimeoutDuration(int(gap_s * 1000))
    except Exception:  # NoTimeout mode: duration not applicable
        pass
    if out:
        yield pd.DataFrame(
            {"user_id": [o[0] for o in out],
             "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
             "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
             "n_events": [o[3] for o in out],
             "sum_value": [o[4] for o in out]})


def sessionize_stream(events: DataFrame, gap_s: float = 1800.0,
                      timeout: str = "processing") -> DataFrame:
    """Streaming sessionizer; emits CLOSED sessions (a session closes when
    a later event exceeds the gap, or — with timeout='processing' — when
    its processing-time timeout fires).

    timeout='none' is for bounded drains (availableNow): with
    ProcessingTimeTimeout the query never reaches a final batch — it keeps
    scheduling "cleaning up state" micro-batches for pending timeouts, so
    availableNow cannot terminate. Live deployments keep 'processing' so
    idle keys flush and state stays bounded.
    """
    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_s)

    mode = (GroupStateTimeout.ProcessingTimeTimeout
            if timeout == "processing" else GroupStateTimeout.NoTimeout)
    return (events
            .select("user_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_SCHEMA, _STATE_SCHEMA, "append", mode))


def sessionize_batch(events: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """Batch twin: gap-flagging + cumulative session ids via windows.
    Emits ALL sessions (batch input has a defined end)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike (a plain
    # double cast is illegal on NTZ) and never routes through the session
    # timezone, so gaps are stable across DST transitions.
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    with_id = (events
               .select("user_id", "ts", "value")
               .withColumn("_new",
                           F.when(gap_us.isNull()
                                  | (gap_us > int(gap_s * 1_000_000)), 1)
                           .otherwise(0))
               .withColumn("_sid", F.sum("_new").over(
                   w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (with_id.groupBy("user_id", "_sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .drop("_sid"))
