"""Streaming ordered-funnel — the stateful twin of ``operators/funnel.py``.

Per user, state is exactly the funnel recurrence's carry: one earliest-
valid-completion timestamp per step — O(n_steps) longs per active key,
nothing else. Each micro-batch folds its events (sorted by ts) through the
same strict-``<`` recurrence the batch operator uses, then emits the
user's updated funnel row when anything advanced ("update"-style output
over an append sink: downstream keeps the latest row per user, the same
latest-wins convention as the CDC merge).

Exactness contract: results equal the batch funnel whenever each user's
events arrive in non-decreasing ts order ACROSS micro-batches (per-key
ordered delivery — e.g. a Kafka topic keyed by user). Under out-of-order
arrival a step completion that becomes valid only because an EARLIER
step-1 event arrived late can be missed; holding enough state to revise
those retroactively is unbounded (it needs every step's full timestamp
set), so this operator trades that corner for O(1) state — the documented
trade of every streaming funnel. Within one micro-batch, ordering doesn't
matter (events are sorted before folding).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType, TimestampType,
)


def _schemas(steps: list[str]) -> tuple[StructType, StructType]:
    out = StructType(
        [StructField("user_id", LongType(), False)]
        + [StructField(f"t_{s}", TimestampType(), True) for s in steps]
        + [StructField("depth", IntegerType(), False)])
    state = StructType(
        [StructField(f"us_{i}", LongType(), True)
         for i in range(len(steps))])
    return out, state


def _fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState,
          steps: list[str]) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n = len(steps)
    t = list(state.get) if state.exists else [None] * n
    before = tuple(t)
    rows = pd.concat(list(pdfs)).sort_values("ts")
    idx = {s: i for i, s in enumerate(steps)}
    for ts, etype in zip(rows["ts"], rows["event_type"]):
        i = idx.get(etype)
        if i is None:
            continue
        us = int(ts.value // 1000)
        if i == 0:
            if t[0] is None or us < t[0]:
                t[0] = us
        elif t[i - 1] is not None and t[i - 1] < us:
            if t[i] is None or us < t[i]:
                t[i] = us
    if tuple(t) == before or t[0] is None:
        if t[0] is not None:
            state.update(tuple(t))
        return
    state.update(tuple(t))
    out = {"user_id": [user_id]}
    depth = 0
    for s, us in zip(steps, t):
        out[f"t_{s}"] = [pd.Timestamp(us, unit="us") if us is not None
                         else pd.NaT]
        depth += us is not None
    out["depth"] = [depth]
    yield pd.DataFrame(out)


def funnel_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """Stateful streaming funnel. Emits the user's refreshed funnel row on
    every micro-batch that advances it (latest row per user wins). State
    never times out by default — a funnel is a lifetime property; compose
    with a watermark-bounded source if completed users should expire."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    out_schema, state_schema = _schemas(steps)

    def fn(key, pdfs, state):
        yield from _fold(key, pdfs, state, steps)

    return (events
            .select("user_id", "ts", "event_type")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.NoTimeout))
