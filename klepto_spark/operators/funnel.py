"""Ordered-funnel analysis over event streams (engine extension, M5).

``funnel`` computes, per user, the earliest strictly-increasing timestamp
chain through an ordered list of step event types: step i+1 only counts if
it happens strictly AFTER the user's earliest valid completion of step i.
This is the standard product-analytics funnel (view -> click -> purchase)
the reference engine has no answer for.

Design (scale-first): ONE window pass computes, for every step, the running
minimum of that step's *qualifying* timestamps; a qualifying row for step
i+1 is one whose running step-i minimum is strictly earlier. All window
expressions share the same (user, ts) partitioning/ordering, so Catalyst
plans a single sort; the final per-user aggregate reuses the window's hash
partitioning — one shuffle total, no self-joins, no per-step scans. At
100 TB the state per user is O(n_steps) timestamps inside a streaming-
friendly shape (the same recurrence drives a stateful streaming variant).

Strict ``<`` comparisons make the result insensitive to the ordering of
same-timestamp rows: a step at the same instant as its predecessor never
qualifies, so no event-id tie-break is needed and the DuckDB oracle replays
bit-for-bit (both engines default the frame to RANGE UNBOUNDED PRECEDING ..
CURRENT ROW, which is peer-inclusive and order-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def funnel(df: DataFrame, steps: list[str], *,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Per-user funnel times: one row per user who completed step 1, with
    ``t_<step>`` = earliest valid completion time of each step (NULL once
    the chain breaks) and ``depth`` = number of steps completed."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts = F.col(ts_col)

    qualifying = [F.when(F.col(type_col) == steps[0], ts)]
    cur = df
    for step in steps[1:]:
        run_col = f"_run_{len(qualifying)}"
        cur = cur.withColumn(run_col, F.min(qualifying[-1]).over(w))
        qualifying.append(
            F.when((F.col(type_col) == step) & (F.col(run_col) < ts), ts))

    aggs = [F.min(q).alias(f"t_{s}") for s, q in zip(steps, qualifying)]
    per_user = cur.groupBy(user_col).agg(*aggs)
    depth = None
    for s in steps:
        hit = F.col(f"t_{s}").isNotNull().cast("int")
        depth = hit if depth is None else depth + hit
    return (per_user
            .withColumn("depth", depth)
            .filter(F.col(f"t_{steps[0]}").isNotNull()))


def funnel_sql(table: str, steps: list[str], *,
               user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type") -> str:
    """Portable-SQL twin of :func:`funnel` (same recurrence, same default
    window frame) for the DuckDB oracle."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    over = f"OVER (PARTITION BY {user_col} ORDER BY {ts_col})"
    qual = [f"CASE WHEN {type_col} = '{steps[0]}' THEN {ts_col} END"]
    src = table
    for i, step in enumerate(steps[1:], start=1):
        src = (f"(SELECT *, min({qual[-1]}) {over} AS _run_{i} FROM {src})")
        qual.append(f"CASE WHEN {type_col} = '{step}' AND _run_{i} < {ts_col} "
                    f"THEN {ts_col} END")
    t_cols = ", ".join(f"min({q}) AS t_{s}" for s, q in zip(steps, qual))
    depth = " + ".join(
        f"CAST(min({q}) IS NOT NULL AS INT)" for q in qual)
    return (f"SELECT {user_col}, {t_cols}, {depth} AS depth "
            f"FROM {src} GROUP BY {user_col} "
            f"HAVING min({qual[0]}) IS NOT NULL")
