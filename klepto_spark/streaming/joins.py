"""Watermarked stream-stream interval joins (attribution enrichment).

The classic streaming enrichment — "match each purchase to the click that
preceded it within an hour" — is a stream-stream join with a time-bound
condition. Structured Streaming keeps both sides' recent rows in state and
needs two things to bound that state, both encoded here so callers can't
forget them:

- a **watermark on each side** (how late events may arrive), and
- an **interval condition** relating the two event times, from which Spark
  derives exactly how long each side's rows must be retained.

State is O(rows inside the watermark+interval window per key), evicted as
the watermark advances — the property that lets the join run forever.

``interval_join_stream`` works identically on batch frames (the condition
is ordinary Catalyst), which is how the tests pin stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(left: DataFrame, right: DataFrame, on: str, *,
                         left_ts: str = "ts", right_ts: str = "ts",
                         within: str = "1 hour",
                         late: str = "10 minutes",
                         how: str = "inner",
                         prefix: tuple[str, str] = ("l_", "r_")
                         ) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` with the same ``on`` key
    where ``left_ts <= right_ts <= left_ts + within``. ``late`` is each
    side's allowed event-time lateness (the watermark). Column names are
    disambiguated with ``prefix``; the join key keeps its name.

    On streaming inputs both watermarks are applied here; on batch inputs
    withWatermark is a no-op and the same plan runs as a plain interval
    join — the equivalence the tests assert."""
    lp, rp = prefix
    l = left.select(
        F.col(on),
        *[F.col(c).alias(f"{lp}{c}") for c in left.columns if c != on])
    r = right.select(
        F.col(on),
        *[F.col(c).alias(f"{rp}{c}") for c in right.columns if c != on])
    lts, rts = f"{lp}{left_ts}", f"{rp}{right_ts}"
    if l.isStreaming:
        l = l.withWatermark(lts, late)
    if r.isStreaming:
        r = r.withWatermark(rts, late)
    cond = (
        (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {within}")))
    return l.join(r, on=[l[on] == r[on], cond], how=how) \
            .drop(r[on])
