"""As-of (time-travel) join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row for the same key whose
time is <= the left row's time (the point-in-time join of feature stores
and market data).

Implementation is the scalable union-marker pattern, NOT the naive
join-then-filter (which explodes to |L|x|R| per key before pruning):

1. union left and right rows with a side marker, carrying right-side
   payload columns as nulls on left rows;
2. one window pass per key ordered by (time, side) with
   ``last(payload, ignorenulls=True)`` — each left row picks up the
   latest preceding right payload;
3. keep left rows.

Cost: one shuffle on the key (window partitioning), sort within
partitions — same shape as any windowed aggregation, linear in input, no
blow-up on hot keys. Skewed keys fall back to AQE or pre-salting upstream.

Ties: right rows sort BEFORE left rows at the same timestamp, so an
equal-time right row is visible to the left row (<= semantics, matching
DuckDB's ASOF JOIN, the correctness oracle in __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key: str,
              left_time: str, right_time: str,
              payload: list[str] | None = None,
              direction: str = "backward") -> DataFrame:
    """Point-in-time join. Columns of ``left`` are kept; ``payload``
    columns from ``right`` (default: all non-key/non-time) are attached
    from the as-of row, NULL when no right row qualifies.

    direction: 'backward' (latest right at-or-before left time — the
    common case) or 'forward' (earliest right at-or-after).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if payload is None:
        payload = [c for c in right.columns if c not in (key, right_time)]
    if not payload:
        return left

    from pyspark.sql.types import StructType
    rfields = {f.name: f for f in right.schema.fields}
    ptype = StructType([rfields[c] for c in payload])

    lcols = left.columns
    # side marker orders equal timestamps: right (0) visible to left (1)
    # for backward; reversed for forward. Payload columns travel as ONE
    # struct so the window picks a whole right ROW — per-column
    # last(ignorenulls) would mix columns from different right rows when
    # the true as-of row has NULLs (diverging from ASOF-join semantics).
    l_marked = left.select(
        F.col(key).alias("_k"), F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(ptype).alias("_p"))
    r_marked = right.select(
        F.col(key).alias("_k"), F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        F.struct(*[F.col(c) for c in payload]).alias("_p"))

    unioned = l_marked.unionByName(r_marked)
    order = [F.asc("_t"), F.asc("_side")] if direction == "backward" \
        else [F.desc("_t"), F.asc("_side")]
    w = (Window.partitionBy("_k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    def out_name(c: str) -> str:
        # right payload colliding with a left column gets an r_ prefix
        return c if c not in lcols else f"r_{c}"

    return (unioned
            .select("_side", *lcols,
                    F.last("_p", ignorenulls=True).over(w).alias("_pp"))
            .filter(F.col("_side") == 1)
            .select(*lcols,
                    *[F.col("_pp").getField(c).alias(out_name(c))
                      for c in payload]))
