"""Per-group top-k without a window sort.

The window idiom — ``row_number() OVER (PARTITION BY g ORDER BY v DESC)
<= k`` — is correct but makes the shuffle SORT-shaped: every shuffle
partition fully sorts ALL its rows by (g, v) before the rank filter
discards all but k per group. At 100 TB that is an O(n log n) sort (and
its spill files) spent to keep k rows per group.

:func:`grouped_topk` swaps the sort for an aggregate: collect each
group's candidate structs, ``array_sort`` + ``slice`` them INSIDE the
aggregate's output expression, and explode the k survivors. The plan is
an ObjectHashAggregate — a hash shuffle with NO sort anywhere below the
final (tiny) presentation ordering — and the per-group work is
O(g log g) on a g-row array instead of a partition-wide sort.

When to use which (the honest 100 TB rule):

- group size is BOUNDED by the data model (orders per customer, events
  per session, lineitems per order — tens to thousands): use this.
  The aggregate's per-group state is one in-memory array of that
  bounded size, and ObjectHashAggregate falls back to sort-based
  aggregation only if the hash map itself outgrows memory.
- group size is UNBOUNDED / a single group can be millions of rows:
  use the window form — its sort spills gracefully per partition,
  whereas a million-element collect_list array is a straight OOM.
  (A salting pre-pass that keeps a local top-k per (group, salt) then
  re-ranks also works, at the price of two aggregates.)

Determinism: ordering is (order_col DESC, tie_cols ASC) via lexical
struct sort on (-order_col, *tie_cols), so ties can never reorder
between runs, partitionings, or engines — the property the DuckDB
oracle hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_topk(df: DataFrame, group_cols: list[str], order_col: str,
                 k: int, tie_cols: list[str],
                 rank_col: str = "rank") -> DataFrame:
    """Top ``k`` rows per group by ``order_col`` DESC (ties broken by
    ``tie_cols`` ASC), as group_cols + rank (1-based INT) + tie_cols +
    order_col — equivalent to the row_number window filter, minus the
    partition-wide sort. ``order_col`` must be numeric (the descending
    order is obtained by negation inside the sort struct)."""
    item = F.struct(
        (-F.col(order_col)).alias("_neg"),
        *[F.col(c).alias(c) for c in tie_cols],
        F.col(order_col).alias(order_col))
    top = (df.groupBy(*group_cols)
           .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k)
                .alias("_top")))
    ex = top.select(*group_cols,
                    F.posexplode("_top").alias("_pos", "_item"))
    return ex.select(
        *group_cols,
        (F.col("_pos") + 1).cast("int").alias(rank_col),
        *[F.col(f"_item.{c}").alias(c) for c in tie_cols],
        F.col(f"_item.{order_col}").alias(order_col))
