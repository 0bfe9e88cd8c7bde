"""Mergeable cardinality sketches (HLL) for corpus-scale distinct counts.

Exact ``COUNT(DISTINCT x)`` at 100 TB shuffles every distinct value to
reduce — the single most expensive aggregation shape there is. Spark's
Apache DataSketches HLL functions replace it with a fixed-size sketch per
partition plus a cheap merge: the shuffle carries ``2^lgk``-bucket
sketches (a few KB each) instead of the value universe.

Two properties matter at scale and are pinned by tests:

- **error bound**: the estimate is within the standard HLL relative error
  (~1.04/sqrt(2^lgk), ~1.6% at the default lgk=12) of the exact count.
- **mergeability**: per-group sketches union to the global sketch — the
  global estimate from ``hll_union_agg`` over per-source sketches equals
  the estimate from sketching the whole corpus directly, so daily/
  per-source sketches can be stored and rolled up without re-scanning
  history (the same at-rest pattern as the IVF index).

Reference scope note: hellofresh/klepto has no aggregation engine at all;
sketches are part of the engine's training-data-pipeline extension
(SURVEY §2.8-adjacent), alongside dedup and sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: list[str] | None = None,
                 lgk: int = 12) -> DataFrame:
    """Approximate distinct ``value_col`` per group (or globally):
    one hash-aggregate whose shuffle carries fixed-size sketches."""
    agg = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk))).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_sketch_by(df: DataFrame, value_col: str, group_cols: list[str],
                  lgk: int = 12) -> DataFrame:
    """Materialisable per-group sketches (binary column): store these at
    rest and roll them up later with :func:`hll_rollup` — distinct counts
    over any group union without touching the raw data again."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
                 .alias("hll_sketch")))


def hll_rollup(sketches: DataFrame,
               group_cols: list[str] | None = None) -> DataFrame:
    """Merge stored sketches (all of them, or per coarser group) and
    estimate. Union is lossless for HLL: the rolled-up estimate is the
    estimate of the union of the original inputs."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("hll_sketch"))).alias("approx_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)
