"""Skew-handling utilities for the 100 TB regime.

AQE's skew-join splitting covers sort-merge joins at runtime; these helpers
cover the cases AQE does not: hot-key *aggregations* and broadcast-infeasible
joins with a handful of pathological keys.

Salted aggregation is two-phase: partial-aggregate on (key, salt) — spreading
one hot key over N reducers — then final-aggregate on key. Correct for any
algebraic aggregate expressed as (partial, merge) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, buckets): hash of the whole row, not
    rand() — reruns and speculative retries stay consistent."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                         F.lit(buckets)).cast("int"))


def salted_count(df: DataFrame, keys: list[str], buckets: int = 16,
                 out: str = "n") -> DataFrame:
    """COUNT(*) per key, skew-safe."""
    salted = with_salt(df, buckets)
    partial = (salted.groupBy(*keys, "_salt")
               .agg(F.count(F.lit(1)).alias("_partial")))
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("bigint").alias(out))


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[Column, Column]],
               buckets: int = 16) -> DataFrame:
    """General two-phase aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr) where
    the partial runs per (key, salt) and the merge combines partials per
    key, e.g.::

        salted_agg(df, ["k"], {
            "total":  (F.sum("x"),            F.sum("total")),
            "n":      (F.count(F.lit(1)),     F.sum("n")),
            "mx":     (F.max("x"),            F.max("mx")),
        })
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()])
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()])


def salted_join(big: DataFrame, small: DataFrame, key: str,
                buckets: int = 8) -> DataFrame:
    """Equi-join with hot keys on the big side: salt the big side, EXPLODE
    the small side across all salt values, join on (key, salt). Use when
    the small side is too large to broadcast but the big side's keys are
    skewed. Output columns = big's ++ small's (minus its join key)."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                        F.lit(buckets)).cast("int"))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    joined = big_salted.join(small_exploded, [key, "_salt"])
    return joined.drop("_salt")
