"""Range (interval) join — a distributed shape Spark lacks natively.

``point BETWEEN start AND end`` joins compile to BroadcastNestedLoopJoin
(small right side) or a cartesian product — both are O(|L| x |R|)
comparisons and the cartesian is a non-starter at 100 TB. Engines with
native range joins (DuckDB's IEJoin, Databricks' range-join hints) solve
this with banding; OSS Spark doesn't, so this operator implements the
standard banding decomposition with plain DataFrame ops:

1. quantise the domain into buckets of ``bucket_width``;
2. left rows map to ONE bucket (their point's); right intervals EXPLODE
   to every bucket they overlap (``sequence`` + ``explode``);
3. equi-join on the bucket id (plus any equi keys) — a hash shuffle
   join, no nested loop anywhere;
4. refine with the exact band predicate.

Cost model: the shuffle carries |L| + |R| * (avg_span / bucket_width + 1)
rows. ``bucket_width`` trades right-side replication against bucket
population — pick it near the typical interval span so replication
stays ~2x. Every comparison after the equi-join is bucket-local, so the
plan scales like any keyed join (AQE skew handling applies to hot
buckets for free).

The refinement predicate is half-open (``start <= point < end``) so
adjacent intervals tile without double-matching; pass ``closed='both'``
for inclusive ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKET = "_range_bucket"


def range_join(left: DataFrame, right: DataFrame, *, point: str,
               start: str, end: str, bucket_width: int,
               keys: list[str] | None = None,
               closed: str = "left") -> DataFrame:
    """Inner-join ``left`` rows to every ``right`` interval containing
    their point (optionally also matching on equi ``keys``). ``point``,
    ``start`` and ``end`` are NUMERIC columns (map timestamps through
    ``unix_timestamp``/``epoch`` first — integer seconds compare exactly
    across engines).

    Intervals with ``end < start`` match nothing (filtered before the
    explode — a descending ``sequence`` would mis-replicate them)."""
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = keys or []
    lb = F.floor(F.col(point) / F.lit(bucket_width)).cast("long")
    lhs = left.withColumn(BUCKET, lb)
    span = F.sequence(
        F.floor(F.col(start) / F.lit(bucket_width)).cast("long"),
        F.floor(F.col(end) / F.lit(bucket_width)).cast("long"))
    rhs = (right.filter(F.col(end) >= F.col(start))
           .withColumn(BUCKET, F.explode(span)))
    upper = (F.col(point) <= F.col(end) if closed == "both"
             else F.col(point) < F.col(end))
    return (lhs.join(rhs, on=[BUCKET, *keys], how="inner")
            .filter((F.col(start) <= F.col(point)) & upper)
            .drop(BUCKET))
