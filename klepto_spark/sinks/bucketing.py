"""Bucketed tables: shuffle-free co-located FK joins.

The engine's FK-restriction joins shuffle (or broadcast) on every run. For
tables joined repeatedly on the same key — the orders/lineitem spine of a
100 TB warehouse — bucketing both sides on the join key at write time makes
every subsequent equi-join/aggregation on that key shuffle-free: Spark
reads co-located buckets and skips the Exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the plan contains NO shuffle Exchange on either side
    (asserted in tests/test_scale_utils.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
