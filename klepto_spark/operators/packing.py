"""Sequence packing — concat-and-split documents into fixed token budgets.

Pretraining pipelines do not feed one document per context window; they
concatenate the token stream and slice it into ``budget``-token packs
(GPT-3 §2.3-style packing; documents straddle pack boundaries). The
batch form of that streaming operation is exactly a prefix sum: a
document's pack is wherever its FIRST token lands in the concatenated
stream, ``pack_id = (cum_before_doc) div budget``, and its offset inside
the pack is ``cum_before_doc mod budget``.

Scale shape: a single global prefix sum would serialise the corpus
through one partition, so the stream is sharded first — the same
deterministic md5 draw the samplers use routes each document to one of
``shards`` independent streams, and the prefix sum runs PER SHARD
(one hash-partition shuffle, each shard's window serial but bounded by
corpus/shards; at 100 TB you raise ``shards`` to thousands, which is
also how many pack files a real tokeniser job writes). All arithmetic
is BIGINT (exact in any engine); the only cross-engine care is DuckDB's
HUGEINT window SUM, cast back in the SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from klepto_spark.operators.sampling import (
    _hash_prefix_sql, _hex_value, _hex_value_sql, hash_prefix)


def pack_sequences(df: DataFrame, key_col: str, cost: Column,
                   budget: int, shards: int = 8,
                   salt: str = "") -> DataFrame:
    """Assign every row to a ``(shard, pack_id)`` training pack plus its
    ``pack_off`` start offset inside the pack; ``tok`` echoes the cost so
    downstream can see straddling (``pack_off + tok > budget`` means the
    document spills into the next pack — by design, as in GPT-3-style
    packing). Deterministic in (salt, key, cost): repartition-stable and
    exactly replayable in SQL via :func:`pack_sequences_sql`."""
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    shard = (_hex_value(hash_prefix(key_col, salt)) % shards).cast("int")
    base = df.select(F.col(key_col), cost.cast("bigint").alias("tok"),
                     shard.alias("shard"))
    w = (Window.partitionBy("shard").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum_before = (F.sum("tok").over(w) - F.col("tok")).alias("__cb")
    return (base.select("*", cum_before)
            .select(F.col(key_col), F.col("shard"),
                    F.expr(f"__cb div {int(budget)}").alias("pack_id"),
                    (F.col("__cb") % budget).alias("pack_off"),
                    F.col("tok")))


def pack_sequences_sql(table_sql: str, key_col: str, cost_sql: str,
                       budget: int, shards: int = 8,
                       salt: str = "") -> str:
    """DuckDB twin of :func:`pack_sequences` (same shard draw, same
    prefix sum, integer div/mod)."""
    hx = _hex_value_sql(_hash_prefix_sql(key_col, salt))
    return f"""
WITH __c AS (
  SELECT {key_col}, CAST({cost_sql} AS BIGINT) AS tok,
         CAST({hx} % {int(shards)} AS INTEGER) AS shard
  FROM {table_sql}),
__w AS (
  SELECT {key_col}, shard, tok,
         CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY {key_col}
              ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok AS cb
  FROM __c)
SELECT {key_col}, shard, cb // {int(budget)} AS pack_id,
       cb % {int(budget)} AS pack_off, tok
FROM __w"""
