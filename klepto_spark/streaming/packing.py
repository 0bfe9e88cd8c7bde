"""Streaming sequence packer — the ingest-time twin of
``operators.packing.pack_sequences``.

A tokenised corpus usually arrives incrementally; packing must not
re-shuffle history to place new documents. The state that survives
between micro-batches is ONE BIGINT per shard (the running token total
of its stream), so ``applyInPandasWithState`` keyed by shard assigns
``pack_id``/``pack_off`` to new documents in O(batch) with O(shards)
total state — at any scale, state is a few thousand longs.

Equivalence contract (pinned in tests): stream output ≡ batch
``pack_sequences`` when documents arrive in non-decreasing ``key``
order per shard (the batch form's ORDER BY). Out-of-order arrival still
produces valid packs (every doc gets the next slot in its shard's
stream) — the stream is then its own total order, which is the honest
semantics of ingest-time packing.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from klepto_spark.operators.sampling import _hex_value, hash_prefix

_OUT = StructType([
    StructField("key", LongType(), False),
    StructField("shard", IntegerType(), False),
    StructField("pack_id", LongType(), False),
    StructField("pack_off", LongType(), False),
    StructField("tok", LongType(), False),
])
_STATE = StructType([StructField("cum", LongType(), True)])


def _fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState,
          budget: int) -> Iterator[pd.DataFrame]:
    (shard,) = key
    cum = state.get[0] if state.exists else 0
    rows = pd.concat(list(pdfs)).sort_values("key")
    out = {"key": [], "shard": [], "pack_id": [], "pack_off": [], "tok": []}
    for k, tok in zip(rows["key"], rows["tok"]):
        out["key"].append(int(k))
        out["shard"].append(int(shard))
        out["pack_id"].append(cum // budget)
        out["pack_off"].append(cum % budget)
        out["tok"].append(int(tok))
        cum += int(tok)
    state.update((cum,))
    yield pd.DataFrame(out)


def pack_stream(docs: DataFrame, key_col: str, cost, budget: int,
                shards: int = 8, salt: str = "") -> DataFrame:
    """Streaming pack assignment: same md5 shard draw and the same
    integer arithmetic as the batch operator; per-shard running totals
    as stream state. ``cost`` is a Column (e.g. ``token_count("text")``)."""
    if budget <= 0 or shards <= 0:
        raise ValueError("budget and shards must be positive")
    # the state fold orders by the key as an INTEGER; a silent cast would
    # NULL non-numeric ids (crashing the fold) and sort numeric STRINGS
    # numerically while the batch twin's ORDER BY sorts them
    # lexicographically — breaking the pinned stream==batch equivalence.
    # Require an integral key up front instead (ADVICE r05).
    key_type = dict(docs.dtypes).get(key_col)
    if key_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"pack_stream key column {key_col!r} must be an integral "
            f"type (got {key_type}): the per-shard state fold and the "
            "batch operator must order keys identically")
    shard = (_hex_value(hash_prefix(key_col, salt)) % shards).cast("int")
    base = docs.select(F.col(key_col).cast("long").alias("key"),
                       cost.cast("bigint").alias("tok"),
                       shard.alias("shard"))

    def fn(key, pdfs, state):
        yield from _fold(key, pdfs, state, budget)

    return (base.groupBy("shard")
            .applyInPandasWithState(fn, _OUT, _STATE, "append",
                                    GroupStateTimeout.NoTimeout))
