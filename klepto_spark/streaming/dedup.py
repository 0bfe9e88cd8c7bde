"""Streaming deduplication for unbounded document feeds.

The batch dedup families (operators/dedup.py) assume a bounded corpus;
a training-data INGEST pipeline sees an unbounded stream and must decide
keep/drop per arriving document with bounded state. Two operators:

- :func:`dedup_exact_stream` — drop exact-content re-arrivals: fingerprint
  the content (md5, the same identity as batch ``exact_dedup``) and keep
  the FIRST arrival per fingerprint within the watermark.
- :func:`dedup_simhash_stream` — drop near-duplicate re-arrivals: the
  stateless per-row SimHash (:func:`operators.dedup.simhash_col`, bit-
  identical to the batch fingerprint) is the dedup identity, so hamming-0
  near-dups (reformatted copies, boilerplate variants) collapse too.

Both build on ``dropDuplicatesWithinWatermark``: state holds one entry
per distinct fingerprint seen inside the watermark horizon and is evicted
as event time advances — state is O(distinct docs per watermark window),
NOT O(stream history), which is what makes this safe on an unbounded
100 TB/day feed. The trade, shared with every watermarked dedup: a
duplicate arriving later than the watermark delay re-admits. Size the
delay to the feed's re-delivery horizon; use the batch families for
whole-corpus offline dedup.

Structured Streaming forbids an aggregation upstream of the stateful
dedup, which is why the fingerprints are stateless projections (md5 /
simhash_col), not the batch explode+groupBy shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from klepto_spark.operators.dedup import simhash_col

FP_COL = "_fp"


def dedup_exact_stream(df: DataFrame, text_col: str = "text",
                       ts_col: str = "ts",
                       delay: str = "1 hour") -> DataFrame:
    """Keep the first arrival per exact content within the watermark."""
    return (df.withColumn(FP_COL, F.md5(F.col(text_col)))
            .withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark([FP_COL])
            .drop(FP_COL))


def dedup_simhash_stream(df: DataFrame, text_col: str = "text",
                         ts_col: str = "ts", delay: str = "1 hour",
                         k: int = 4, bits: int = 64) -> DataFrame:
    """Keep the first arrival per SimHash within the watermark —
    hamming-0 near-duplicates (same fingerprint) collapse; the
    fingerprint rides along in ``simhash`` for downstream audit."""
    return (df.withColumn("simhash", simhash_col(F.col(text_col), k, bits))
            .withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(["simhash"]))
