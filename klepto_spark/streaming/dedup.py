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


# ---------------------------------------------------------------------------
# Incremental-index twin: near-dup pairs vs (and into) the at-rest band
# index (operators.dedup.minhash_append) via foreachBatch -- unlike the
# watermarked first-arrival filters above, this remembers the WHOLE
# accepted corpus at rest, not a time horizon, with per-batch cost that
# follows the batch (broadcast band probe), never the corpus.
# Exactly-once: both outputs are epoch-keyed (ep=<batch>) and replaced
# on retry -- see process_batch.
# ---------------------------------------------------------------------------

from klepto_spark.operators import dedup as D


def dedup_stream_writer(docs: DataFrame, index_path: str, pairs_path: str,
                        checkpoint: str, text_col: str = "text",
                        key_col: str = "doc_id", k: int = 5,
                        num_hashes: int = 16, bands: int = 4,
                        max_bucket: int = 64,
                        per_doc_cap: int | None = None):
    """A configured ``DataStreamWriter``: call ``.start()`` (or add a
    trigger first) to begin deduplicating the ``docs`` stream against —
    and into — the at-rest band index at ``index_path``. New duplicate
    pairs (>= one endpoint in the arriving batch) appear under
    ``pairs_path`` partitioned by batch epoch."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_batch(batch_df, int(epoch_id), index_path, pairs_path,
                      text_col, key_col, k, num_hashes, bands,
                      max_bucket, per_doc_cap)

    return (docs.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_batch(batch_df: DataFrame, epoch_id: int, index_path: str,
                  pairs_path: str, text_col: str = "text",
                  key_col: str = "doc_id", k: int = 5,
                  num_hashes: int = 16, bands: int = 4,
                  max_bucket: int = 64,
                  per_doc_cap: int | None = None) -> None:
    """One micro-batch of the streaming dedup, exposed so retry
    idempotence is directly testable: calling this twice with the same
    ``epoch_id`` (what a crash-recovered ``foreachBatch`` does) must
    leave the index and pairs output exactly as a single call would."""
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    bands_df = D.minhash_band_rows(batch_df, text_col, key_col, k,
                                   num_hashes, bands)
    # the index this epoch probes = strictly EARLIER epochs (plus any
    # pre-existing non-epoch content adopted from minhash_write_index).
    # Pinning ep < epoch_id makes a replay read the same index no matter
    # what later epochs committed before the crash — deterministic
    # retries, not just tolerated ones.
    prior: list[str] = []
    if fs.exists(p):
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("_"):
                continue
            if name.startswith("ep="):
                try:
                    if int(name[3:]) >= epoch_id:
                        continue
                except ValueError:
                    pass
            prior.append(str(st.getPath()))
    if not prior:
        # first batch bootstraps the index; its intra-batch pairs come
        # from the self-contained operator
        pairs = D.minhash_lsh_pairs(batch_df, text_col, key_col, k,
                                    num_hashes, bands, max_bucket,
                                    per_doc_cap=per_doc_cap)
    else:
        pairs = D.minhash_append(
            spark, sorted(prior), batch_df, text_col, key_col, k,
            num_hashes, bands, max_bucket, commit=False,
            per_doc_cap=per_doc_cap)
    # dynamic overwrite scoped to THIS write (ADVICE r06: setting it on
    # the shared session silently changed later partitioned overwrites)
    (pairs.withColumn("ep", F.lit(epoch_id))
     .write.mode("overwrite").partitionBy("ep")
     .option("partitionOverwriteMode", "dynamic").parquet(pairs_path))
    # idempotent index commit: the epoch's own dir, replaced on retry
    bands_df.write.mode("overwrite").parquet(
        f"{index_path}/ep={epoch_id}")


# ---------------------------------------------------------------------------
# SEMANTIC twin (round 7): the same foreachBatch shape over the at-rest
# signature index (operators.dedup.semantic_append) -- an embedding
# stream deduplicates against, and folds into, the (key, signature,
# vector) index with per-batch broadcast-probe cost. Epoch-keyed and
# replayable exactly like process_batch.
# ---------------------------------------------------------------------------


def semantic_stream_writer(emb: DataFrame, index_path: str,
                           pairs_path: str, checkpoint: str,
                           threshold: float,
                           vec_col: str = "embedding",
                           key_col: str = "vec_id", bits: int = 16,
                           dim: int | None = None,
                           max_bucket: int = 64):
    """A configured ``DataStreamWriter`` for embedding streams: verified
    cosine pairs (>= one endpoint in the arriving batch) appear under
    ``pairs_path`` partitioned by batch epoch; the batch's index rows
    commit to ``index_path/ep=<batch>``."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_semantic_batch(batch_df, int(epoch_id), index_path,
                               pairs_path, threshold, vec_col, key_col,
                               bits, dim, max_bucket)

    return (emb.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_semantic_batch(batch_df: DataFrame, epoch_id: int,
                           index_path: str, pairs_path: str,
                           threshold: float,
                           vec_col: str = "embedding",
                           key_col: str = "vec_id", bits: int = 16,
                           dim: int | None = None,
                           max_bucket: int = 64) -> None:
    """One micro-batch of the streaming semantic dedup (retry-idempotent
    by the same contract as :func:`process_batch`: same ``epoch_id`` =>
    same index view probed, same outputs replaced)."""
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    prior: list[str] = []
    if fs.exists(p):
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("_"):
                continue
            if name.startswith("ep="):
                try:
                    if int(name[3:]) >= epoch_id:
                        continue
                except ValueError:
                    pass
            prior.append(str(st.getPath()))
    if not prior:
        from klepto_spark.operators.similarity import cosine_similar_pairs
        pairs = cosine_similar_pairs(batch_df, threshold, vec_col,
                                     key_col, bits, dim, max_bucket)
    else:
        pairs = D.semantic_append(
            spark, sorted(prior), batch_df, threshold, vec_col, key_col,
            bits, dim, max_bucket, commit=False)
    (pairs.withColumn("ep", F.lit(epoch_id))
     .write.mode("overwrite").partitionBy("ep")
     .option("partitionOverwriteMode", "dynamic").parquet(pairs_path))
    D.semantic_index_rows(batch_df, vec_col, key_col, bits, dim) \
        .write.mode("overwrite").parquet(f"{index_path}/ep={epoch_id}")
