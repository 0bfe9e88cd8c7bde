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
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
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
# EXACT twin (round 8): the same foreachBatch shape over the at-rest
# fingerprint index (operators.dedup.exact_append) -- completes the
# streaming symmetry with the minhash and semantic twins. Epoch-keyed
# and replayable exactly like process_batch.
# ---------------------------------------------------------------------------


def exact_stream_writer(docs: DataFrame, index_path: str, pairs_path: str,
                        checkpoint: str, text_col: str = "text",
                        key_col: str = "doc_id",
                        prefix_words: int | None = None):
    """A configured ``DataStreamWriter`` for document streams: exact
    duplicate pairs (>= one endpoint in the arriving batch) appear under
    ``pairs_path`` partitioned by batch epoch; the batch's (key, fp)
    rows commit to ``index_path/ep=<batch>``."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_exact_batch(batch_df, int(epoch_id), index_path,
                            pairs_path, text_col, key_col, prefix_words)

    return (docs.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_exact_batch(batch_df: DataFrame, epoch_id: int,
                        index_path: str, pairs_path: str,
                        text_col: str = "text", key_col: str = "doc_id",
                        prefix_words: int | None = None) -> None:
    """One micro-batch of the streaming exact dedup (retry-idempotent by
    the same contract as :func:`process_batch`: same ``epoch_id`` =>
    same index view probed, same outputs replaced)."""
    if batch_df.isEmpty():
        # same replay contract as the semantic twin: a retried empty
        # epoch also writes nothing (and no empty ep= dir pollutes the
        # index listing)
        return
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    fp = batch_df.select(
        F.col(key_col),
        D.exact_fingerprint(text_col, prefix_words).alias("fp"))
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
    if not prior:
        # bootstrap epoch: intra-batch exact pairs (a < b) only
        pairs = (fp.withColumnRenamed(key_col, "a")
                 .join(fp.withColumnRenamed(key_col, "b"), "fp")
                 .filter(F.col("a") < F.col("b"))
                 .select("a", "b"))
    else:
        pairs = D.exact_append(spark, sorted(prior), batch_df, text_col,
                               key_col, prefix_words, commit=False)
    (pairs.withColumn("ep", F.lit(epoch_id))
     .write.mode("overwrite").partitionBy("ep")
     .option("partitionOverwriteMode", "dynamic").parquet(pairs_path))
    fp.write.mode("overwrite").parquet(f"{index_path}/ep={epoch_id}")


def cdc_stream_writer(docs: DataFrame, index_path: str, pairs_path: str,
                      checkpoint: str, text_col: str = "text",
                      key_col: str = "doc_id", divisor: int = 8,
                      min_shared: int = 2, min_words: int = 3,
                      max_bucket: int = 64):
    """A configured ``DataStreamWriter`` for document streams:
    shift-resistant CDC near-dup pairs (>= one endpoint in the arriving
    batch, with shared-chunk agreement counts) appear under
    ``pairs_path`` partitioned by batch epoch; the batch's (key, h)
    chunk-hash rows commit to ``index_path/ep=<batch>`` — the fourth
    dedup family's streaming twin (exact / minhash / semantic / cdc)."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_cdc_batch(batch_df, int(epoch_id), index_path,
                          pairs_path, text_col, key_col, divisor,
                          min_shared, min_words, max_bucket)

    return (docs.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_cdc_batch(batch_df: DataFrame, epoch_id: int,
                      index_path: str, pairs_path: str,
                      text_col: str = "text", key_col: str = "doc_id",
                      divisor: int = 8, min_shared: int = 2,
                      min_words: int = 3, max_bucket: int = 64) -> None:
    """One micro-batch of the streaming CDC near-dup (retry-idempotent
    by the same contract as :func:`process_batch`: same ``epoch_id`` =>
    same index view probed, same outputs replaced)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    from klepto_spark.operators.text import cdc_chunk_rows
    chunks = cdc_chunk_rows(batch_df, text_col, key_col, divisor,
                            min_words).distinct()
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
    if not prior:
        # bootstrap epoch: intra-batch pairs only
        pairs = D.cdc_near_dup_pairs(batch_df, text_col, key_col,
                                     divisor, min_shared, min_words,
                                     max_bucket)
    else:
        pairs = D.cdc_append(spark, sorted(prior), batch_df, text_col,
                             key_col, divisor, min_shared, min_words,
                             max_bucket, commit=False)
    (pairs.withColumn("ep", F.lit(epoch_id))
     .write.mode("overwrite").partitionBy("ep")
     .option("partitionOverwriteMode", "dynamic").parquet(pairs_path))
    chunks.write.mode("overwrite").parquet(f"{index_path}/ep={epoch_id}")


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
    if batch_df.isEmpty():
        # foreachBatch delivers empty micro-batches (ADVICE r07): the dim
        # probe inside semantic_append would see no rows; nothing to
        # probe, nothing to fold — and writing nothing keeps the replay
        # contract (a retried empty epoch also writes nothing)
        return
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
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


def span_stream_writer(docs: DataFrame, index_path: str, stats_path: str,
                       checkpoint: str, text_col: str = "text",
                       key_col: str = "doc_id", k: int = 8,
                       min_count: int = 2):
    """A configured ``DataStreamWriter`` for document streams:
    duplicated-span coverage (t18's signal, as-of-arrival) for each
    arriving batch appears under ``stats_path`` partitioned by batch
    epoch; the batch's (h, cnt) window-count rows commit to
    ``index_path/ep=<batch>`` — the FIFTH family's streaming twin
    (exact / minhash / semantic / cdc / span). A batch's coverage
    counts duplication against everything that arrived AT OR BEFORE it
    (the same one-directional contract as the pair families: earlier
    epochs' stats are never restated when later copies arrive)."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_span_batch(batch_df, int(epoch_id), index_path,
                           stats_path, text_col, key_col, k, min_count)

    return (docs.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_span_batch(batch_df: DataFrame, epoch_id: int,
                       index_path: str, stats_path: str,
                       text_col: str = "text", key_col: str = "doc_id",
                       k: int = 8, min_count: int = 2) -> None:
    """One micro-batch of the streaming span coverage (retry-idempotent
    by the same contract as :func:`process_batch`: same ``epoch_id`` =>
    same index view probed, same outputs replaced — critical HERE
    because the index stores COUNTS that sum on read: the epoch-keyed
    dynamic overwrite is what keeps a replayed batch from
    double-counting its own windows)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    from klepto_spark.operators.text import (_window_grams,
                                             dup_span_stats, span_append)
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
    if not prior:
        # bootstrap epoch: intra-batch duplication only
        stats = dup_span_stats(batch_df, text_col, key_col, k, min_count)
    else:
        stats = span_append(spark, sorted(prior), batch_df, text_col,
                            key_col, k, min_count, commit=False)
    (stats.withColumn("ep", F.lit(epoch_id))
     .write.mode("overwrite").partitionBy("ep")
     .option("partitionOverwriteMode", "dynamic").parquet(stats_path))
    _, grams = _window_grams(batch_df, text_col, key_col, k)
    (grams.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
     .write.mode("overwrite").parquet(f"{index_path}/ep={epoch_id}"))


def hll_stream_writer(rows: DataFrame, index_path: str, est_path: str,
                      checkpoint: str, value_col: str,
                      group_cols: list[str]):
    """A configured ``DataStreamWriter`` for value streams: running
    per-group distinct-count estimates (t06's portable HLL,
    stream-so-far as of each batch) appear under ``est_path``
    partitioned by batch epoch; the batch's (group, bucket, rho)
    register rows commit to ``index_path/ep=<batch>`` — the SIXTH
    at-rest family's streaming twin (exact / minhash / semantic / cdc /
    span / hll). Register merge is MAX, so unlike the span family's
    summed counts a replayed epoch could not double-count even without
    the epoch-pinned probe view — the ep= protocol is kept anyway so
    the shared compaction (:func:`compact_index_epochs`) and the
    deterministic-retry contract apply unchanged."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_hll_batch(batch_df, int(epoch_id), index_path, est_path,
                          value_col, group_cols)

    return (rows.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_hll_batch(batch_df: DataFrame, epoch_id: int,
                      index_path: str, est_path: str, value_col: str,
                      group_cols: list[str]) -> None:
    """One micro-batch of the streaming distinct-count monitor
    (retry-idempotent: same ``epoch_id`` => same prior register view =>
    same estimates and the same ep= dir overwritten). The emitted
    estimates cover everything that arrived AT OR BEFORE the batch and
    are bit-identical to :func:`hll_distinct_portable` over that union —
    register maxima over disjoint row sets are lossless, so each epoch's
    row is exactly what a full recompute would print."""
    if batch_df.isEmpty():
        return
    from klepto_spark.operators.hll_portable import (_fold_estimate,
                                                     hll_registers)
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    regs = hll_registers(batch_df, value_col, group_cols)
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
    cols = [*group_cols, "hll_bucket", "hll_r"]
    merged = regs.select(*cols)
    if prior:
        merged = merged.unionByName(
            spark.read.parquet(*prior).select(*cols))
    (_fold_estimate(merged, group_cols)
     .write.mode("overwrite").parquet(f"{est_path}/ep={epoch_id}"))
    regs.select(*cols).write.mode("overwrite") \
        .parquet(f"{index_path}/ep={epoch_id}")


def bloom_stream_writer(rows: DataFrame, index_path: str,
                        verdict_path: str, checkpoint: str,
                        value_col: str, group_cols: list[str],
                        m: int | None = None, k: int | None = None):
    """A configured ``DataStreamWriter`` for value streams: per-batch
    membership verdicts against the stream-so-far Bloom filter
    (t23's portable bits) appear under ``verdict_path`` partitioned by
    batch epoch; the batch's (group, bloom_bit) rows commit to
    ``index_path/ep=<batch>`` — the SEVENTH at-rest family's streaming
    twin (exact / minhash / semantic / cdc / span / hll / bloom). The
    merge is set UNION (distinct-on-read), so like the HLL twin a
    replayed epoch cannot change the filter even without the
    epoch-pinned probe view — the ep= protocol is kept anyway so the
    shared compaction and the deterministic-retry contract apply
    unchanged. The per-batch verdict is the streaming decontamination
    monitor: "has this value been seen in any earlier batch?" (a batch
    value is probed against the PRIOR epochs' filter, so first
    occurrences report maybe_member=false)."""
    from klepto_spark.operators.bloom_portable import K_HASHES, M_BITS
    m = m or M_BITS
    k = k or K_HASHES

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_bloom_batch(batch_df, int(epoch_id), index_path,
                            verdict_path, value_col, group_cols, m, k)

    return (rows.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_bloom_batch(batch_df: DataFrame, epoch_id: int,
                        index_path: str, verdict_path: str,
                        value_col: str, group_cols: list[str],
                        m: int, k: int) -> None:
    """One micro-batch of the streaming membership monitor
    (retry-idempotent: same ``epoch_id`` => same prior-filter view =>
    same verdicts and the same ep= dir overwritten). Verdicts test each
    batch value against everything that arrived STRICTLY BEFORE the
    batch and are bit-identical to ``bloom_probe`` over that prior
    union — set union over disjoint row sets is lossless."""
    if batch_df.isEmpty():
        return
    from klepto_spark.operators.bloom_portable import (bloom_bits,
                                                       bloom_probe)
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    bits = bloom_bits(batch_df, value_col, group_cols, m, k)
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
    cols = [*group_cols, "bloom_bit"]
    if prior:
        prior_bits = spark.read.parquet(*prior).select(*cols).distinct()
    else:
        prior_bits = bits.select(*cols).limit(0)
    (bloom_probe(prior_bits, batch_df, value_col, group_cols,
                 m=m, k=k)
     .write.mode("overwrite").parquet(f"{verdict_path}/ep={epoch_id}"))
    bits.select(*cols).write.mode("overwrite") \
        .parquet(f"{index_path}/ep={epoch_id}")


def cms_stream_writer(rows: DataFrame, index_path: str, est_path: str,
                      checkpoint: str, value_col: str,
                      group_cols: list[str],
                      w: int | None = None, d: int | None = None):
    """A configured ``DataStreamWriter`` for value streams: per-batch
    frequency estimates against the stream-so-far count-min sketch
    (t24's portable counters) appear under ``est_path`` partitioned by
    batch epoch; the batch's (group, cm_row, cm_col, cnt) rows commit
    to ``index_path/ep=<batch>`` — the EIGHTH at-rest family's
    streaming twin (exact / minhash / semantic / cdc / span / hll /
    bloom / cms). Counter merge is SUM — NOT idempotent, exactly the
    span count index's hazard — so the ep= protocol is load-bearing
    here: a replayed epoch OVERWRITES its own counter dir instead of
    re-adding rows, and the epoch-pinned probe view keeps its estimates
    deterministic no matter what later epochs committed before a crash.
    Estimates cover everything that arrived AT OR BEFORE the batch
    (own batch included — a frequency monitor should count the
    occurrences it is looking at), bit-identical to ``cms_probe`` over
    that union because counter addition over disjoint row sets is
    exact."""
    from klepto_spark.operators.cms_portable import D_ROWS, W_COLS
    w = w or W_COLS
    d = d or D_ROWS

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_cms_batch(batch_df, int(epoch_id), index_path, est_path,
                          value_col, group_cols, w, d)

    return (rows.writeStream.foreachBatch(_batch)
            .option("checkpointLocation", checkpoint))


def process_cms_batch(batch_df: DataFrame, epoch_id: int,
                      index_path: str, est_path: str, value_col: str,
                      group_cols: list[str], w: int, d: int) -> None:
    """One micro-batch of the streaming frequency monitor
    (retry-idempotent: same ``epoch_id`` => same prior-counter view =>
    same estimates and the same ep= dir overwritten)."""
    if batch_df.isEmpty():
        return
    from klepto_spark.operators.cms_portable import (cms_counters,
                                                     cms_probe,
                                                     fold_counters)
    spark = batch_df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(conf)
    counters = cms_counters(batch_df, value_col, group_cols, w, d)
    prior = _prior_index_paths(jvm, fs, p, epoch_id)
    cols = [*group_cols, "cm_row", "cm_col", "cnt"]
    merged = counters.select(*cols)
    if prior:
        merged = merged.unionByName(
            spark.read.parquet(*prior).select(*cols))
    (cms_probe(fold_counters(merged, group_cols), batch_df, value_col,
               group_cols, w=w, d=d)
     .write.mode("overwrite").parquet(f"{est_path}/ep={epoch_id}"))
    counters.select(*cols).write.mode("overwrite") \
        .parquet(f"{index_path}/ep={epoch_id}")


# ---------------------------------------------------------------------------
# Epoch compaction (VERDICT r07 #3): the foreachBatch twins append one
# ep=<batch> directory per micro-batch FOREVER -- a year of 1-minute
# batches is ~500k small parquet dirs every probe must list and read.
# compact_index_epochs folds committed epochs below a caller-supplied
# horizon into flat base files, journaled and lease-gated exactly like
# the table-store binpack (sources/catalog.py compact_small_files,
# sinks/deletion_vectors.py vacuum_epochs): a crash at ANY point leaves
# a journal that the next fold -- or the next probe, via the stale-
# journal check in _prior_index_paths -- converges forward or back.
# ---------------------------------------------------------------------------

import os as _os  # noqa: E402
import time as _time  # noqa: E402

_FOLD_JOURNAL = "_epochfold.json"
_FOLD_STAGE = "_epfoldstage"
#: journals younger than this are presumed a LIVE concurrent fold
FOLD_LEASE_SEC = 60.0


def _fold_lease() -> float:
    return float(_os.environ.get("KLEPTO_EPOCHFOLD_LEASE_SEC",
                                 FOLD_LEASE_SEC))


def _recover_fold(jvm, fs, root) -> None:
    """Converge a crashed fold. The journal lists old entries (flat base
    files + folded ep dirs) and the new base file names; olds are only
    deleted AFTER every new file landed, so the journal state decides:
    all news present -> roll forward (delete remaining olds); any news
    missing -> roll back (delete partial news, olds intact). Either way
    the journal and stage clear, and probe results are unchanged.
    Shared protocol: :mod:`klepto_spark.sinks.journal`; journal entries
    are names relative to the index root."""
    from klepto_spark.sinks.journal import recover
    P = jvm.org.apache.hadoop.fs.Path
    recover(jvm, fs, root, _FOLD_JOURNAL, _FOLD_STAGE,
            to_path=lambda s: P(root, s))


def _prior_index_paths(jvm, fs, root, epoch_id: int) -> list[str]:
    """The index view epoch ``epoch_id`` probes: every flat base entry
    plus strictly EARLIER ep= dirs. Pinning ep < epoch_id makes a replay
    read the same index no matter what later epochs committed before the
    crash — deterministic retries, not just tolerated ones. A STALE fold
    journal (crashed fold) is converged first so the listing never mixes
    a partial fold's news with the olds they replace; a YOUNG journal is
    a live concurrent fold and is left alone (its olds still serve)."""
    if not fs.exists(root):
        return []
    P = jvm.org.apache.hadoop.fs.Path
    jp = P(root, _FOLD_JOURNAL)
    if fs.exists(jp):
        age = _time.time() - fs.getFileStatus(jp).getModificationTime() / 1e3
        if age >= _fold_lease():
            _recover_fold(jvm, fs, root)
    prior: list[str] = []
    for st in fs.listStatus(root):
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
    return prior


def compact_index_epochs(spark, index_path: str,
                         max_epoch_exclusive: int) -> int:
    """Fold committed ``ep=<batch>`` dirs below ``max_epoch_exclusive``
    into the OLDEST folded epoch's directory; returns epoch dirs folded.

    The fold target stays an ``ep=`` dir (never flat files at the root)
    so the index remains readable as one partitioned table — the mixed
    layout the batch-commit guard refuses is never created. The ``ep``
    value of folded rows becomes the oldest folded epoch: that column is
    the index's commit/probe mechanism, not data lineage, and every
    probing epoch e >= the horizon satisfies e > oldest-folded, so the
    folded rows stay in exactly the views that saw them before.

    ``max_epoch_exclusive`` must not exceed the stream's committed
    horizon (the checkpoint's last committed batch id + 1): a replay of
    an IN-FLIGHT epoch e >= the horizon probes the identical view after
    the fold — probe results are byte-identical (pytest-pinned). What
    changes is the file count: O(batches) small dirs become one bounded
    dir, the difference between a listing that takes milliseconds and
    one that dominates every probe at year-scale. Refolding rewrites
    the previous fold's rows (classic log-structured compaction cost) —
    amortise by raising the horizon in large steps.

    Journaled + lease-gated: a journal younger than
    ``KLEPTO_EPOCHFOLD_LEASE_SEC`` (default 60s) means a concurrent fold
    owns the root — this call raises instead of racing it. A stale
    journal is recovered (forward or back, decided by which files
    landed) before folding. Olds retire only after every new file is in
    place, so a crash at any point leaves duplicates at worst, never a
    missing epoch."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    root = P(index_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return 0
    jp = P(root, _FOLD_JOURNAL)
    if fs.exists(jp):
        age = _time.time() - fs.getFileStatus(jp).getModificationTime() / 1e3
        if age < _fold_lease():
            raise RuntimeError(
                f"epoch fold already in flight at {index_path!r} "
                f"(journal {age:.0f}s old < lease {_fold_lease():.0f}s); "
                "retry after the lease, or raise "
                "KLEPTO_EPOCHFOLD_LEASE_SEC if this journal is yours")
        _recover_fold(jvm, fs, root)
    folded: dict[int, str] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("ep="):
            continue  # adopted flat base / _meta: not this fold's business
        try:
            ep = int(name[3:])
        except ValueError:
            continue
        if ep < max_epoch_exclusive:
            folded[ep] = name
    if len(folded) < 2:
        return 0  # nothing to merge
    dest = folded[min(folded)]
    union = spark.read.parquet(
        *[str(P(root, folded[e])) for e in sorted(folded)])
    stage = P(root, _FOLD_STAGE)
    if fs.exists(stage):
        fs.delete(stage, True)
    # coalesce (no shuffle): each output task drains many small inputs;
    # the cap bounds the folded dir's file count independent of how
    # many epochs went in
    union.coalesce(min(len(folded), 32)).write.mode("overwrite").parquet(
        str(stage))
    staged = [st.getPath() for st in fs.listStatus(stage)
              if st.getPath().getName().endswith(".parquet")]
    # olds: every folded dir EXCEPT the destination, plus the
    # destination's own pre-fold data files (the fold files replace
    # them in place); news land inside the destination dir
    dest_files = [f"{dest}/{st.getPath().getName()}"
                  for st in fs.listStatus(P(root, dest))
                  if st.getPath().getName().endswith(".parquet")]
    olds = [folded[e] for e in sorted(folded) if folded[e] != dest]
    olds += dest_files
    news = [f"{dest}/fold-{max_epoch_exclusive}-{i}-{p.getName()}"
            for i, p in enumerate(staged)]
    from klepto_spark.sinks.journal import publish_renames, write_plan
    write_plan(fs, jp, olds, news)
    # Lease-expiry race guard: if the rename phase outlives the journal
    # lease (object-store copies, GC pause), a concurrent probe's
    # _recover_fold may converge the root while this loop keeps
    # renaming. The shared helper re-checks the journal after each
    # rename and reads the OLDS to decide which way the peer went:
    # roll-forward (olds gone) means the fold is already published and
    # the news must stand; roll-back (olds intact) means this fold's
    # landed files are orphans to remove before raising (ADVICE r08
    # high: deleting news after a peer's roll-forward destroyed both
    # copies).
    outcome = publish_renames(
        jvm, fs, root, _FOLD_JOURNAL, lambda s: P(root, s),
        staged, news, olds,
        lost_journal_msg=(
            f"compact_index_epochs: journal at {index_path!r} "
            "disappeared mid-publish (a concurrent recovery rolled the "
            "fold back after the lease expired); this fold's files were "
            "removed and the pre-fold layout stands — raise "
            "KLEPTO_EPOCHFOLD_LEASE_SEC above the worst-case publish "
            "time and re-run"))
    if outcome == "renamed":
        # converge from the post-rename state: all news present -> the
        # olds retire and the journal clears; anything less rolls back
        _recover_fold(jvm, fs, root)
    if not all(fs.exists(P(root, n)) for n in news):
        raise RuntimeError(
            f"compact_index_epochs: publish did not land at "
            f"{index_path!r} (rename failed); the pre-fold layout was "
            "kept — re-run compact_index_epochs")
    return len(folded)
