"""Multimodal column plumbing (engine extension, M5).

Images/audio/video are opaque ``binary`` columns + a typed metadata struct.
The Spark-side plumbing — schemas, Arrow-batched pandas iteration via
``mapInPandas``, partition sizing — is real and tested; the actual media
decode is gated on the deployment having Pillow (:func:`_pil_image` —
``decode_images`` fills real width/height when PIL imports on the
workers, NULL dims here where the container has no image libraries) and
otherwise STUBBED behind ``_decode_image_stub``, which is deterministic
so tests can assert shapes.

Scale notes: binary payloads dominate partition size — size partitions by
``spark.sql.files.maxPartitionBytes`` against payload size, not row count,
and keep metadata in separate (pruned) columns so metadata-only queries
never touch the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

# Typed metadata for an opaque media payload.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),       # images/video
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),    # audio/video
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feat_mean", LongType(), True),      # stub feature: mean byte
    StructField("feat_head", StringType(), True),    # stub feature: head hex
])


def attach_media(df: DataFrame, payload_col: str, media_id_col: str,
                 kind: str, mime: str | None = None) -> DataFrame:
    """Wrap a binary column into the canonical media schema."""
    return df.select(
        F.col(media_id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(mime).cast("string").alias("mime"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode. Replace with PIL/libvips in a deployment:

        from PIL import Image; img = Image.open(io.BytesIO(payload))

    Raises for None payloads like a real decoder would."""
    if payload is None:
        raise ValueError("no payload")
    return {
        "n_bytes": len(payload),
        "feat_mean": sum(payload) // len(payload) if payload else 0,
        "feat_head": payload[:4].hex(),
    }


def _pil_image():
    """The image-decode feature gate (VERDICT r10 #6): PIL's Image
    module when the deployment has Pillow installed, else None. Called
    on each executor worker (not resolved driver-side) so a cluster
    whose workers carry Pillow gets real decode with zero code change;
    this container has no image libraries, so here it returns None and
    :func:`decode_images` degrades to NULL dimensions."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _decode_image_batch(payloads, image_mod):
    """Decode one Arrow batch of image payloads to (width, height)
    lists. With ``image_mod`` (PIL.Image or compatible), ``open`` on an
    in-memory buffer reads the HEADER only — `.size` never rasterises
    the pixels, so cost is O(rows), not O(pixels). Without it, or for
    NULL/undecodable payloads, dims are None (permissive, mirroring
    extract_features' NULL-payload rule). Kept a plain function so the
    gate is unit-testable without Spark workers (which re-resolve the
    gate themselves via :func:`_pil_image`)."""
    import io
    widths, heights = [], []
    for p in payloads:
        w = h = None
        if p is not None and image_mod is not None:
            try:
                with image_mod.open(io.BytesIO(bytes(p))) as img:
                    w, h = int(img.size[0]), int(img.size[1])
            except Exception:  # undecodable bytes -> NULL dims
                w = h = None
        widths.append(w)
        heights.append(h)
    return widths, heights


def decode_images(df: DataFrame) -> DataFrame:
    """Populate ``width``/``height`` on media rows from the payload
    bytes — the REAL decode path behind the :func:`_pil_image` gate.
    Arrow-batched ``mapInPandas`` like :func:`extract_features`;
    metadata-only consumers downstream should select away ``payload``
    so parquet column pruning keeps the blobs unread."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _pil_image()  # resolved per worker, see the gate
        for pdf in batches:
            w, h = _decode_image_batch(pdf["payload"], image_mod)
            out = pdf.copy()
            out["width"] = pd.array(w, dtype="Int32")
            out["height"] = pd.array(h, dtype="Int32")
            yield out

    from klepto_spark.operators.dedup import fan_out
    n_part = max(4, min(8, df.sparkSession.sparkContext.defaultParallelism))
    return fan_out(df, "media_id", target=n_part).mapInPandas(
        run, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode/feature-extract via Arrow-batched ``mapInPandas``.

    The pattern to copy for real decoders: iterate pandas batches, keep
    per-batch work vectorised in numpy over ONE concatenated buffer (no
    per-row Python loop), never collect to the driver. Rows with NULL
    payloads yield NULL features (permissive mode)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [None if p is None else bytes(p)
                        for p in pdf["payload"]]
            valid = [p for p in payloads if p is not None]
            # Variable-length byte stats, vectorised: concatenate the batch
            # into one uint8 buffer, then slice sums via prefix-sum — exact,
            # O(bytes), and robust to zero-length payloads.
            lens = np.fromiter((len(p) for p in valid), dtype=np.int64,
                               count=len(valid))
            buf = np.frombuffer(b"".join(valid), dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            ends = np.cumsum(lens)
            starts = ends - lens
            sums = csum[ends] - csum[starts]
            means = sums // np.maximum(lens, 1)  # len 0 -> sum 0 -> mean 0
            it = iter(range(len(valid)))
            rows = {"media_id": pdf["media_id"], "n_bytes": [],
                    "feat_mean": [], "feat_head": []}
            for p in payloads:
                if p is None:
                    rows["n_bytes"].append(None)
                    rows["feat_mean"].append(None)
                    rows["feat_head"].append(None)
                else:
                    i = next(it)
                    rows["n_bytes"].append(int(lens[i]))
                    rows["feat_mean"].append(int(means[i]))
                    rows["feat_head"].append(p[:4].hex())
            yield pd.DataFrame(rows)

    from klepto_spark.operators.dedup import fan_out
    # Fan out so decode parallelises across Python workers, but cap the
    # partition count: each partition pays worker spin-up + Arrow transfer,
    # so tiny inputs want few fat partitions (at real scale, partition count
    # follows data size via maxPartitionBytes anyway).
    n_part = max(4, min(8, df.sparkSession.sparkContext.defaultParallelism))
    return fan_out(df, "media_id", target=n_part).mapInPandas(
        run, schema=FEATURE_SCHEMA)


def media_features_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """ANSI/DuckDB oracle for :func:`extract_features` over a utf-8 text
    payload (the driver fixture): the stub features are pure byte math, so
    the oracle recomputes them from ``encode(text)`` — byte count, floored
    mean byte via hex-pair arithmetic, head-4 hex. Keeps the mapInPandas
    plumbing value-checked until a real decoder replaces the stub."""
    nibble = "strpos('0123456789abcdef', substr(hx, 2*i + {o}, 1)) - 1"
    byte = f"({nibble.format(o=1)}) * 16 + {nibble.format(o=2)}"
    return f"""
WITH b AS (SELECT CAST({id_col} AS BIGINT) AS media_id,
                  encode({text_col}) AS p FROM {table}),
h AS (SELECT media_id, octet_length(p) AS n, lower(hex(p)) AS hx FROM b)
SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
  CAST(CASE WHEN n = 0 THEN 0 ELSE
    coalesce(list_sum(list_transform(range(0, n), i -> {byte})), 0) // n
  END AS BIGINT) AS feat_mean,
  substr(hx, 1, 8) AS feat_head
FROM h"""


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan frame-sampling work items for video payloads: one row per
    (media_id, frame_ts) — the explode happens on metadata only, so the
    planning query never shuffles payload bytes."""
    frames = F.sequence(F.lit(0),
                        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0))
                                   - 1, F.lit(0)),
                        F.lit(every_ms))
    return (df.filter(F.col("kind") == "video")
            .select("media_id", F.explode(frames).alias("frame_ts")))


ENERGY_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("win_idx", IntegerType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("byte_sum", LongType(), False),
])


def frame_energy(df: DataFrame, window_bytes: int = 64) -> DataFrame:
    """Fixed-window energy profile over audio-shaped payloads: one row per
    (media_id, window of ``window_bytes`` payload bytes) carrying the
    window's byte count and byte sum — the stub stand-in for per-frame
    RMS/loudness (swap the sum for a real PCM decode + RMS in a
    deployment; the windowing, Arrow batching and output schema are the
    real plumbing). NULL/empty payloads emit no windows; the tail window
    is short.

    Vectorised like :func:`extract_features`: the whole Arrow batch
    concatenates into ONE uint8 buffer, a single prefix-sum prices every
    window slice, and window boundaries come from numpy arithmetic — no
    per-row or per-window Python loop. Output rows are metadata-sized, so
    downstream aggregation (e.g. silence detection = windows with low
    energy) never re-touches the blobs."""
    import numpy as np

    if window_bytes <= 0:
        raise ValueError(f"window_bytes must be positive, got {window_bytes}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [(mid, bytes(p)) for mid, p in
                        zip(pdf["media_id"], pdf["payload"])
                        if p is not None and len(p) > 0]
            if not payloads:
                continue
            lens = np.fromiter((len(p) for _, p in payloads),
                               dtype=np.int64, count=len(payloads))
            buf = np.frombuffer(b"".join(p for _, p in payloads),
                                dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
            doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            n_wins = (lens + window_bytes - 1) // window_bytes
            # Window starts for every payload, flattened: repeat each
            # doc's base offset, add a per-doc restarting arange.
            doc_idx = np.repeat(np.arange(len(payloads)), n_wins)
            flat = np.arange(n_wins.sum(), dtype=np.int64)
            win_in_doc = flat - np.repeat(np.cumsum(n_wins) - n_wins, n_wins)
            starts = doc_starts[doc_idx] + win_in_doc * window_bytes
            ends = np.minimum(starts + window_bytes,
                              doc_starts[doc_idx] + lens[doc_idx])
            mids = np.fromiter((m for m, _ in payloads), dtype=np.int64,
                               count=len(payloads))
            yield pd.DataFrame({
                "media_id": mids[doc_idx],
                "win_idx": win_in_doc.astype(np.int32),
                "n_bytes": ends - starts,
                "byte_sum": csum[ends] - csum[starts],
            })

    from klepto_spark.operators.dedup import fan_out
    n_part = max(4, min(8, df.sparkSession.sparkContext.defaultParallelism))
    return fan_out(df, "media_id", target=n_part).mapInPandas(
        run, schema=ENERGY_SCHEMA)


def frame_energy_sql(window_bytes: int = 64, table: str = "documents",
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`frame_energy` over utf-8 text payloads
    (the driver fixture): per-window byte sums recomputed from
    ``encode(text)`` with the same hex-pair arithmetic as
    :func:`media_features_sql`."""
    w = int(window_bytes)
    nibble = "strpos('0123456789abcdef', substr(hx, 2*i + {o}, 1)) - 1"
    byte = f"({nibble.format(o=1)}) * 16 + {nibble.format(o=2)}"
    return f"""
WITH b AS (SELECT CAST({id_col} AS BIGINT) AS media_id,
                  encode({text_col}) AS p FROM {table}),
h AS (SELECT media_id, octet_length(p) AS n, lower(hex(p)) AS hx
      FROM b WHERE octet_length(p) > 0),
wins AS (SELECT media_id, n, hx,
                CAST(unnest(range(0, (n + {w - 1}) // {w})) AS BIGINT)
                  AS win_idx
         FROM h)
SELECT media_id, CAST(win_idx AS INT) AS win_idx,
  CAST(least({w}, n - win_idx * {w}) AS BIGINT) AS n_bytes,
  CAST(list_sum(list_transform(
         range(win_idx * {w}, least((win_idx + 1) * {w}, n)),
         i -> {byte})) AS BIGINT) AS byte_sum
FROM wins"""


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_ts", LongType(), False),
    StructField("frame_byte", IntegerType(), False),
    StructField("frame_sig", StringType(), False),
])


def extract_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """EXECUTE the frame-sampling plan against the payloads — the second
    half of the pattern :func:`frame_sample_plan` begins: plan on
    metadata, then touch each blob exactly once. The plan's
    (media_id, frame_ts) rows are grouped back into a per-media frame
    LIST and joined onto the payload row, so one ``mapInPandas`` pass
    decodes all of a video's frames together — the blob is never
    duplicated per frame row, which is the difference between reading
    each 100 MB video once and reading it once per sampled frame.

    The decode is STUBBED deterministically (no video libs in this
    container): frame(ts) = the payload byte at offset ``ts mod len``
    plus a 4-byte signature from that offset — pure byte math, so the
    DuckDB oracle replays it exactly. Swap the stub for a real
    ffmpeg/pyav seek in deployment; the plan->group->single-pass-join
    plumbing is the production shape. Empty/NULL payloads emit no
    frames (their plan rows drop in the join)."""
    plan = frame_sample_plan(df, every_ms)
    lists = plan.groupBy("media_id").agg(
        F.array_sort(F.collect_list("frame_ts")).alias("_fts"))
    joined = (df.filter(F.col("kind") == "video")
              .filter(F.col("payload").isNotNull()
                      & (F.length("payload") > 0))
              .select("media_id", "payload")
              .join(lists, "media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_ts": [], "frame_byte": [],
                   "frame_sig": []}
            for mid, payload, fts in zip(pdf["media_id"], pdf["payload"],
                                         pdf["_fts"]):
                p = bytes(payload)
                n = len(p)
                hx = p.hex()
                for ts in fts:
                    off = int(ts) % n
                    out["media_id"].append(int(mid))
                    out["frame_ts"].append(int(ts))
                    out["frame_byte"].append(p[off])
                    out["frame_sig"].append(hx[2 * off:2 * off + 8])
            yield pd.DataFrame(out)

    from klepto_spark.operators.dedup import fan_out
    n_part = max(4, min(8, df.sparkSession.sparkContext.defaultParallelism))
    return fan_out(joined, "media_id", target=n_part).mapInPandas(
        run, schema=FRAME_SCHEMA)


def extract_frames_sql(every_ms: int = 1000, table: str = "documents",
                       text_col: str = "text", id_col: str = "doc_id",
                       duration_sql: str | None = None) -> str:
    """DuckDB oracle for :func:`extract_frames` over utf-8 payloads with
    the m02 fixture's deterministic duration (``duration_sql`` defaults
    to the m02 contract: (id % 30) * 1000 + 500)."""
    dur = duration_sql or f"(CAST({id_col} AS BIGINT) % 30) * 1000 + 500"
    nibble = "strpos('0123456789abcdef', substr(hx, 2*off + {o}, 1)) - 1"
    byte = f"({nibble.format(o=1)}) * 16 + {nibble.format(o=2)}"
    return f"""
WITH b AS (SELECT CAST({id_col} AS BIGINT) AS media_id,
                  encode({text_col}) AS p, {dur} AS dur FROM {table}),
h AS (SELECT media_id, dur, octet_length(p) AS n, lower(hex(p)) AS hx
      FROM b WHERE octet_length(p) > 0),
pl AS (SELECT media_id, n, hx,
              CAST(unnest(range(0, greatest(dur - 1, 0) + 1, {every_ms}))
                   AS BIGINT) AS frame_ts
       FROM h),
o AS (SELECT media_id, frame_ts, n, hx,
             CAST(frame_ts % n AS BIGINT) AS off FROM pl)
SELECT media_id, frame_ts,
       CAST({byte} AS INT) AS frame_byte,
       substr(hx, 2*off + 1, 8) AS frame_sig
FROM o"""


def payload_dedup(media: DataFrame, prefix_bytes: int = 64,
                  key_col: str = "media_id") -> DataFrame:
    """Duplicate-candidate triage for opaque binary payloads — the
    media-side counterpart of text exact dedup: fingerprint = md5 of
    the first ``prefix_bytes`` (the header hash blob stores triage
    with). Payloads sharing a header hash are the candidate set; the
    emitted byte length then settles most of them for free — equal
    (fp, nbytes) pairs are byte-compare candidates, differing nbytes
    members are proven-distinct header collisions (shared boilerplate
    headers, truncated re-crawls) without either payload ever being
    read twice. Returns every payload whose header-hash group has >1
    member: (key, fp, nbytes, n_candidates).

    Scale shape: the ONLY shuffle carries (key, fp, nbytes) — 48-byte
    rows — never payloads; the group sizes broadcast back. At 100 TB of
    media the fingerprint projection is the single pass over the blobs,
    everything after is metadata-sized."""
    f = media.select(
        F.col(key_col),
        F.md5(F.expr(f"substring(payload, 1, {prefix_bytes})"))
        .alias("fp"),
        F.length("payload").cast("long").alias("nbytes"))
    g = (f.groupBy("fp")
         .agg(F.count(F.lit(1)).alias("n_candidates"))
         .filter(F.col("n_candidates") > 1))
    return (f.join(F.broadcast(g), ["fp"])
            .select(F.col(key_col), "fp", "nbytes", "n_candidates"))
