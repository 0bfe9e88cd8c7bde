"""Merge-on-read CDC: deletion vectors + delta epochs over a file table.

The eager keyed merges (:func:`writers.merge_files` /
:func:`writers.merge_files_partitioned`) rewrite data on every CDC window —
the whole table or the touched buckets. At 100 TB with frequent small
windows even touched-bucket rewrites dominate: a 1000-row delta that hits
900 distinct buckets rewrites 900 bucket directories. This module gives
file tables the third, write-cheapest shape (the same trade Delta Lake's
deletion vectors / Iceberg's merge-on-read make):

- **merge** appends the window as an immutable *epoch*: the upserted rows
  land under ``_delta/e<N>/`` and the deleted keys under ``_dv/e<N>/``
  (both parquet regardless of the table's format — internal state, not
  user data), then a single commit file ``_dvlog/e<N>.json`` publishes
  the epoch atomically. The base files are NEVER touched: merge cost is
  O(delta), zero base IO, no rewrite amplification.
- **read** resolves merge-on-read: base rows whose key appears in any
  committed epoch are superseded; the newest epoch's version of each key
  wins (an upsert beats a delete of the same epoch, matching the eager
  merges' same-window semantics); tombstoned keys vanish.
  :meth:`sources.catalog.FileCatalog.load` applies this automatically, so
  every consumer of the catalog sees the merged view.
- **compact** folds the accumulated epochs back into the base through the
  eager merge (which delegates to the bucket-partitioned layout when one
  exists), then retires the consumed epochs. Compaction is idempotent —
  a crash between the fold and the retirement replays the same upserts
  and deletes onto an already-folded base and converges.

Read cost grows with the pending epoch volume (the resolution anti-join
carries every event key), which is why ``auto_compact`` folds when the
pending-to-base row ratio passes a threshold — the standard
merge-on-read / compaction economics.

Single-writer per table, like every file-sink merge in this package.
Capture windows must carry one version per key (``steal_cdc`` guarantees
this); the resolution picks one arbitrary row of a same-epoch duplicate.

Reference scope note: hellofresh/klepto rewrites whole tables per run
(pkg/dumper/engine/engine.go); incremental file-sink state is an engine
extension, like incremental.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from klepto_spark.sinks.writers import (
    BUCKET_COL,
    _hadoop_fs,
    _load_layout,
    _load_schema_contract,
    _save_schema_contract,
    align_to_contract,
    merge_files,
    merge_files_partitioned,
    write_files,
)

_LOG_DIR = "_dvlog"
_DELTA_DIR = "_delta"
_DV_DIR = "_dv"
_META_FILE = "_dvmeta.json"
EPOCH_COL = "_dv_epoch"


def _target(directory: str, table: str, fmt: str) -> str:
    return f"{directory.rstrip('/')}/{table}.{fmt}"


def _epoch_name(n: int) -> str:
    return f"e{n:06d}"


def _read_json(jvm, fs, path) -> dict:
    stream = fs.open(path)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _write_json(fs, path, payload: dict) -> None:
    out = fs.create(path, True)
    out.write(bytearray(json.dumps(payload).encode("utf-8")))
    out.close()


def _sub(jvm, base, *parts: str):
    p = base
    for part in parts:
        p = jvm.org.apache.hadoop.fs.Path(p, part)
    return p


def committed_epochs(jvm, fs, tgt) -> list[dict]:
    """The table's committed epochs, oldest first. The commit file IS the
    publish: data directories without one are invisible (a crashed append
    left them; the next merge removes them)."""
    log_dir = _sub(jvm, tgt, _LOG_DIR)
    if not fs.exists(log_dir):
        return []
    out = []
    for status in fs.listStatus(log_dir):
        name = status.getPath().getName()
        if name.startswith("e") and name.endswith(".json"):
            out.append(_read_json(jvm, fs, status.getPath()))
    return sorted(out, key=lambda e: e["id"])


def _clean_uncommitted(jvm, fs, tgt, committed_ids: set[int]) -> None:
    """Remove epoch data dirs that have no commit file — the leftovers of
    a merge that crashed between the data write and the commit."""
    for d in (_DELTA_DIR, _DV_DIR):
        parent = _sub(jvm, tgt, d)
        if not fs.exists(parent):
            continue
        for status in fs.listStatus(parent):
            name = status.getPath().getName()
            if not name.startswith("e"):
                continue
            try:
                eid = int(name[1:])
            except ValueError:
                continue
            if eid not in committed_ids:
                fs.delete(status.getPath(), True)


def _meta_path(jvm, tgt):
    return _sub(jvm, tgt, _META_FILE)


def load_dv_meta(jvm, fs, tgt) -> dict | None:
    path = _meta_path(jvm, tgt)
    if not fs.exists(path):
        return None
    return _read_json(jvm, fs, path)


def _base_reader(spark: SparkSession, fmt: str, contract):
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        reader = (reader.schema(contract) if contract is not None
                  else reader.option("inferSchema", "true"))
    elif contract is not None:
        reader = reader.schema(contract)
    return reader


def merge_files_dv(df: DataFrame, directory: str, table: str, fmt: str,
                   keys: list[str], deletes: DataFrame | None = None,
                   n_buckets: int | None = None,
                   auto_compact: float | None = 0.2) -> None:
    """Keyed merge that writes O(delta) instead of rewriting data files:
    the window is published as one immutable epoch (upserts + deletion
    vector), committed by a single log-file create. The first call
    creates the base eagerly (bucket-partitioned when ``n_buckets`` is
    given — compaction then inherits touched-buckets-only cost).

    ``auto_compact``: fold epochs into the base when pending event rows
    exceed this fraction of the base's rows (None disables; compaction
    is then the caller's cadence via :func:`compact_files_dv`)."""
    target = _target(directory, table, fmt)
    spark = df.sparkSession
    jvm, fs, tgt = _hadoop_fs(df, target)

    if not fs.exists(tgt):
        if n_buckets:
            merge_files_partitioned(df, directory, table, fmt, keys,
                                    n_buckets=n_buckets, deletes=deletes)
        else:
            first = df
            if deletes is not None:
                first = first.join(deletes.select(*keys).distinct(),
                                   on=keys, how="left_anti")
            write_files(first, directory, table, fmt, mode="overwrite")
            _save_schema_contract(jvm, fs, tgt, df.schema)
        _write_json(fs, _meta_path(jvm, tgt), {"keys": list(keys)})
        return

    meta = load_dv_meta(jvm, fs, tgt)
    if meta is not None and list(meta["keys"]) != list(keys):
        raise ValueError(
            f"table {table!r} tracks deletion vectors by keys "
            f"{meta['keys']}, merge requested {list(keys)}: key identity "
            "cannot change without compacting and rewriting")
    layout = _load_layout(jvm, fs, tgt)
    if layout is not None and list(layout["keys"]) != list(keys):
        raise ValueError(
            f"table {table!r} was bucketed by keys {layout['keys']}, "
            f"merge requested keys {list(keys)}")

    epochs = committed_epochs(jvm, fs, tgt)
    _clean_uncommitted(jvm, fs, tgt, {e["id"] for e in epochs})
    # epoch ids are MONOTONE across compactions (a global version
    # number): compaction records the last folded id as base_epoch, and
    # new epochs continue above it — time travel depends on an id never
    # meaning two different snapshots over the table's lifetime
    floor = (meta or {}).get("base_epoch", 0)
    next_id = max(epochs[-1]["id"] if epochs else 0, floor) + 1

    contract = _load_schema_contract(jvm, fs, tgt)
    if contract is None:
        # adopting a pre-contract table: the at-rest schema becomes the
        # contract now, so later epochs and the view stay type-stable
        base_probe = _base_reader(spark, fmt, None).load(target)
        from pyspark.sql.types import StructType
        contract = StructType(
            [f for f in base_probe.schema.fields if f.name != BUCKET_COL])
        _save_schema_contract(jvm, fs, tgt, contract)
    table_types = {f.name: f.dataType for f in contract.fields}

    delta = align_to_contract(df, table_types, table)
    name = _epoch_name(next_id)
    delta_rows = dv_rows = 0
    if delta.columns:
        counted = delta.withColumn(EPOCH_COL, F.lit(next_id))
        path = str(_sub(jvm, tgt, _DELTA_DIR, name))
        counted.write.mode("overwrite").parquet(path)
        delta_rows = spark.read.parquet(path).count()
    if deletes is not None:
        dels = align_to_contract(deletes.select(*keys).distinct(),
                                 table_types, table)
        path = str(_sub(jvm, tgt, _DV_DIR, name))
        dels.withColumn(EPOCH_COL, F.lit(next_id)) \
            .write.mode("overwrite").parquet(path)
        dv_rows = spark.read.parquet(path).count()
    if delta_rows == 0 and dv_rows == 0:
        _clean_uncommitted(jvm, fs, tgt, {e["id"] for e in epochs})
        return
    # the commit point: one file create publishes the epoch atomically
    log_dir = _sub(jvm, tgt, _LOG_DIR)
    if not fs.exists(log_dir):
        fs.mkdirs(log_dir)
    _write_json(fs, _sub(jvm, tgt, _LOG_DIR, f"{name}.json"),
                {"id": next_id, "delta_rows": delta_rows,
                 "dv_rows": dv_rows})
    if meta is None:
        _write_json(fs, _meta_path(jvm, tgt), {"keys": list(keys)})
    if not epochs:
        # first epoch on an optimized table: the min/max manifest only
        # describes the base files, so a pruned read would skip every
        # epoch row — retire it (optimize refuses pending epochs anyway,
        # so it can only be rebuilt after compaction)
        from klepto_spark.sinks.layout import invalidate_manifest
        invalidate_manifest(jvm, fs, tgt)

    if auto_compact is not None:
        pending = sum(e["delta_rows"] + e["dv_rows"] for e in epochs)
        pending += delta_rows + dv_rows
        base_rows = _base_reader(spark, fmt, contract).load(target).count()
        if pending >= auto_compact * max(base_rows, 1):
            compact_files_dv(spark, directory, table, fmt)


def _resolve(base: DataFrame, upserts: DataFrame | None,
             dv: DataFrame | None, keys: list[str],
             cols: list[str]) -> DataFrame:
    """Merge-on-read resolution: newest epoch per key wins; within an
    epoch an upsert beats a delete (the eager merges' same-window rule);
    any event supersedes the base row of that key."""
    if upserts is None and dv is None:
        return base.select(*cols)
    if upserts is None:
        # delete-only history: every event key is dead, nothing revives
        gone = dv.select(*keys).distinct()
        return base.join(gone, on=keys, how="left_anti").select(*cols)
    from pyspark.sql.window import Window
    events = upserts.withColumn("_dv_tomb", F.lit(False))
    if dv is not None:
        events = events.unionByName(dv.withColumn("_dv_tomb", F.lit(True)),
                                    allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(F.desc(EPOCH_COL),
                                          F.asc("_dv_tomb"))
    latest = (events.withColumn("_dv_rn", F.row_number().over(w))
              .filter(F.col("_dv_rn") == 1))
    live = latest.filter(~F.col("_dv_tomb")).select(*cols)
    # the event-key set is the pending CDC volume — small by compaction
    # contract; AQE picks broadcast vs shuffled anti-join by its size
    gone = events.select(*keys).distinct()
    kept = base.join(gone, on=keys, how="left_anti").select(*cols)
    return kept.unionByName(live)


def _event_frames(spark, jvm, fs, tgt, epochs):
    delta_paths = [str(_sub(jvm, tgt, _DELTA_DIR, _epoch_name(e["id"])))
                   for e in epochs if e["delta_rows"]]
    dv_paths = [str(_sub(jvm, tgt, _DV_DIR, _epoch_name(e["id"])))
                for e in epochs if e["dv_rows"]]
    upserts = spark.read.parquet(*delta_paths) if delta_paths else None
    dv = spark.read.parquet(*dv_paths) if dv_paths else None
    return upserts, dv


def read_files_dv(spark: SparkSession, directory: str, table: str,
                  fmt: str, base: DataFrame | None = None,
                  as_of_epoch: int | None = None) -> DataFrame:
    """The merged view of a deletion-vector table: base files with every
    committed epoch applied. Pass ``base`` to reuse an already-built base
    frame (the FileCatalog does, so its row-mode/schema options hold).

    ``as_of_epoch=N`` time-travels: only epochs with id <= N apply, so
    the view is the table exactly as it stood after epoch N committed
    (``N`` at-or-above the compaction floor and at-or-below the newest
    committed epoch). History at or below the floor lives only folded
    into the base files (compaction is this layer's VACUUM) — asking for
    it raises rather than silently serving the wrong snapshot; the floor
    itself is servable because the base IS that snapshot."""
    target = _target(directory, table, fmt)
    spark_any = base if base is not None else spark.range(0)
    jvm, fs, tgt = _hadoop_fs(spark_any, target)
    contract = _load_schema_contract(jvm, fs, tgt)
    if base is None:
        base = _base_reader(spark, fmt, contract).load(target)
    if BUCKET_COL in base.columns:
        base = base.drop(BUCKET_COL)
    epochs = committed_epochs(jvm, fs, tgt)
    if as_of_epoch is not None:
        meta = load_dv_meta(jvm, fs, tgt)
        floor = (meta or {}).get("base_epoch", 0)
        # pre-feature compactions wrote no base_epoch; the surviving
        # commit ids still bound the floor from below
        if epochs:
            floor = max(floor, epochs[0]["id"] - 1)
        if as_of_epoch < floor:
            raise ValueError(
                f"epoch {as_of_epoch} of table {table!r} was compacted "
                f"into the base (floor is {floor}): that history is no "
                "longer reconstructible")
        newest = epochs[-1]["id"] if epochs else floor
        if as_of_epoch > newest:
            raise ValueError(
                f"epoch {as_of_epoch} of table {table!r} does not exist "
                f"(newest committed epoch is {newest})")
        epochs = [e for e in epochs if e["id"] <= as_of_epoch]
    if not epochs:
        return base
    meta = load_dv_meta(jvm, fs, tgt)
    if meta is None:
        raise ValueError(f"table {table!r} has committed epochs but no "
                         f"{_META_FILE}: cannot resolve without the keys")
    upserts, dv = _event_frames(spark, jvm, fs, tgt, epochs)
    return _resolve(base, upserts, dv, list(meta["keys"]), base.columns)


def pending_epochs(spark: SparkSession, directory: str, table: str,
                   fmt: str) -> list[dict]:
    """Committed-but-uncompacted epochs (oldest first) — the observable
    compaction debt."""
    jvm, fs, tgt = _hadoop_fs(spark.range(0),
                              _target(directory, table, fmt))
    if not fs.exists(tgt):
        return []
    return committed_epochs(jvm, fs, tgt)


def compact_files_dv(spark: SparkSession, directory: str, table: str,
                     fmt: str) -> int:
    """Fold every committed epoch into the base files and retire them;
    returns the number of epochs folded. Delegates to the eager keyed
    merge, so a bucket-partitioned base rewrites only touched buckets.

    Crash-safe by idempotence: the fold happens first, the retirement
    after — a crash in between replays the same latest-wins upserts and
    deletes onto the already-folded base and converges. Readers stay
    consistent throughout: before the fold they see base+events; after
    the fold but before retirement, events re-apply rows the base already
    holds (same keys, same values) and delete keys already gone."""
    target = _target(directory, table, fmt)
    jvm, fs, tgt = _hadoop_fs(spark.range(0), target)
    epochs = committed_epochs(jvm, fs, tgt)
    if not epochs:
        return 0
    meta = load_dv_meta(jvm, fs, tgt)
    if meta is None:
        raise ValueError(f"table {table!r} has committed epochs but no "
                         f"{_META_FILE}: cannot compact without the keys")
    keys = list(meta["keys"])
    contract = _load_schema_contract(jvm, fs, tgt)
    cols = [f.name for f in contract.fields] if contract is not None else None
    upserts, dv = _event_frames(spark, jvm, fs, tgt, epochs)

    from pyspark.sql.window import Window
    if upserts is None:
        # delete-only history: merge an empty upsert frame, dv keys only
        if cols is None:
            raise ValueError(f"table {table!r} has no schema contract and "
                             "no upsert epochs to derive one from")
        ups = spark.createDataFrame([], contract)
        dels = dv.select(*keys).distinct()
        merge_files(ups, directory, table, fmt, keys, deletes=dels)
    else:
        events = upserts.withColumn("_dv_tomb", F.lit(False))
        if dv is not None:
            events = events.unionByName(
                dv.withColumn("_dv_tomb", F.lit(True)),
                allowMissingColumns=True)
        w = Window.partitionBy(*keys).orderBy(F.desc(EPOCH_COL),
                                              F.asc("_dv_tomb"))
        latest = (events.withColumn("_dv_rn", F.row_number().over(w))
                  .filter(F.col("_dv_rn") == 1)).persist()
        try:
            if cols is None:
                cols = [c for c in latest.columns
                        if c not in (EPOCH_COL, "_dv_tomb", "_dv_rn")]
            ups = latest.filter(~F.col("_dv_tomb")).select(*cols)
            dels = latest.filter(F.col("_dv_tomb")).select(*keys)
            if dels.isEmpty():
                dels = None
            # merge_files auto-delegates to the bucket-partitioned merge
            # when the base carries a layout sidecar; on a plain base its
            # atomic whole-dir swap REPLACES the table directory, which
            # also retires the epoch dirs — the sidecars are re-published
            # below either way
            merge_files(ups, directory, table, fmt, keys, deletes=dels)
        finally:
            latest.unpersist()
    # retire consumed epochs (no-ops where the dir swap already did)
    for e in epochs:
        name = _epoch_name(e["id"])
        for p in (_sub(jvm, tgt, _LOG_DIR, f"{name}.json"),
                  _sub(jvm, tgt, _DELTA_DIR, name),
                  _sub(jvm, tgt, _DV_DIR, name)):
            if fs.exists(p):
                fs.delete(p, True)
    if contract is not None and not fs.exists(
            _sub(jvm, tgt, "_schema.json")):
        _save_schema_contract(jvm, fs, tgt, contract)
    # record where history now starts: epochs <= base_epoch are folded
    # into the base files and no longer reconstructible (time travel
    # below this floor must refuse, like a vacuumed Delta table)
    _write_json(fs, _meta_path(jvm, tgt),
                {"keys": keys, "base_epoch": epochs[-1]["id"]})
    # the fold rewrote base files: any surviving min/max manifest now
    # names gone files and must not serve pruned reads
    from klepto_spark.sinks.layout import invalidate_manifest
    invalidate_manifest(jvm, fs, tgt)
    return len(epochs)


def vacuum_epochs(spark: SparkSession, directory: str, table: str,
                  fmt: str, retain_epochs: int) -> int:
    """Bound merge-on-read history: fold all but the newest
    ``retain_epochs`` committed epochs into the base files and retire
    them, keeping the recent ones replayable for time travel. Full
    compaction (:func:`compact_files_dv`) is all-or-nothing — the only
    way to stop ``_dvlog`` growing without it was to give up history
    entirely; this is the retention knob in between (VERDICT r05 #7).

    Publish protocol (shares the bin-pack journal + recovery): stage the
    resolved base, RAISE the time-travel floor first (a crash after this
    point can only over-refuse history, never serve a folded epoch's
    pre-image), journal ``{olds, news}``, move news in, let recovery
    delete olds, then retire the folded epochs' files. A crash between
    publish and retirement is benign: the surviving folded epochs
    re-apply latest-wins onto the already-folded base and converge to
    the same rows; the next vacuum retires them.

    Raises on bucket-partitioned layouts (their files are key-routed;
    use :func:`compact_files_dv`, which delegates to the bucket merge).
    Pending positional deletes are folded first — the base swap would
    invalidate their (file, row) addresses. Returns the number of
    epochs folded (0 when history is already within budget)."""
    if retain_epochs < 0:
        raise ValueError("retain_epochs must be >= 0")
    if retain_epochs == 0:
        return compact_files_dv(spark, directory, table, fmt)
    if fmt != "parquet":
        raise ValueError("vacuum_epochs requires parquet (the partial "
                         "fold republishes base files in place)")
    from klepto_spark.sinks.layout import _recover_binpack, _sub_path
    from klepto_spark.sinks.writers import _is_bucket_layout
    target = _target(directory, table, fmt)
    jvm, fs, tgt = _hadoop_fs(spark.range(0), target)
    if not fs.exists(tgt):
        return 0
    if _is_bucket_layout(fs, tgt):
        raise ValueError(
            f"table {table!r} is bucket-partitioned: vacuum would break "
            "its key routing; use compact_files_dv (full fold)")
    _recover_binpack(jvm, fs, tgt)
    epochs = committed_epochs(jvm, fs, tgt)
    fold = epochs[:-retain_epochs] if retain_epochs else epochs
    if not fold:
        return 0
    meta = load_dv_meta(jvm, fs, tgt)
    if meta is None:
        raise ValueError(f"table {table!r} has committed epochs but no "
                         f"{_META_FILE}: cannot vacuum without the keys")
    pdv_log = _sub(jvm, tgt, "_pdvlog")
    if fs.exists(pdv_log) and fs.listStatus(pdv_log):
        from klepto_spark.sinks.positional_dv import compact_files_pdv
        compact_files_pdv(spark, directory, table, fmt)
    keys = list(meta["keys"])
    contract = _load_schema_contract(jvm, fs, tgt)
    base = _base_reader(spark, fmt, contract).load(target)
    cols = ([f.name for f in contract.fields] if contract is not None
            else base.columns)
    upserts, dv = _event_frames(spark, jvm, fs, tgt, fold)
    resolved = _resolve(base, upserts, dv, keys, cols)

    stage = _sub_path(jvm, tgt, "_bpstage")
    if fs.exists(stage):
        fs.delete(stage, True)
    resolved.write.mode("overwrite").parquet(str(stage))
    olds = [str(st.getPath()) for st in fs.listStatus(tgt)
            if st.getPath().getName().endswith(".parquet")
            and not st.getPath().getName().startswith("_")]
    staged = [str(st.getPath()) for st in fs.listStatus(stage)
              if st.getPath().getName().endswith(".parquet")]
    news = [f"{target}/vac-{fold[-1]['id']}-{i}-{p.rsplit('/', 1)[1]}"
            for i, p in enumerate(staged)]
    # floor first: from here on, pre-fold snapshots refuse (they could
    # otherwise resolve folded epochs against the ALREADY-folded base)
    meta["base_epoch"] = max(meta.get("base_epoch", 0), fold[-1]["id"])
    _write_json(fs, _meta_path(jvm, tgt), meta)
    from klepto_spark.sinks.journal import publish_renames, write_plan
    write_plan(fs, _sub_path(jvm, tgt, "_binpack.json"), olds, news)
    # Hadoop rename reports failure as a False return, not an exception
    # (e.g. destination exists). A failed publish must abort BEFORE the
    # retirement loop or the folded epochs' upserts vanish from the
    # current view (ADVICE r06 medium). The abort decision is made from
    # the POST-recovery state below, not these return values.
    to_path = lambda s: jvm.org.apache.hadoop.fs.Path(s)  # noqa: E731
    outcome = publish_renames(
        jvm, fs, tgt, "_binpack.json", to_path,
        [to_path(s) for s in staged], news, olds,
        lost_journal_msg=(
            f"vacuum_epochs: journal for table {table!r} disappeared "
            "mid-publish (a concurrent recovery rolled the fold back); "
            "this fold's files were removed, the pre-fold base stands "
            "and the folded epochs were NOT retired — re-run "
            "vacuum_epochs"))
    if outcome == "renamed":
        _recover_binpack(jvm, fs, tgt)  # deletes olds + plan + staging
    news_paths = [jvm.org.apache.hadoop.fs.Path(n) for n in news]
    # Decide from the POST-recovery state, not the rename return values
    # (ADVICE r07): a rename can report False because the destination
    # already exists (a prior attempt landed it), in which case recovery
    # takes the all-news-present branch, retires the olds, and the fold
    # IS live — retiring the epochs below is then correct, and claiming
    # "pre-fold base kept" would misstate the table to the operator.
    if not all(fs.exists(p) for p in news_paths):
        raise RuntimeError(
            f"vacuum_epochs: publish did not land for table {table!r} "
            "(rename failed); recovery kept the pre-fold base and the "
            "folded epochs were NOT retired — re-run vacuum_epochs")
    for e in fold:
        name = _epoch_name(e["id"])
        for p in (_sub(jvm, tgt, _LOG_DIR, f"{name}.json"),
                  _sub(jvm, tgt, _DELTA_DIR, name),
                  _sub(jvm, tgt, _DV_DIR, name)):
            if fs.exists(p):
                fs.delete(p, True)
    if contract is not None and not fs.exists(
            _sub(jvm, tgt, "_schema.json")):
        _save_schema_contract(jvm, fs, tgt, contract)
    return len(fold)
