"""Source catalogs: table discovery + column listing + DataFrame loading.

Mirrors the reference's reader surface (SURVEY §2.1 S1-S6):
- GetTables  (base tables only; views excluded) ->
  reference: pkg/reader/mysql/reader.go:34-57, pkg/reader/postgres/reader.go:36-62
- GetColumns (cached)                           -> engine.go:52-79
- ReadTable                                     -> engine.go:82-133
- GetStructure (DDL text)                       -> mysql/reader.go:84-111 / pg_dump

The file catalog treats a directory of ``<table>.<ext>`` files as the
database; the JDBC catalog (gated on driver jars being present) maps to
``spark.read.format("jdbc")`` where Catalyst pushes filters/limits to the
source database exactly as the reference pushes its generated SQL.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from klepto_spark.sources.dsn import DSN, DSNError, file_path, jdbc_url, route


CORRUPT_COL = "_corrupt_record"

_MISSING = object()  # "no per-table entry" (None is a stored value)

#: stride_mode="auto" switches to histogram strides when the key span
#: exceeds this multiple of COUNT(*) — see _derive_partition_options
_AUTO_SPARSITY_FACTOR = 2


class FileCatalog:
    """Directory-of-files catalog (parquet/csv/json).

    ``row_mode`` controls row-level error semantics for text formats
    (mirrors the reference's row-skip in pkg/reader/engine/engine.go:202-205):

    - ``'strict'`` (default): a malformed row fails the table read
      (FAILFAST). NOTE: Spark's own default is silently-permissive —
      malformed CSV/JSON rows become nulls with no signal; strict is the
      honest default for a copy tool.
    - ``'permissive'``: malformed rows are SKIPPED and counted
      (:meth:`corrupt_count`); the pipeline sees only clean rows.

    Parquet is columnar — there is no per-row parse to fail; its analog is
    ``ignoreCorruptFiles`` at file/row-group granularity, applied in
    permissive mode.

    ``schemas`` (table -> StructType) pins text-format schemas explicitly —
    the right call at scale (inference costs a scan) and REQUIRED for full
    row-level typing: CSV/JSON type inference ignores the parse mode
    (measured), so one poison row silently widens affected columns to
    string. With a declared schema, type-corrupt rows are detected and
    (in permissive mode) skipped; with inference, only arity-corrupt rows
    are."""

    def __init__(self, spark: SparkSession, directory: str, fmt: str = "parquet",
                 row_mode: str = "strict", schemas: dict | None = None,
                 merge_schema: bool = False):
        if row_mode not in ("strict", "permissive"):
            raise ValueError(f"unknown row_mode {row_mode!r}")
        self.spark = spark
        self.directory = Path(directory)
        self.fmt = fmt
        self.row_mode = row_mode
        self.schemas = schemas or {}
        # Parquet directories that accumulate appends from different
        # writers can mix physical types (int32 then int64 for the same
        # column). The default read samples ONE footer, so the table's
        # schema — and whether the read even succeeds — depends on file
        # listing order. merge_schema=True reconciles all footers with
        # type widening at the cost of reading every footer; opt-in
        # because at large file counts that inference pass is real IO.
        self.merge_schema = merge_schema
        self._columns_cache: dict[str, list[str]] = {}
        if row_mode == "permissive" and fmt == "csv":
            # With parser column pruning, arity-malformed rows are only
            # detected when the FULL row parses — a narrow projection would
            # let corrupt rows leak past the filter. Permissive mode is an
            # explicit correctness opt-in, so trade pruning speed away.
            spark.conf.set("spark.sql.csv.parser.columnPruning.enabled",
                           "false")

    def tables(self) -> list[str]:
        return sorted(p.stem for p in self.directory.glob(f"*.{self.fmt}"))

    def columns(self, table: str) -> list[str]:
        if table not in self._columns_cache:
            self._columns_cache[table] = self.load(table).columns
        return self._columns_cache[table]

    def _path(self, table: str) -> str:
        return str(self.directory / f"{table}.{self.fmt}")

    def _text_reader(self, table: str):
        reader = self.spark.read.format(self.fmt)
        if self.fmt == "csv":
            reader = reader.option("header", "true")
        if table in self.schemas:
            return reader.schema(self.schemas[table])
        return reader.option("inferSchema", "true")

    def _table_schema(self, table: str):
        if table in self.schemas:
            return self.schemas[table]
        return self._text_reader(table).load(self._path(table)).schema

    def _raw_permissive(self, table: str) -> DataFrame:
        """Text read with the corrupt-record column materialised. Spark only
        populates it from an EXPLICIT schema — declared, or inferred in a
        schema-only pass (see class docstring for the inference caveat)."""
        from pyspark.sql.types import StringType, StructField, StructType
        schema = StructType(list(self._table_schema(table).fields)
                            + [StructField(CORRUPT_COL, StringType(), True)])
        reader = (self.spark.read.format(self.fmt).schema(schema)
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", CORRUPT_COL))
        if self.fmt == "csv":
            reader = reader.option("header", "true")
        return reader.load(self._path(table))

    def load(self, table: str) -> DataFrame:
        from pyspark.sql import functions as F

        from klepto_spark.session import ensure_nanos_conf, normalise_nanos_ts
        ensure_nanos_conf(self.spark)
        # a crash mid bin-pack publish leaves transient duplicates (news
        # moved in before olds deleted); replay/roll back the journaled
        # plan on the read path — same discipline as apply_positional's
        # _recover_plan — so every catalog read sees a settled file set.
        # Driver-side existence checks only; the jvm hop is paid only when
        # a half-applied plan is actually present.
        #
        # LEASE GATE (ADVICE r05): recovery deletes staged/new files, a
        # destructive mutation — a reader racing a LIVE publish in another
        # process must not mistake it for a crash. A plan/stage younger
        # than the lease raises instead of recovering (retry once the
        # writer settles, or run `compact_small_files`/the writer-side
        # recovery explicitly); older remnants recover as before. The
        # writer's publish window is seconds, so a fresh journal almost
        # always means a publish in flight.
        # The lease applies ONLY when the journal exists: before
        # _binpack.json lands, nothing has been published and recovery
        # merely drops the staging dir — the table's file set is
        # untouched either way, so blocking reads for the full lease on
        # a bare _bpstage remnant bought no safety (ADVICE r06). A live
        # writer whose pre-journal staging is dropped just fails its
        # stage write and retries; the table never regresses.
        root = Path(self._path(table))
        journal = root / "_binpack.json"
        remnants = [p for p in (journal, root / "_bpstage")
                    if p.exists()]
        if remnants:
            import os as _os
            import time as _time
            lease = float(_os.environ.get(
                "KLEPTO_BINPACK_LEASE_SEC", "60"))
            age = _time.time() - max(p.stat().st_mtime for p in remnants)
            if age < lease and journal.exists():
                raise RuntimeError(
                    f"table {table!r} has a bin-pack publish journal "
                    f"{age:.0f}s old (lease {lease:.0f}s): a compaction "
                    "may be publishing in another process. Retry after "
                    "it settles, or — if the writer is known dead — "
                    "re-run the compaction / lower "
                    "KLEPTO_BINPACK_LEASE_SEC to force recovery.")
            from klepto_spark.sinks.layout import _recover_binpack
            from klepto_spark.sinks.writers import _hadoop_fs
            jvm, fs, tgt = _hadoop_fs(self.spark.range(0), str(root))
            _recover_binpack(jvm, fs, tgt)
        if self.fmt in ("csv", "json"):
            if self.row_mode == "permissive":
                df = (self._raw_permissive(table)
                      .filter(F.col(CORRUPT_COL).isNull())
                      .drop(CORRUPT_COL))
            else:
                df = (self._text_reader(table).option("mode", "FAILFAST")
                      .load(self._path(table)))
        else:
            reader = self.spark.read.format(self.fmt)
            if self.row_mode == "permissive":
                reader = reader.option("ignoreCorruptFiles", "true")
            if self.merge_schema and self.fmt == "parquet":
                # mergeSchema reconciles added/removed COLUMNS but
                # refuses numeric promotions (int file + long file
                # throws); fall back to an explicitly-widened schema —
                # the parquet reader upcasts int32 under a long schema
                reader = reader.option("mergeSchema", "true")
                try:
                    df = reader.load(self._path(table))
                except Exception:  # noqa: BLE001 — incompatible footers
                    df = (self.spark.read
                          .schema(self._widened_schema(table))
                          .parquet(self._path(table)))
            else:
                df = reader.load(self._path(table))
        # a deletion-vector table (merge-on-read CDC sink) resolves its
        # committed epochs at read time, so every catalog consumer —
        # including sync_deletes' sink-key diff — sees the merged view
        # positional deletes first (they address base rows only, so they
        # commute with key-epoch resolution either way; applying them on
        # the raw scan keeps _metadata addressable)
        pdv_log = Path(self._path(table)) / "_pdvlog"
        if pdv_log.is_dir() and any(pdv_log.glob("e*.json")):
            from klepto_spark.sinks.positional_dv import apply_positional
            df = apply_positional(self.spark, self._path(table), base=df)
        dv_log = Path(self._path(table)) / "_dvlog"
        if dv_log.is_dir() and any(dv_log.glob("e*.json")):
            from klepto_spark.sinks.deletion_vectors import read_files_dv
            df = read_files_dv(self.spark, str(self.directory), table,
                               self.fmt, base=df)
        # normalise nanosecond timestamps read as long (see session.py)
        return normalise_nanos_ts(df)

    def load_as_of(self, table: str, epoch: int) -> DataFrame:
        """Snapshot read of a merge-on-read table as it last stood while
        ``epoch`` was current (``epoch=0`` or the compaction floor = the
        base files alone). Raises when that history was folded away by
        compaction — the layer's VACUUM — rather than serving a wrong
        snapshot.

        Positional deletes are sub-epoch events: each commit is stamped
        with the then-current key epoch, and only deletes stamped at or
        before ``epoch`` apply here — a row live at epoch N but
        positionally deleted later stays VISIBLE in the epoch-N snapshot
        (the audit contract). Unstamped pre-stamping positional epochs
        make placement impossible, so the read refuses (same discipline
        as the floor); folding positional deletes into the base raises
        the floor for the same reason."""
        from klepto_spark.session import normalise_nanos_ts
        from klepto_spark.sinks.deletion_vectors import read_files_dv
        base = None
        pdv_log = Path(self._path(table)) / "_pdvlog"
        if pdv_log.is_dir() and any(pdv_log.glob("e*.json")):
            from klepto_spark.sinks.positional_dv import apply_positional
            base = apply_positional(self.spark, self._path(table),
                                    as_of_dv_epoch=epoch)
        df = read_files_dv(self.spark, str(self.directory), table,
                           self.fmt, base=base, as_of_epoch=epoch)
        return normalise_nanos_ts(df)

    def load_range(self, table: str, col: str, lo=None, hi=None
                   ) -> DataFrame:
        """Range read that exploits a clustered layout's min/max manifest
        when one exists (``optimize`` CLI / sinks.layout): only the files
        whose envelope can contain [lo, hi] are opened. Falls back to a
        plain load + filter — same results either way (the layout module's
        equivalence contract)."""
        from pyspark.sql import functions as F
        from klepto_spark.session import normalise_nanos_ts
        manifest = Path(self._path(table)) / "_minmax.json"
        if (self.fmt == "parquet" and manifest.is_file()
                and self._manifest_usable(table)):
            from klepto_spark.sinks.layout import pruned_read
            return normalise_nanos_ts(
                pruned_read(self.spark, self._path(table), col, lo, hi))
        df = self.load(table)
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df

    def _manifest_usable(self, table: str) -> bool:
        """Whether ``_minmax.json`` still describes the table's merged view.

        The manifest is written by ``optimize`` against a settled base; it
        knows nothing about later mutations, so the pruned read must stand
        down — never silently return deleted/superseded rows — when:

        - ``_pdvlog`` / ``_dvlog`` hold pending epochs (positional deletes
          or merge-on-read upserts the manifest files don't reflect), or
        - any file the manifest names is gone (a compaction/bin-pack
          rewrote the layout out from under it — in that case the stale
          manifest is deleted here so the next ``optimize`` starts clean).

        Driver-side file checks only — file-count-bounded metadata, the
        same cost class as reading the manifest itself."""
        import json as _json
        root = Path(self._path(table))
        for log in ("_pdvlog", "_dvlog"):
            d = root / log
            if d.is_dir() and any(d.glob("e*.json")):
                return False
        manifest = root / "_minmax.json"
        try:
            with open(manifest) as f:
                files = [e["file"] for e in _json.load(f)["files"]]
        except (OSError, KeyError, ValueError):
            return False
        if all((root / name).is_file() for name in files):
            return True
        manifest.unlink(missing_ok=True)  # stale: files were rewritten
        return False

    def quarantine(self, table: str) -> DataFrame:
        """The malformed rows a permissive read skips, with whatever
        columns DID parse plus the raw line in ``_corrupt_record`` — write
        this to a side sink at scale instead of re-scanning for
        :meth:`corrupt_count` (the write references every column, which
        also guarantees full-row parsing so arity corruption is caught)."""
        if self.row_mode != "permissive" or self.fmt not in ("csv", "json"):
            raise ValueError("quarantine() needs row_mode='permissive' on "
                             "a csv/json catalog")
        from pyspark.sql import functions as F
        raw = self._raw_permissive(table)
        return raw.filter(F.col(CORRUPT_COL).isNotNull())

    def corrupt_count(self, table: str) -> int:
        """Rows skipped by a permissive text read (0 in strict mode /
        non-text formats). Costs one extra scan of the table's file —
        charged only when permissive mode asks for the metric; at scale,
        route corrupt rows to a quarantine sink instead and count there."""
        if self.row_mode != "permissive" or self.fmt not in ("csv", "json"):
            return 0
        from pyspark.sql import functions as F
        # One aggregate pass that references EVERY data column: the CSV
        # parser only detects arity-malformed rows when it parses the full
        # row, and column pruning short-circuits that (a corrupt-only scan
        # is outright disallowed). count(col) references cannot be
        # constant-folded away, so the scan stays full-width.
        raw = self._raw_permissive(table)
        data_cols = [f.name for f in raw.schema.fields
                     if f.name != CORRUPT_COL]
        row = raw.agg(
            F.sum(F.when(F.col(CORRUPT_COL).isNotNull(), 1)
                  .otherwise(0)).alias("skipped"),
            *[F.count(F.col(c)).alias(f"_w_{i}")
              for i, c in enumerate(data_cols)],
        ).collect()[0]
        return int(row["skipped"] or 0)

    _NUM_RANK = {"tinyint": 1, "smallint": 2, "int": 3, "bigint": 4,
                 "float": 5, "double": 6}

    def _widened_schema(self, table: str):
        """Union of every parquet file's schema with LOSSLESS numeric
        widening: integral chain promotes to the widest integral,
        float+double to double, and integral-up-to-int32 + fractional to
        double (exact in the 53-bit mantissa). bigint + fractional
        raises — doubles round bigints above 2^53 (exactly the nano-
        epoch / 64-bit-id hazard), and silent coercion would corrupt.
        Non-numeric conflicts raise for the same reason."""
        from pyspark.sql.types import DoubleType, StructField, StructType
        root = Path(self._path(table))
        files = ([root] if root.is_file() else
                 sorted(p for p in root.rglob("*.parquet")
                        if not p.name.startswith(("_", "."))))
        if any("=" in p.parent.name for p in files):
            raise ValueError(
                f"{table!r}: schema widening does not support "
                "hive-partitioned layouts (partition columns live in "
                "directory names, not footers)")
        merged: dict[str, StructField] = {}
        order: list[str] = []
        for f in files:
            for fld in self.spark.read.parquet(str(f)).schema.fields:
                if fld.name not in merged:
                    merged[fld.name] = fld
                    order.append(fld.name)
                    continue
                cur = merged[fld.name]
                a, b = cur.dataType, fld.dataType
                if a != b:
                    ra = self._NUM_RANK.get(a.simpleString())
                    rb = self._NUM_RANK.get(b.simpleString())
                    mixed = (ra is not None and rb is not None
                             and (ra <= 4) != (rb <= 4))
                    if ra is None or rb is None or (
                            mixed and min(ra, rb) == 4):
                        raise ValueError(
                            f"{table!r}.{fld.name}: cannot losslessly "
                            f"widen {a.simpleString()} vs "
                            f"{b.simpleString()}")
                    wide = (DoubleType() if mixed
                            else (a if ra >= rb else b))
                    merged[fld.name] = StructField(fld.name, wide, True)
                elif fld.nullable and not cur.nullable:
                    merged[fld.name] = StructField(fld.name, a, True)
        return StructType([merged[n] for n in order])

    def structure(self) -> str:
        """Whole-catalog DDL text (reference GetStructure)."""
        from klepto_spark.sinks.ddl import create_table_sql
        return "\n\n".join(
            create_table_sql(t, self.load(t).schema) for t in self.tables())


class JdbcCatalog:
    """JDBC catalog; usable when a JDBC driver jar is on the Spark
    classpath (embedded Derby ships with Spark, so the path is exercised
    in-container — tests/test_jdbc.py; mysql/postgres jars slot in the
    same way).

    ``read_timeout`` maps the reference's per-read timeout (default 5 min,
    cmd/steal.go:72, enforced pkg/reader/engine/engine.go:106-130) onto the
    JDBC ``queryTimeout`` option, enforced by the driver per statement.

    Scale posture (VERDICT r08 #1 — the reference reads each table over
    one cursor, pkg/reader/engine/engine.go:82-133; at 100 TB that is
    the steal path's bottleneck):

    * ``fetchsize`` is ALWAYS set (default 10k). Spark's default of 0
      means "driver default", and pgjdbc's default is to buffer the
      ENTIRE result set in the reading task's memory — a guaranteed OOM
      on any large table.
    * reads are PARTITIONED when the table has an integral primary key
      (:func:`klepto_spark.jdbc.partition_column`): one min/max probe
      derives ``partitionColumn/lowerBound/upperBound/numPartitions``,
      so the scan runs ``read_partitions`` concurrent range queries
      instead of one cursor. PK-less tables (or empty ones) fall back to
      a single partition — correct, just not parallel.
    * per-table override via ``partition_overrides``: map a table to a
      column name to force it, or to ``None`` to disable partitioning
      (e.g. a PK the optimizer can't range-scan). TOML surface:
      ``PartitionColumn`` on the table spec (``apply_read_overrides``).
    """

    def __init__(self, spark: SparkSession, dsn: DSN,
                 read_timeout: int = 300, fetchsize: int = 10_000,
                 read_partitions: int | None = None,
                 partition_overrides: dict[str, str | None] | None = None,
                 stride_mode: str = "uniform"):
        if stride_mode not in ("uniform", "histogram", "auto"):
            raise ValueError(f"unknown stride_mode {stride_mode!r}")
        self.spark = spark
        self.dsn = dsn
        self.url = jdbc_url(dsn)
        self.read_timeout = read_timeout
        self.fetchsize = fetchsize
        self.read_partitions = read_partitions
        self.partition_overrides = dict(partition_overrides or {})
        # per-table tuning from TableSpec (apply_read_overrides) — kept
        # OFF the catalog-wide defaults so one table's setting never
        # leaks into another's scan (ADVICE r09 medium)
        self.partition_counts: dict[str, int] = {}
        self.stride_mode = stride_mode
        self.stride_modes: dict[str, str] = {}
        self._columns_cache: dict[str, list[str]] = {}
        self._bounds_cache: dict[str, dict] = {}
        self._stored_cache: dict[str, str] = {}

    @property
    def _dialect(self) -> str:
        return "mysql" if self.dsn.type == "mysql" else "ansi"

    def _stored(self, table: str) -> str:
        """Exact stored-case table name (cached); falls back to the name
        as given when metadata can't resolve it (e.g. a schema-qualified
        or subquery ``dbtable`` — those pass through unquoted)."""
        if table not in self._stored_cache:
            from klepto_spark import jdbc as J
            try:
                stored = J.stored_table_name(self.spark, self.dsn, table)
            except Exception:  # noqa: BLE001 — metadata probe is best-effort
                stored = None
            self._stored_cache[table] = stored or ""
        return self._stored_cache[table]

    def _per_table(self, table: str, mapping: dict):
        """Exact-name lookup with a case-insensitive fallback (so a TOML
        spec's spelling matches the engine's folded catalog name);
        returns ``_MISSING`` when the table has no entry — ``None`` is a
        legitimate stored value (override meaning 'disable')."""
        if table in mapping:
            return mapping[table]
        lowered = {k.lower(): v for k, v in mapping.items()}
        return lowered.get(table.lower(), _MISSING)

    def tables(self) -> list[str]:
        # base tables only — DatabaseMetaData's TABLE type filter excludes
        # views and system tables, mirroring the reference's relkind='r' /
        # BASE TABLE filters, dialect-agnostically
        from klepto_spark import jdbc as J
        return J.list_tables(self.spark, self.dsn)

    def columns(self, table: str) -> list[str]:
        if table not in self._columns_cache:
            self._columns_cache[table] = self.load(table).columns
        return self._columns_cache[table]

    def apply_read_overrides(self, spec) -> None:
        """Adopt per-table read tuning from a pipeline Spec
        (TableSpec.partition_column / read_partitions); called by the
        steal engine so TOML users steer the parallel scan without
        touching catalog construction."""
        for t in getattr(spec, "tables", []):
            col = getattr(t, "partition_column", None)
            if col is not None:
                # "" disables partitioning for the table explicitly
                self.partition_overrides[t.name] = col or None
            n = getattr(t, "read_partitions", None)
            if n:
                # per-table, NOT a catalog-wide default: the first
                # table's tuning must not leak into other tables'
                # scans (ADVICE r09 medium)
                self.partition_counts[t.name] = int(n)
            mode = getattr(t, "stride_mode", None)
            if mode:
                self.stride_modes[t.name] = mode

    def _partition_options(self, table: str) -> dict:
        """``partitionColumn/lowerBound/upperBound/numPartitions`` for a
        parallel scan (plus a ``predicates`` list in histogram stride
        mode), or {} for the single-partition fallback. The min/max
        probe runs ONCE per table per catalog (cached) and is bounded by
        ``read_timeout`` like every other source statement.

        Partitioning is an OPTIMIZATION: any failure in the probe —
        quoted-identifier folds, a missing column, an unparsable bound —
        degrades to the single-partition read instead of failing the
        load (VERDICT r09 #1)."""
        if table in self._bounds_cache:
            return self._bounds_cache[table]
        try:
            opts = self._derive_partition_options(table)
        except Exception as exc:  # noqa: BLE001 — degrade, never fail a read
            import warnings
            warnings.warn(
                f"partition probe for table {table!r} failed "
                f"({type(exc).__name__}: {exc}); reading single-partition",
                stacklevel=2)
            opts = {}
        self._bounds_cache[table] = opts
        return opts

    def _derive_partition_options(self, table: str) -> dict:
        from klepto_spark import jdbc as J
        from klepto_spark.sinks.ddl import quote_ident
        col = self._per_table(table, self.partition_overrides)
        if col is _MISSING:
            col = J.partition_column(self.spark, self.dsn, table)
        elif col:
            # overrides come from TOML in the user's spelling — resolve
            # the stored case so the quoted identifier matches
            col = J.stored_column_name(
                self.spark, self.dsn, table, col) or col
        if not col:
            return {}
        # quote the STORED names (mixed-case tables / reserved-word
        # columns — the reference's own "OrderItems" fixture shape,
        # pkg/reader/postgres/reader.go:89-91). Spark interpolates both
        # the probe SQL and its generated WHERE clauses verbatim.
        qtable = quote_ident(self._stored(table) or table, self._dialect)
        qcol = quote_ident(col, self._dialect)
        mode = self._per_table(table, self.stride_modes)
        if mode is _MISSING:
            mode = self.stride_mode
        # auto mode needs COUNT(*) for its sparsity signal; it rides the
        # SAME probe statement, so auto pays one aggregate pass (the
        # COUNT forfeits the index-only MIN/MAX shortcut — that is the
        # explicit cost of asking for skew detection), never two
        n_rows = None
        if mode == "auto":
            rows = J.query_rows(
                self.spark, self.dsn,
                f"SELECT MIN({qcol}), MAX({qcol}), COUNT(*) FROM {qtable}",
                query_timeout=self.read_timeout)
            lo_s, hi_s, cnt_s = rows[0] if rows else (None, None, None)
            if cnt_s is not None:
                n_rows = int(cnt_s)
        else:
            rows = J.query_rows(
                self.spark, self.dsn,
                f"SELECT MIN({qcol}), MAX({qcol}) FROM {qtable}",
                query_timeout=self.read_timeout)
            lo_s, hi_s = rows[0] if rows else (None, None)
        if lo_s is None or hi_s is None or lo_s == hi_s:
            return {}
        cnt = self._per_table(table, self.partition_counts)
        n = int(cnt if cnt is not _MISSING else
                (self.read_partitions
                 or self.spark.sparkContext.defaultParallelism))
        # cap at the key range: Spark's columnPartition silently
        # reduces numPartitions to (upper - lower) when the range
        # is narrower — capping here keeps the requested count
        # and the actual count identical (and avoids empty range
        # slices, each of which still opens a connection)
        lo = hi = None
        try:
            lo, hi = int(lo_s), int(hi_s)
        except ValueError:
            # a scale-0 DECIMAL pk can render with a decimal point
            # ("1.00", driver-dependent): parse through Decimal —
            # truncation is exact at scale 0, and Spark's partition
            # clauses only need COVERING integer bounds (ADVICE r09)
            from decimal import Decimal, InvalidOperation
            try:
                lo, hi = int(Decimal(lo_s)), int(Decimal(hi_s))
            except (InvalidOperation, ValueError):
                pass
        if lo is not None:
            n = max(1, min(n, hi - lo))
            lo_s, hi_s = str(lo), str(hi)
        else:
            # DATE/TIMESTAMP bounds pass through as the driver's
            # ISO strings (Spark parses them for temporal
            # partition columns); cap by day span so a same-day
            # range never fans out into empty slices
            import datetime as _dt
            try:
                span = (_dt.date.fromisoformat(hi_s[:10])
                        - _dt.date.fromisoformat(lo_s[:10])).days
                n = max(1, min(n, max(1, span)))
            except ValueError:
                # neither integral nor temporal: Spark cannot range-
                # partition on it — single-partition fallback
                return {}
        if n <= 1:
            return {}
        if mode == "auto":
            # sparsity signal (VERDICT r10 #5): a dense uniform key has
            # span ~= COUNT(*), so uniform strides are row-balanced and
            # the histogram probe would be a wasted table pass; id gaps
            # or a hot tail inflate span past the row count and uniform
            # strides go empty/overweight. 2x covers benign fragmentation
            # (a half-dense key is at worst 2x imbalanced) before paying
            # the GROUP-BY probe. Temporal keys stay uniform — the
            # bucket arithmetic is integral-only.
            mode = ("histogram"
                    if (lo is not None and n_rows
                        and hi - lo + 1 > _AUTO_SPARSITY_FACTOR * n_rows)
                    else "uniform")
        if mode == "histogram":
            if lo is not None:
                preds = self._histogram_predicates(qtable, qcol, lo, hi, n)
                if preds:
                    return {"predicates": preds, "partitionColumn": col}
            else:
                # the bucket arithmetic is integral-only; say so instead
                # of silently leaving the user's skew mitigation off
                import warnings
                warnings.warn(
                    f"stride_mode='histogram' for table {table!r} needs "
                    f"an integral partition key; {col!r} is temporal — "
                    "using uniform day-span strides", stacklevel=3)
        return {"partitionColumn": qcol,
                "lowerBound": lo_s, "upperBound": hi_s,
                "numPartitions": str(n)}

    def _histogram_predicates(self, qtable: str, qcol: str,
                              lo: int, hi: int, n: int
                              ) -> list[str] | None:
        """Quantile range predicates from one GROUP-BY histogram probe.

        Uniform min/max strides assume a near-uniform key: a hot-tail or
        sparse PK (id gaps after deletes, epoch-ms keys with a dense
        recent window) yields empty and overweight range queries — AQE
        rebalances after the scan, but the scans themselves skew. One
        extra server-side aggregate (integer bucket = (col-lo)/w, plain
        SQL so Derby/MySQL/PG all run it) yields per-bucket counts;
        greedy merging cuts ~row-balanced ranges at bucket edges. Bucket
        width bounds the residual imbalance; 32 buckets per requested
        partition keeps it well under the 2× target while the probe
        result stays tiny (≤10k rows) regardless of table size."""
        from klepto_spark import jdbc as J
        span = hi - lo
        if span <= 0 or n <= 1 or span > (1 << 62):
            return None
        nb = min(10_000, max(256, 32 * n))
        w = span // nb + 1
        # FLOOR() because `/` is integer division on Derby/PG but true
        # division on MySQL; the result renders as a double on some
        # drivers ("3.0"), hence the Decimal parse
        from decimal import Decimal
        # derived table because Derby only binds plain column refs in
        # GROUP BY — grouping by the subquery's alias works everywhere
        rows = J.query_rows(
            self.spark, self.dsn,
            f"SELECT bkt, COUNT(*) FROM (SELECT "
            f"FLOOR(({qcol} - {lo}) / {w}) AS bkt FROM {qtable}) AS kb "
            f"GROUP BY bkt",
            query_timeout=self.read_timeout)
        counts = sorted((int(Decimal(b)), int(c))
                        for b, c in rows if b is not None)
        total = sum(c for _, c in counts)
        if total == 0 or len(counts) < 2:
            return None
        # greedy: cut at a bucket edge once the running partition reaches
        # its fair share of the REMAINING rows (re-targeting each cut
        # absorbs rounding instead of starving the last partition)
        bounds: list[int] = []
        acc, remaining, parts_left = 0, total, n
        for i, (b, c) in enumerate(counts):
            acc += c
            if (len(bounds) < n - 1 and i < len(counts) - 1
                    and acc >= remaining / parts_left):
                bounds.append(lo + (b + 1) * w)
                remaining -= acc
                acc, parts_left = 0, parts_left - 1
        if not bounds:
            return None
        preds = [f"{qcol} < {bounds[0]} OR {qcol} IS NULL"]
        preds += [f"{qcol} >= {a} AND {qcol} < {b}"
                  for a, b in zip(bounds, bounds[1:])]
        preds.append(f"{qcol} >= {bounds[-1]}")
        return preds

    def load(self, table: str) -> DataFrame:
        from klepto_spark.sinks.ddl import quote_ident
        opts = self._partition_options(table)
        # quote the stored-case table name whenever metadata resolves
        # one — a mixed-case table reads correctly both partitioned and
        # not; schema-qualified / subquery dbtables pass through raw
        stored = self._stored(table)
        dbtable = quote_ident(stored, self._dialect) if stored else table
        if "predicates" in opts:
            props = {"fetchsize": str(self.fetchsize),
                     "queryTimeout": str(self.read_timeout)}
            if self.dsn.username:
                props["user"] = self.dsn.username
                props["password"] = self.dsn.password
            return self.spark.read.jdbc(
                url=self.url, table=dbtable,
                predicates=list(opts["predicates"]), properties=props)
        reader = (self.spark.read.format("jdbc")
                  .option("url", self.url)
                  .option("dbtable", dbtable)
                  .option("queryTimeout", str(self.read_timeout))
                  .option("fetchsize", str(self.fetchsize)))
        for k, v in opts.items():
            reader = reader.option(k, v)
        if self.dsn.username:
            reader = (reader.option("user", self.dsn.username)
                      .option("password", self.dsn.password))
        return reader.load()

    def structure(self, include_comments: bool = False) -> str:
        """Native DDL with constraint fidelity (PK/FK/defaults/indexes)
        captured through the connection — SHOW CREATE TABLE on mysql,
        DatabaseMetaData assembly elsewhere; falls back to schema-derived
        DDL if the driver lacks metadata support. Views are appended as
        CREATE VIEW text while staying excluded from :meth:`tables` (and
        therefore from data dumps) — the reference captures view DDL the
        same one-sided way (SURVEY §4.3.7).

        pg_dump parity (reference pg_dump.go:36-41): extensions first
        (table DDL may reference their types), then collations + types
        (enums + domains — columns reference them), then non-trigger
        functions/procedures (DEFAULTs and views may call them), then
        sequences (``DEFAULT nextval(...)`` needs them) with ownership +
        position, then tables, then CHECK constraints + views +
        materialized views + rewrite rules + RLS policies + trigger
        functions/triggers. Comments are OFF by default — the reference
        passes ``--no-comments`` — and opt-in via
        ``include_comments=True``."""
        from klepto_spark import jdbc as J
        from klepto_spark.sinks.ddl import create_table_sql
        parts = []
        seq_pre, seq_post = J.split_sequence_statements(
            J.sequence_ddl(self.spark, self.dsn))
        for stmts in (J.extension_ddl(self.spark, self.dsn),
                      J.collation_ddl(self.spark, self.dsn),
                      J.enum_ddl(self.spark, self.dsn),
                      J.domain_ddl(self.spark, self.dsn),
                      J.function_ddl(self.spark, self.dsn), seq_pre):
            if stmts:
                parts.append("\n".join(stmts))
        for t in self.tables():
            try:
                parts.append(J.native_ddl(self.spark, self.dsn, t))
            except Exception:  # noqa: BLE001 — driver-specific metadata gaps
                parts.append(create_table_sql(t, self.load(t).schema))
        for stmts in (seq_post,
                      J.check_constraint_ddl(self.spark, self.dsn)):
            if stmts:
                parts.append("\n".join(stmts))
        for v in J.list_views(self.spark, self.dsn):
            try:
                parts.append(J.view_ddl(self.spark, self.dsn, v))
            except Exception:  # noqa: BLE001 — dialect without view-text SQL
                pass
        mviews = J.matview_ddl(self.spark, self.dsn)
        if mviews:
            parts.append("\n".join(mviews))
        for stmts in (J.rule_ddl(self.spark, self.dsn),
                      J.policy_ddl(self.spark, self.dsn)):
            if stmts:
                parts.append("\n".join(stmts))
        trig = J.trigger_ddl(self.spark, self.dsn)
        if trig:
            parts.append("\n".join(trig))
        if include_comments:
            stmts = J.comment_ddl(self.spark, self.dsn)
            if stmts:
                parts.append("\n".join(stmts))
        return "\n\n".join(parts)


def connect(spark: SparkSession, dsn_str: str, row_mode: str = "strict"):
    """Reader factory routed by DSN scheme
    (reference: pkg/reader/reader.go:99-115). ``row_mode`` is the
    row-level error policy for file sources (see FileCatalog)."""
    kind, fmt, dsn = route(dsn_str)
    if kind == "files":
        return FileCatalog(spark, file_path(dsn), fmt, row_mode=row_mode)
    if kind == "jdbc":
        return JdbcCatalog(spark, dsn)
    raise DSNError(f"scheme {dsn.type!r} is not a readable source")
