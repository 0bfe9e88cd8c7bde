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


class FileCatalog:
    """Directory-of-files catalog (parquet/csv/json)."""

    def __init__(self, spark: SparkSession, directory: str, fmt: str = "parquet"):
        self.spark = spark
        self.directory = Path(directory)
        self.fmt = fmt
        self._columns_cache: dict[str, list[str]] = {}

    def tables(self) -> list[str]:
        return sorted(p.stem for p in self.directory.glob(f"*.{self.fmt}"))

    def columns(self, table: str) -> list[str]:
        if table not in self._columns_cache:
            self._columns_cache[table] = self.load(table).columns
        return self._columns_cache[table]

    def load(self, table: str) -> DataFrame:
        from klepto_spark.session import ensure_nanos_conf, normalise_nanos_ts
        ensure_nanos_conf(self.spark)
        reader = self.spark.read.format(self.fmt)
        if self.fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = reader.load(str(self.directory / f"{table}.{self.fmt}"))
        # normalise nanosecond timestamps read as long (see session.py)
        return normalise_nanos_ts(df)

    def structure(self) -> str:
        """Whole-catalog DDL text (reference GetStructure)."""
        from klepto_spark.sinks.ddl import create_table_sql
        return "\n\n".join(
            create_table_sql(t, self.load(t).schema) for t in self.tables())


class JdbcCatalog:
    """JDBC catalog; usable when a JDBC driver jar is on the Spark
    classpath (not bundled in this container — constructor raises cleanly
    otherwise, keeping the dependency gated)."""

    def __init__(self, spark: SparkSession, dsn: DSN):
        self.spark = spark
        self.dsn = dsn
        self.url = jdbc_url(dsn)
        self._columns_cache: dict[str, list[str]] = {}

    def _read(self, query: str) -> DataFrame:
        return (self.spark.read.format("jdbc")
                .option("url", self.url)
                .option("user", self.dsn.username)
                .option("password", self.dsn.password)
                .option("query", query)
                .load())

    def tables(self) -> list[str]:
        # base tables only — views are excluded, mirroring the reference
        # (pg relkind='r' / mysql BASE TABLE filters)
        q = ("SELECT table_name FROM information_schema.tables "
             "WHERE table_type = 'BASE TABLE' "
             "AND table_schema NOT IN ('information_schema', 'pg_catalog', "
             "'mysql', 'performance_schema', 'sys')")
        return sorted(r[0] for r in self._read(q).collect())

    def columns(self, table: str) -> list[str]:
        if table not in self._columns_cache:
            self._columns_cache[table] = self.load(table).columns
        return self._columns_cache[table]

    def load(self, table: str) -> DataFrame:
        return (self.spark.read.format("jdbc")
                .option("url", self.url)
                .option("user", self.dsn.username)
                .option("password", self.dsn.password)
                .option("dbtable", table)
                .load())

    def structure(self) -> str:
        from klepto_spark.sinks.ddl import create_table_sql
        return "\n\n".join(
            create_table_sql(t, self.load(t).schema) for t in self.tables())


def connect(spark: SparkSession, dsn_str: str):
    """Reader factory routed by DSN scheme
    (reference: pkg/reader/reader.go:99-115)."""
    kind, fmt, dsn = route(dsn_str)
    if kind == "files":
        return FileCatalog(spark, file_path(dsn), fmt)
    if kind == "jdbc":
        return JdbcCatalog(spark, dsn)
    raise DSNError(f"scheme {dsn.type!r} is not a readable source")
