"""DDL generation from Spark schemas.

The reference captures DDL as opaque SQL text from the source DB
(reference: pkg/reader/mysql/reader.go:84-111 SHOW CREATE TABLE;
pkg/reader/postgres/pg_dump.go:32-59 pg_dump --schema-only). Spark schemas
are first-class (StructType), so we *generate* the CREATE TABLE text
instead — per dialect, since type names differ.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, ByteType, DataType, DateType,
    DecimalType, DoubleType, FloatType, IntegerType, LongType, MapType,
    ShortType, StringType, StructType, TimestampNTZType, TimestampType,
)

_BASE = {
    ByteType: "TINYINT", ShortType: "SMALLINT", IntegerType: "INTEGER",
    LongType: "BIGINT", FloatType: "REAL", DoubleType: "DOUBLE",
    BooleanType: "BOOLEAN", BinaryType: "BLOB", DateType: "DATE",
    TimestampType: "TIMESTAMP", TimestampNTZType: "TIMESTAMP",
}

_DIALECT_OVERRIDES = {
    "mysql": {StringType: "TEXT", BinaryType: "BLOB", DoubleType: "DOUBLE"},
    "postgres": {StringType: "TEXT", BinaryType: "BYTEA",
                 DoubleType: "DOUBLE PRECISION", TimestampType: "TIMESTAMP"},
    "ansi": {StringType: "VARCHAR", BinaryType: "VARBINARY",
             DoubleType: "DOUBLE PRECISION"},
}

_QUOTE = {"mysql": "`", "postgres": '"', "ansi": '"'}


def sql_type(dt: DataType, dialect: str = "ansi") -> str:
    overrides = _DIALECT_OVERRIDES[dialect]
    for klass, name in overrides.items():
        if isinstance(dt, klass):
            return name
    if isinstance(dt, DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, StringType):
        return "TEXT"
    if isinstance(dt, ArrayType):
        if dialect == "postgres":
            return sql_type(dt.elementType, dialect) + "[]"
        return "JSON"  # portable fallback for nested data
    if isinstance(dt, (MapType, StructType)):
        return "JSON"
    for klass, name in _BASE.items():
        if isinstance(dt, klass):
            return name
    raise ValueError(f"no SQL mapping for Spark type {dt.simpleString()}")


def quote_ident(name: str, dialect: str = "ansi") -> str:
    """Identifier quoting incl. escape doubling
    (reference: pkg/reader/mysql/reader.go:114-116 backticks,
    pkg/reader/postgres/reader.go:89-91 double quotes)."""
    q = _QUOTE[dialect]
    return q + name.replace(q, q + q) + q


def create_table_sql(table: str, schema: StructType,
                     dialect: str = "ansi") -> str:
    cols = ",\n".join(
        f"  {quote_ident(f.name, dialect)} {sql_type(f.dataType, dialect)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields)
    return f"CREATE TABLE {quote_ident(table, dialect)} (\n{cols}\n);"
