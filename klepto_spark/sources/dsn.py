"""DSN parsing and driver routing.

Mirrors the reference's DSN grammar (reference: pkg/dsn/dsn.go:27-83):
``type://[user[:pass]@][protocol[(address)]][host:port][/datasource][?params]``
routed to a reader/dumper driver registry (pkg/reader/driver.go:15-23,
pkg/dumper/driver.go:15-40). Spark mapping: the scheme selects a
``spark.read``/``df.write`` format + options.

Supported schemes:
- ``parquet|orc|csv|json://<directory>`` — file catalogs over a table-per-file
  layout (the engine's native path)
- ``mysql|postgres://…``             — JDBC (gated: needs driver jars)
- ``os://stdout|stderr`` / ``file://<path>`` — SQL-text sink targets
  (pkg/dumper/query/writer.go:11-33)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs


@dataclass
class DSN:
    type: str
    username: str = ""
    password: str = ""
    host: str = ""
    port: str = ""
    address: str = ""
    data_source: str = ""
    params: dict[str, str] = field(default_factory=dict)


_DSN_RE = re.compile(
    r"^(?P<type>[\w.]+)://"
    r"(?:(?P<username>[^:@/]+)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<address>[^/?]*)"
    r"(?:/(?P<data_source>[^?]*))?"
    r"(?:\?(?P<params>.*))?$")


class DSNError(ValueError):
    pass


def parse(s: str) -> DSN:
    """Parse a DSN string; raises DSNError on empty/invalid input
    (reference: pkg/dsn/dsn_test.go:39-85 error cases)."""
    if not s:
        raise DSNError("empty dsn")
    m = _DSN_RE.match(s)
    if not m or not m.group("type"):
        raise DSNError(f"invalid dsn: {s!r}")
    g = m.groupdict(default="")
    params = {k: ",".join(v) for k, v in parse_qs(g["params"]).items()}
    dsn = DSN(type=g["type"], username=g["username"], password=g["password"],
              address=g["address"], data_source=g["data_source"], params=params)
    if ":" in dsn.address:
        dsn.host, dsn.port = dsn.address.rsplit(":", 1)
    return dsn


# scheme -> (kind, spark format); kind: 'files' | 'jdbc' | 'text'
SCHEMES: dict[str, tuple[str, str]] = {
    "parquet": ("files", "parquet"),
    "orc": ("files", "orc"),
    "csv": ("files", "csv"),
    "json": ("files", "json"),
    "mysql": ("jdbc", "jdbc"),
    "postgres": ("jdbc", "jdbc"),
    # embedded Derby ships with Spark itself (the Hive-metastore engine),
    # so the JDBC paths are exercisable without external services
    "derby": ("jdbc", "jdbc"),
    "os": ("text", ""),
    "file": ("text", ""),
    # streaming transport (gated: the Kafka connector jar is not bundled
    # with pyspark — see streaming/kafka.py)
    "kafka": ("stream", "kafka"),
}


def file_path(dsn: DSN) -> str:
    """Directory for a files-kind DSN: ``parquet:///abs/path`` parses with
    an empty address and 'abs/path' as data_source — reassemble the
    absolute path; ``parquet://rel/path`` keeps the relative form."""
    if dsn.address:
        return dsn.address + ("/" + dsn.data_source if dsn.data_source else "")
    return "/" + dsn.data_source


def jdbc_url(dsn: DSN) -> str:
    """JDBC url + credential options for mysql/postgres/derby DSNs
    (reference connection setup: pkg/reader/mysql/mysql.go:14-35,
    pkg/reader/postgres/postgres.go:15-36)."""
    if dsn.type == "derby":
        # derby:///abs/path/db?create=true -> jdbc:derby:/abs/path/db;create=true
        path = file_path(dsn)
        opts = "".join(f";{k}={v}" for k, v in dsn.params.items())
        return f"jdbc:derby:{path}{opts}"
    driver = {"mysql": "mysql", "postgres": "postgresql"}[dsn.type]
    return f"jdbc:{driver}://{dsn.address}/{dsn.data_source}"


def route(s: str) -> tuple[str, str, DSN]:
    """(kind, spark_format, parsed) for a DSN; raises on unknown scheme
    (reference: pkg/dumper/dumper.go unknown-driver error)."""
    dsn = parse(s)
    if dsn.type not in SCHEMES:
        raise DSNError(f"unknown driver scheme: {dsn.type!r}")
    kind, fmt = SCHEMES[dsn.type]
    return kind, fmt, dsn
