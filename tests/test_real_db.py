"""Real MySQL / Postgres end-to-end, gated on TEST_MYSQL_URL /
TEST_POSTGRES_URL (mirroring the reference's TEST_MYSQL / TEST_POSTGRES
gates, features/mysql_test.go:64-70; services recipe in
docker-compose.test.yml). Skips cleanly when the env var or the driver
jar is absent, so the default suite never needs a network.

These are the dialect-specific statements embedded Derby cannot reach:
SHOW CREATE TABLE / SHOW CREATE VIEW (mysql), RENAME TABLE vs
ALTER TABLE .. RENAME in the staging swap, FOREIGN_KEY_CHECKS vs
DISABLE TRIGGER ALL hooks, and the pg_catalog.pg_constraint FK cycle.
The oracle is the reference's own (features/mysql_test.go:122-212):
source ≡ target row and column counts after a steal, with anonymisation
applied.
"""

import os

import pytest

from klepto_spark import jdbc as J
from klepto_spark.config import Spec, TableSpec
from klepto_spark.engine import steal
from klepto_spark.sinks.writers import JdbcHooks, write_jdbc
from klepto_spark.sources.catalog import JdbcCatalog
from klepto_spark.sources.dsn import parse

_DRIVER_CLASS = {"mysql": "com.mysql.cj.jdbc.Driver",
                 "postgres": "org.postgresql.Driver"}
_ENV = {"mysql": "TEST_MYSQL_URL", "postgres": "TEST_POSTGRES_URL"}

# original fixture (shape mirrors the reference's fixtures/mysql_simple.sql:
# a parent table, an FK child, and nullable + typed columns)
_FIXTURE = {
    "members": ("CREATE TABLE members ("
                " id INT PRIMARY KEY NOT NULL,"
                " full_name VARCHAR(60) NOT NULL,"
                " email VARCHAR(120) NOT NULL,"
                " active {bool} NOT NULL,"
                " created_at TIMESTAMP {ts_default})"),
    "purchases": ("CREATE TABLE purchases ("
                  " id INT PRIMARY KEY NOT NULL,"
                  " member_id INT NOT NULL,"
                  " amount DECIMAL(8,2) NOT NULL,"
                  " CONSTRAINT fk_member FOREIGN KEY (member_id)"
                  " REFERENCES members (id))"),
}
_ROWS = [
    "INSERT INTO members VALUES (1, 'Nia Okafor', 'nia@example.test', {t}, {now})",
    "INSERT INTO members VALUES (2, 'Leo Brandt', 'leo@example.test', {t}, {now})",
    "INSERT INTO members VALUES (3, 'Mae Chen', 'mae@example.test', {f}, {now})",
    "INSERT INTO purchases VALUES (10, 1, 19.99)",
    "INSERT INTO purchases VALUES (11, 1, 5.25)",
    "INSERT INTO purchases VALUES (12, 2, 100.00)",
]


def _url(dialect: str) -> str | None:
    return os.environ.get(_ENV[dialect])


def _gate(spark, dialect: str):
    url = _url(dialect)
    if not url:
        pytest.skip(f"{_ENV[dialect]} not set (see docker-compose.test.yml)")
    try:
        spark._sc._jvm.java.lang.Class.forName(_DRIVER_CLASS[dialect])
    except Exception:  # noqa: BLE001
        pytest.skip(f"{_DRIVER_CLASS[dialect]} not on the Spark classpath "
                    "(set SPARK_GRAFT_EXTRA_JARS)")
    return parse(url)


def _dialect_sql(dialect: str):
    if dialect == "mysql":
        return {"bool": "TINYINT(1)", "ts_default": "NULL",
                "t": "1", "f": "0", "now": "NOW()"}
    return {"bool": "BOOLEAN", "ts_default": "NULL",
            "t": "TRUE", "f": "FALSE", "now": "NOW()"}


def _setup_fixture(spark, dsn, dialect: str):
    subst = _dialect_sql(dialect)
    for t in ("purchases", "members"):  # FK order for drops
        try:
            J.execute(spark, dsn, [f"DROP TABLE {t}"], transactional=False)
        except Exception:  # noqa: BLE001
            pass
    stmts = [_FIXTURE["members"].format(**subst),
             _FIXTURE["purchases"].format(**subst)]
    stmts += [r.format(**subst) for r in _ROWS]
    J.execute(spark, dsn, stmts, transactional=False)


def _target_dsn_url(url: str, dbname: str) -> str:
    base, _ = url.rsplit("/", 1)
    return f"{base}/{dbname}"


@pytest.mark.parametrize("dialect", ["mysql", "postgres"])
def test_real_db_steal_roundtrip(spark, dialect):
    """Full steal: real source DB -> anonymise -> real target DB, twice
    (the second run exercises the overwrite-existing staging swap:
    RENAME TABLE on mysql, ALTER TABLE .. RENAME on postgres)."""
    dsn = _gate(spark, dialect)
    _setup_fixture(spark, dsn, dialect)
    src_url = _url(dialect)

    # a sibling database on the same server receives the copy
    if dialect == "mysql":
        J.execute(spark, dsn, ["CREATE DATABASE IF NOT EXISTS klepto_target"],
                  transactional=False)
    else:
        try:
            J.execute(spark, dsn, ["CREATE DATABASE klepto_target"],
                      transactional=False)
        except Exception:  # noqa: BLE001 — already exists
            pass
    tgt_url = _target_dsn_url(src_url, "klepto_target")
    tgt_dsn = parse(tgt_url)
    for t in ("purchases", "members"):
        try:
            J.execute(spark, tgt_dsn, [f"DROP TABLE {t}"],
                      transactional=False)
        except Exception:  # noqa: BLE001
            pass

    cat = JdbcCatalog(spark, dsn)
    tables = {t.lower() for t in cat.tables()}
    assert {"members", "purchases"} <= tables

    # dialect DDL capture: SHOW CREATE TABLE on mysql (ENGINE= marker),
    # DatabaseMetaData assembly elsewhere — FK text present on both
    ddl = cat.structure().upper()
    assert "FOREIGN KEY" in ddl or "FK_MEMBER" in ddl
    if dialect == "mysql":
        assert "ENGINE=" in ddl  # only SHOW CREATE TABLE emits this

    spec = Spec(tables=[TableSpec(name="members",
                                  anonymise={"email": "EmailAddress"})])
    for _ in range(2):  # second pass = overwrite-existing rename path
        report = steal(spec, cat, tgt_url, concurrency=2)
        assert report.ok

    out = JdbcCatalog(spark, tgt_dsn)
    for t in cat.tables():
        src_df, dst_df = cat.load(t), out.load(t)
        assert dst_df.count() == src_df.count()
        assert [c.lower() for c in dst_df.columns] == \
            [c.lower() for c in src_df.columns]
    src_mail = {r[0] for r in cat.load("members").select("email").collect()}
    dst_mail = {r[0] for r in out.load("members").select("email").collect()}
    assert src_mail.isdisjoint(dst_mail)


@pytest.mark.parametrize("dialect", ["mysql", "postgres"])
def test_real_db_constraint_hooks(spark, dialect):
    """The dialect constraint hooks execute for real: FOREIGN_KEY_CHECKS
    toggling on mysql, DISABLE/ENABLE TRIGGER ALL on postgres — around an
    overwrite of the FK'd child table."""
    dsn = _gate(spark, dialect)
    _setup_fixture(spark, dsn, dialect)
    cat = JdbcCatalog(spark, dsn)
    df = cat.load("purchases")
    hooks = JdbcHooks.suspend_constraints(dialect, "purchases")
    write_jdbc(df, dsn, "purchases_copy", mode="overwrite", hooks=hooks)
    assert JdbcCatalog(spark, dsn).load("purchases_copy").count() == 3
    J.execute(spark, dsn, ["DROP TABLE purchases_copy"], transactional=False)


def test_real_db_pg_fk_cycle(spark):
    """RDS fallback on real postgres: FKs saved from
    pg_catalog.pg_constraint (pg_get_constraintdef fidelity), dropped
    pre-load, re-added post-load — and present again afterwards."""
    dsn = _gate(spark, "postgres")
    _setup_fixture(spark, dsn, "postgres")
    hooks = JdbcHooks.rds_fk_cycle(spark, dsn, "purchases")
    assert hooks.pre_once and "DROP CONSTRAINT" in hooks.pre_once[0]
    assert "ADD CONSTRAINT" in hooks.post[0]
    assert "REFERENCES" in hooks.post[0].upper()

    extra = spark.createDataFrame([(13, 3, 7.50)],
                                  "id int, member_id int, amount double")
    write_jdbc(extra, dsn, "purchases", mode="append", atomic=True,
               hooks=hooks)
    back = J.query_rows(spark, dsn, """
SELECT conname FROM pg_catalog.pg_constraint
WHERE contype = 'f' AND conrelid = 'purchases'::regclass""")
    assert [r[0] for r in back] == ["fk_member"]


def test_real_db_mysql_view_ddl(spark):
    """SHOW CREATE VIEW path: views appear in structure(), never in
    tables()."""
    dsn = _gate(spark, "mysql")
    _setup_fixture(spark, dsn, "mysql")
    try:
        J.execute(spark, dsn, [
            "CREATE OR REPLACE VIEW big_spenders AS "
            "SELECT member_id, SUM(amount) AS total FROM purchases "
            "GROUP BY member_id"], transactional=False)
        cat = JdbcCatalog(spark, dsn)
        assert "big_spenders" not in {t.lower() for t in cat.tables()}
        ddl = cat.structure().upper()
        assert "CREATE" in ddl and "BIG_SPENDERS" in ddl
    finally:
        J.execute(spark, dsn, ["DROP VIEW IF EXISTS big_spenders"],
                  transactional=False)


def test_fixture_helpers_are_wellformed():
    """The gated suite's helpers must not rot while the gate is closed:
    dialect substitutions cover every placeholder, generated statements
    parse-shape sanely, and the target-DSN rewrite keeps credentials."""
    for dialect in ("mysql", "postgres"):
        subst = _dialect_sql(dialect)
        stmts = [_FIXTURE["members"].format(**subst),
                 _FIXTURE["purchases"].format(**subst)]
        stmts += [r.format(**subst) for r in _ROWS]
        assert all("{" not in s for s in stmts), dialect
        assert stmts[0].startswith("CREATE TABLE members")
        assert "FOREIGN KEY" in stmts[1]
        assert sum(s.startswith("INSERT") for s in stmts) == 6
    out = _target_dsn_url("postgres://u:p@h:5432/test", "klepto_target")
    assert out == "postgres://u:p@h:5432/klepto_target"
