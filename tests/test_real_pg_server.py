"""Real PostgreSQL end-to-end over an in-process server.

The JDBC transport needs a driver jar this environment cannot fetch, but
the server binaries (initdb/pg_ctl/psql) ARE present — so this suite
boots a throwaway socket-only PostgreSQL and executes the ENGINE'S OWN
generated statement text against the real dialect: the SQL-text dump
(DDL + INSERT literals, reference pkg/dumper/query/dumper.go:36-163),
the staging-swap rename, the trigger-suspension hooks
(pkg/dumper/postgres/dumper.go:81-145), and the pg_catalog FK
drop/re-add cycle (dumper.go:95-120). These are exactly the statements
embedded Derby cannot validate; a syntax or semantics divergence from
real Postgres fails HERE instead of on a user's database.

Skips cleanly when the server binaries or a runnable system user are
absent.
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import tempfile

import pytest

PG_PORT = "54329"


def _run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


@pytest.fixture(scope="module")
def pg():
    """Boot a socket-only PostgreSQL; yield a psql runner
    ``sql(text) -> str`` (rows as pipe-separated lines, errors raise)."""
    for tool in ("initdb", "pg_ctl", "psql"):
        if not shutil.which(tool):
            pytest.skip(f"{tool} not installed")
    if os.geteuid() == 0:
        # postgres refuses to start as root; run the server as the
        # postgres system user (present on Debian-family images)
        try:
            pwd.getpwnam("postgres")
        except KeyError:
            pytest.skip("running as root and no postgres system user")
        def server(cmd: str) -> subprocess.CompletedProcess:
            return _run(["su", "postgres", "-s", "/bin/sh", "-c", cmd])
    else:
        def server(cmd: str) -> subprocess.CompletedProcess:
            return _run(["/bin/sh", "-c", cmd])

    base = tempfile.mkdtemp(prefix="kspg_", dir="/tmp")
    os.chmod(base, 0o777)  # the server user must create data/ and the socket
    data, sock = f"{base}/data", f"{base}/sock"
    os.mkdir(sock)
    os.chmod(sock, 0o777)
    try:
        r = server(f"initdb -D {data} -A trust -U postgres")
        if r.returncode:
            pytest.skip(f"initdb failed: {r.stderr.strip()[:200]}")
        r = server(
            f"pg_ctl -D {data} -w -l {base}/log "
            f"-o \"-k {sock} -p {PG_PORT} -c listen_addresses=''\" start")
        if r.returncode:
            pytest.skip(f"pg_ctl start failed: {r.stderr.strip()[:200]}")

        def sql(text: str, check: bool = True, db: str = "postgres") -> str:
            p = _run(["psql", "-h", sock, "-p", PG_PORT, "-U", "postgres",
                      "-d", db,
                      "-X", "-A", "-t", "-v", "ON_ERROR_STOP=1",
                      "-c", text])
            if check and p.returncode:
                raise RuntimeError(p.stderr.strip())
            if not check and p.returncode:
                return f"ERROR: {p.stderr.strip()}"
            return p.stdout.strip()

        yield sql
    finally:
        server(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(base, ignore_errors=True)


FIXTURE = [
    ("CREATE TABLE members ("
     " id INT PRIMARY KEY NOT NULL,"
     " full_name VARCHAR(60) NOT NULL,"
     " active BOOLEAN NOT NULL)"),
    ("CREATE TABLE purchases ("
     " id INT PRIMARY KEY NOT NULL,"
     " member_id INT NOT NULL,"
     " amount DECIMAL(8,2) NOT NULL,"
     " CONSTRAINT fk_member FOREIGN KEY (member_id)"
     " REFERENCES members (id) ON DELETE CASCADE)"),
    "INSERT INTO members VALUES (1, 'Nia Okafor', TRUE)",
    "INSERT INTO members VALUES (2, 'Leo Brandt', FALSE)",
    "INSERT INTO purchases VALUES (10, 1, 19.99)",
    "INSERT INTO purchases VALUES (11, 2, 100.00)",
]


@pytest.fixture()
def fixture_tables(pg):
    pg("DROP TABLE IF EXISTS purchases, members CASCADE")
    for stmt in FIXTURE:
        pg(stmt)
    yield
    pg("DROP TABLE IF EXISTS purchases, members CASCADE")


def test_sqltext_dump_replays_into_real_postgres(spark, sf_dir, pg):
    """The postgres-dialect SQL-text dump of an anonymised table must
    replay verbatim into real PostgreSQL with every row intact — the
    reference's dump-restore-compare oracle (features/mysql_test.go:
    122-212) pointed at the real target dialect."""
    from klepto_spark.config import TableSpec
    from klepto_spark.operators.pipeline import build_table_df, parquet_loader
    from klepto_spark.sinks.sqltext import iter_statements

    df = build_table_df(
        TableSpec(name="customer",
                  anonymise={"c_name": "FullName",
                             "c_acctbal": "literal:0"}),
        parquet_loader(spark, sf_dir)).limit(40).cache()
    pg('DROP TABLE IF EXISTS "customer" CASCADE')
    for stmt in iter_statements(df, "customer", dialect="postgres"):
        pg(stmt)
    assert int(pg('SELECT count(*) FROM "customer"')) == df.count()
    want = {(r["c_custkey"], r["c_name"]) for r in df.collect()}
    got = {(int(k), n) for k, n in
           (line.split("|", 1) for line in
            pg('SELECT c_custkey, c_name FROM "customer"').splitlines())}
    assert got == want
    pg('DROP TABLE "customer"')


def test_sqltext_binary_bool_timestamp_literals(spark, pg):
    """Literal rendering for the awkward types against the real parser:
    bytea (X'..' is a bit-string to Postgres — the dialect emits \\x hex
    casts), booleans, timestamps, embedded quotes, and NULLs."""
    from klepto_spark.sinks.sqltext import iter_statements
    rows = [(1, bytearray(b"\x00\xffhi"), True, "O'Brien ''x''"),
            (2, None, None, None)]
    df = spark.createDataFrame(
        rows, "id int, blob binary, flag boolean, note string") \
        .selectExpr("id", "blob", "flag", "note",
                    "IF(id = 1, timestamp'2024-02-29 12:34:56', "
                    "CAST(NULL AS timestamp)) AS ts")
    pg('DROP TABLE IF EXISTS "oddtypes"')
    for stmt in iter_statements(df, "oddtypes", dialect="postgres"):
        pg(stmt)
    assert pg('SELECT encode(blob, \'hex\') FROM "oddtypes" '
              'WHERE id = 1') == "00ff6869"
    assert pg('SELECT flag, note, ts FROM "oddtypes" WHERE id = 1') == \
        "t|O'Brien ''x''|2024-02-29 12:34:56"
    assert pg('SELECT blob IS NULL, flag IS NULL, note IS NULL, ts IS NULL'
              ' FROM "oddtypes" WHERE id = 2') == "t|t|t|t"
    pg('DROP TABLE "oddtypes"')


def test_fk_cycle_statements_on_real_postgres(pg, fixture_tables):
    """The rds_fk_cycle statement pair executes against real pg_catalog:
    the collect query returns pg_get_constraintdef text, DROP CONSTRAINT
    actually suspends enforcement, and the re-ADD restores the original
    definition verbatim (ON DELETE CASCADE fidelity included)."""
    from klepto_spark.sinks.writers import JdbcHooks, pg_fk_defs_sql

    out = pg(pg_fk_defs_sql("purchases"))
    defs = [tuple(line.split("|", 1)) for line in out.splitlines()]
    assert [name for name, _ in defs] == ["fk_member"]
    assert "ON DELETE CASCADE" in defs[0][1]

    hooks = JdbcHooks.from_fk_defs("purchases", defs)
    for stmt in hooks.pre_once:
        pg(stmt)
    # FK gone: an orphan row loads (exactly what the bulk load needs)
    pg("INSERT INTO purchases VALUES (99, 12345, 1.00)")
    pg("DELETE FROM purchases WHERE id = 99")
    for stmt in hooks.post:
        pg(stmt)
    # restored identically, and enforcing again
    assert pg(pg_fk_defs_sql("purchases")) == out
    err = pg("INSERT INTO purchases VALUES (99, 12345, 1.00)", check=False)
    assert "violates foreign key" in err


def test_trigger_suspend_hooks_on_real_postgres(pg, fixture_tables):
    """DISABLE/ENABLE TRIGGER ALL hook text (the superuser path the
    reference uses, pkg/dumper/postgres/dumper.go:81-145) round-trips:
    suspended -> orphan insert allowed; restored -> rejected."""
    from klepto_spark.sinks.writers import JdbcHooks
    hooks = JdbcHooks.suspend_constraints("postgres", "purchases")
    for stmt in hooks.pre:
        pg(stmt)
    pg("INSERT INTO purchases VALUES (98, 54321, 2.00)")
    pg("DELETE FROM purchases WHERE id = 98")
    for stmt in hooks.post:
        pg(stmt)
    err = pg("INSERT INTO purchases VALUES (98, 54321, 2.00)", check=False)
    assert "violates foreign key" in err


def test_staging_swap_rename_on_real_postgres(pg):
    """The postgres staging-swap rename statement is real ALTER TABLE
    syntax and preserves data across the swap."""
    from klepto_spark.sinks.writers import STAGING_SUFFIX, _rename_sql
    pg("DROP TABLE IF EXISTS swap_t, swap_t" + STAGING_SUFFIX)
    pg(f"CREATE TABLE swap_t{STAGING_SUFFIX} (id INT)")
    pg(f"INSERT INTO swap_t{STAGING_SUFFIX} VALUES (7)")
    pg(_rename_sql("postgres", f"swap_t{STAGING_SUFFIX}", "swap_t"))
    assert pg("SELECT id FROM swap_t") == "7"
    pg("DROP TABLE swap_t")


def test_generated_create_table_ddl_on_real_postgres(spark, pg):
    """create_table_sql's postgres dialect must be accepted by the real
    parser for every mapped Spark type — including arrays (FLOAT[] for
    embeddings), decimals, binary->bytea, and quoted identifiers — and
    the created columns must round-trip a value of each type."""
    from klepto_spark.sinks.ddl import create_table_sql
    df = spark.createDataFrame(
        [], "id bigint, name string, ok boolean, bal decimal(18,2), "
            "f float, d double, blob binary, ts timestamp, "
            "emb array<float>, tags array<string>, `select` int")
    pg('DROP TABLE IF EXISTS "ddl_t"')
    pg(create_table_sql("ddl_t", df.schema, dialect="postgres"))
    pg('INSERT INTO "ddl_t" VALUES (1, '
       "'n', TRUE, 12.34, 1.5, 2.5, '\\x00ff'::bytea, "
       "'2024-02-29 12:34:56', ARRAY[0.1,0.2]::real[], "
       "ARRAY['a','b'], 9)")
    assert pg('SELECT id, ok, bal, emb[2], "select" FROM "ddl_t"') == \
        "1|t|12.34|0.2|9"
    pg('DROP TABLE "ddl_t"')


def _rows(text: str) -> list[tuple]:
    """psql -A -t output -> list of string tuples ('' for NULL)."""
    return [tuple(line.split("|")) for line in text.splitlines() if line]


def test_sequence_comment_extension_ddl_on_real_postgres(pg):
    """pg_dump-parity round-trip for the r06-flagged gaps: the SAME
    catalog SQL that jdbc.sequence_ddl/comment_ddl/extension_ddl run
    over JDBC executes here via psql against a live server, the
    rendered statements replay into a SECOND database on the same
    server, and the restored SERIAL-backed sequence continues ABOVE the
    source's last id — the collision a schema-only restore used to
    guarantee. Ownership restores too (dropping the table drops the
    sequence)."""
    from klepto_spark import jdbc as J

    for db in ("seqsrc", "seqdst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE TABLE posts (id SERIAL PRIMARY KEY, title TEXT)",
           db="seqsrc")
        pg("INSERT INTO posts (title) SELECT 'p' || g "
           "FROM generate_series(1, 7) g", db="seqsrc")
        pg("COMMENT ON TABLE posts IS 'user''s posts'", db="seqsrc")
        pg("COMMENT ON COLUMN posts.title IS 'headline'", db="seqsrc")

        seq_rows = _rows(pg(J.PG_SEQUENCES_SQL, db="seqsrc"))
        owner_rows = _rows(pg(J.PG_SEQUENCE_OWNERS_SQL, db="seqsrc"))
        # psql prints NULL as '' — normalise last_value like the reader
        seq_rows = [tuple(None if v == "" else v for v in r)
                    for r in seq_rows]
        stmts = J.pg_sequence_statements(seq_rows, owner_rows)
        assert any(s.startswith("CREATE SEQUENCE posts_id_seq")
                   for s in stmts)
        assert ("ALTER SEQUENCE posts_id_seq OWNED BY posts.id;"
                in stmts)
        assert any(s.startswith("SELECT setval('posts_id_seq', 7")
                   for s in stmts)

        # restore in pg_dump order: CREATE SEQUENCE + setval before the
        # table (DEFAULT nextval references it), OWNED BY after it
        pre, post = J.split_sequence_statements(stmts)
        bad = pg("CREATE TABLE posts (id INT NOT NULL "
                 "DEFAULT nextval('posts_id_seq'), title TEXT)",
                 db="seqdst", check=False)  # sequence must exist FIRST
        assert bad.startswith("ERROR")
        for s in pre:
            pg(s, db="seqdst")
        pg("CREATE TABLE posts (id INT NOT NULL "
           "DEFAULT nextval('posts_id_seq'), title TEXT)", db="seqdst")
        for s in post:
            pg(s, db="seqdst")
        pg("INSERT INTO posts (title) VALUES ('new')", db="seqdst")
        nxt = int(pg("SELECT max(id) FROM posts", db="seqdst"))
        assert nxt == 8, f"restored sequence did not continue at 8: {nxt}"
        # OWNED BY survives: dropping the table drops the sequence
        pg("DROP TABLE posts", db="seqdst")
        gone = pg("SELECT count(*) FROM pg_class "
                  "WHERE relname = 'posts_id_seq'", db="seqdst")
        assert gone == "0"

        # comments: catalog SQL + renderer replay, including the quote
        cstmts = J.pg_comment_statements(
            _rows(pg(J.PG_TABLE_COMMENTS_SQL, db="seqsrc")),
            _rows(pg(J.PG_COLUMN_COMMENTS_SQL, db="seqsrc")))
        assert "COMMENT ON TABLE posts IS 'user''s posts';" in cstmts
        assert "COMMENT ON COLUMN posts.title IS 'headline';" in cstmts
        pg("CREATE TABLE posts (id INT, title TEXT)", db="seqdst")
        for s in cstmts:
            pg(s, db="seqdst")
        back = pg("SELECT obj_description('posts'::regclass, 'pg_class')",
                  db="seqdst")
        assert back == "user's posts"

        # extensions: render + execute (plpgsql excluded, IF NOT EXISTS
        # makes replay idempotent)
        estmts = J.pg_extension_statements(
            _rows(pg(J.PG_EXTENSIONS_SQL, db="seqsrc")))
        assert all("plpgsql" not in s for s in estmts)
        for s in estmts:
            pg(s, db="seqdst")
    finally:
        for db in ("seqsrc", "seqdst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_serial_identity_structure_replay_without_collision(pg):
    """ADVICE r07 medium: the combined structure() restore for SERIAL and
    IDENTITY tables, replayed in structure()'s exact section order
    (sequences-pre, tables, sequences-post) against a real server. The
    table DDL comes from the same information_schema SQL + renderer the
    engine uses, where SERIAL arrives already decomposed — so the
    sequence CREATE never collides — and the identity column re-creates
    its own internal sequence, positioned by the post-routed setval."""
    from klepto_spark import jdbc as J

    for db in ("ssrc", "sdst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE TABLE posts (id SERIAL PRIMARY KEY, title TEXT)",
           db="ssrc")
        pg("CREATE TABLE orders (id BIGINT GENERATED BY DEFAULT AS "
           "IDENTITY PRIMARY KEY, note TEXT)", db="ssrc")
        pg("INSERT INTO posts (title) SELECT 'p' || g "
           "FROM generate_series(1, 7) g", db="ssrc")
        pg("INSERT INTO orders (note) SELECT 'o' || g "
           "FROM generate_series(1, 3) g", db="ssrc")

        seq_rows = [tuple(None if v == "" else v for v in r)
                    for r in _rows(pg(J.PG_SEQUENCES_SQL, db="ssrc"))]
        owner_rows = _rows(pg(J.PG_SEQUENCE_OWNERS_SQL, db="ssrc"))
        stmts = J.pg_sequence_statements(seq_rows, owner_rows)
        assert not any("orders_id_seq" in s for s in stmts
                       if s.startswith(("CREATE", "ALTER")))
        pre, post = J.split_sequence_statements(stmts)

        col_rows = [tuple(None if v == "" else v for v in r)
                    for r in _rows(pg(J.PG_COLUMNS_SQL, db="ssrc"))]
        tables = J.pg_create_table_statements(
            col_rows, _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="ssrc")))
        assert all("serial" not in t.lower() for t in tables)
        assert any("nextval('posts_id_seq'" in t for t in tables)
        assert any("GENERATED BY DEFAULT AS IDENTITY" in t
                   for t in tables)

        # the collision this fix removes: every statement must replay
        for s in pre + tables + post:
            pg(s, db="sdst")
        pg("INSERT INTO posts (title) VALUES ('new')", db="sdst")
        assert int(pg("SELECT max(id) FROM posts", db="sdst")) == 8
        pg("INSERT INTO orders (note) VALUES ('new')", db="sdst")
        assert int(pg("SELECT max(id) FROM orders", db="sdst")) == 4
    finally:
        for db in ("ssrc", "sdst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_enum_check_trigger_ddl_roundtrip_on_real_postgres(pg):
    """VERDICT r07 #4 — the last pg_dump --schema-only residue: enum
    types, CHECK constraints, and triggers (with their functions)
    captured by the engine's catalog SQL, rendered, replayed into a
    second database, and ENFORCED there."""
    from klepto_spark import jdbc as J

    for db in ("esrc", "edst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')", db="esrc")
        pg("CREATE TABLE entries (id INT PRIMARY KEY, m mood, n INT "
           "CONSTRAINT n_positive CHECK (n > 0), stamped_at TIMESTAMP)",
           db="esrc")
        pg("CREATE FUNCTION stamp() RETURNS trigger LANGUAGE plpgsql AS "
           "$$ BEGIN NEW.stamped_at := now(); RETURN NEW; END $$",
           db="esrc")
        pg("CREATE TRIGGER stamp_trg BEFORE INSERT ON entries "
           "FOR EACH ROW EXECUTE FUNCTION stamp()", db="esrc")

        enums = J.pg_enum_statements(
            _rows(pg(J.PG_ENUM_TYPES_SQL, db="esrc")))
        assert enums == ["CREATE TYPE mood AS ENUM ('sad', 'ok', "
                         "'happy');"]
        checks = J.pg_check_statements(
            _rows(pg(J.PG_CHECK_CONSTRAINTS_SQL, db="esrc")))
        assert len(checks) == 1 and "n_positive" in checks[0]
        # the trigger catalog SQL finds exactly the user trigger and its
        # function (FK/PK internals excluded by tgisinternal)
        trig_rows = _rows(pg(J.PG_TRIGGERS_SQL, db="esrc"))
        assert [t for t, _ in trig_rows] == ["stamp_trg"]
        fn_names = _rows(pg(
            "SELECT proname FROM (" + J.PG_TRIGGER_FUNCTIONS_SQL + ") q",
            db="esrc"))
        assert fn_names == [("stamp",)]
        # function bodies are multi-line (psql's line-per-row output
        # can't carry them); fetch the single def whole
        fdef = pg("SELECT pg_get_functiondef(p.oid) FROM pg_proc p "
                  "JOIN pg_namespace n ON n.oid = p.pronamespace "
                  "WHERE p.proname = 'stamp' "
                  "AND n.nspname = current_schema()", db="esrc")
        trig = J.pg_trigger_statements([("stamp", fdef)], trig_rows)

        # replay: enums -> table (enum-typed column) -> checks -> trigger
        tables = J.pg_create_table_statements(
            [tuple(None if v == "" else v for v in r)
             for r in _rows(pg(J.PG_COLUMNS_SQL, db="esrc"))],
            _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="esrc")))
        assert any(" m mood" in t for t in tables)
        for s in enums + tables + checks + trig:
            pg(s, db="edst")
        # all three enforced in the restored schema
        err = pg("INSERT INTO entries (id, m, n) VALUES (1, 'angry', 1)",
                 db="edst", check=False)
        assert "invalid input value for enum" in err
        err = pg("INSERT INTO entries (id, m, n) VALUES (1, 'ok', 0)",
                 db="edst", check=False)
        assert "n_positive" in err
        pg("INSERT INTO entries (id, m, n) VALUES (1, 'ok', 5)",
           db="edst")
        assert pg("SELECT stamped_at IS NOT NULL FROM entries "
                  "WHERE id = 1", db="edst") == "t"
    finally:
        for db in ("esrc", "edst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_cross_schema_trigger_function_dumped_and_replays(pg):
    """Review finding (round 8): a trigger on a current-schema table
    backed by a function in ANOTHER schema must dump the function (with
    its CREATE SCHEMA) — the old function-side namespace filter dropped
    it and the CREATE TRIGGER failed on replay."""
    from klepto_spark import jdbc as J

    for db in ("xsrc", "xdst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE SCHEMA util", db="xsrc")
        pg("CREATE TABLE logs (id INT PRIMARY KEY, stamped_at TIMESTAMP)",
           db="xsrc")
        pg("CREATE FUNCTION util.audit() RETURNS trigger LANGUAGE plpgsql"
           " AS $$ BEGIN NEW.stamped_at := now(); RETURN NEW; END $$",
           db="xsrc")
        pg("CREATE TRIGGER audit_trg BEFORE INSERT ON logs "
           "FOR EACH ROW EXECUTE FUNCTION util.audit()", db="xsrc")

        fn_rows = _rows(pg(
            "SELECT proname, nspname FROM ("
            + J.PG_TRIGGER_FUNCTIONS_SQL + ") q(proname, def, nspname)",
            db="xsrc"))
        assert ("audit", "util") in fn_rows  # not filtered out anymore
        fdef = pg("SELECT pg_get_functiondef(p.oid) FROM pg_proc p "
                  "JOIN pg_namespace n ON n.oid = p.pronamespace "
                  "WHERE p.proname = 'audit' AND n.nspname = 'util'",
                  db="xsrc")
        trig_rows = _rows(pg(J.PG_TRIGGERS_SQL, db="xsrc"))
        stmts = J.pg_trigger_statements([("audit", fdef, "util")],
                                        trig_rows)
        assert stmts[0] == 'CREATE SCHEMA IF NOT EXISTS "util";'
        tables = J.pg_create_table_statements(
            [tuple(None if v == "" else v for v in r)
             for r in _rows(pg(J.PG_COLUMNS_SQL, db="xsrc"))],
            _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="xsrc")))
        for s in tables + stmts:
            pg(s, db="xdst")
        pg("INSERT INTO logs (id) VALUES (1)", db="xdst")
        assert pg("SELECT stamped_at IS NOT NULL FROM logs WHERE id = 1",
                  db="xdst") == "t"
    finally:
        for db in ("xsrc", "xdst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_domain_and_function_ddl_roundtrip_on_real_postgres(pg):
    """VERDICT r08 #4 (domains + non-trigger functions): a schema whose
    table uses a CHECK-constrained domain column and a function-backed
    DEFAULT dumps through the engine's catalog SQL and replays with both
    ENFORCED."""
    from klepto_spark import jdbc as J

    for db in ("dsrc", "ddst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE DOMAIN price AS numeric(8,2) DEFAULT 1.00 NOT NULL "
           "CHECK (VALUE > 0)", db="dsrc")
        pg("CREATE FUNCTION next_code(i int) RETURNS int LANGUAGE sql "
           "IMMUTABLE AS $$ SELECT i + 1 $$", db="dsrc")
        pg("CREATE TABLE items (id INT PRIMARY KEY, cost price, "
           "code INT DEFAULT next_code(41))", db="dsrc")

        domains = J.pg_domain_statements(
            _rows(pg(J.PG_DOMAINS_SQL, db="dsrc")))
        assert domains == ["CREATE DOMAIN price AS numeric(8,2) "
                           "DEFAULT 1.00 NOT NULL "
                           "CHECK ((VALUE > (0)::numeric));"]
        # function defs are multi-line: names via the catalog SQL, the
        # def fetched whole (same psql workaround as the trigger test)
        fn_names = _rows(pg("SELECT proname FROM ("
                            + J.PG_FUNCTIONS_SQL + ") q", db="dsrc"))
        assert [n for n, *_ in fn_names] == ["next_code"]
        fdef = pg("SELECT pg_get_functiondef(p.oid) FROM pg_proc p "
                  "JOIN pg_namespace n ON n.oid = p.pronamespace "
                  "WHERE p.proname = 'next_code' "
                  "AND n.nspname = current_schema()", db="dsrc")
        funcs = J.pg_function_statements([("next_code", fdef)])
        tables = J.pg_create_table_statements(
            [tuple(None if v == "" else v for v in r)
             for r in _rows(pg(J.PG_COLUMNS_SQL, db="dsrc"))],
            _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="dsrc")))
        assert any(" cost price" in t for t in tables)
        for s in domains + funcs + tables:
            pg(s, db="ddst")
        # the domain CHECK is enforced, its DEFAULT applies, and the
        # function-backed column DEFAULT evaluates
        err = pg("INSERT INTO items (id, cost) VALUES (1, -5)",
                 db="ddst", check=False)
        assert "price" in err and "check" in err.lower()
        pg("INSERT INTO items (id) VALUES (1)", db="ddst")
        assert _rows(pg("SELECT cost, code FROM items", db="ddst")) == \
            [("1.00", "42")]
    finally:
        for db in ("dsrc", "ddst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_matview_ddl_roundtrip_on_real_postgres(pg):
    """VERDICT r08 #4 (materialized views): dumped WITH NO DATA like
    pg_dump --schema-only; REFRESH after a data copy populates it."""
    from klepto_spark import jdbc as J

    for db in ("msrc", "mdst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE TABLE sales (id INT PRIMARY KEY, region TEXT, "
           "amount NUMERIC(8,2))", db="msrc")
        pg("CREATE MATERIALIZED VIEW region_totals AS "
           "SELECT region, sum(amount) AS total FROM sales GROUP BY region",
           db="msrc")
        names = _rows(pg("SELECT relname FROM ("
                         + J.PG_MATVIEWS_SQL + ") q", db="msrc"))
        assert [n for n, *_ in names] == ["region_totals"]
        # matview defs are multi-line: fetch whole, like function bodies
        mdef = pg("SELECT pg_get_viewdef(c.oid, true) FROM pg_class c "
                  "WHERE c.relkind = 'm' AND c.relname = 'region_totals'",
                  db="msrc")
        mviews = J.pg_matview_statements([("region_totals", mdef)])
        assert mviews[0].startswith("CREATE MATERIALIZED VIEW "
                                    "region_totals AS")
        assert mviews[0].rstrip().endswith("WITH NO DATA;")
        tables = J.pg_create_table_statements(
            [tuple(None if v == "" else v for v in r)
             for r in _rows(pg(J.PG_COLUMNS_SQL, db="msrc"))],
            _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="msrc")))
        for s in tables + mviews:
            pg(s, db="mdst")
        # schema-only: unpopulated until the data lands and REFRESH runs
        err = pg("SELECT * FROM region_totals", db="mdst", check=False)
        assert "has not been populated" in err
        pg("INSERT INTO sales VALUES (1, 'eu', 10.00), (2, 'eu', 5.00)",
           db="mdst")
        pg("REFRESH MATERIALIZED VIEW region_totals", db="mdst")
        assert _rows(pg("SELECT region, total FROM region_totals",
                        db="mdst")) == [("eu", "15.00")]
    finally:
        for db in ("msrc", "mdst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_partitioned_table_ddl_roundtrip_on_real_postgres(pg):
    """VERDICT r08 #4 (declarative partitioning): a range-partitioned
    parent with a hash sub-partitioned child replays as PARTITION BY /
    PARTITION OF in parents-first order, and row routing works in the
    restored schema. The sub-partition is named to sort BEFORE its
    parent so the dependency ordering (not luck) is what's proven."""
    from klepto_spark import jdbc as J

    for db in ("psrc", "pdst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    try:
        pg("CREATE TABLE events (id INT NOT NULL, day DATE NOT NULL, "
           "PRIMARY KEY (id, day)) PARTITION BY RANGE (day)", db="psrc")
        pg("CREATE TABLE events_2024 PARTITION OF events FOR VALUES "
           "FROM ('2024-01-01') TO ('2025-01-01')", db="psrc")
        pg("CREATE TABLE zz_2025 PARTITION OF events FOR VALUES "
           "FROM ('2025-01-01') TO ('2026-01-01') PARTITION BY HASH (id)",
           db="psrc")
        pg("CREATE TABLE aa_bucket0 PARTITION OF zz_2025 FOR VALUES "
           "WITH (MODULUS 2, REMAINDER 0)", db="psrc")
        pg("CREATE TABLE ab_bucket1 PARTITION OF zz_2025 FOR VALUES "
           "WITH (MODULUS 2, REMAINDER 1)", db="psrc")

        stmts = J.pg_create_table_statements(
            [tuple(None if v == "" else v for v in r)
             for r in _rows(pg(J.PG_COLUMNS_SQL, db="psrc"))],
            _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="psrc")),
            _rows(pg(J.PG_PARTITIONED_TABLES_SQL, db="psrc")),
            _rows(pg(J.PG_PARTITIONS_SQL, db="psrc")))
        # parent carries PARTITION BY; children are PARTITION OF; the
        # sub-partitioned child carries both
        assert any("CREATE TABLE events (" in s
                   and s.rstrip().endswith("PARTITION BY RANGE (day);")
                   for s in stmts)
        assert any("zz_2025 PARTITION OF events" in s
                   and "PARTITION BY HASH (id)" in s for s in stmts)
        # dependency order: zz_2025 before its aa_/ab_ buckets even
        # though they sort first alphabetically
        order = [i for i, s in enumerate(stmts)
                 if "zz_2025" in s or "aa_bucket0" in s]
        assert "zz_2025" in stmts[order[0]]
        for s in stmts:
            pg(s, db="pdst")
        pg("INSERT INTO events VALUES (1, '2024-06-01'), "
           "(2, '2025-06-01'), (3, '2025-07-01')", db="pdst")
        assert pg("SELECT count(*) FROM events_2024", db="pdst") == "1"
        assert pg("SELECT count(*) FROM zz_2025", db="pdst") == "2"
        # rows out of every range REFUSE (the restored bounds are live)
        err = pg("INSERT INTO events VALUES (9, '2030-01-01')",
                 db="pdst", check=False)
        assert "no partition of relation" in err
    finally:
        for db in ("psrc", "pdst"):
            pg(f"DROP DATABASE IF EXISTS {db}")


def test_policy_rule_collation_roundtrip_on_real_postgres(pg):
    """pg_dump tail (VERDICT r09 #6): RLS policies (+ ENABLE/FORCE ROW
    LEVEL SECURITY), a rewrite rule, and a user collation with a collated
    column — extracted with the engine's catalog SQL, rendered, replayed
    into a second database, and ENFORCED there: a non-superuser behind
    the restored policy sees only its tenant's rows, the restored rule
    swallows DELETEs, and the restored column keeps its collation."""
    from klepto_spark import jdbc as J

    for db in ("rlssrc", "rlsdst"):
        pg(f"DROP DATABASE IF EXISTS {db}")
        pg(f"CREATE DATABASE {db}")
    pg("DROP ROLE IF EXISTS app_user")
    pg("CREATE ROLE app_user LOGIN")
    pg('DROP ROLE IF EXISTS "AppRW"')
    pg('CREATE ROLE "AppRW" LOGIN')  # mixed-case: folds if unquoted
    try:
        pg("CREATE COLLATION csort (provider = libc, locale = 'C')",
           db="rlssrc")
        pg("CREATE TABLE accounts (id INT PRIMARY KEY, tenant INT NOT "
           "NULL, label TEXT COLLATE csort)", db="rlssrc")
        pg("ALTER TABLE accounts ENABLE ROW LEVEL SECURITY", db="rlssrc")
        pg("ALTER TABLE accounts FORCE ROW LEVEL SECURITY", db="rlssrc")
        pg("CREATE POLICY tenant_iso ON accounts TO public "
           "USING (tenant = 1)", db="rlssrc")
        pg("CREATE POLICY ins_guard ON accounts AS RESTRICTIVE FOR "
           "INSERT WITH CHECK (tenant = 1)", db="rlssrc")
        # ADVICE r10: a mixed-case role in TO must survive the dump —
        # unquoted it folds to apprw at replay and the policy targets a
        # missing role
        pg('CREATE POLICY rw_extra ON accounts FOR SELECT TO "AppRW" '
           "USING (tenant = 2)", db="rlssrc")
        pg("CREATE RULE protect_del AS ON DELETE TO accounts "
           "DO INSTEAD NOTHING", db="rlssrc")

        # --- extract with the engine's catalog SQL ---
        coll_rows = _rows(pg(J.PG_COLLATIONS_SQL_V15, db="rlssrc"))
        coll_stmts = J.pg_collation_statements(coll_rows)
        assert coll_stmts == ['CREATE COLLATION "csort" '
                              "(provider = libc, locale = 'C');"]
        # the native_ddl column-collation lookup (product path) finds
        # the collated column through the same catalog SQL
        assert _rows(pg(J.pg_column_collations_sql("accounts"),
                        db="rlssrc")) == [("label", "csort")]
        col_rows = _rows(pg(J.PG_COLUMNS_SQL, db="rlssrc"))
        pk_rows = _rows(pg(J.PG_PRIMARY_KEYS_SQL, db="rlssrc"))
        table_stmts = J.pg_create_table_statements(col_rows, pk_rows)
        assert any('label text COLLATE "csort"' in s
                   for s in table_stmts), table_stmts
        pol_stmts = J.pg_policy_statements(
            _rows(pg(J.PG_RLS_TABLES_SQL, db="rlssrc")),
            _rows(pg(J.PG_POLICIES_SQL, db="rlssrc")))
        assert ('ALTER TABLE "accounts" ENABLE ROW LEVEL SECURITY;'
                in pol_stmts)
        assert ('ALTER TABLE "accounts" FORCE ROW LEVEL SECURITY;'
                in pol_stmts)
        # the role arrives server-quoted, lowercase roles stay bare
        assert any('TO "AppRW"' in s for s in pol_stmts), pol_stmts
        assert any("TO public " in s for s in pol_stmts), pol_stmts
        # multi-line rule definitions: fetch the single def whole (same
        # psql workaround as the trigger/function tests)
        rdef = pg("SELECT definition FROM pg_rules WHERE "
                  "schemaname = current_schema() AND "
                  "rulename = 'protect_del'", db="rlssrc")
        rule_stmts = J.pg_rule_statements([("protect_del", rdef)])

        # --- replay in structure() order into the second database ---
        for s in (coll_stmts + table_stmts + rule_stmts + pol_stmts):
            pg(s, db="rlsdst")
        pg("GRANT SELECT, INSERT, DELETE ON accounts TO app_user",
           db="rlsdst")
        pg('GRANT SELECT ON accounts TO "AppRW"', db="rlsdst")
        pg("INSERT INTO accounts VALUES (1, 1, 'mine'), (2, 2, 'other')",
           db="rlsdst")  # superuser bypasses RLS for seeding

        # the restored POLICY actually filters a non-superuser
        seen = pg("SET ROLE app_user; SELECT count(*) FROM accounts",
                  db="rlsdst")
        assert seen.splitlines()[-1] == "1"
        # the mixed-case role's restored policy is ENFORCED for it:
        # permissive tenant_iso (public) OR rw_extra (tenant = 2) —
        # AppRW sees both tenants where app_user sees one
        rw = pg('SET ROLE "AppRW"; SELECT count(*) FROM accounts',
                db="rlsdst")
        assert rw.splitlines()[-1] == "2"
        # the RESTRICTIVE insert guard blocks the wrong tenant
        bad = pg("SET ROLE app_user; INSERT INTO accounts VALUES "
                 "(3, 2, 'smuggled')", db="rlsdst", check=False)
        assert bad.startswith("ERROR")
        # the restored RULE swallows deletes
        pg("SET ROLE app_user; DELETE FROM accounts", db="rlsdst")
        left = pg("SELECT count(*) FROM accounts", db="rlsdst")
        assert left == "2"
        # the restored column collation is the user collation
        got = pg("SELECT collation_name FROM information_schema.columns "
                 "WHERE table_name = 'accounts' AND column_name = "
                 "'label'", db="rlsdst")
        assert got == "csort"
    finally:
        for db in ("rlssrc", "rlsdst"):
            pg(f"DROP DATABASE IF EXISTS {db}")
        pg("DROP ROLE IF EXISTS app_user")
        pg('DROP ROLE IF EXISTS "AppRW"')
