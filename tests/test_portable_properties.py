"""Property-based cross-engine parity (hypothesis).

The reference has no property tests (SURVEY §5); this goes beyond: for
ARBITRARY input strings, the portable anonymiser expressions must produce
identical values in Spark and DuckDB. Strings are batched into one
comparison query per test run to amortise engine startup.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from klepto_spark.functions.anonymise import anonymise_sql
from klepto_spark.functions.portable import s as sql_str

# Printable unicode incl. quotes, BACKSLASHES, accents, CJK; control chars
# and surrogates excluded (NUL is illegal mid-literal in both engines'
# parsers anyway; parquet-borne values never pass through literals).
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"),
                           max_codepoint=0x2FFF),
    min_size=0, max_size=60)

SPECS = ["EmailAddress", "UserName", "FirstName", "Latitude", "DigitsN:6",
         "Password:6:10:true:true:false", "Sentence", "IPv4",
         "CreditCardNum:visa", "Year:1990:2020"]


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8, unique=True))
def test_anonymisers_cross_engine_on_arbitrary_strings(spark, values):
    values_sql = ", ".join(f"({sql_str(v)})" for v in values)
    src = f"(SELECT * FROM (VALUES {values_sql}) AS v(email))"
    sel = ", ".join(
        f"({anonymise_sql(sp, 'email', table='t')}) AS f{i}"
        for i, sp in enumerate(SPECS))
    q = f"SELECT {sel} FROM {src} AS t"
    srows = sorted([tuple(r) for r in spark.sql(q).collect()], key=repr)
    drows = sorted([tuple(r) for r in duckdb.sql(q).fetchall()], key=repr)
    assert srows == drows


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=126),
                        min_size=1, max_size=40),
                min_size=2, max_size=6, unique=True))
def test_insert_statement_roundtrip(spark, values):
    """SQL-text sink property: emitted INSERT literals parse back to the
    original values (DuckDB as the consuming database)."""
    from klepto_spark.sinks.sqltext import insert_statements
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "id long, v string")
    stmts = [r.stmt for r in insert_statements(df, "t").collect()]
    con = duckdb.connect()
    con.execute('CREATE TABLE "t" (id BIGINT, v TEXT)')
    for stmt in stmts:
        con.execute(stmt)
    got = dict(con.execute("SELECT id, v FROM t").fetchall())
    assert got == {i: v for i, v in enumerate(values)}
