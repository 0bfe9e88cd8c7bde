"""Pass-through copy of the types the reference CANNOT handle
(SURVEY §1.3 last row): DECIMAL, ARRAY, MAP, STRUCT must survive
``steal`` end-to-end through each sink family —

- file sink: byte-exact round trip (parquet carries all four natively);
- sqltext sink: documented literal policy — decimals as plain exact
  literals, nested data as JSON text matching the JSON DDL fallback
  (postgres primitive arrays as native ARRAY[..] constructors);
- JDBC sink: decimals native, nested serialised as JSON strings
  (no JDBC type exists for them; arrays stay native on postgres).
"""

import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from klepto_spark.config import Spec
from klepto_spark.engine import steal
from klepto_spark.sources.catalog import FileCatalog


ROWS = [
    (1, Decimal("12345.678"), [1, 2, 3], {"a": 1}, (7, "x")),
    (2, Decimal("-0.001"), [], {}, (None, "it's")),
    (3, None, None, None, None),
]
SCHEMA = ("id bigint, bal decimal(12,3), xs array<int>, "
          "kv map<string,int>, st struct<a:int,b:string>")


@pytest.fixture()
def src_dir(spark, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(
        str(d / "typed.parquet"))
    return str(d)


def test_file_sink_round_trip_is_exact(spark, src_dir, tmp_path):
    out = str(tmp_path / "out")
    steal(Spec(), FileCatalog(spark, src_dir), f"parquet://{out}")
    got = spark.read.parquet(f"{out}/typed.parquet")
    src = spark.read.parquet(f"{src_dir}/typed.parquet")
    assert got.schema == src.schema  # decimal precision/scale included
    assert sorted(got.collect()) == sorted(src.collect())


def test_sqltext_sink_policy(spark, src_dir, tmp_path):
    out = tmp_path / "dump.sql"
    steal(Spec(), FileCatalog(spark, src_dir), f"file://{out}")
    text = out.read_text()
    # DDL: decimal keeps precision/scale; nested fall back to JSON
    assert "DECIMAL(12,3)" in text
    assert text.count("JSON") >= 3
    insert_1 = next(line for line in text.splitlines()
                    if line.startswith("INSERT") and "12345.678" in line)
    # decimal is a plain exact literal, not quoted or rounded
    assert "12345.678" in insert_1 and "'12345.678'" not in insert_1
    # nested values are VALID JSON inside SQL string literals
    assert "'[1,2,3]'" in insert_1
    assert "'{\"a\":1}'" in insert_1
    assert '\'{"a":7,"b":"x"}\'' in insert_1
    # escape doubling guards quotes inside nested strings; NULL row is NULL
    import re
    insert_2 = next(line for line in text.splitlines()
                    if line.startswith("INSERT") and "it''s" in line)
    literals = re.findall(r"'((?:[^']|'')*)'", insert_2)
    parsed = json.loads(literals[-1].replace("''", "'"))
    assert parsed == {"b": "it's"}  # to_json omits null struct fields
    insert_3 = next(line for line in text.splitlines()
                    if line.startswith("INSERT") and "(3," in line)
    assert insert_3.count("NULL") == 4


def test_sqltext_postgres_primitive_arrays_native(spark):
    """postgres DDL declares elem[] columns, so the literal must be the
    exact ARRAY[..] constructor (quoted/escaped elements, NULL elements
    kept, empty arrays typed), while map/struct stay JSON."""
    from klepto_spark.sinks.sqltext import insert_statements
    df = spark.createDataFrame(
        [(["a'b", None], [1, None], []),],
        "tags array<string>, ns array<int>, empty array<int>")
    stmt = insert_statements(df, "t", dialect="postgres").first()[0]
    assert "ARRAY['a''b',NULL]" in stmt
    assert "ARRAY[1,NULL]" in stmt
    assert "ARRAY[]::" in stmt  # empty array keeps its cast


def test_jdbc_sink_round_trip(spark, src_dir, tmp_path):
    from tests.test_jdbc import _dsn
    dsn = _dsn(spark, tmp_path, "typeddb")
    if dsn.type == "derby":
        target = f"derby:///{dsn.data_source}?create=true"
    else:
        auth = (f"{dsn.username}:{dsn.password}@" if dsn.username else "")
        target = f"{dsn.type}://{auth}{dsn.address}/{dsn.data_source}"
    steal(Spec(), FileCatalog(spark, src_dir), target)
    from klepto_spark.sources.catalog import JdbcCatalog
    back = JdbcCatalog(spark, dsn).load("typed")
    rows = {r["ID" if "ID" in back.columns else "id"]: r
            for r in back.collect()}
    r1 = rows[1]
    # decimal survives natively with exact value
    assert Decimal(str(r1[1])) == Decimal("12345.678")
    # nested columns came back as JSON strings
    assert json.loads(r1[2]) == [1, 2, 3]
    assert json.loads(r1[3]) == {"a": 1}
    assert json.loads(r1[4]) == {"a": 7, "b": "x"}
    r3 = rows[3]
    assert r3[1] is None and r3[2] is None and r3[3] is None
