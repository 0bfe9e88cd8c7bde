"""Edge cases of the deterministic sampling contract: rate=1.0 keeps ALL
rows, NULL keys agree across engines, the exact-n SQL twin's default
column list, and literal escaping in generated SQL."""

import duckdb
import pytest

from klepto_spark.operators import sampling as P


def test_threshold_full_rate_is_sentinel_above_hex():
    # 'g' sorts above every 8-hex-char prefix (bytewise, 'g' > 'f'), so
    # rate=1.0 keeps even the p=2^-32 keys whose prefix is 'ffffffff' —
    # a plain hex threshold ('ffffffff') drops exactly those.
    assert P._threshold_hex(1.0) == "g"
    assert "ffffffff" < "g"
    con = duckdb.connect()
    assert con.execute("SELECT 'ffffffff' < 'g'").fetchone()[0] is True
    assert P._threshold_hex(0.0) == "00000000"
    with pytest.raises(ValueError):
        P._threshold_hex(1.5)


def test_stratified_full_rate_keeps_whole_stratum(spark):
    df = spark.range(2000).selectExpr("id", "'keep' AS lang")
    kept = P.sample_stratified(df, "lang", "id", {"keep": 1.0})
    assert kept.count() == 2000


def test_null_keys_agree_with_duckdb(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    (spark.range(100)
     .selectExpr("id", "CASE WHEN id % 7 = 0 THEN NULL ELSE id END AS k")
     .coalesce(1).write.parquet(path))
    got = sorted(r["id"] for r in
                 spark.read.parquet(path)
                 .filter(P.hash_prefix("k", salt="s") <
                         P.F.lit(P._threshold_hex(0.5)))
                 .collect())
    con = duckdb.connect()
    want = sorted(r[0] for r in con.execute(
        f"SELECT id FROM read_parquet('{path}/*.parquet') "
        f"WHERE {P.sample_uniform_sql('k', 0.5, salt='s')}").fetchall())
    assert got == want
    # NULL keys all hash identically: they move as one unit, both engines
    nulls = [i for i in range(100) if i % 7 == 0]
    assert set(nulls) <= set(got) or not (set(nulls) & set(got))


def test_exact_n_sql_star_has_no_duplicate_column(spark, tmp_path):
    path = str(tmp_path / "d.parquet")
    (spark.range(50)
     .selectExpr("id", "CAST(id % 3 AS STRING) AS s")
     .coalesce(1).write.parquet(path))
    sql = P.sample_exact_n_sql(
        f"read_parquet('{path}/*.parquet')", "s", "id", 5, salt="x")
    con = duckdb.connect()
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    assert cols.count("rn") == 1
    got = rel.fetchall()
    spark_rows = (P.sample_exact_n(spark.read.parquet(path), "s", "id", 5,
                                   salt="x").collect())
    assert len(got) == len(spark_rows) == 15


def test_sql_literal_escaping():
    sql = P.sample_stratified_sql("lang", "id", {"o'brien": 0.5})
    duckdb.connect().execute(
        f"SELECT * FROM (SELECT 1 AS id, 'o''brien' AS lang) WHERE {sql}")
    split = P.split_assign_sql("id", {"tr'ain": 0.5, "te'st": 0.5},
                               salt="sa'lt")
    duckdb.connect().execute(f"SELECT {split} FROM (SELECT 1 AS id)")
