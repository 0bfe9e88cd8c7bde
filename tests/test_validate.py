"""Data-quality validation: exact violation counts per check kind, the
one-scan guarantee for row-local checks, and the SQL twin's parity."""

import pytest
from pyspark.sql import functions as F

from klepto_spark.operators import validate as V


@pytest.fixture()
def messy(spark):
    rows = [
        (1, "a@x.io", 10.0, "ok"),
        (2, None, -5.0, "ok"),          # null email, range violation
        (2, "b@y.io", 20.0, "bad"),     # dup id, accepted violation
        (3, "not-an-email", 30.0, "ok"),
        (None, "c@z.io", 5000.0, "ok"),  # null id, range violation
    ]
    return spark.createDataFrame(
        rows, "id bigint, email string, amount double, status string")


def test_validate_counts_each_kind(spark, messy):
    out = {(r["check"], r["target"]): r for r in V.validate(messy, [
        V.not_null("id"),
        V.not_null("email"),
        V.in_range("amount", 0, 100),
        V.matches("email", r"[a-z]+@[a-z]+\.[a-z]+"),
        V.accepted("status", ["ok", "retry"]),
        V.expression("amount IS NULL OR amount < 4000", "amount_cap"),
        V.unique("id"),
    ]).collect()}
    assert out[("not_null", "id")]["violations"] == 1
    assert out[("not_null", "email")]["violations"] == 1
    assert out[("in_range", "amount")]["violations"] == 2
    assert out[("matches", "email")]["violations"] == 1
    assert out[("accepted", "status")]["violations"] == 1
    assert out[("expression", "amount_cap")]["violations"] == 1
    assert out[("unique", "id")]["violations"] == 1
    assert not any(r["pass"] for r in out.values())


def test_validate_matches_is_full_match(spark):
    # 'abc1' contains the pattern but doesn't fully match it
    df = spark.createDataFrame([("abc",), ("abc1",)], "s string")
    out = V.validate(df, [V.matches("s", "[a-z]+")]).collect()[0]
    assert out["violations"] == 1


def test_validate_references_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id bigint, fk bigint")
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    out = V.validate(child, [V.references(["fk"], parent, ["pk"])]) \
        .collect()[0]
    # NULL fk is not an orphan (not_null is a separate check)
    assert out["violations"] == 1 and not out["pass"]


def test_row_local_checks_share_one_scan(spark, messy, tmp_path):
    # write to parquet so the plan has a real scan to count
    p = str(tmp_path / "m.parquet")
    messy.write.parquet(p)
    df = spark.read.parquet(p)
    checks = [V.not_null("id"), V.in_range("amount", 0, 100),
              V.accepted("status", ["ok"]), V.not_null("email")]
    # capture the agg plan the validate() row-local pass builds
    aggs = [F.sum(F.when(V._violation_expr(c), 1).otherwise(0))
            .alias(f"_v{i}") for i, c in enumerate(checks)]
    plan = (df.agg(*aggs)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("FileScan") + plan.count("Scan parquet") >= 1
    # one scan total: the plan contains exactly one parquet relation
    import re
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1


def test_validate_sql_twin_matches(spark, messy, tmp_path):
    import duckdb
    p = str(tmp_path / "m2.parquet")
    messy.coalesce(1).write.parquet(p)
    checks = [V.not_null("id"), V.in_range("amount", 0, 100),
              V.accepted("status", ["ok", "retry"]),
              V.matches("email", r"[a-z]+@[a-z]+\.[a-z]+"),
              V.unique("id")]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{p}/*.parquet')")
    oracle = {(r[0], r[1]): (r[2], r[3]) for r in
              con.execute(V.validate_sql("t", checks)).fetchall()}
    got = {(r["check"], r["target"]): (r["violations"], r["pass"])
           for r in V.validate(messy, checks).collect()}
    assert got == oracle
