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


# ---------------------------------------------------------------------------
# Hypothesis property suite (VERDICT r3 #6): the Spark operators and their
# SQL twins are the SAME function of (keys, salt, rates) — locked over
# generated inputs covering NULL keys, quotes, unicode, and rate 0/1.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

# printable-ish unicode incl. quotes/backslash/pipe; no surrogates
_KEY = st.one_of(
    st.none(),
    st.text(min_size=0, max_size=12),
    st.sampled_from(["o'brien", "a''b", 'x"y', "a|b", "ü当ñ", "", "\\", " "]))
_SALT = st.sampled_from(["", "s", "o'salt", "ü|当"])
_RATE = st.one_of(st.sampled_from([0.0, 1.0, 0.5]),
                  st.floats(min_value=0.0, max_value=1.0,
                            allow_nan=False))
_PROP = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _frames(spark, keys):
    import pandas as pd
    rows = [(i, k) for i, k in enumerate(keys)]
    sdf = spark.createDataFrame(rows, "id long, k string")
    pdf = pd.DataFrame(rows, columns=["id", "k"]).astype({"k": "object"})
    return sdf, pdf


@_PROP
@given(keys=st.lists(_KEY, min_size=1, max_size=25), salt=_SALT, rate=_RATE)
def test_prop_sample_uniform_matches_sql_twin(spark, keys, salt, rate):
    sdf, pdf = _frames(spark, keys)
    got = sorted(r["id"] for r in
                 P.sample_uniform(sdf, "k", rate, salt=salt).collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(r[0] for r in con.execute(
        f"SELECT id FROM t WHERE "
        f"{P.sample_uniform_sql('k', rate, salt=salt)}").fetchall())
    assert got == want


@_PROP
@given(keys=st.lists(_KEY, min_size=1, max_size=25), salt=_SALT,
       w=st.floats(min_value=0.01, max_value=0.99, allow_nan=False),
       names=st.sampled_from([("train", "test"), ("tr'ain", "te''st"),
                              ("ü当", "b"), ("only",)]))
def test_prop_split_assign_matches_sql_twin(spark, keys, salt, w, names):
    weights = ({names[0]: 1.0} if len(names) == 1
               else {names[0]: w, names[1]: 1.0 - w})
    sdf, pdf = _frames(spark, keys)
    got = {r["id"]: r["split"] for r in
           P.split_assign(sdf, "k", weights, salt=salt).collect()}
    con = duckdb.connect()
    con.register("t", pdf)
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT id, {P.split_assign_sql('k', weights, salt=salt)} "
        f"FROM t").fetchall()}
    assert got == want


@_PROP
@given(keys=st.lists(_KEY, min_size=1, max_size=25), salt=_SALT,
       r1=_RATE, r2=_RATE, default=_RATE,
       strata=st.sampled_from([("en", "de"), ("o'lang", "ü当"),
                               ("", "x")]))
def test_prop_sample_stratified_matches_sql_twin(spark, keys, salt,
                                                 r1, r2, default, strata):
    rates = {strata[0]: r1, strata[1]: r2}
    # derive a stratum per row from the key so NULL-key rows exercise the
    # default branch and non-NULL rows spread across both strata
    import pandas as pd
    rows = [(i, k, (strata[i % 2] if k is not None else None))
            for i, k in enumerate(keys)]
    sdf = spark.createDataFrame(rows, "id long, k string, lang string")
    pdf = pd.DataFrame(rows, columns=["id", "k", "lang"]).astype(
        {"k": "object", "lang": "object"})
    got = sorted(r["id"] for r in P.sample_stratified(
        sdf, "lang", "k", rates, default_rate=default,
        salt=salt).collect())
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(r[0] for r in con.execute(
        f"SELECT id FROM t WHERE "
        f"{P.sample_stratified_sql('lang', 'k', rates, default_rate=default, salt=salt)}"
    ).fetchall())
    assert got == want


def test_weighted_sample_agrees_with_duckdb_including_edges(spark, tmp_path):
    """Weighted Bernoulli: the integer draw + double threshold agree with
    the SQL twin bit-for-bit, incl. weight 0 (never), >=1 (always, even
    for the 'ffffffff' tail), negative (clamped to never), and NULL
    (dropped by both engines)."""
    path = str(tmp_path / "w.parquet")
    (spark.range(500)
     .selectExpr("id",
                 "CASE WHEN id % 11 = 0 THEN NULL "
                 "     WHEN id % 7 = 0 THEN -0.5 "
                 "     WHEN id % 5 = 0 THEN 2.0 "
                 "     WHEN id % 3 = 0 THEN 0.0 "
                 "     ELSE id / 500.0 END AS w")
     .coalesce(1).write.parquet(path))
    df = spark.read.parquet(path)
    got = sorted(r["id"] for r in
                 P.sample_weighted(df, "id", "w", rate=0.9,
                                   salt="s").collect())
    con = duckdb.connect()
    want = sorted(r[0] for r in con.execute(
        f"SELECT id FROM read_parquet('{path}/*.parquet') "
        f"WHERE {P.sample_weighted_sql('id', 'w', rate=0.9, salt='s')}"
    ).fetchall())
    assert got == want
    ids = set(got)
    assert not {i for i in range(500) if i % 11 == 0} & ids   # NULL w
    assert not {i for i in range(500) if i % 7 == 0} & ids    # negative
    assert not {i for i in range(500) if i % 3 == 0
                and i % 5 and i % 7 and i % 11} & ids         # zero
    always = {i for i in range(500)
              if i % 5 == 0 and i % 11 and i % 7 and i % 3}
    assert always <= ids                                      # clamped to 1


def test_weighted_sample_rate_scales_keep_probability(spark):
    df = spark.range(4000).selectExpr("id", "1.0 AS w")
    n_half = P.sample_weighted(df, "id", "w", rate=0.5, salt="a").count()
    n_full = P.sample_weighted(df, "id", "w", rate=1.0, salt="a").count()
    assert n_full == 4000
    assert abs(n_half - 2000) < 200
