import os

import duckdb
import pytest

SF_TEST = os.environ.get("KLEPTO_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    from klepto_spark.session import get_spark
    s = get_spark(app_name="klepto_spark_tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_TEST}/{t}.parquet')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST


def assert_df_matches_duck(sdf, duck, sql, float_cols=()):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL,
    mimicking the driver's t2 check (row count + column names + values)."""
    srows = [tuple(r) for r in sdf.collect()]
    drows = [tuple(r) for r in duck.execute(sql).fetchall()]
    scols = sdf.columns
    dcols = [d[0] for d in duck.execute(sql).description]
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    # align column order by name
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    fidx = [sorted(scols).index(c) for c in float_cols]

    def norm(row, idx):
        out = []
        for j, i in enumerate(idx):
            v = row[i]
            if j in fidx and v is not None:
                v = round(float(v), 6)
            out.append(v)
        return tuple(out)

    s_norm = sorted((norm(r, sidx) for r in srows), key=repr)
    d_norm = sorted((norm(r, didx) for r in drows), key=repr)
    assert len(s_norm) == len(d_norm), f"row count {len(s_norm)} vs {len(d_norm)}"
    assert s_norm == d_norm
