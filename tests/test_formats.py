"""CSV/JSON source + sink round-trips through the DSN-routed paths."""

from klepto_spark.sinks.writers import write_table
from klepto_spark.sources.catalog import connect


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    src = connect(spark, f"parquet://{sf_dir}")
    region = src.load("region")
    for fmt in ("csv", "json"):
        write_table(region, f"{fmt}:///{str(tmp_path / fmt).lstrip('/')}",
                    "region")
        back = connect(spark, f"{fmt}:///{str(tmp_path / fmt).lstrip('/')}")
        assert back.tables() == ["region"]
        got = back.load("region")
        assert got.count() == 5
        assert sorted(r.r_name for r in got.collect()) == \
            sorted(r.r_name for r in region.collect())


def test_csv_catalog_infers_schema(spark, sf_dir, tmp_path):
    src = connect(spark, f"parquet://{sf_dir}")
    write_table(src.load("nation"), f"csv:///{str(tmp_path).lstrip('/')}",
                "nation")
    cat = connect(spark, f"csv:///{str(tmp_path).lstrip('/')}")
    df = cat.load("nation")
    types = dict(df.dtypes)
    assert types["n_nationkey"] == "int" and types["n_name"] == "string"
