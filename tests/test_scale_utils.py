"""Scale utilities: salted aggregation/join correctness and the
shuffle-free bucketed-join plan property."""

import pytest
from pyspark.sql import functions as F

from klepto_spark.operators.skew import salted_agg, salted_count, salted_join
from klepto_spark.plans import inspect as I
from klepto_spark.sinks.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def skewed(spark):
    # one hot key (90%), many cold keys
    rows = [("hot", i * 1.0) for i in range(900)]
    rows += [(f"cold{i}", i * 1.0) for i in range(100)]
    return spark.createDataFrame(rows, "k string, x double")


def test_salted_count_matches_plain(spark, skewed):
    got = {r.k: r.n for r in salted_count(skewed, ["k"]).collect()}
    want = {r.k: r.n for r in
            skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want and got["hot"] == 900


def test_salted_agg_matches_plain(spark, skewed):
    got = {r.k: (r.total, r.n, r.mx) for r in salted_agg(
        skewed, ["k"],
        {"total": (F.sum("x"), F.sum("total")),
         "n": (F.count(F.lit(1)), F.sum("n")),
         "mx": (F.max("x"), F.max("mx"))}).collect()}
    want = {r.k: (r.total, r.n, r.mx) for r in
            skewed.groupBy("k").agg(F.sum("x").alias("total"),
                                    F.count(F.lit(1)).alias("n"),
                                    F.max("x").alias("mx")).collect()}
    assert got == want


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2")], "k string, label string")
    got = sorted((r.k, r.x, r.label)
                 for r in salted_join(skewed, dim, "k").collect())
    want = sorted((r.k, r.x, r.label) for r in skewed.join(dim, "k").collect())
    assert got == want and len(got) == 902


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    # warehouse dir is a static conf -> set in session defaults (tmpfs)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                .withColumnRenamed("l_orderkey", "o_orderkey"))
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=8)
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    # co-located buckets: no shuffle Exchange anywhere in the join plan
    assert I.shuffle_count(joined) == 0
    assert joined.count() == lineitem.count()
    # and an aggregation on the bucket key is shuffle-free too
    agg = spark.table("b_lineitem").groupBy("o_orderkey").count()
    assert I.shuffle_count(agg) == 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning (on by default in the
    tuned session) injects a might_contain filter on the big probe side
    when a selective build side warrants it. Local data sits below the
    default application-side threshold (10 GB — exactly right at 100 TB),
    so the test lowers it to observe the injection; the assertion is that
    our session config leaves the machinery ON and working."""
    assert (spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
    prev_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                       "applicationSideScanSizeThreshold", "0")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .filter("o_orderpriority = '1-URGENT'"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_b)
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter."
                         "applicationSideScanSizeThreshold")
