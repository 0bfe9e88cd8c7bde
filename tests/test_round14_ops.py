"""Round-14 operator tests: grouped top-k without a window sort (a40)
and the skew pattern's value-invisibility (a39)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from klepto_spark.operators.topk import grouped_topk


def _window_topk(df, k):
    """The reference semantics: row_number over the window idiom."""
    w = (Window.partitionBy("g")
         .orderBy(F.desc("v"), F.asc("tie")))
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("g", F.col("rank").cast("int"), "tie", "v"))


def test_grouped_topk_matches_window_semantics(spark):
    """The aggregate-based plan must return EXACTLY what the window
    idiom returns — same rows, same ranks — over a corpus with
    duplicate order values (tie-break exercised) and uneven groups."""
    rows = [(g, i, float((i * 7) % 13)) for g in range(50)
            for i in range(g % 9 + 1)]
    df = spark.createDataFrame(rows, "g int, tie int, v double")
    got = sorted(map(tuple, grouped_topk(
        df, ["g"], "v", 3, tie_cols=["tie"]).collect()))
    want = sorted(map(tuple, _window_topk(df, 3).collect()))
    assert got == want


def test_grouped_topk_ties_and_small_groups(spark):
    """All-equal values rank purely by the tiebreaker; a group smaller
    than k returns all its rows and never pads."""
    df = spark.createDataFrame(
        [("a", 3, 1.0), ("a", 1, 1.0), ("a", 2, 1.0), ("b", 9, 5.0)],
        "g string, tie int, v double")
    out = {(r["g"], r["rank"]): r["tie"]
           for r in grouped_topk(df, ["g"], "v", 2,
                                 tie_cols=["tie"]).collect()}
    assert out == {("a", 1): 1, ("a", 2): 2, ("b", 1): 9}


def test_grouped_topk_layout_independent(spark):
    """Result is a pure function of the data — repartitioning the input
    cannot change rows or ranks (collect_list order is absorbed by the
    in-aggregate array_sort)."""
    rows = [(i % 40, i, float((i * 31) % 17)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, tie int, v double")
    a = sorted(map(tuple, grouped_topk(
        df.repartition(1), ["g"], "v", 5, tie_cols=["tie"]).collect()))
    b = sorted(map(tuple, grouped_topk(
        df.repartition(17, "tie"), ["g"], "v", 5,
        tie_cols=["tie"]).collect()))
    assert a == b


def test_skewed_hot_key_salting_invisible(spark, sf_dir):
    """a39's defining contract: the salted two-phase plan returns
    byte-identical values to the plain groupBy + join it replaces."""
    import __spark_entry__ as entry
    got = sorted(map(tuple, entry.q_skewed_hot_key(
        spark, sf_dir).collect()))
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select(F.when(F.col("user_id") % 10 < 7, F.lit(0))
                  .otherwise(F.col("user_id")).cast("long")
                  .alias("hot_key"), "value"))
    dim = (spark.read.parquet(f"{sf_dir}/customer.parquet")
           .select(F.col("c_custkey").alias("hot_key"),
                   F.col("c_nationkey").alias("nation_key")))
    plain = (ev.join(dim, "hot_key")
             .groupBy("hot_key", "nation_key")
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total_value"),
                  F.max("value").alias("max_value"))
             .orderBy("hot_key"))
    assert got == sorted(map(tuple, plain.collect()))
