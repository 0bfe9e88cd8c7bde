"""t-digest quantile sketch: accuracy (rank error), mergeability of stored
digests, determinism across runs, and NULL/empty-group handling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from klepto_spark.operators.tdigest import (
    tdigest_by, tdigest_quantiles, tdigest_rollup)

PROBS = [0.25, 0.5, 0.9]


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(11)
    rows = [(int(i), ["a", "b", "c"][i % 3], float(v))
            for i, v in enumerate(rng.gamma(2.0, 500.0, size=30_000))]
    return spark.createDataFrame(rows, "id bigint, seg string, v double") \
        .repartition(8).cache()


def _rank_err(values, est, q):
    sv = np.sort(values)
    return abs(np.searchsorted(sv, est) / len(sv) - q)


def test_tdigest_rank_error_within_bound(spark, skewed):
    got = {r["seg"]: r for r in
           tdigest_quantiles(skewed, "v", PROBS, ["seg"]).collect()}
    pdf = skewed.toPandas()
    for seg, sub in pdf.groupby("seg"):
        vals = sub["v"].to_numpy()
        for q in PROBS:
            est = got[seg][f"p{int(q * 100):02d}"]
            assert _rank_err(vals, est, q) < 0.01, (seg, q)


def test_tdigest_shuffle_carries_digests_not_values(spark, skewed):
    q = tdigest_quantiles(skewed, "v", PROBS, ["seg"])
    q.collect()
    plan = (q._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    # raw values never shuffle: the only keyed exchange moves digest rows,
    # which carry td_means/td_weights arrays (bounded by delta)
    assert "td_means" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tdigest_rollup_matches_direct(spark, skewed):
    # store per-(seg, bucket) digests, roll up to seg: same answers as
    # digesting per seg directly, within the digest's own error bound
    bucketed = skewed.withColumn("b", (F.col("id") % 7).cast("int"))
    stored = tdigest_by(bucketed, "v", ["seg", "b"])
    rolled = {r["seg"]: r for r in
              tdigest_rollup(stored, PROBS, ["seg"]).collect()}
    pdf = skewed.toPandas()
    for seg, sub in pdf.groupby("seg"):
        vals = sub["v"].to_numpy()
        for q in PROBS:
            assert _rank_err(vals, rolled[seg][f"p{int(q * 100):02d}"],
                             q) < 0.015, (seg, q)


def test_tdigest_deterministic_across_runs(spark, skewed):
    a = sorted(map(tuple, tdigest_quantiles(
        skewed, "v", PROBS, ["seg"]).collect()))
    b = sorted(map(tuple, tdigest_quantiles(
        skewed, "v", PROBS, ["seg"]).collect()))
    assert a == b


def test_tdigest_nulls_and_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("n", None)],
        "seg string, v double")
    got = {r["seg"]: r for r in
           tdigest_quantiles(df, "v", [0.5], ["seg"]).collect()}
    assert got["a"]["p50"] == pytest.approx(2.0)
    p50_n = got["n"]["p50"]
    assert p50_n is None or np.isnan(p50_n)


def test_tdigest_extremes_clamped_to_min_max(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)], "seg string, v double")
    r = tdigest_quantiles(df, "v", [0.25, 0.5, 0.9], ["seg"]).collect()[0]
    assert 1.0 <= r["p25"] <= 100.0
    assert r["p50"] == pytest.approx(50.5, abs=1.0)
    assert r["p90"] == pytest.approx(90.5, abs=1.5)
