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


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (same mergeable-sketch family)
# --------------------------------------------------------------------------

def _zipf_df(spark, n=50_000, seed=3):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.5, size=n)
    vals = np.clip(vals, 1, 10_000)
    return (spark.createDataFrame(
        [(int(i), ["g1", "g2"][i % 2], f"v{v}") for i, v in enumerate(vals)],
        "id bigint, g string, item string").repartition(8), vals)


def test_heavy_hitters_bounds_contain_exact_counts(spark):
    from klepto_spark.operators.sketches import heavy_hitters
    df, vals = _zipf_df(spark)
    got = heavy_hitters(df, "item", ["g"], k=64).collect()
    exact = (df.groupBy("g", "item").count().collect())
    ex = {(r["g"], r["item"]): r["count"] for r in exact}
    totals = {}
    for (g, _), c in ex.items():
        totals[g] = totals.get(g, 0) + c
    seen = {(r["g"], r["item"]) for r in got}
    for r in got:
        t = ex[(r["g"], r["item"])]
        assert r["count_lo"] <= t <= r["count_hi"], (r, t)
    # MG guarantee: anything above totals/k is present
    for key, c in ex.items():
        if c > totals[key[0]] / 64:
            assert key in seen, (key, c)


def test_heavy_hitters_exact_when_k_exceeds_distinct(spark):
    from klepto_spark.operators.sketches import heavy_hitters
    df = spark.createDataFrame(
        [(i, f"w{i % 7}") for i in range(700)], "id bigint, item string")
    got = {r["item"]: r for r in
           heavy_hitters(df, "item", k=64).collect()}
    assert len(got) == 7
    for i in range(7):
        r = got[f"w{i}"]
        assert r["count_lo"] == r["count_hi"] == 100  # err == 0: exact


def test_heavy_hitters_summary_only_shuffle(spark):
    from klepto_spark.operators.sketches import heavy_hitters
    df, _ = _zipf_df(spark, n=2000)
    q = heavy_hitters(df, "item", ["g"], k=16)
    q.collect()
    plan = (q._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "mg_values" in plan
    assert plan.count("Exchange hashpartitioning") == 1
