"""Operator-level tests for the M5 extensions: behaviors the oracle parity
suite doesn't pin (IVF probing, rolling-hash robustness, tokenizer shapes,
multimodal batch plumbing, simhash locality)."""

import pytest
from pyspark.sql import functions as F

from klepto_spark.operators import dedup, multimodal as M, similarity, text as T


# ------------------------------------------------------------- dedup ----

def test_exact_dedup_groups_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string")
    got = {r.doc_id: r.n_dups for r in dedup.exact_dedup(df).collect()}
    assert got == {1: 2, 3: 1}  # min key kept, counts right


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base[:-10] + "sleepy cat"
    far = "completely different content about spark engines and parquet"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = {(r.a, r.b) for r in dedup.minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_jaccard_scores_bounded_and_ordered(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij" * 10), (2, "abcdefghij" * 10),
         (3, "abcdefghij" * 9 + "zzzzzzzzzz")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    got = {(r.a, r.b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(df, pairs, threshold=0.0).collect()}
    assert got[(1, 2)] == 1.0
    assert 0.0 < got[(1, 3)] < 1.0
    # the verification pins two frames (candidates + shingle sets);
    # release_caches frees them once results are materialised (ADVICE r05)
    assert dedup.release_caches() >= 2
    assert dedup.release_caches() == 0


def test_capped_bucket_pairs_bounds_giant_class(spark):
    """The 100 TB failure mode: a giant true-duplicate class lands in one
    LSH bucket. The cap must turn the m^2 expansion into m-1 star edges
    while clustering still recovers the full class transitively."""
    from klepto_spark.operators.components import dedup_clusters
    text = "identical duplicate content for the pathological bucket " * 3
    rows = [(i, text) for i in range(1000)] + [
        (5000, "qx zv jk wm unrelated singleton content pf bd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, max_bucket=64)
    got = pairs.collect()
    assert len(got) == 999          # star edges, not 1000*999/2 pairs
    assert {r.a for r in got} == {0}  # all from the min-id representative
    clusters = dedup_clusters(df, pairs).collect()
    canon = {r.doc_id: r.canonical for r in clusters}
    assert all(canon[i] == 0 for i in range(1000))
    assert canon[5000] == 5000


def test_capped_bucket_pairs_all_pairs_below_cap(spark):
    """Buckets at or under the cap keep full all-pairs expansion."""
    buckets = spark.createDataFrame([([1, 2, 3],)], "ids array<long>")
    got = {(r.a, r.b) for r in
           dedup.capped_bucket_pairs(buckets, max_bucket=3).collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}
    star = {(r.a, r.b) for r in
            dedup.capped_bucket_pairs(buckets, max_bucket=2).collect()}
    assert star == {(1, 2), (1, 3)}


def test_connected_components_convergence_guard(spark):
    """A bounded max_iter must raise on non-convergence, never return
    partial (wrong) labels; the default iterates to the fixed point."""
    from klepto_spark.operators.components import connected_components
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long")  # diameter 12
    labels = {r.node: r.comp for r in connected_components(path).collect()}
    assert set(labels.values()) == {0}
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(path, max_iter=2)


def test_simhash_locality(spark):
    """Near-identical docs get close fingerprints (small hamming distance);
    unrelated docs don't collide."""
    base = "spark dataframe shuffle partition broadcast join " * 8
    near = base + "extra"
    far = "zq xv wk jy pf mg bd " * 12
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    fp = {r.doc_id: r.simhash for r in dedup.simhash_df(df).collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(fp[1], fp[2]) <= 8
    assert hamming(fp[1], fp[3]) > 16


# -------------------------------------------------------- similarity ----

def test_kmeans_recovers_separated_blobs(spark):
    """Lloyd's over DataFrame aggs: three well-separated blobs must come
    back as three pure clusters with centroids at the blob means, and the
    result must be deterministic (smallest-key init)."""
    import random
    rng = random.Random(11)
    blobs = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    for i in range(90):
        c = blobs[i % 3]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_fit(df, k=3, max_iter=20, dim=3)
    assert cents == similarity.kmeans_fit(df, k=3, max_iter=20, dim=3)
    # each blob mean is ~one centroid
    for blob in blobs:
        best = min(cents, key=lambda c: sum((a - b) ** 2
                                            for a, b in zip(c, blob)))
        assert all(abs(a - b) < 0.6 for a, b in zip(best, blob))
    # assignment purity: every member lands with its blob's centroid
    assigned = similarity.ivf_assign(df, cents)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    for m in range(3):
        members = {got[i] for i in range(90) if i % 3 == m}
        assert len(members) == 1


def test_kmeans_caches_projection_across_iterations(spark, monkeypatch,
                                                    tmp_path):
    """VERDICT r04 #7: training must read the corpus once, not once per
    Lloyd round. kmeans_fit persists the projected (key, vector) frame;
    every iteration's plan must then scan the InMemory cache, not the
    source — and the trained centroids must be identical to an uncached
    run (persistence is a pure optimisation)."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is the dispatching
    # facade in Spark 4 and its methods aren't the ones instances bind
    from pyspark.sql.classic.dataframe import DataFrame
    rows = [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(60)]
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.parquet(str(tmp_path / "v.parquet"))
    df = spark.read.parquet(str(tmp_path / "v.parquet"))

    captured = {}
    orig_unpersist = DataFrame.unpersist

    def spy_unpersist(self, *a, **kw):
        # the frame being released is the one the iterations consumed:
        # after materialisation its own plan must be an in-memory scan
        captured["plan"] = self._jdf.queryExecution() \
            .executedPlan().toString()
        return orig_unpersist(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "unpersist", spy_unpersist)
    cached = similarity.kmeans_fit(df, k=4, max_iter=5, dim=2)
    assert "InMemory" in captured["plan"], captured["plan"][:400]

    # pure optimisation: identical centroids with persistence disabled
    monkeypatch.setattr(DataFrame, "persist", lambda self, *a, **kw: self)
    monkeypatch.setattr(DataFrame, "unpersist", orig_unpersist)
    assert similarity.kmeans_fit(df, k=4, max_iter=5, dim=2) == cached


def test_brute_force_topk_exact(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = similarity.brute_force_topk(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert top[0].vec_id == 0 and top[0].score == 1.0
    assert top[1].score == 0.0  # orthogonal


def test_ivf_probe_restricts_and_finds(spark):
    import math
    rows = [(i, [math.cos(i * 0.01), math.sin(i * 0.01)]) for i in range(50)]
    rows += [(100 + i, [-math.cos(i * 0.01), -math.sin(i * 0.01)])
             for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = [[1.0, 0.0], [-1.0, 0.0]]
    assigned = similarity.ivf_assign(df, centroids)
    counts = {r.cluster: 1 for r in assigned.collect()}
    assert set(counts) == {0, 1}
    top = similarity.ivf_topk(df, [1.0, 0.05], centroids, n_probe=1, k=3).collect()
    assert all(r.vec_id < 100 for r in top)  # only the probed cluster


def test_cosine_similar_pairs_threshold(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.a, r.b) for r in
           similarity.cosine_similar_pairs(df, threshold=0.99, bits=4).collect()}
    assert (1, 2) in got and (1, 3) not in got


# -------------------------------------------------------------- text ----

def test_token_count_and_word_tokens(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], "text string")
    row = df.select(T.token_count("text").alias("n"),
                    T.word_tokens("text").alias("w")).first()
    assert row.n == 4  # whitespace tokens
    assert row.w == ["hello", ",", "world", "!", "42", "times"]  # BPE-ish


def test_lang_id_english_vs_german(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog sat in the house and it is warm"),
         (2, "der hund und die katze sind nicht in das haus und das ist gut"),
         (3, "xyzzy plugh abracadabra")],
        "doc_id long, text string")
    got = {r.doc_id: r.lang for r in
           df.select("doc_id", T.lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_rolling_hash_fingerprint_stability(spark):
    """Winnowing min-hash fingerprint survives an append (the rolling-hash
    property exact md5 lacks)."""
    base = "abcdefghijklmnopqrstuvwxyz" * 4
    df = spark.createDataFrame([(1, base), (2, base + "APPENDED")],
                               "doc_id long, text string")
    fps = [r.fp for r in
           df.select(T.rolling_hash_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    exact = [r.fp for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert exact[0] != exact[1]


# -------------------------------------------------------- multimodal ----

def test_media_schema_and_features(spark):
    df = spark.createDataFrame([(1, bytearray(b"\x01\x02\x03\x04\x05")),
                                (2, None)],
                               "media_id long, payload binary")
    media = M.attach_media(df, "payload", "media_id", kind="image",
                           mime="image/png")
    assert [f.name for f in media.schema.fields] == \
        [f.name for f in M.MEDIA_SCHEMA.fields]
    feats = {r.media_id: r for r in M.extract_features(media).collect()}
    assert feats[1].n_bytes == 5 and feats[1].feat_head == "01020304"
    assert feats[1].feat_mean == 3
    assert feats[2].n_bytes is None  # NULL payload -> NULL features


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, "video", 2500), (2, "image", None)],
        "media_id long, kind string, duration_ms long")
    got = M.frame_sample_plan(df, every_ms=1000).collect()
    assert {(r.media_id, r.frame_ts) for r in got} == {(1, 0), (1, 1000), (1, 2000)}


def test_prenormalised_topk_matches_brute_force(spark, tmp_path):
    """Unit-vectors-at-rest: dot-only scoring returns the same top-k as
    full cosine, and — once the normalised form is materialised, as it
    would be at rest — the per-row sqrt is GONE from the query plan."""
    import random
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [rng.uniform(-1, 1) for _ in range(16)]
    base = similarity.brute_force_topk(df, q, k=10).collect()
    (similarity.normalise_embeddings(df, dim=16)
     .write.mode("overwrite").parquet(str(tmp_path / "normed")))
    normed = spark.read.parquet(str(tmp_path / "normed"))
    fast = similarity.topk_prenormalised(normed, q, k=10).collect()
    assert [r.vec_id for r in base] == [r.vec_id for r in fast]
    for a, b in zip(base, fast):
        assert abs(a.score - b.score) <= 1e-5
    # the norm column holds the original magnitudes; vectors are unit
    sample = normed.limit(5).collect()
    for r in sample:
        assert abs(sum(x * x for x in r.embedding) - 1.0) < 1e-9
        assert r.vec_norm > 0
    plan = similarity.topk_prenormalised(normed, q, k=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SQRT" not in plan.upper().replace("TAKEORDEREDANDPROJECT", "")


def test_ivf_retrain_splits_hot_cluster(spark, tmp_path):
    """Maintenance loop: an index written with degenerate centroids (one
    hot cluster) retrains into balanced clusters and probes stay exact."""
    import random
    rng = random.Random(5)
    blobs = [[8.0, 0.0], [0.0, 8.0], [-8.0, -8.0]]
    rows = [(i, [c + rng.uniform(-0.5, 0.5) for c in blobs[i % 3]])
            for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # degenerate: both centroids far away -> everything lands in cluster 0
    bad = [[100.0, 100.0], [200.0, 200.0]]
    idx = str(tmp_path / "idx")
    similarity.ivf_write_index(df, bad, idx)
    sizes = {r.cluster: r.n_vectors
             for r in similarity.ivf_stats(spark, idx).collect()}
    assert sizes == {0: 120}  # hot cluster detected via stats
    idx2 = str(tmp_path / "idx2")
    cents = similarity.ivf_retrain(spark, idx, k=3, out_path=idx2)
    sizes2 = {r.cluster: r.n_vectors
              for r in similarity.ivf_stats(spark, idx2).collect()}
    assert len(sizes2) == 3 and all(v == 40 for v in sizes2.values())
    # probing the retrained index matches exact brute force
    q = [8.0, 0.5]
    got = similarity.ivf_probe_index(spark, idx2, q, cents, n_probe=1, k=5)
    exact = similarity.brute_force_topk(df, q, k=5)
    assert [r.vec_id for r in got.collect()] == \
        [r.vec_id for r in exact.collect()]


def test_pq_compression_and_adc_search(spark):
    """PQ: codebooks train per subspace, codes are m small ints, and
    ADC top-k finds the true nearest neighbours on separated data."""
    import random
    rng = random.Random(9)
    blobs = [[6.0, 0.0, 0.0, 0.0], [0.0, 6.0, 0.0, 0.0],
             [0.0, 0.0, 6.0, 0.0], [0.0, 0.0, 0.0, 6.0]]
    rows = [(i, [c + rng.uniform(-0.4, 0.4) for c in blobs[i % 4]])
            for i in range(160)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train_wrap(df, m=2, k=8, max_iter=10, dim=4)
    assert len(books) == 2 and all(len(b) == 8 for b in books)
    assert books == pq_train_wrap(df, m=2, k=8, max_iter=10, dim=4)  # deterministic
    codes = similarity.pq_encode(df, books)
    row = codes.first()
    assert len(row.codes) == 2 and all(0 <= c < 8 for c in row.codes)
    # ADC search: every top-8 hit for a blob-0 query is a blob-0 member
    q = [6.0, 0.1, -0.1, 0.0]
    got = similarity.pq_topk(codes, q, books, k=8).collect()
    assert all(r.vec_id % 4 == 0 for r in got), [r.vec_id for r in got]
    # dim mismatch fails loudly
    import pytest
    with pytest.raises(ValueError, match="query dim"):
        similarity.pq_topk(codes, [1.0, 2.0], books)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_wrap(df, m=3, dim=4)


def pq_train_wrap(df, m, k=16, max_iter=8, dim=None):
    return similarity.pq_train(df, m, k=k, max_iter=max_iter, dim=dim)


def test_pq_rerank_recovers_exact_topk(spark, sf_dir):
    """Two-stage ANN on the driver embeddings: ADC shortlist + exact
    cosine rerank equals the brute-force top-10 once the shortlist is
    wide enough for the query's quantisation error. Training, encode and
    argmin are all deterministic, so these (query, n_candidates) pins
    are stable."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    books = similarity.pq_train(emb, m=8, k=64, max_iter=4, dim=64)
    codes = similarity.pq_encode(emb, books).cache()
    for qid, nc in [(7, 50), (42, 50), (0, 150)]:
        q = [float(x) for x in
             emb.filter(f"vec_id = {qid}").first()["embedding"]]
        exact = {(r["vec_id"], r["score"])
                 for r in similarity.brute_force_topk(emb, q, k=10).collect()}
        got = {(r["vec_id"], r["score"])
               for r in similarity.pq_topk_reranked(
                   codes, emb, q, books, k=10, n_candidates=nc).collect()}
        assert got == exact, (qid, nc)


def test_opq_rotation_reduces_quantisation_error(spark, sf_dir):
    """OPQ (learned rotation + PQ): the rotation is orthogonal and
    deterministic, cuts quantisation MSE vs plain PQ (identity rotation,
    same training pipeline), and ADC search in the rotated space keeps
    the query's own vector in its shortlist."""
    import numpy as np
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    R0, books0 = similarity.opq_train(emb, m=8, k=16, iters=0, dim=64)
    R5, books5 = similarity.opq_train(emb, m=8, k=16, iters=5, dim=64)
    assert R5 == similarity.opq_train(emb, m=8, k=16, iters=5, dim=64)[0]
    Rm = np.asarray(R5)
    assert np.allclose(Rm @ Rm.T, np.eye(64), atol=1e-8)
    assert np.allclose(np.asarray(R0), np.eye(64))
    e_pq = similarity.opq_quantisation_error(emb, R0, books0)
    e_opq = similarity.opq_quantisation_error(emb, R5, books5)
    assert e_opq < e_pq
    q = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    codes = similarity.opq_encode(emb, R5, books5)
    top = similarity.opq_topk(codes, q, R5, books5, k=10).collect()
    assert len(top) == 10
    assert any(r["vec_id"] == 7 for r in top)


def test_ivfpq_index_prunes_and_reranks_exact(spark, sf_dir, tmp_path):
    """IVF-PQ at-rest index: the probe filter prunes partitions at the
    scan, the query's own vector tops the result, and with every
    cluster probed + a wide shortlist the residual-ADC + exact-rerank
    pipeline recovers the brute-force top-10 exactly (scores included —
    the rerank reads the full vectors riding in the index rows)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    cents, books = similarity.ivfpq_train(emb, n_clusters=4, m=8, k=16,
                                          dim=64)
    path = str(tmp_path / "ivfpq")
    similarity.ivfpq_write_index(emb, cents, books, path)
    q = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]

    pruned = similarity.ivfpq_search(spark, path, q, cents, books,
                                     n_probe=2, k=10, n_candidates=100)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    rows = pruned.collect()
    assert len(rows) == 10 and rows[0]["vec_id"] == 7

    exact = {(r["vec_id"], r["score"])
             for r in similarity.brute_force_topk(emb, q, k=10).collect()}
    full = {(r["vec_id"], r["score"])
            for r in similarity.ivfpq_search(
                spark, path, q, cents, books, n_probe=4, k=10,
                n_candidates=200).collect()}
    assert full == exact


def test_vectorised_ann_paths_tolerate_null_embeddings(spark):
    """NULL / wrong-dimension / NULL-element vectors must be DROPPED by
    the vectorised argmin/encode paths (matching the expression paths'
    NULL propagation), not crash the Arrow UDF."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, None),
            (2, [0.0, 1.0]),  # wrong dimension
            (3, [0.0, None, 0.0, 0.0]),  # NULL element
            (4, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    got = similarity.ivf_topk(df, [1.0, 0.0, 0.0, 0.0], cents,
                              n_probe=1, k=5).collect()
    assert [r["vec_id"] for r in got] == [0]
    codes = {r["vec_id"]: r["codes"]
             for r in similarity.pq_encode(df, _wide_books()).collect()}
    assert codes[1] is None and codes[2] is None and codes[3] is None
    assert codes[0] is not None and len(codes[0]) == 2
    enc = {r["vec_id"]: (r["cluster"], r["codes"]) for r in
           (df.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
            .select("vec_id",
                    similarity._ivfpq_encode_pandas(cents, _wide_books())(
                        similarity.F.col("v")).alias("e"))
            .select("vec_id", "e.cluster", "e.codes").collect())}
    assert enc[0][0] == 0 and enc[1] == (None, None)
    # pq_topk over the NULL codes: ascending sort is NULLS FIRST in Spark,
    # so without the isNotNull filter the dropped rows would occupy the
    # top-k with NULL ADC scores and displace real neighbours
    topk = similarity.pq_topk(
        similarity.pq_encode(df, _wide_books()), [1.0, 0.0, 0.0, 0.0],
        _wide_books(), k=3).collect()
    assert [r["vec_id"] for r in topk] == [0, 4]
    assert all(r["sq_dist"] is not None for r in topk)


def test_pq_train_refuses_sample_smaller_than_k(spark):
    rows = [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="< k="):
        similarity.ivfpq_train(df, n_clusters=2, m=2, k=16, dim=4,
                               sample_n=5)
    with pytest.raises(ValueError, match="< k="):
        similarity.opq_train(df, m=2, k=16, dim=4, sample_n=5)


def _wide_books():
    # 2 subspaces x k codes over dim=4 vectors, k*sub big enough to
    # force pq_encode onto the pandas path (total terms > budget)
    import math
    return [[[math.sin(1.1 * (j + 1) + 0.7 * c + i) for j in range(2)]
             for c in range(130)] for i in range(2)]


def test_ann_recall_gate_default_params(spark):
    """Retrieval-quality gate (VERDICT r3 #5): with the DEFAULT index
    parameters (ivfpq n_probe=2, n_candidates=50; pq+rerank
    n_candidates=50), recall@10 vs brute-force cosine must stay >= 0.9
    averaged over seeded queries. The value-exact contract queries pin
    specific constants; this pins the QUALITY surface, so a future index
    change cannot silently trade recall away.

    The gate runs on seeded CLUSTERED data (10 Gaussian clusters,
    noise 0.15) — data with real neighbourhood structure, where an index
    implementation regression shows directly. The near-uniform testdata
    corpus is deliberately NOT the gate: at 500 points in 64-dim its
    cosine neighbourhoods straddle any coarse partition (measured: 0.5
    recall at defaults, 0.66 even probing every cell — a data-hardness
    property, not an index defect; the full-sweep == brute-force
    equivalence on that corpus is pinned separately by
    test_ivfpq_index_prunes_and_reranks_exact)."""
    import numpy as np
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 64))
    rows = [(i, [float(x) for x in
                 centers[i % 10] + rng.normal(size=64) * 0.15])
            for i in range(400)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    queries = {i: rows[i][1] for i in (0, 41, 102, 223, 384)}
    truth = {qid: {r["vec_id"] for r in
                   similarity.brute_force_topk(emb, q, k=10).collect()}
             for qid, q in queries.items()}

    cents, books = similarity.ivfpq_train(emb, n_clusters=8, m=8, dim=64)
    hits = 0
    for qid, q in queries.items():
        got = {r["vec_id"] for r in
               similarity.ivfpq_topk(emb, q, cents, books, k=10).collect()}
        hits += len(got & truth[qid])
    ivfpq_recall = hits / (10 * len(queries))

    pq_books = similarity.pq_train(emb, m=8, dim=64)
    codes = similarity.pq_encode(emb, pq_books)
    hits = 0
    for qid, q in queries.items():
        got = {r["vec_id"] for r in similarity.pq_topk_reranked(
            codes, emb, q, pq_books, k=10).collect()}
        hits += len(got & truth[qid])
    pq_recall = hits / (10 * len(queries))

    assert ivfpq_recall >= 0.9, f"IVF-PQ recall@10 degraded: {ivfpq_recall}"
    assert pq_recall >= 0.9, f"PQ+rerank recall@10 degraded: {pq_recall}"


def test_semantic_dedup_drops_larger_id_of_each_similar_pair(spark):
    """Embedding-cosine near-dup removal: of each pair over the threshold
    the larger-id document is dropped; documents without an embedding
    survive; chains drop every non-minimal member reachable by a pair."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]),
         (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
         (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [0.0, 0.999, 0.02, 0.0]),   # near-dup of 2
         (4, [0.0, 0.0, 1.0, 0.0])],
        "vec_id int, embedding array<double>")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(5)] + [(9, "no embedding")],
        "doc_id int, text string")
    out = dedup.semantic_dedup(docs, emb, threshold=0.98, bits=2, dim=4)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 2, 4, 9]


def test_pq_expression_path_nulls_invalid_vectors(spark):
    """The codegen'd pq_encode path must emit a NULL codes ARRAY (not an
    array of NULL elements) for NULL / wrong-dim / non-finite vectors —
    under ANSI mode element_at(lut, NULL) does not propagate NULL, so a
    non-NULL codes array with NULL elements would score garbage ADC."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, None),
            (2, [0.0, 1.0]), (3, [0.0, None, 0.0, 0.0]),
            (4, [0.0, float("nan"), 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    books = [[[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 1.0]]]  # m*k*sub=8
    codes = {r["vec_id"]: r["codes"]
             for r in similarity.pq_encode(df, books).collect()}
    assert codes[0] is not None
    assert codes[1] is None and codes[2] is None
    assert codes[3] is None and codes[4] is None
    top = similarity.pq_topk(similarity.pq_encode(df, books),
                             [1.0, 0.0, 0.0, 0.0], books, k=5).collect()
    assert [r["vec_id"] for r in top] == [0]
    assert all(r["sq_dist"] is not None for r in top)


def test_hll_sketches_error_bound_and_mergeability(spark, sf_dir):
    """HLL distinct: estimate within the standard error of exact, and
    per-group sketches union to the same estimate as sketching the whole
    corpus — the property that makes stored sketches roll-uppable."""
    from klepto_spark.operators import sketches as S
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = events.select("user_id").distinct().count()
    est = S.hll_distinct(events, "user_id").first()["approx_distinct"]
    assert abs(est - exact) / exact < 0.05  # ~3x sigma at lgk=12
    per_type = S.hll_sketch_by(events, "user_id", ["event_type"])
    rolled = S.hll_rollup(per_type).first()["approx_distinct"]
    direct = S.hll_distinct(events, "user_id").first()["approx_distinct"]
    assert rolled == direct  # union is lossless


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    """Banded range join == naive cross-filter on boundary-heavy data
    (half-open + closed ends, degenerate intervals, equi keys), and the
    plan contains no nested-loop/cartesian node — the operator's point."""
    from klepto_spark.operators.rangejoin import range_join
    pts = spark.createDataFrame(
        [(i, k, float(p)) for i, (k, p) in enumerate(
            [("a", 0), ("a", 5), ("a", 10), ("a", 15), ("b", 5),
             ("a", 9.999), ("a", 10.001), ("b", 20)])],
        "pid long, k string, p double")
    ivs = spark.createDataFrame(
        [(0, "a", 0.0, 10.0), (1, "a", 10.0, 20.0), (2, "b", 0.0, 30.0),
         (3, "a", 50.0, 40.0),   # degenerate: end < start, matches nothing
         (4, "b", 5.0, 5.0)],    # zero-width: only closed='both' at p=5
        "iid long, k string, s double, e double")
    for closed in ("left", "both"):
        got = sorted(
            (r["pid"], r["iid"]) for r in range_join(
                pts, ivs.withColumnRenamed("k", "k2"), point="p", start="s",
                end="e", bucket_width=7, closed=closed).collect())
        upper = "p <= e" if closed == "both" else "p < e"
        want = sorted(
            (r["pid"], r["iid"]) for r in pts.crossJoin(ivs.drop("k"))
            .filter(f"s <= p AND {upper}").collect())
        assert got == want, closed
    # keyed variant restricts to matching keys
    keyed = sorted((r["pid"], r["iid"]) for r in range_join(
        pts, ivs, point="p", start="s", end="e", bucket_width=7,
        keys=["k"]).collect())
    want_k = sorted((r["pid"], r["iid"]) for r in
                    pts.join(ivs, "k").filter("s <= p AND p < e").collect())
    assert keyed == want_k
    plan = range_join(pts, ivs, point="p", start="s", end="e",
                      bucket_width=7)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_decontamination_flags_ngram_overlap(spark):
    """Docs sharing any word n-gram with the benchmark set are flagged
    (including the benchmark docs themselves); clean docs are not; the
    benchmark gram set broadcasts."""
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps high"),
         (1, "completely unrelated words here today"),
         (2, "we saw the quick brown fox yesterday"),   # shares a 3-gram
         (3, "quick brown dog runs far away")],          # only a 2-gram
        "doc_id int, text string")
    bench = docs.filter("doc_id = 0")
    got = sorted(r["doc_id"] for r in
                 T.contaminated_ids(docs, bench, n=3).collect())
    assert got == [0, 2]
    plan = T.contaminated_ids(docs, bench, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_ivf_append_ingests_without_touching_existing_partitions(
        spark, tmp_path):
    """ivf_append: new vectors land in their nearest clusters; files of
    untouched clusters keep byte-identity; probes find appended vectors
    through the same pruned scan."""
    import os
    import numpy as np
    from pyspark.sql import functions as F
    from klepto_spark.operators.similarity import (
        ivf_append, ivf_probe_index, ivf_stats, ivf_write_index)

    cents = [[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]]
    rng = np.random.default_rng(5)
    base = [(i, [float(cents[i % 3][0] + rng.normal(0, 0.5)),
                 float(cents[i % 3][1] + rng.normal(0, 0.5))])
            for i in range(90)]
    df = spark.createDataFrame(base, "vec_id bigint, embedding array<float>")
    p = str(tmp_path / "ivf")
    ivf_write_index(df, cents, p)

    def sig(cluster):
        d = f"{p}/cluster={cluster}"
        return {f: os.stat(os.path.join(d, f)).st_mtime_ns
                for f in os.listdir(d) if f.endswith(".parquet")}

    before = {c: sig(c) for c in range(3)}
    # a batch that lands ONLY in cluster 0's region
    newv = [(1000 + i, [10.0 + i * 0.01, 0.2]) for i in range(5)]
    ivf_append(spark.createDataFrame(
        newv, "vec_id bigint, embedding array<float>"), cents, p)
    after = {c: sig(c) for c in range(3)}
    assert before[1] == after[1] and before[2] == after[2]  # untouched
    assert set(before[0]) <= set(after[0])  # cluster 0 gained files only
    sizes = {r["cluster"]: r["n_vectors"]
             for r in ivf_stats(spark, p).collect()}
    assert sizes[0] == 35 and sizes[1] == 30 and sizes[2] == 30
    got = ivf_probe_index(spark, p, [10.0, 0.2], cents, n_probe=1, k=5)
    assert any(r["vec_id"] >= 1000 for r in got.collect())


def test_per_doc_cap_bounds_mass_near_copy_candidates(spark):
    """VERDICT r05 #5: near-copies with small variations land in
    overlapping-but-distinct buckets, so candidate pairs grow
    quadratically in the duplicate-class size even though every bucket
    stays under max_bucket. With per_doc_cap=C the output is bounded by
    2*C*n_docs, and connected components over the capped pairs still
    recover the whole class (each member keeps its strongest edges)."""
    import random
    rng = random.Random(7)
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = []
    for i in range(80):  # 80 near-copies: each differs in one word
        words = base.split()
        words[rng.randrange(len(words))] = f"tok{i}"
        rows.append((i, " ".join(words)))
    for i in range(80, 120):  # 40 unrelated docs
        rows.append((i, f"completely different text number {i} " * 8))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.minhash_lsh_pairs(df).count()
    cap = 5
    capped_df = dedup.minhash_lsh_pairs(df, per_doc_cap=cap)
    capped = capped_df.count()
    assert uncapped > 1000  # quadratic blowup is real in this corpus
    assert capped <= 2 * cap * 120  # linear bound holds
    assert capped < uncapped / 3
    # transitivity: the capped graph still connects the whole class
    from klepto_spark.operators.components import connected_components
    comp = connected_components(capped_df)
    sizes = [r["n"] for r in
             comp.groupBy("comp").agg(
                 F.count(F.lit(1)).alias("n")).collect()]
    assert max(sizes) == 80


def test_per_doc_cap_off_keeps_exact_candidates(spark):
    """Cap off (the contract-query default) must be byte-identical to
    the historical candidate set."""
    rows = [(i, f"document body {i % 4} repeated " * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.a, r.b) for r in dedup.minhash_lsh_pairs(df).collect()}
    b = {(r.a, r.b) for r in
         dedup.minhash_lsh_pairs(df, per_doc_cap=None).collect()}
    assert a == b and a


def test_cross_corpus_cap_keeps_orientation(spark):
    """Capped cross-corpus pairs stay (old in a, new in b) and bounded."""
    old = spark.createDataFrame(
        [(i, "shared benchmark passage " * 10 + f"v{i}")
         for i in range(30)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(100 + i, "shared benchmark passage " * 10 + f"w{i}")
         for i in range(10)], "doc_id long, text string")
    got = dedup.cross_corpus_pairs(old, new, per_doc_cap=3).collect()
    assert got
    assert all(r.a < 100 <= r.b for r in got)
    assert len(got) <= 2 * 3 * 40


def test_decode_images_pil_gate(spark, monkeypatch):
    """The image-decode feature gate (VERDICT r10 #6). Three pins:
    (1) the decode kernel fills width/height through any PIL-compatible
    module — monkeypatched fake here, real Pillow in a deployment, zero
    code change; (2) undecodable/NULL payloads degrade to NULL dims, no
    raise; (3) end-to-end decode_images in THIS container (no PIL on
    the workers) keeps every row and schema with NULL dims."""
    import io
    import sys
    import types

    class _FakeImg:
        def __init__(self, size):
            self.size = size

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImageMod:
        @staticmethod
        def open(buf):
            data = buf.read()
            if not data.startswith(b"IMG"):
                raise OSError("cannot identify image file")
            return _FakeImg((int(data[3:6]), int(data[6:9])))

    # (1)+(2): kernel with a fake PIL.Image
    w, h = M._decode_image_batch(
        [b"IMG640480", b"junk", None], _FakeImageMod)
    assert (w, h) == ([640, None, None], [480, None, None])

    # the gate itself resolves through `from PIL import Image`
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _FakeImageMod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    assert M._pil_image() is _FakeImageMod

    # (3): worker-side gate finds no PIL here -> NULL dims, rows kept
    monkeypatch.delitem(sys.modules, "PIL")
    df = spark.createDataFrame([(1, bytearray(b"IMG640480")), (2, None)],
                               "media_id long, payload binary")
    media = M.attach_media(df, "payload", "media_id", kind="image")
    out = {r.media_id: r for r in M.decode_images(media).collect()}
    assert len(out) == 2
    assert [f.name for f in M.decode_images(media).schema.fields] == \
        [f.name for f in M.MEDIA_SCHEMA.fields]
    assert out[1].width is None and out[1].height is None
    assert bytes(out[1].payload) == b"IMG640480"  # payload rides through
