"""Unit semantics for mixture_sample and pack_sequences (beyond the
DuckDB parity the contract queries give): mixture proportions actually
land, the limiting group is kept whole, packs respect the budget
arithmetic, and both are repartition-stable (membership/assignment is a
pure function of the row, never of physical layout)."""

import pytest
from pyspark.sql import functions as F

from klepto_spark.operators.packing import pack_sequences
from klepto_spark.operators.sampling import mixture_sample


@pytest.fixture(scope="module")
def corpus(spark):
    # deliberately lopsided: a=600, b=300, c=100, d=50 (d unlisted)
    rows = [(i, "a" if i < 600 else "b" if i < 900 else
             "c" if i < 1000 else "d", (i * 37) % 90 + 10)
            for i in range(1050)]
    return spark.createDataFrame(rows, "doc_id long, src string, tok long")


def test_mixture_hits_target_proportions(corpus):
    # target 50/30/20 over a,b,c; c (100 rows, w=.2 -> n/w=500) limits.
    out = mixture_sample(corpus, "src", "doc_id",
                         {"a": 0.5, "b": 0.3, "c": 0.2}, salt="t")
    got = dict(out.groupBy("src").count().collect() and
               [(r["src"], r["count"]) for r in
                out.groupBy("src").count().collect()])
    assert got["c"] == 100          # limiting group kept whole
    assert "d" not in got           # unlisted group dropped
    # expectation 250/150: Bernoulli noise at n~250 is ~sqrt(n)
    assert abs(got["a"] - 250) < 60
    assert abs(got["b"] - 150) < 45


def test_mixture_is_repartition_stable(corpus):
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    a = {r["doc_id"] for r in
         mixture_sample(corpus, "src", "doc_id", w, salt="t").collect()}
    b = {r["doc_id"] for r in
         mixture_sample(corpus.repartition(13, "tok"), "src", "doc_id",
                        w, salt="t").collect()}
    assert a == b


def test_mixture_rejects_bad_weights(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "src", "doc_id", {})
    with pytest.raises(ValueError):
        mixture_sample(corpus, "src", "doc_id", {"a": 0.0})


def test_pack_prefix_sum_invariants(corpus):
    out = pack_sequences(corpus, "doc_id", F.col("tok"), budget=256,
                         shards=4, salt="t").collect()
    assert len(out) == 1050
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        cum = by_shard.get(r["shard"], 0)
        # pack id / offset are exactly where the doc's first token lands
        assert r["pack_id"] == cum // 256
        assert r["pack_off"] == cum % 256
        assert 0 <= r["pack_off"] < 256
        by_shard[r["shard"]] = cum + r["tok"]
    # every shard starts at pack 0 and pack ids are monotone in doc order
    rows = sorted(out, key=lambda r: (r["shard"], r["doc_id"]))
    for s in by_shard:
        packs = [r["pack_id"] for r in rows if r["shard"] == s]
        assert packs[0] == 0 and packs == sorted(packs)


def test_pack_is_repartition_stable(corpus):
    a = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_off"])
         for r in pack_sequences(corpus, "doc_id", F.col("tok"),
                                 budget=128, shards=3, salt="t").collect()}
    b = {(r["doc_id"], r["shard"], r["pack_id"], r["pack_off"])
         for r in pack_sequences(corpus.repartition(17), "doc_id",
                                 F.col("tok"), budget=128, shards=3,
                                 salt="t").collect()}
    assert a == b


def test_pack_rejects_bad_args(corpus):
    with pytest.raises(ValueError):
        pack_sequences(corpus, "doc_id", F.col("tok"), budget=0)
    with pytest.raises(ValueError):
        pack_sequences(corpus, "doc_id", F.col("tok"), budget=10, shards=0)


# ---------------------------------------------------------------------------
# Incremental MinHash dedup against the at-rest band index
# ---------------------------------------------------------------------------

def test_minhash_append_matches_full_recompute(spark, sf_dir, tmp_path):
    """Index the first 400 docs, append the last 100: the incremental
    pairs must equal the FULL recompute's pairs restricted to pairs with
    a new-batch endpoint (max_bucket high enough that star-capping can't
    diverge between the two bucket populations)."""
    from klepto_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.filter("doc_id < 400")
    new = docs.filter("doc_id >= 400")
    idx = str(tmp_path / "mh_idx")
    dedup.minhash_write_index(old, idx)

    got = {(r["a"], r["b"]) for r in
           dedup.minhash_append(spark, idx, new, max_bucket=10_000)
           .collect()}
    full = {(r["a"], r["b"]) for r in
            dedup.minhash_lsh_pairs(docs, max_bucket=10_000).collect()}
    want = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert got == want
    assert want, "the sf0.001 corpus must actually have cross-batch dups"


def test_minhash_append_commits_index_for_next_batch(spark, sf_dir,
                                                     tmp_path):
    from klepto_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "mh_idx2")
    dedup.minhash_write_index(docs.filter("doc_id < 300"), idx)
    # batch 1 commits; batch 2 must see batch 1's docs as "old"
    dedup.minhash_append(
        spark, idx, docs.filter("doc_id >= 300 AND doc_id < 400"),
        max_bucket=10_000).collect()
    got = {(r["a"], r["b"]) for r in
           dedup.minhash_append(spark, idx, docs.filter("doc_id >= 400"),
                                max_bucket=10_000).collect()}
    full = {(r["a"], r["b"]) for r in
            dedup.minhash_lsh_pairs(docs, max_bucket=10_000).collect()}
    want = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert got == want


def test_minhash_append_no_commit_leaves_index_untouched(spark, sf_dir,
                                                         tmp_path):
    from klepto_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "mh_idx3")
    dedup.minhash_write_index(docs.filter("doc_id < 400"), idx)
    before = spark.read.parquet(idx).count()
    dedup.minhash_append(spark, idx, docs.filter("doc_id >= 400"),
                         commit=False).collect()
    assert spark.read.parquet(idx).count() == before


def test_minhash_append_probe_broadcasts_not_shuffles_index(spark, sf_dir,
                                                            tmp_path):
    """The index side of the probe must be served by a broadcast join —
    an index shuffle would re-pay the corpus at every append."""
    from klepto_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "mh_idx4")
    dedup.minhash_write_index(docs.filter("doc_id < 400"), idx)
    out = dedup.minhash_append(spark, idx, docs.filter("doc_id >= 400"),
                               commit=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_mixture_listed_but_absent_group_renormalises(corpus):
    # "e" is in the target but absent from the data: the realised
    # mixture renormalises over present groups; nothing crashes, the
    # limiting present group is kept whole.
    out = mixture_sample(corpus, "src", "doc_id",
                         {"a": 0.4, "c": 0.3, "e": 0.3}, salt="t")
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert "e" not in got and got["c"] == 100
    # a thinned to match: expectation n_c/w_c * w_a = 133
    assert abs(got["a"] - 133) < 45


def test_cross_corpus_pairs_probe_matches_full_restriction(spark, sf_dir):
    """The probe-shaped cross-corpus dedup must find exactly the full
    intra-corpus run's pairs restricted to cross-split pairs, with the
    old side always in column a."""
    from klepto_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    S = 400
    got = {(r["a"], r["b"]) for r in dedup.cross_corpus_pairs(
        docs.filter(f"doc_id < {S}"), docs.filter(f"doc_id >= {S}"),
        max_bucket=10_000).collect()}
    full = {(r["a"], r["b"]) for r in
            dedup.minhash_lsh_pairs(docs, max_bucket=10_000).collect()}
    want = {(a, b) for a, b in full if a < S <= b}
    assert got == want and got
    assert all(a < S <= b for a, b in got)


def test_minhash_append_empty_batch_is_noop(spark, sf_dir, tmp_path):
    from klepto_spark.operators import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "mh_empty")
    dedup.minhash_write_index(docs, idx)
    before = spark.read.parquet(idx).count()
    pairs = dedup.minhash_append(spark, idx, docs.filter("doc_id < 0"))
    assert pairs.count() == 0
    assert spark.read.parquet(idx).count() == before


def test_mixture_all_listed_groups_absent_yields_empty(corpus):
    out = mixture_sample(corpus, "src", "doc_id", {"zz": 1.0}, salt="t")
    assert out.count() == 0


# ---------------------------------------------------------------------------
# Decontamination against the at-rest held-out band index (VERDICT r06)
# ---------------------------------------------------------------------------

def test_cross_corpus_indexed_matches_direct(spark, sf_dir, tmp_path):
    """Probing the STORED held-out band index must find exactly what the
    two-corpus operator finds — same pairs, same (train, held-out)
    orientation — on both the exact and per_doc_cap candidate paths."""
    from klepto_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter("doc_id < 400")
    held = docs.filter("doc_id >= 400")
    idx = str(tmp_path / "held_idx")
    dedup.minhash_write_index(held, idx)

    want = {(r["a"], r["b"]) for r in
            dedup.cross_corpus_pairs(train, held,
                                     max_bucket=10_000).collect()}
    got = {(r["a"], r["b"]) for r in
           dedup.cross_corpus_pairs_indexed(spark, idx, train,
                                            max_bucket=10_000).collect()}
    assert got == want and want
    assert all(a < 400 <= b for a, b in got)

    want_c = {(r["a"], r["b"]) for r in
              dedup.cross_corpus_pairs(train, held,
                                       per_doc_cap=3).collect()}
    got_c = {(r["a"], r["b"]) for r in
             dedup.cross_corpus_pairs_indexed(spark, idx, train,
                                              per_doc_cap=3).collect()}
    assert got_c == want_c and want_c


# ---------------------------------------------------------------------------
# Incremental SEMANTIC dedup against the at-rest signature index
# (embedding twin of minhash_append, VERDICT r06)
# ---------------------------------------------------------------------------

SEM_T = 0.35


def test_semantic_append_matches_full_recompute(spark, sf_dir, tmp_path):
    """Index the first 400 embeddings, append the rest: incremental
    verified pairs == full cosine_similar_pairs over the union,
    restricted to pairs with a new-batch endpoint — scores included."""
    from klepto_spark.operators import dedup, similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.filter("vec_id < 400")
    new = emb.filter("vec_id >= 400")
    idx = str(tmp_path / "sem_idx")
    dedup.semantic_write_index(old, idx, bits=4)

    got = {(r["a"], r["b"], r["cosine"]) for r in
           dedup.semantic_append(spark, idx, new, SEM_T, bits=4,
                                 max_bucket=10_000).collect()}
    full = {(r["a"], r["b"], r["cosine"]) for r in
            similarity.cosine_similar_pairs(emb, SEM_T, bits=4,
                                            max_bucket=10_000).collect()}
    want = {(a, b, c) for a, b, c in full if a >= 400 or b >= 400}
    assert got == want
    assert want, "sf0.001 embeddings must have cross-batch near-dups"


def test_semantic_append_commits_index_for_next_batch(spark, sf_dir,
                                                      tmp_path):
    from klepto_spark.operators import dedup, similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "sem_idx2")
    dedup.semantic_write_index(emb.filter("vec_id < 300"), idx, bits=4)
    dedup.semantic_append(spark, idx,
                          emb.filter("vec_id >= 300 AND vec_id < 400"),
                          SEM_T, bits=4, max_bucket=10_000).collect()
    got = {(r["a"], r["b"]) for r in
           dedup.semantic_append(spark, idx, emb.filter("vec_id >= 400"),
                                 SEM_T, bits=4,
                                 max_bucket=10_000).collect()}
    full = {(r["a"], r["b"]) for r in
            similarity.cosine_similar_pairs(emb, SEM_T, bits=4,
                                            max_bucket=10_000).collect()}
    want = {(a, b) for a, b in full if a >= 400 or b >= 400}
    assert got == want


def test_semantic_append_no_commit_and_path_list(spark, sf_dir, tmp_path):
    from klepto_spark.operators import dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "sem_idx3")
    dedup.semantic_write_index(emb.filter("vec_id < 400"), idx, bits=4)
    before = spark.read.parquet(idx).count()
    pairs = dedup.semantic_append(spark, idx, emb.filter("vec_id >= 400"),
                                  SEM_T, bits=4, commit=False)
    n = pairs.count()
    assert spark.read.parquet(idx).count() == before
    # a path LIST probes the same index but refuses to commit into it
    got = dedup.semantic_append(spark, [idx], emb.filter("vec_id >= 400"),
                                SEM_T, bits=4, commit=False).count()
    assert got == n
    with pytest.raises(ValueError, match="single index root"):
        dedup.semantic_append(spark, [idx], emb.filter("vec_id >= 400"),
                              SEM_T, bits=4, commit=True)
