"""Round-10 operator: CDC-chunk near-duplicate pairs (d12) — the
d-family twin of t17 (VERDICT r09 #3). The property under test is the
reason the operator exists: a near-copy with an EARLY insertion still
pairs (chunk boundaries are local), stopword-grade short chunks don't
manufacture pairs, and only chunk hashes ever shuffle."""

import pytest
from pyspark.sql import Row

from klepto_spark.operators import dedup as D
from klepto_spark.plans import inspect as I

pytestmark = pytest.mark.slow


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in rows])


def test_cdc_pairs_survive_early_insertion(spark):
    """Doc 2 = doc 1 with one word inserted near the START: every chunk
    after the edit keeps its hash (boundaries are local), so the pair is
    found with high agreement. Doc 3 is unrelated — no pair."""
    base_words = [f"tok{i}" for i in range(80)]
    edited = " ".join(base_words[:5] + ["INSERTED"] + base_words[5:])
    docs = _docs(spark, [
        (1, " ".join(base_words)),
        (2, edited),
        (3, " ".join(f"other{i}" for i in range(80))),
    ])
    got = {(r["a"], r["b"]): r["shared_chunks"]
           for r in D.cdc_near_dup_pairs(docs, divisor=4).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 2  # most chunks survived the edit


def test_cdc_pairs_min_words_drops_stopword_chunks(spark):
    """Two documents whose ONLY common material is a short (< min_words)
    chunk must not pair: 1-2-word chunks are corpus-wide boilerplate
    whose buckets otherwise grow with the corpus."""
    # divisor=1 puts a boundary after EVERY word -> all chunks are
    # single words; "common" appears in both docs
    docs = _docs(spark, [
        (1, "alpha beta common gamma delta"),
        (2, "epsilon zeta common eta theta"),
    ])
    assert D.cdc_near_dup_pairs(docs, divisor=1, min_shared=1,
                                min_words=3).count() == 0
    # sanity: with the filter off (and min_shared=1) the pair exists
    assert D.cdc_near_dup_pairs(docs, divisor=1, min_shared=1,
                                min_words=1).count() == 1


def test_cdc_pairs_star_cap_keeps_class_connected(spark):
    """A chunk shared by MORE than max_bucket docs star-expands: O(m)
    edges from the smallest id instead of O(m^2) — every member still
    reaches the representative (transitively the whole class)."""
    copy = " ".join(f"w{i}" for i in range(40))
    docs = _docs(spark, [(i, copy) for i in range(10)])
    got = sorted((r["a"], r["b"]) for r in
                 D.cdc_near_dup_pairs(docs, divisor=4, max_bucket=4)
                 .collect())
    # star from doc 0: exactly n-1 edges, all anchored at 0
    assert got == [(0, i) for i in range(1, 10)]
    # uncapped contrast: all 45 pairs
    full = D.cdc_near_dup_pairs(docs, divisor=4, max_bucket=64).count()
    assert full == 45


def test_cdc_pairs_only_hashes_shuffle(spark, sf_dir):
    """Plan pin (the 100 TB posture): chunk hashes and ids shuffle,
    the document text never does — no exchange row wider than
    (key, hash/pair), no Python in the plan."""
    import __spark_entry__ as entry
    df = entry.q_cdc_near_dup(spark, sf_dir)
    plan = I.executed_plan(df)
    assert "Python" not in plan
    for ex in I.exchange_inputs(df):
        assert "text" not in ex, ex


def test_cdc_pairs_agreement_is_distinct_chunks(spark):
    """A chunk repeated WITHIN a doc counts once toward agreement."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [(1, a), (2, a + " " + a)])
    rows = D.cdc_near_dup_pairs(docs, divisor=4, min_shared=1,
                                min_words=1).collect()
    assert len(rows) == 1
    # agreement bounded by doc 1's distinct chunk count
    from klepto_spark.operators.text import cdc_chunk_rows
    n1 = (cdc_chunk_rows(docs.filter("doc_id = 1"), divisor=4)
          .distinct().count())
    assert rows[0]["shared_chunks"] <= n1


def _mini_corpus(spark):
    """Six docs: 1 & 4 near-copies (insertion), 2 & 5 near-copies,
    the rest unrelated — split into index (odd keys) and batch (even)."""
    base = " ".join(f"tok{i}" for i in range(60))
    base2 = " ".join(f"alt{i}" for i in range(60))
    ins = lambda t, w: " ".join(t.split()[:7] + [w] + t.split()[7:])  # noqa: E731
    return _docs(spark, [
        (1, base), (2, base2),
        (3, " ".join(f"solo{i}" for i in range(60))),
        (4, ins(base, "EDIT")), (5, ins(base2, "TWEAK")),
        (6, " ".join(f"lone{i}" for i in range(60))),
    ])


def test_cdc_append_matches_full_restriction(spark, tmp_path):
    """Incremental probe ≡ the full batch operator restricted to pairs
    with a batch endpoint — including the agreement COUNTS (exact by
    construction: every voting bucket contains a batch hash)."""
    corpus = _mini_corpus(spark)
    idx_docs = corpus.filter("doc_id % 2 = 1")
    batch = corpus.filter("doc_id % 2 = 0")
    path = str(tmp_path / "cdcidx")
    D.cdc_write_index(idx_docs, path, divisor=4, min_words=1)
    got = sorted(map(tuple,
                     D.cdc_append(spark, path, batch, divisor=4,
                                  min_shared=2, min_words=1,
                                  commit=False).collect()))
    full = D.cdc_near_dup_pairs(corpus, divisor=4, min_shared=2,
                                min_words=1)
    want = sorted(map(tuple,
                      full.filter("a % 2 = 0 OR b % 2 = 0").collect()))
    assert got == want and len(got) >= 2  # both near-copy pairs found


def test_cdc_append_commit_visibility_and_isolation(spark, tmp_path):
    """commit=True folds the batch so the NEXT append sees it, while the
    returned frame keeps probing the pre-append snapshot; commit=False
    leaves the index untouched."""
    corpus = _mini_corpus(spark)
    path = str(tmp_path / "cdcidx2")
    D.cdc_write_index(corpus.filter("doc_id = 1"), path,
                      divisor=4, min_words=1)
    batch4 = corpus.filter("doc_id = 4")
    D.cdc_append(spark, path, batch4, divisor=4, min_shared=2,
                 min_words=1, commit=False).collect()
    # no-commit: doc 4 absent, a fresh identical append still pairs 1-4
    again = D.cdc_append(spark, path, batch4, divisor=4, min_shared=2,
                         min_words=1, commit=True)
    assert [(r["a"], r["b"]) for r in again.collect()] == [(1, 4)]
    # committed: a batch near doc 4's text now pairs with BOTH 1 and 4
    batch6 = _docs(spark, [(8, corpus.filter("doc_id = 4")
                            .collect()[0]["text"] + " tail")])
    pairs = {(r["a"], r["b"]) for r in
             D.cdc_append(spark, path, batch6, divisor=4, min_shared=2,
                          min_words=1, commit=False).collect()}
    assert pairs == {(1, 8), (4, 8)}


def test_cdc_append_scheme_meta_refusal(spark, tmp_path):
    """An append with a different chunking scheme must refuse: probing
    divisor-8 hashes against a divisor-4 index silently finds nothing."""
    corpus = _mini_corpus(spark)
    path = str(tmp_path / "cdcidx3")
    D.cdc_write_index(corpus, path, divisor=4, min_words=1)
    with pytest.raises(ValueError, match="different scheme"):
        D.cdc_append(spark, path, corpus.limit(1), divisor=8,
                     min_shared=1, min_words=1, commit=False)
