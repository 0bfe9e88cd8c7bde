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
