"""Cross-scale correctness for the dedup cluster family (VERDICT r04 #8).

The d05/d07 DuckDB oracle is a recursive CTE whose closure blows up past
sf0.01, so the heaviest operators only had small-scale value evidence.
These slow tests close that gap at sf0.1 WITHOUT a recursive oracle: the
LSH candidate edges are collected once (they are a vanishing fraction of
the corpus — that is the whole point of LSH) and an independent
in-test union-find builds ground-truth components; d05/d07 labels must
match it EXACTLY, which subsumes the two closure invariants (every
pair's endpoints share a component; labels are a fixed point of one more
propagation round — a min-id labelling equal to the true components is
idempotent by definition).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.1"


def _ground_truth_components(edges):
    """Plain union-find, written here (not imported) so the check is
    independent of the module under test."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent} | {
        n: find(n) for pair in edges for n in pair}


@pytest.fixture(scope="module")
def truth(spark):
    from klepto_spark.operators import dedup
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs)
    edges = [(r["a"], r["b"]) for r in pairs.collect()]
    assert edges, "sf0.1 LSH must produce candidate pairs"
    comp = _ground_truth_components(edges)
    chars = {r["doc_id"]: r["n_chars"]
             for r in docs.select("doc_id", "n_chars").collect()}
    return edges, comp, chars


def test_d05_labels_match_independent_union_find_at_sf01(spark, truth):
    edges, comp, chars = truth
    got = {r["doc_id"]: (r["canonical"], r["is_duplicate"])
           for r in entry.queries()["d05_dedup_clusters"](
               spark, SF_DIR).collect()}
    assert len(got) == len(chars)  # every document labelled
    for doc in chars:
        want = comp.get(doc, doc)  # singleton -> itself
        assert got[doc] == (want, doc != want), doc
    # explicit closure invariant (already implied): endpoints co-labelled
    assert all(got[u][0] == got[v][0] for u, v in edges)


def test_d07_keep_best_matches_ground_truth_at_sf01(spark, truth):
    edges, comp, chars = truth
    # ground-truth keeper per component: max n_chars, ties -> min id
    members: dict = {}
    for doc in chars:
        members.setdefault(comp.get(doc, doc), []).append(doc)
    keeper = {c: min(ms, key=lambda d: (-chars[d], d))
              for c, ms in members.items()}
    got = {r["doc_id"]: (r["canonical"], r["is_duplicate"])
           for r in entry.queries()["d07_dedup_keep_best"](
               spark, SF_DIR).collect()}
    assert len(got) == len(chars)
    for doc in chars:
        want = keeper[comp.get(doc, doc)]
        assert got[doc] == (want, doc != want), doc


def test_d05_labels_are_propagation_fixed_point_at_sf01(spark, truth):
    """The literal idempotence invariant from the verdict: running ONE
    more min-label propagation round over the d05 output changes no
    label."""
    edges, _, _ = truth
    labels = entry.queries()["d05_dedup_clusters"](spark, SF_DIR) \
        .select(F.col("doc_id").alias("node"),
                F.col("canonical").alias("comp"))
    e = spark.createDataFrame(edges, "src long, dst long")
    e = e.union(e.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))
    nmin = (e.join(labels, e.dst == labels.node)
            .groupBy("src").agg(F.min("comp").alias("nmin")))
    moved = (labels.join(nmin, labels.node == nmin.src)
             .filter(F.col("nmin") < F.col("comp")))
    assert moved.limit(1).count() == 0
