"""Connected-components dedup clustering tests."""

import random

from klepto_spark.operators.components import (
    connected_components, connected_components_star, dedup_clusters)


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter > 1), clique 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "a long, b long")
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_star_matches_propagation_on_random_graphs(spark):
    """large-star/small-star must agree with min-label propagation on
    arbitrary graphs — both compute component = min reachable id."""
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randrange(20, 80))]
        edges = [(x, y) for x, y in edges if x != y]
        pairs = spark.createDataFrame(edges, "a long, b long")
        ref = {r.node: r.comp for r in connected_components(pairs).collect()}
        got = {r.node: r.comp
               for r in connected_components_star(pairs).collect()}
        assert got == ref, f"trial {trial} diverged"


def test_star_handles_long_chain_in_few_rounds(spark):
    """The case propagation is wrong for: a diameter-40 chain needs 40
    propagation rounds (a bounded run raises), while the star form
    contracts it within its O(log^2 n) budget and still labels every node
    with the chain minimum."""
    chain = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(chain, "a long, b long")
    import pytest
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(pairs, max_iter=5)
    got = {r.node: r.comp
           for r in connected_components_star(pairs, max_iter=12).collect()}
    assert got == {i: 0 for i in range(41)}
    # and the dedup wrapper exposes it
    docs = spark.createDataFrame([(i,) for i in range(41)], "doc_id long")
    via = dedup_clusters(docs, pairs, algorithm="star")
    assert {r.doc_id: r.canonical for r in via.collect()} == \
        {i: 0 for i in range(41)}


def test_dedup_clusters_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "a long, b long")
    got = {r.doc_id: (r.canonical, r.is_duplicate)
           for r in dedup_clusters(docs, pairs).collect()}
    assert got[0] == (0, False) and got[3] == (0, True) and got[5] == (0, True)
    assert got[1] == (1, False) and got[2] == (2, False) and got[4] == (4, False)


def test_end_to_end_lsh_to_clusters(spark):
    from klepto_spark.operators.dedup import minhash_lsh_pairs
    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, base[:-10] + "sleepy cat"), (3, base + " again"),
         (4, "completely different text about spark shuffles and parquet")],
        "doc_id long, text string")
    clusters = dedup_clusters(docs, minhash_lsh_pairs(docs))
    got = {r.doc_id: r.canonical for r in clusters.collect()}
    # 1,2,3 are near-dups (transitively) -> one canonical; 4 stands alone
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4


def test_local_union_find_matches_distributed(spark):
    """Driver-side union-find labels == propagation labels on a graph
    with chains, cliques, singeltons-by-absence, and reversed edges;
    the edge-budget guard raises past the limit."""
    from klepto_spark.operators.components import (
        connected_components, connected_components_local)
    pairs = spark.createDataFrame(
        [(5, 3), (3, 1), (10, 11), (11, 12), (12, 10), (20, 21),
         (2, 1), (40, 30)], "a long, b long")
    local = {(r["node"], r["comp"])
             for r in connected_components_local(pairs).collect()}
    dist = {(r["node"], r["comp"])
            for r in connected_components(pairs).collect()}
    assert local == dist
    import pytest as _pytest
    with _pytest.raises(ValueError, match="edge budget|driver budget"):
        connected_components_local(pairs, limit=3)


def test_dedup_clusters_auto_matches_propagation(spark, sf_dir):
    from klepto_spark.operators import dedup
    from klepto_spark.operators.components import dedup_clusters
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs)
    auto = {tuple(r) for r in
            dedup_clusters(docs, pairs, algorithm="auto").collect()}
    prop = {tuple(r) for r in
            dedup_clusters(docs, pairs, algorithm="propagation").collect()}
    assert auto == prop


def test_dedup_keep_best_keeps_highest_score(spark):
    """Cluster survivor = argmax(score, tie min id); singletons keep
    themselves; every member maps to the survivor."""
    from klepto_spark.operators.components import dedup_keep_best
    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7), (9, 99)],
        "doc_id long, quality long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = {r["doc_id"]: (r["canonical"], r["is_duplicate"])
           for r in dedup_keep_best(docs, pairs,
                                    score_col="quality").collect()}
    # cluster {1,2,3}: 2 and 3 tie at 50 -> min id 2 wins
    assert got == {1: (2, True), 2: (2, False), 3: (2, True),
                   4: (4, False), 9: (9, False)}
