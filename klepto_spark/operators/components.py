"""Connected components over candidate-pair graphs — dedup clustering.

LSH produces PAIRS (a~b); deduplication needs CLUSTERS (every doc mapped to
one canonical representative, transitively). This is iterative min-label
propagation expressed as DataFrame joins:

    label(v) <- min(label(v), min over neighbours u of label(u))

repeated until a fixed point. Iterations are O(diameter) — near-duplicate
graphs are overwhelmingly small star/clique components, so 3-5 rounds
converge in practice; the loop checks convergence with a count of changed
labels per round (one action per iteration).

Scale notes: each round is two shuffles (join on edge endpoints + groupBy
min). Labels are checkpointed every round via localCheckpoint to truncate
the lineage — without it, round N replays rounds 1..N-1. For planet-scale
graphs swap in the alternating large-star/small-star algorithm; for the
near-dup use case this direct form is simpler and equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, *, a: str = "a", b: str = "b",
                         max_iter: int | None = None) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component id is
    the minimum node id reachable via pair edges.

    Iterates to the fixed point by default — label propagation needs
    O(diameter) rounds, and a silently-unconverged result is WRONG labels.
    Pass ``max_iter`` to bound the rounds; exhausting it raises rather
    than returning partial labels."""
    edges = (pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
             .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
             .distinct()
             .persist())
    labels = (edges.select(F.col("src").alias("node"))
              .distinct()
              .withColumn("comp", F.col("node")))
    rounds = 0
    while True:
        rounds += 1
        neighbour_min = (edges
                         .join(labels, edges.dst == labels.node)
                         .groupBy("src")
                         .agg(F.min("comp").alias("nmin")))
        updated = (labels
                   .join(neighbour_min, labels.node == neighbour_min.src, "left")
                   .select(F.col("node"),
                           F.least(F.col("comp"),
                                   F.coalesce(F.col("nmin"), F.col("comp")))
                           .alias("comp"),
                           (F.coalesce(F.col("nmin"), F.col("comp"))
                            < F.col("comp")).alias("_changed"))
                   .localCheckpoint())
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
        if max_iter is not None and rounds >= max_iter:
            edges.unpersist()
            raise RuntimeError(
                f"connected_components: not converged after {max_iter} "
                "rounds (component diameter exceeds max_iter); labels "
                "would be wrong — raise max_iter or use the default "
                "fixed-point mode")
    edges.unpersist()
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame, *,
                   key_col: str = "doc_id") -> DataFrame:
    """Full dedup decision: every document mapped to its canonical
    representative (min doc id of its near-dup cluster; singletons map to
    themselves). Output: (key, canonical, is_duplicate)."""
    comp = connected_components(pairs).withColumnRenamed("node", key_col)
    return (df.select(key_col)
            .join(comp, key_col, "left")
            .select(F.col(key_col),
                    F.coalesce(F.col("comp"), F.col(key_col)).alias("canonical"))
            .withColumn("is_duplicate",
                        F.col(key_col) != F.col("canonical")))
