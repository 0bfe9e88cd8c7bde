"""Round-15 optimization pins: semantics-preservation tests for the
operators whose internals changed this round (the r14 pattern —
bit-equality of the rewritten shape against the historical form)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from klepto_spark.operators.components import (connected_components,
                                               connected_components_local,
                                               dedup_keep_best)


def _window_keep_best(df, pairs, *, score_col, key_col="doc_id"):
    """The pre-r15 dedup_keep_best: corpus-wide row_number window +
    join back — kept verbatim as the semantic reference."""
    pairs = pairs.persist()
    try:
        try:
            comp = F.broadcast(connected_components_local(pairs))
        except ValueError:
            comp = connected_components(pairs)
    finally:
        pairs.unpersist()
    comp = comp.withColumnRenamed("node", key_col)
    labelled = (df.select(F.col(key_col), F.col(score_col).alias("_q"))
                .join(comp, key_col, "left")
                .withColumn("comp", F.coalesce(F.col("comp"),
                                               F.col(key_col))))
    w = Window.partitionBy("comp").orderBy(F.desc("_q"), F.asc(key_col))
    keeper = (labelled.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .select(F.col("comp"), F.col(key_col).alias("canonical")))
    return (labelled.join(keeper, "comp")
            .select(F.col(key_col), F.col("canonical"),
                    (F.col(key_col) != F.col("canonical"))
                    .alias("is_duplicate")))


def test_keep_best_member_window_matches_corpus_window(spark):
    """The member-only first_value window + singleton union must replay
    the corpus-wide row_number rule exactly: score ties (min key wins),
    null scores (lose to any non-null), all-null clusters, negative and
    huge scores, and singletons."""
    rows = [(1, 10), (2, 10), (3, 5),      # {1,2,3}: tie on 10 -> min id 1
            (4, None), (5, None),          # {4,5}: all-null -> min id 4
            (6, 7), (7, None),             # {6,7}: non-null wins -> 6
            (8, -3), (9, -1),              # {8,9}: -1 > -3 -> 9
            (10, 0),                       # singleton
            (11, 2 ** 62), (12, 2 ** 62 - 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    pr = spark.createDataFrame([(1, 2), (2, 3), (4, 5), (6, 7), (8, 9),
                                (11, 12)], "a long, b long")
    got = sorted(map(tuple, dedup_keep_best(
        df, pr, score_col="n_chars").collect()))
    ref = sorted(map(tuple, _window_keep_best(
        df, pr, score_col="n_chars").collect()))
    assert got == ref
    assert got == [(1, 1, False), (2, 1, True), (3, 1, True),
                   (4, 4, False), (5, 4, True),
                   (6, 6, False), (7, 6, True),
                   (8, 9, True), (9, 9, False),
                   (10, 10, False),
                   (11, 11, False), (12, 11, True)]


def test_keep_best_double_scores_and_distributed_fallback(spark):
    """Non-integral scores and the distributed (non-auto) label paths go
    through the same member window — equality must hold there too."""
    rows = [(1, 1.5), (2, 2.5), (3, float("nan")), (4, 0.0), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars double")
    pr = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    for algo in ("auto", "propagation"):
        got = sorted(map(tuple, dedup_keep_best(
            df, pr, score_col="n_chars", algorithm=algo).collect()))
        ref = sorted(map(tuple, _window_keep_best(
            df, pr, score_col="n_chars").collect()))
        assert got == ref, algo


def test_jaccard_prefix_cap_subset_and_bounded(spark):
    """d16's candidate cap (VERDICT r14 #5): a huge cap reproduces the
    exact join bit-for-bit; a binding cap yields a SUBSET of the exact
    verified pairs, bounded <= 2*cap*n_docs on an adversarial clique
    corpus where the exact output is quadratic."""
    from klepto_spark.operators.prefixjoin import jaccard_prefix_join
    from klepto_spark.operators import dedup

    # 30-doc near-copy clique: every pair is a true near-dup
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 6
          + f"tail{i}") for i in range(30)],
        "doc_id long, text string")
    exact = sorted(map(tuple, jaccard_prefix_join(
        docs, threshold=0.8).collect()))
    dedup.release_caches()
    huge = sorted(map(tuple, jaccard_prefix_join(
        docs, threshold=0.8, per_doc_cap=10_000).collect()))
    dedup.release_caches()
    assert huge == exact and len(exact) == 30 * 29 // 2  # full clique
    cap = 4
    capped = sorted(map(tuple, jaccard_prefix_join(
        docs, threshold=0.8, per_doc_cap=cap).collect()))
    dedup.release_caches()
    assert set(capped) <= set(exact)
    assert 0 < len(capped) <= 2 * cap * 30


def test_validate_target_with_backslashes_and_quotes(spark):
    """ADVICE r14: check labels are F.lit columns, never interpolated
    SQL — a target carrying backslashes or quotes must round-trip
    verbatim."""
    from klepto_spark.operators.validate import Check, validate
    df = spark.createDataFrame([("a1",), ("zz",)], "v string")
    target = r"v rlike '\d' and it's \raw\ text"
    out = validate(df, [Check("expression", target, (r"v rlike '\\d'",))])
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["target"] == target
    assert rows[0]["violations"] == 1  # 'zz' has no digit


def test_with_lang_id_survives_scratch_name_collisions(spark):
    """ADVICE r14: a caller column named like the scratch aliases must
    come through untouched."""
    from klepto_spark.operators.text import with_lang_id, LANG_STOPWORDS
    lang0 = sorted(LANG_STOPWORDS)[0]
    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog", "keepme", 7)],
        f"text string, _lang_p string, _lang_s_{lang0} int")
    out = with_lang_id(df).collect()[0]
    assert out["_lang_p"] == "keepme"
    assert out[f"_lang_s_{lang0}"] == 7
    assert out["lang_pred"] == "en"


def test_double_literal_nonfinite(spark):
    """ADVICE r14: _d() emits parseable literals for inf/nan like the
    historical F.lit path did."""
    import math
    from pyspark.sql import functions as F
    from klepto_spark.operators.similarity import _d
    row = spark.range(1).select(
        F.expr(_d(float("inf"))).alias("pi"),
        F.expr(_d(float("-inf"))).alias("ni"),
        F.expr(_d(float("nan"))).alias("nn"),
        F.expr(_d(0.1)).alias("d")).collect()[0]
    assert row["pi"] == float("inf") and row["ni"] == float("-inf")
    assert math.isnan(row["nn"]) and row["d"] == 0.1
