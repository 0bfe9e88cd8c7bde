"""Round-11 operators: duplicated n-gram span coverage (t18, the Lee et
al. 2021 ExactSubstr signal at word granularity) and the leakage-safe
cluster split (c04). The properties under test are the reasons the
operators exist: a duplicated span is caught at EVERY alignment and
counted once per covered word (interval union, exact integers), and a
near-dup cluster can never straddle train/valid/test."""

import hashlib

import pytest
from pyspark.sql import Row

from klepto_spark.operators import text as T
from klepto_spark.operators.components import leakage_safe_split
from klepto_spark.plans import inspect as I

pytestmark = pytest.mark.slow


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _spans(spark, rows, **kw):
    out = T.dup_span_stats(_docs(spark, rows), **kw).collect()
    return {r["doc_id"]: (r["n_words"], r["dup_words"], r["dup_frac"])
            for r in out}


def test_dup_spans_cross_doc_interval_union(spark):
    """Docs 1 and 2 share the 4-word run ``a b c d``: with k=3 that is
    two overlapping duplicated 3-grams per doc, whose union covers
    exactly 4 words — counted once, not twice. Doc 3 is untouched."""
    got = _spans(spark, [
        (1, "a b c d e f"),
        (2, "x y a b c d z"),
        (3, "p q r s t u"),
    ], k=3)
    assert got[1] == (6, 4, 4 / 6)
    assert got[2] == (7, 4, 4 / 7)
    assert got[3] == (6, 0, 0.0)


def test_dup_spans_intra_doc_repetition_counts(spark):
    """min_count=2 is a GLOBAL occurrence count: a phrase repeated inside
    one document is a duplicated span too (Lee et al. count any repeated
    window). ``m n o`` repeated three times tiles the whole doc."""
    got = _spans(spark, [(1, "m n o m n o m n o")], k=3)
    assert got[1] == (9, 9, 1.0)


def test_dup_spans_alignment_blind(spark):
    """The t18 raison d'etre: the duplicated run sits at DIFFERENT
    offsets in each doc (mid-paragraph quote), where a fixed chunk grid
    (t16) can miss it — the sliding window cannot."""
    quote = "the quick brown fox jumps over the lazy dog tonight"
    got = _spans(spark, [
        (1, "intro words here " + quote),
        (2, quote + " trailing words after it all ends"),
    ], k=8)
    n_quote = len(quote.split())
    for d in (1, 2):
        assert got[d][1] == n_quote, got


def test_dup_spans_short_and_empty_docs(spark):
    """Docs shorter than k emit no windows (dup_words=0); an empty text
    splits to one empty token in BOTH engines (pinned artifact)."""
    got = _spans(spark, [(1, "only two"), (2, "")], k=3)
    assert got[1] == (2, 0, 0.0)
    assert got[2][:2] == (1, 0)


def test_dup_spans_duckdb_twin_on_adversarial_rows(spark):
    """The SQL twin replays split/window/md5/interval-union identically
    on rows exercising every edge at once: overlapping islands, disjoint
    islands, intra-doc repeats, sub-k docs, whitespace runs."""
    import duckdb
    rows = [
        (1, "a b c d e f g h"),
        (2, "z z a b c d q r a b c d"),     # two disjoint islands + repeats
        (3, "a  b\tc d   e f"),              # whitespace runs collapse
        (4, "tiny"),
        (5, "a b c d e f g h"),              # exact twin of doc 1
    ]
    sgot = _spans(spark, rows, k=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    dgot = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(T.dup_span_stats_sql(k=3)).fetchall()}
    con.close()
    assert sgot == dgot


def test_dup_spans_only_hashes_shuffle(spark, sf_dir):
    """Plan pin (the 100 TB posture): occurrences shuffle as
    (doc, pos, md5) — neither the text nor the token array crosses an
    exchange, and no Python appears in the plan."""
    import __spark_entry__ as entry
    df = entry.q_dup_spans(spark, sf_dir)
    plan = I.executed_plan(df)
    assert "Python" not in plan
    for ex in I.exchange_inputs(df):
        assert "text" not in ex and "ws" not in ex.split(", "), ex


WEIGHTS = {"train": 0.8, "valid": 0.1, "test": 0.1}


def _expected_split(canonical, salt="s"):
    h = hashlib.md5(f"{salt}|{canonical}".encode()).hexdigest()[:8]
    # cumulative thresholds for WEIGHTS, mirroring sampling._threshold_hex
    t_train = format(int(0.8 * 16**8), "08x")
    t_valid = format(int(0.9 * 16**8), "08x")
    return "train" if h < t_train else ("valid" if h < t_valid else "test")


def test_leakage_split_clusters_never_straddle(spark):
    """Every member of a near-dup cluster gets the CANONICAL's split —
    the invariant per-doc hashing can't give. Singletons keep their own
    id as canonical and hash independently."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(1, 11)])
    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=5, b=6)])
    out = {r["doc_id"]: r for r in
           leakage_safe_split(docs, pairs, WEIGHTS, salt="s").collect()}
    assert len(out) == 10
    for d in (1, 2, 3):
        assert out[d]["canonical"] == 1
        assert out[d]["split"] == out[1]["split"]
    for d in (5, 6):
        assert out[d]["canonical"] == 5
        assert out[d]["split"] == out[5]["split"]
    for d in (4, 7, 8, 9, 10):
        assert out[d]["canonical"] == d and not out[d]["is_duplicate"]
    for d, r in out.items():
        assert r["split"] == _expected_split(r["canonical"]), (d, r)


def test_leakage_split_growth_stability(spark):
    """Adding unrelated documents (and even a NEW cluster) never moves an
    existing cluster between splits — split depends only on
    (salt, canonical)."""
    docs1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(1, 5)])
    pairs1 = spark.createDataFrame([Row(a=1, b=2)])
    before = {r["doc_id"]: r["split"] for r in
              leakage_safe_split(docs1, pairs1, WEIGHTS, salt="s").collect()}
    docs2 = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(1, 9)])
    pairs2 = spark.createDataFrame([Row(a=1, b=2), Row(a=7, b=8)])
    after = {r["doc_id"]: r["split"] for r in
             leakage_safe_split(docs2, pairs2, WEIGHTS, salt="s").collect()}
    for d, s in before.items():
        assert after[d] == s


def test_leakage_split_rejects_bad_weights(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x")])
    pairs = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, {"train": 0.5, "test": 0.4})


def _strips(spark, rows, **kw):
    out = T.dup_span_strip(_docs(spark, rows), **kw).collect()
    return {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
            for r in out}


def test_dup_span_strip_cuts_exactly_the_covered_words(spark):
    """The t18 scenario, acted on: docs 1/2 share ``a b c d`` — strip
    removes those four words from each and keeps the unique remainder
    in order. Doc 3 is untouched."""
    got = _strips(spark, [
        (1, "a b c d e f"),
        (2, "x y a b c d z"),
        (3, "p q r s t u"),
    ], k=3)
    assert got[1] == ("e f", 6, 4)
    assert got[2] == ("x y z", 7, 4)
    assert got[3] == ("p q r s t u", 6, 0)


def test_dup_span_strip_fully_duplicated_doc_survives_empty(spark):
    """A doc that is one big duplicated span strips to '' (the caller
    decides whether to drop it) — it must not disappear from output."""
    same = "w1 w2 w3 w4 w5 w6"
    got = _strips(spark, [(1, same), (2, same)], k=3)
    assert got[1] == ("", 6, 6) and got[2] == ("", 6, 6)


def test_dup_span_strip_matches_t18_coverage(spark):
    """n_removed == t18's dup_words on every doc by construction: the
    strip acts on exactly the coverage set the signal reports."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "z z a b c d q r a b c d"),
        (3, "unique words only here today"),
        (4, "a b c d e f g h"),
    ]
    stats = _spans(spark, rows, k=3)
    stripped = _strips(spark, rows, k=3)
    for d in stats:
        assert stripped[d][2] == stats[d][1], d


def test_dup_span_strip_duckdb_twin(spark):
    """The SQL twin replays island folding, NOT-EXISTS exclusion and
    ordered reassembly — including disjoint islands inside one doc and
    whitespace-run normalisation."""
    import duckdb
    rows = [
        (1, "a b c d e f g h"),
        (2, "z z a b c d q r a b c d"),
        (3, "a  b\tc d   e f"),
        (4, "tiny"),
        (5, "a b c d e f g h"),
    ]
    sgot = _strips(spark, rows, k=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    dgot = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(T.dup_span_strip_sql(k=3)).fetchall()}
    con.close()
    assert sgot == dgot


def test_dup_span_strip_text_shuffles_once(spark, sf_dir):
    """Plan pin: the token array crosses an exchange exactly once (the
    islands join back to the docs) — per-word rows never carry text,
    and no Python appears in the plan."""
    import __spark_entry__ as entry
    df = entry.q_dup_span_strip(spark, sf_dir)
    plan = I.executed_plan(df)
    assert "Python" not in plan
    text_crossings = sum(1 for ex in I.exchange_inputs(df)
                         if "ws" in [c.split("#")[0] for c in ex.split(", ")])
    assert text_crossings <= 1, I.exchange_inputs(df)


def test_span_append_matches_full_recompute(spark, tmp_path):
    """The incremental-matrix identity, span edition: probing the
    at-rest window-count index scores a batch EXACTLY like running t18
    over old ∪ new and keeping the batch rows — including windows that
    are unique in each side but duplicated only across the union."""
    old = [(i, f"old{i} " + "shared span common words here " + f"tail{i}")
           for i in range(1, 6)]
    new = [(11, "shared span common words here and fresh stuff"),
           (12, "totally novel content nothing repeated anywhere at all")]
    idx = str(tmp_path / "spanidx")
    T.span_write_index(_docs(spark, old), idx, k=3)
    got = {r["doc_id"]: (r["n_words"], r["dup_words"])
           for r in T.span_append(spark, idx, _docs(spark, new),
                                  k=3, min_count=2, commit=False).collect()}
    full = {r["doc_id"]: (r["n_words"], r["dup_words"])
            for r in T.dup_span_stats(_docs(spark, old + new), k=3)
            .collect() if r["doc_id"] in (11, 12)}
    assert got == full


def test_span_append_commit_visible_to_next_batch(spark, tmp_path):
    """A committed batch's window counts fold into the index: a span
    that exists once in batch 1 and once in batch 2 (never in the base
    corpus) is unduplicated for batch 1 but duplicated for batch 2."""
    phrase = "rare phrase seen exactly twice overall"
    idx = str(tmp_path / "spanidx")
    T.span_write_index(
        _docs(spark, [(1, "base corpus words entirely unrelated")]),
        idx, k=3)
    b1 = T.span_append(spark, idx, _docs(spark, [(2, phrase)]),
                       k=3, min_count=2, commit=True)
    assert {r["dup_words"] for r in b1.collect()} == {0}
    b2 = T.span_append(spark, idx, _docs(spark, [(3, phrase)]),
                       k=3, min_count=2, commit=False)
    [r3] = b2.collect()
    assert r3["dup_words"] == r3["n_words"] == 6


def test_span_append_snapshot_isolated_from_own_commit(spark, tmp_path):
    """commit=True folds the batch in, but the RETURNED frame keeps
    probing the pre-append snapshot: collecting it after the commit
    must not double-count the batch's own occurrences."""
    idx = str(tmp_path / "spanidx")
    T.span_write_index(
        _docs(spark, [(1, "base corpus words entirely unrelated")]),
        idx, k=3)
    out = T.span_append(
        spark, idx, _docs(spark, [(2, "once only never repeated phrase")]),
        k=3, min_count=2, commit=True)
    # collected AFTER the commit landed: still zero coverage
    assert {r["dup_words"] for r in out.collect()} == {0}


def test_span_append_refuses_mismatched_k(spark, tmp_path):
    idx = str(tmp_path / "spanidx")
    T.span_write_index(_docs(spark, [(1, "a b c d e f")]), idx, k=3)
    with pytest.raises(ValueError, match="different scheme"):
        T.span_append(spark, idx, _docs(spark, [(2, "a b c d")]), k=4)


def test_distribution_drift_values_and_one_sided_categories(spark):
    """Hand-computed drift: shares are exact divisions, a category
    missing from one snapshot reports zero count and 0.0 share, and
    sum(abs_diff)/2 is the total variation distance."""
    from klepto_spark.operators.validate import distribution_drift
    a = spark.createDataFrame(
        [Row(doc_id=i, src=s) for i, s in
         enumerate(["web"] * 6 + ["books"] * 3 + ["code"] * 1)])
    b = spark.createDataFrame(
        [Row(doc_id=i, src=s) for i, s in
         enumerate(["web"] * 2 + ["books"] * 2 + ["wiki"] * 1)])
    got = {r["src"]: r for r in
           distribution_drift(a, b, "src").collect()}
    assert got["web"]["n_a"] == 6 and got["web"]["n_b"] == 2
    assert got["web"]["frac_a"] == 0.6 and got["web"]["frac_b"] == 0.4
    assert got["code"]["n_b"] == 0 and got["code"]["frac_b"] == 0.0
    assert got["wiki"]["n_a"] == 0 and got["wiki"]["frac_a"] == 0.0
    tvd = sum(r["abs_diff"] for r in got.values()) / 2
    assert abs(tvd - 0.3) < 1e-12  # (.2+.1+.1+.2)/2


def test_distribution_drift_duckdb_twin(spark):
    """The SQL twin computes identical doubles — same divide/subtract/
    abs shape over the same BIGINTs."""
    import duckdb
    from klepto_spark.operators.validate import (distribution_drift,
                                                 distribution_drift_sql)
    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(30)] + \
           [(100 + i, "wiki") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")
    sgot = sorted(tuple(r) for r in distribution_drift(
        df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1"),
        "src").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dgot = sorted(tuple(r) for r in con.execute(distribution_drift_sql(
        "SELECT * FROM t WHERE doc_id % 2 = 0",
        "SELECT * FROM t WHERE doc_id % 2 = 1", "src")).fetchall())
    con.close()
    assert sgot == dgot


def test_distribution_drift_empty_snapshot_reports_zero_shares(spark):
    """An entirely empty snapshot must report exact 0.0 shares (total
    clamps to 1), not a div-by-zero NULL/error — and the non-empty
    side's shares stay exact."""
    import duckdb
    from klepto_spark.operators.validate import (distribution_drift,
                                                 distribution_drift_sql)
    df = spark.createDataFrame(
        [Row(doc_id=1, src="web"), Row(doc_id=2, src="web"),
         Row(doc_id=3, src="books"), Row(doc_id=4, src="books")])
    got = {r["src"]: r for r in distribution_drift(
        df, df.filter("doc_id < 0"), "src").collect()}
    assert got["web"]["frac_a"] == 0.5 and got["web"]["frac_b"] == 0.0
    assert got["web"]["abs_diff"] == 0.5
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(1, "web"), (2, "web"), (3, "books"), (4, "books")])
    dgot = {r[0]: r for r in con.execute(distribution_drift_sql(
        "SELECT * FROM t", "SELECT * FROM t WHERE doc_id < 0",
        "src")).fetchall()}
    con.close()
    assert dgot["web"][3] == 0.5 and dgot["web"][4] == 0.0


def test_semdedup_within_cluster_pairs_and_boundary_trade(spark):
    """SemDeDup's contract and its documented trade: same-cluster
    near-dups pair (larger id dropped), but a near-dup pair SPLIT
    ACROSS a cluster boundary is invisible — that recall complement
    belongs to d06's hyperplane path."""
    from klepto_spark.operators import dedup as D
    from klepto_spark.operators.similarity import cluster_similar_pairs
    cents = [[1.0, 0.0], [0.0, 1.0]]
    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.9, 0.1]),
         Row(vec_id=2, embedding=[0.88, 0.12]),   # near-dup of 1, cluster 0
         Row(vec_id=3, embedding=[0.1, 0.9]),     # alone in cluster 1
         Row(vec_id=4, embedding=[0.72, 0.69]),   # cluster 0 ─┐ near-dups
         Row(vec_id=5, embedding=[0.69, 0.72])])  # cluster 1 ─┘ split
    pairs = {(r["a"], r["b"]) for r in
             cluster_similar_pairs(emb, cents, 0.99).collect()}
    assert (1, 2) in pairs
    assert (4, 5) not in pairs  # the boundary trade
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en", source="s", n_chars=10)
         for i in range(1, 7)])  # doc 6 has no embedding -> survives
    kept = {r["doc_id"] for r in
            D.semdedup(docs, emb, cents, 0.99).collect()}
    assert kept == {1, 3, 4, 5, 6}


def test_semdedup_star_cap_bounds_giant_clusters(spark):
    """A cluster past max_cluster emits only star edges from its min
    key — O(m) pairs, connectivity preserved for downstream CC."""
    from klepto_spark.operators.similarity import cluster_similar_pairs
    cents = [[1.0, 0.0], [0.0, 1.0]]
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 0.001 * i]) for i in range(10)])
    got = sorted((r["a"], r["b"]) for r in
                 cluster_similar_pairs(emb, cents, 0.9,
                                       max_cluster=4).collect())
    assert got == [(0, i) for i in range(1, 10)]
    full = cluster_similar_pairs(emb, cents, 0.9, max_cluster=64).count()
    assert full == 45
