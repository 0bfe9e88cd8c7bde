"""Unit tests for the round-4 additions: ordered funnel, PII scan/redact,
and TF-IDF top terms — edge cases the sf-data oracles can't reach."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from klepto_spark.operators import pii
from klepto_spark.operators.funnel import funnel, funnel_sql
from klepto_spark.operators.text import tfidf_top_terms


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), e) for u, t, e in rows],
        "user_id bigint, ts timestamp, event_type string")


def test_funnel_requires_strict_order(spark):
    ev = _events(spark, [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:01:00", "click"),
        (1, "2024-01-01T00:02:00", "purchase"),
        # user 2 clicks BEFORE viewing -> depth 1
        (2, "2024-01-01T00:01:00", "click"),
        (2, "2024-01-01T00:02:00", "view"),
        # user 3 never views -> excluded entirely
        (3, "2024-01-01T00:00:00", "purchase"),
    ])
    got = {r["user_id"]: r["depth"]
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 1}


def test_funnel_same_timestamp_never_qualifies(spark):
    # click at the same instant as the first view must NOT count (strict <),
    # regardless of row order — run both input orders.
    rows = [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:00:00", "click"),
        (1, "2024-01-01T00:05:00", "click"),
    ]
    for perm in (rows, rows[::-1]):
        r = funnel(_events(spark, perm), ["view", "click"]).collect()[0]
        assert r["t_click"] == _ts("2024-01-01T00:05:00")
        assert r["depth"] == 2


def test_funnel_uses_earliest_valid_chain(spark):
    # A later view would allow a later click, but the EARLIEST view anchors:
    # the click between the views qualifies.
    ev = _events(spark, [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:01:00", "click"),
        (1, "2024-01-01T00:02:00", "view"),
    ])
    r = funnel(ev, ["view", "click"]).collect()[0]
    assert r["t_view"] == _ts("2024-01-01T00:00:00")
    assert r["t_click"] == _ts("2024-01-01T00:01:00")


def test_funnel_single_window_pass_one_shuffle(spark):
    ev = _events(spark, [(1, "2024-01-01T00:00:00", "view")])
    plan = (funnel(ev, ["view", "click", "purchase"])
            ._jdf.queryExecution().executedPlan().toString())
    # the window pass and the final aggregate must share one exchange
    assert plan.count("Exchange") == 1


def test_funnel_sql_matches_spark_on_duckdb(spark, tmp_path):
    import duckdb
    ev = _events(spark, [
        (1, "2024-01-01T00:00:00", "view"),
        (1, "2024-01-01T00:00:00", "click"),
        (1, "2024-01-01T00:01:00", "click"),
        (1, "2024-01-01T00:01:00", "purchase"),
        (1, "2024-01-01T00:02:00", "purchase"),
        (2, "2024-01-01T00:00:00", "click"),
        (3, "2024-01-01T00:00:00", "view"),
    ])
    p = str(tmp_path / "ev.parquet")
    ev.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')")
    oracle = {r[0]: r for r in con.execute(
        funnel_sql("events", ["view", "click", "purchase"])).fetchall()}
    got = {r["user_id"]: r
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(got) == set(oracle) == {1, 3}
    assert tuple(got[1]) == tuple(oracle[1])
    assert got[1]["depth"] == 3 and got[3]["depth"] == 1


def test_pii_redact_masks_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org from 192.168.0.1 "
             "acct 1234567890 ok"),
         (2, "clean text, short 123 digits, 1.2.3 not an ip"),
         (3, "two mails a@b.io c@d.net and 10.0.0.1")],
        "id bigint, body string")
    out = {r["id"]: r for r in pii.pii_scan(df, "body").collect()}
    assert out[1]["body_redacted"] == \
        "mail <EMAIL> from <IP> acct <NUM> ok"
    assert (out[1]["n_email"], out[1]["n_ipv4"],
            out[1]["n_long_digits"]) == (1, 1, 1)
    assert out[2]["body_redacted"] == out[2]["body"]  # untouched
    assert (out[2]["n_email"], out[2]["n_ipv4"],
            out[2]["n_long_digits"]) == (0, 0, 0)
    assert out[3]["n_email"] == 2 and out[3]["n_ipv4"] == 1


def test_pii_counts_are_pre_redaction(spark):
    # the email's local part has a >=6 digit run; it must count for
    # long_digits (raw text) even though the email rule masks it first
    df = spark.createDataFrame([(1, "x 1234567@ex.com y")],
                               "id bigint, body string")
    r = pii.pii_scan(df, "body").collect()[0]
    assert r["body_redacted"] == "x <EMAIL> y"
    assert r["n_long_digits"] == 1


def test_pii_sql_twins_match_spark(spark):
    import duckdb
    texts = ["mail bob@x.org 10.0.0.1 acct 999999999",
             "no pii here 12345",
             "a@b.io and c@d.net 255.255.255.255 0000000"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id bigint, body string")
    srows = {r["id"]: r for r in pii.pii_scan(df, "body").collect()}
    con = duckdb.connect()
    counts = ", ".join(f"{pii.match_count_sql('body', r)} AS n_{r.name}"
                       for r in pii.DEFAULT_RULES)
    for i, t in enumerate(texts):
        lit = "'" + t.replace("'", "''") + "'"
        red, ne, ni, nd = con.execute(
            f"SELECT {pii.redact_sql(lit)}, "
            + counts.replace("body", lit)).fetchone()
        s = srows[i]
        assert red == s["body_redacted"]
        assert (ne, ni, nd) == (s["n_email"], s["n_ipv4"],
                                s["n_long_digits"])
    con.close()


def test_tfidf_prefers_rare_terms_and_breaks_ties_lexically(spark):
    df = spark.createDataFrame(
        [(1, "common rare common zebra"),
         (2, "common common apple zebra"),
         (3, "common plain plain plain")],
        "doc_id bigint, text string")
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = {d: sorted(rs, key=lambda r: r["rank"])[0]["term"]
            for d, rs in by_doc.items()}
    # 'rare' (df=1) beats 'common' (df=3) despite tf 1 vs 2 (score 3 vs 2);
    # 'plain' tf=3 df=1 dominates doc 3
    assert top1 == {1: "rare", 2: "apple", 3: "plain"}
    # tie-break: doc 2 has apple(df=1,tf=1) and zebra(df=2,tf=1) ->
    # apple score 3 > zebra 1.5; doc 1 rank2 among common(2) vs zebra(1.5)
    doc1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in doc1] == ["rare", "common"]


def test_tfidf_empty_and_whitespace_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, "")],
        "doc_id bigint, text string")
    out = tfidf_top_terms(df, k=5).collect()
    assert {r["doc_id"] for r in out} == {1}
    # N counts ALL docs (3), not just non-empty ones: alpha df=1 tf=1
    alpha = [r for r in out if r["term"] == "alpha"][0]
    assert alpha["score"] == pytest.approx(3.0)


def test_strip_boilerplate_preserves_order_and_empty_docs(spark):
    from klepto_spark.operators.text import strip_boilerplate
    df = spark.createDataFrame(
        [(1, "the quick the brown the fox"),
         (2, "the lazy the dog"),
         (3, "the the the")],          # all boilerplate -> empty
        "doc_id bigint, text string")
    # 'the' appears in 3/3 docs -> stripped at ratio 0.9; rest df=1 kept
    out = {r["doc_id"]: r["clean_text"]
           for r in strip_boilerplate(df, max_df_ratio=0.9).collect()}
    assert out == {1: "quick brown fox", 2: "lazy dog", 3: ""}


def test_strip_boilerplate_threshold_boundary(spark):
    from klepto_spark.operators.text import strip_boilerplate
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id bigint, text string")
    # df('a')=2 = 1.0*N > 0.5*N -> stripped; b/c df=1 = 0.5*N kept (<=)
    out = {r["doc_id"]: r["clean_text"]
           for r in strip_boilerplate(df, max_df_ratio=0.5).collect()}
    assert out == {1: "b", 2: "c"}


def test_trigram_novelty_semantics(spark):
    from klepto_spark.operators.text import trigram_novelty
    # 9 docs share one trigram vocabulary; 1 doc is pure line noise.
    rows = [(i, "the cat sat on the mat") for i in range(9)]
    rows.append((9, "zqxjkvwpfy"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # top_k = 17 = exactly the shared sentence's distinct trigrams, all
    # with corpus count 9 vs the junk's 1 — the cut excludes all junk.
    got = {r["doc_id"]: r for r in
           trigram_novelty(df, top_k=17).collect()}
    assert got[0]["novelty"] == 0.0 and got[0]["hits"] == got[0]["n_tri"]
    r = got[9]
    assert r["hits"] == 0 and r["novelty"] == 1.0
    assert r["novelty"] == (r["n_tri"] - r["hits"]) / r["n_tri"]


def test_trigram_novelty_short_and_null_docs_survive(spark):
    from klepto_spark.operators.text import trigram_novelty
    df = spark.createDataFrame(
        [(0, "ab"), (1, ""), (2, "regular length text here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in trigram_novelty(df, top_k=5).collect()}
    # sub-k docs emit their whole text as one short shingle (t04 rule)
    assert got[0]["n_tri"] == 1 and got[1]["n_tri"] == 1
    assert all(0.0 <= r["novelty"] <= 1.0 for r in got.values())


def test_chunk_documents_offsets_and_edges(spark):
    from klepto_spark.operators.text import chunk_documents
    df = spark.createDataFrame(
        [(0, "abcdefghij"), (1, "ab"), (2, ""), (3, None)],
        "doc_id long, text string")
    rows = sorted(((r["doc_id"], r["chunk_id"], r["start"], r["chunk"])
                   for r in chunk_documents(df, size=4, overlap=1)
                   .collect()))
    # doc 0: starts 1,4,7,10 (step 3), last chunk short
    assert [(c, s, t) for d, c, s, t in rows if d == 0] == [
        (0, 1, "abcd"), (1, 4, "defg"), (2, 7, "ghij"), (3, 10, "j")]
    # short, empty, and NULL docs each keep exactly one chunk row
    assert [(s, t) for d, c, s, t in rows if d == 1] == [(1, "ab")]
    assert [t for d, c, s, t in rows if d == 2] == [""]
    assert len([1 for d, *_ in rows if d == 3]) == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)
