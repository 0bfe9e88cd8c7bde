"""Property-based cross-engine parity (hypothesis).

The reference has no property tests (SURVEY §5); this goes beyond: for
ARBITRARY input strings, the portable anonymiser expressions must produce
identical values in Spark and DuckDB. Strings are batched into one
comparison query per test run to amortise engine startup.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from klepto_spark.functions.anonymise import anonymise_sql
from klepto_spark.functions.portable import s as sql_str

# Printable unicode incl. quotes, BACKSLASHES, accents, CJK; control chars
# and surrogates excluded (NUL is illegal mid-literal in both engines'
# parsers anyway; parquet-borne values never pass through literals).
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"),
                           max_codepoint=0x2FFF),
    min_size=0, max_size=60)

SPECS = ["EmailAddress", "UserName", "FirstName", "Latitude", "DigitsN:6",
         "Password:6:10:true:true:false", "Sentence", "IPv4",
         "CreditCardNum:visa", "Year:1990:2020"]


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8, unique=True))
def test_anonymisers_cross_engine_on_arbitrary_strings(spark, values):
    values_sql = ", ".join(f"({sql_str(v)})" for v in values)
    src = f"(SELECT * FROM (VALUES {values_sql}) AS v(email))"
    sel = ", ".join(
        f"({anonymise_sql(sp, 'email', table='t')}) AS f{i}"
        for i, sp in enumerate(SPECS))
    q = f"SELECT {sel} FROM {src} AS t"
    srows = sorted([tuple(r) for r in spark.sql(q).collect()], key=repr)
    drows = sorted([tuple(r) for r in duckdb.sql(q).fetchall()], key=repr)
    assert srows == drows


@pytest.mark.slow
@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=126),
                        min_size=1, max_size=40),
                min_size=2, max_size=6, unique=True))
def test_insert_statement_roundtrip(spark, values):
    """SQL-text sink property: emitted INSERT literals parse back to the
    original values (DuckDB as the consuming database)."""
    from klepto_spark.sinks.sqltext import insert_statements
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "id long, v string")
    stmts = [r.stmt for r in insert_statements(df, "t").collect()]
    con = duckdb.connect()
    con.execute('CREATE TABLE "t" (id BIGINT, v TEXT)')
    for stmt in stmts:
        con.execute(stmt)
    got = dict(con.execute("SELECT id, v FROM t").fetchall())
    assert got == {i: v for i, v in enumerate(values)}


# --------------------------------------------------------------------------
# PII rules: cross-engine agreement + idempotence over generated text
# --------------------------------------------------------------------------

PII_TEXT = st.text(
    alphabet=st.sampled_from(list(
        "abcDEF019@._- <>!?é中")), min_size=0, max_size=60)


@settings(max_examples=60, deadline=None)
@given(st.lists(PII_TEXT, min_size=1, max_size=6))
def test_pii_redact_sql_twin_and_idempotence(texts):
    """For arbitrary text: (1) DuckDB's redaction/count twins equal the
    Java-regex semantics encoded in the rules (both engines are driven
    here through their SQL surfaces), and (2) redaction is idempotent —
    replacement tokens contain no redactable shapes."""
    import duckdb
    import re
    from klepto_spark.operators import pii

    con = duckdb.connect()
    for t in texts:
        lit = "'" + t.replace("'", "''") + "'"
        duck_red, = con.execute(
            f"SELECT {pii.redact_sql(lit)}").fetchone()
        # Python re is a close proxy for Java regex on this subset
        py = t
        for r in pii.DEFAULT_RULES:
            py = re.sub(r.pattern, r.replacement, py)
        assert duck_red == py, t
        # idempotence via the SQL twin
        lit2 = "'" + duck_red.replace("'", "''") + "'"
        again, = con.execute(f"SELECT {pii.redact_sql(lit2)}").fetchone()
        assert again == duck_red, t
        for r in pii.DEFAULT_RULES:
            n_duck, = con.execute(
                f"SELECT {pii.match_count_sql(lit, r)}").fetchone()
            assert n_duck == len(re.findall(r.pattern, t)), (t, r.name)
    con.close()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.integers(1, 500)),
                min_size=1, max_size=60, unique_by=lambda t: t[0]),
       st.integers(16, 400), st.integers(1, 5))
def test_pack_sequences_prefix_property(spark, rows, budget, shards):
    """For ANY (key, cost) population, budget, and shard count: every
    document's (pack_id, pack_off) equals the per-shard running total of
    its predecessors in key order — recomputed independently in Python."""
    from klepto_spark.operators.packing import pack_sequences
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = sorted(
        ((r["doc_id"], r["shard"], r["pack_id"], r["pack_off"], r["tok"])
         for r in pack_sequences(df, "doc_id", F.col("tok"),
                                 budget=budget, shards=shards,
                                 salt="h").collect()))
    assert len(got) == len(rows)
    cum = {}
    for doc_id, shard, pack_id, pack_off, tok in sorted(got):
        c = cum.get(shard, 0)
        assert pack_id == c // budget and pack_off == c % budget
        cum[shard] = c + tok


@settings(max_examples=8, deadline=None)
@given(st.integers(2, 60), st.data())
def test_chunk_documents_offsets_property(spark, size, data):
    """Any (size, overlap < size) and any text population: chunk starts
    advance by exactly (size - overlap), every doc's chunks cover it in
    order, and reassembling unique regions reproduces the document."""
    overlap = data.draw(st.integers(0, size - 1))
    texts = data.draw(st.lists(
        st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
                max_size=150), min_size=1, max_size=12))
    from klepto_spark.operators.text import chunk_documents
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    rows = chunk_documents(df, size=size, overlap=overlap).collect()
    step = size - overlap
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        chunks = by_doc[i]
        assert [c["start"] for c in chunks] == \
            [1 + j * step for j in range(len(chunks))]
        # reassemble from each chunk's unique region (drop the overlap)
        rebuilt = chunks[0]["chunk"] + "".join(
            c["chunk"][overlap:] for c in chunks[1:])
        assert rebuilt == text
        assert all(c["chunk"] == text[c["start"] - 1:c["start"] - 1 + size]
                   for c in chunks)


@settings(max_examples=8, deadline=None)
@given(st.dictionaries(st.sampled_from(["a", "b", "c", "d"]),
                       st.floats(0.05, 1.0), min_size=1, max_size=4),
       st.integers(0, 2**31 - 1))
def test_mixture_sample_limiting_group_property(spark, weights, seed):
    """Any positive weights over any subset of groups: the limiting
    group (min n/w among present groups) is kept WHOLE, unlisted groups
    vanish, and membership is repartition-stable."""
    from klepto_spark.operators.sampling import mixture_sample
    rows = [(i, ["a", "b", "c", "d", "e"][i % 5]) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = mixture_sample(df, "src", "doc_id", weights, salt=str(seed))
    got = {r["src"]: r["count"]
           for r in out.groupBy("src").count().collect()}
    assert set(got) <= set(weights)
    counts = {g: 100 for g in ["a", "b", "c", "d"]}  # 500/5 per group
    limiting = min((g for g in weights), key=lambda g: counts[g] / weights[g])
    assert got.get(limiting, 0) == counts[limiting]


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.sampled_from(["a", "b", "c"]),
                          st.integers(1, 50)),
                min_size=1, max_size=30,
                unique_by=lambda t: t[0]),
       st.integers(10, 200))
def test_token_budget_matches_driver_side_greedy(spark, rows, budget):
    """token_budget_sample property: for arbitrary (key, stratum, tokens)
    rows and budgets, the distributed window result equals a pure-python
    greedy replay of the same (md5-hash, key) order — the determinism
    contract p06 rides on."""
    import hashlib

    from pyspark.sql import functions as F

    from klepto_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(rows, ["doc_id", "source", "tok"])
    got = {r["doc_id"] for r in
           token_budget_sample(df, "source", "doc_id", F.col("tok"),
                               budget=budget, salt="prop").collect()}
    kept = set()
    by_s: dict[str, list] = {}
    for k, s, t in rows:
        by_s.setdefault(s, []).append((k, t))
    for docs in by_s.values():
        docs.sort(key=lambda kt: (
            hashlib.md5(f"prop|{kt[0]}".encode()).hexdigest()[:8], kt[0]))
        cum = 0
        for k, t in docs:
            cum += t
            if cum > budget:
                break
            kept.add(k)
    assert got == kept
