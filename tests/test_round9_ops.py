"""Round-9 operators: content-defined chunking (t17) and the Q18-shape
aggregate-semi-join (a24). The CDC property under test is the REASON the
operator exists: chunk hashes survive an insertion elsewhere in the
document, where fixed-size chunking loses every later chunk."""

import pytest
from pyspark.sql import Row, functions as F

from klepto_spark.operators import text as T

pytestmark = pytest.mark.slow


def _hashes(spark, text, divisor=4):
    """All CDC chunk hashes of one document."""
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    stats = T.cdc_shared_stats(df, divisor=divisor)
    # reconstruct via the internal path: two docs sharing every chunk
    # would be circular — instead explode through a 1-doc corpus and
    # read the hash column off the pre-aggregation frame
    wexpr = "split(trim(text), '\\\\s+')"
    bexpr = (f"filter(sequence(1, size(_w)), i -> "
             f"i < size(_w) AND "
             f"cast(conv(substring(md5(element_at(_w, i)), 1, 8), "
             f"16, 10) AS BIGINT) % {divisor} = 0)")
    chunk_expr = """
transform(sequence(1, size(_b) + 1), j ->
  md5(concat_ws(' ', slice(_w,
    CASE WHEN j = 1 THEN 1 ELSE element_at(_b, j - 1) + 1 END,
    (CASE WHEN j = size(_b) + 1 THEN size(_w)
          ELSE element_at(_b, j) END)
    - (CASE WHEN j = 1 THEN 1 ELSE element_at(_b, j - 1) + 1 END)
    + 1))))"""
    rows = (df.select(F.expr(wexpr).alias("_w"))
            .withColumn("_b", F.expr(bexpr))
            .select(F.expr(chunk_expr).alias("hs")).collect())
    assert stats.collect()[0]["n_chunks"] == len(rows[0]["hs"])
    return rows[0]["hs"]


def test_cdc_chunks_survive_an_insertion(spark):
    """Insert one word mid-document: at least the chunks strictly before
    and strictly after the edited chunk keep their hashes. A fixed-size
    grid (t16 chunking) keeps the before-chunks but loses EVERY chunk
    after the insertion point."""
    base_words = [f"w{i}" for i in range(60)]
    base = " ".join(base_words)
    edited = " ".join(base_words[:31] + ["INSERTED"] + base_words[31:])
    h1, h2 = _hashes(spark, base), _hashes(spark, edited)
    shared = set(h1) & set(h2)
    # CDC: all but the locally edited chunk survive
    assert len(shared) >= len(h1) - 2 and len(h1) > 4
    # fixed-size contrast: chunks after the insertion all change
    from klepto_spark.operators.text import chunk_documents
    df = spark.createDataFrame([Row(doc_id=1, text=base),
                                Row(doc_id=2, text=edited)])
    fixed = (chunk_documents(df, 40, 0).select("doc_id", F.md5("chunk")
                                               .alias("h")).collect())
    f1 = {r["h"] for r in fixed if r["doc_id"] == 1}
    f2 = {r["h"] for r in fixed if r["doc_id"] == 2}
    assert len(f1 & f2) < len(shared)  # CDC strictly more shift-robust


def test_cdc_shared_stats_cross_doc_only(spark):
    """A chunk repeated INSIDE one doc is not 'shared'; the same chunk
    appearing in another doc is."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=a),
        Row(doc_id=2, text=a),            # full near-copy: all shared
        Row(doc_id=3, text="unrelated words only here nothing common"),
    ])
    out = {r["doc_id"]: r for r in
           T.cdc_shared_stats(docs, divisor=4).collect()}
    assert out[1]["shared_chunks"] == out[1]["n_chunks"]
    assert out[2]["shared_chunks"] == out[2]["n_chunks"]
    assert out[3]["shared_chunks"] == 0
    assert out[3]["shared_frac"] == 0.0


def test_cdc_oracle_matches_spark(spark, duck):
    """Value parity on the real corpus (the t2-style check the driver
    runs): the boundary rule, slices and fraction are bit-identical."""
    from tests.conftest import SF_TEST, assert_df_matches_duck
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet")
    sdf = T.cdc_shared_stats(docs, divisor=8)
    assert_df_matches_duck(sdf, duck, T.cdc_shared_stats_sql(divisor=8),
                           float_cols=("shared_frac",))


def test_a24_large_volume_orders_matches_oracle(spark, duck):
    import __spark_entry__ as e
    from tests.conftest import SF_TEST, assert_df_matches_duck
    sdf = e.q_large_volume_orders(spark, SF_TEST)
    assert_df_matches_duck(sdf, duck,
                           e.oracle_sql()["a24_large_volume_orders"],
                           float_cols=("o_totalprice", "total_qty"))
