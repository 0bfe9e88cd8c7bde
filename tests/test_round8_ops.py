"""Round-8 operators: exact-dedup at-rest index (d11), Gopher n-gram
repetition gate (t15), token-budget mixture fill (p06), and fixed-window
payload energy (m03)."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from klepto_spark.operators import dedup
from klepto_spark.operators.sampling import token_budget_sample
from klepto_spark.operators.text import gopher_signals


# ---------------------------------------------------------------------------
# exact_append — incremental exact dedup against the at-rest fp index
# ---------------------------------------------------------------------------

PFX = 8


def _full_exact_pairs(docs, split_pred):
    """Full-recompute reference: fingerprint join restricted to pairs
    with a new-batch endpoint (old side in column a; intra-batch a<b)."""
    fp = docs.select("doc_id", dedup.exact_fingerprint("text", PFX)
                     .alias("fp"), F.expr(split_pred).alias("is_new"))
    old = fp.filter(~F.col("is_new")).selectExpr("doc_id AS a", "fp")
    new = fp.filter(F.col("is_new")).selectExpr("doc_id AS b", "fp")
    on = old.join(new, "fp").select("a", "b")
    nn = (new.selectExpr("b AS a", "fp")
          .join(new, "fp").filter(F.col("a") < F.col("b")).select("a", "b"))
    return {(r["a"], r["b"]) for r in on.unionByName(nn).collect()}


def test_exact_append_matches_full_recompute(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "ex_idx")
    dedup.exact_write_index(docs.filter("doc_id % 5 != 0"), idx,
                            prefix_words=PFX)
    got = {(r["a"], r["b"]) for r in
           dedup.exact_append(spark, idx, docs.filter("doc_id % 5 = 0"),
                              prefix_words=PFX, commit=False).collect()}
    want = _full_exact_pairs(docs, "doc_id % 5 = 0")
    assert got == want
    assert want, "the corpus must actually have prefix-exact dups"


def test_exact_append_commit_is_seen_by_next_batch(spark, tmp_path):
    mk = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in [
            (1, "alpha beta gamma delta"),
            (2, "zig zag zog zug"),
            (10, "alpha beta gamma delta"),       # batch1: dup of 1
            (20, "alpha beta gamma delta"),       # batch2: dup of 1 AND 10
            (21, "zig zag zog zug"),              # batch2: dup of 2
        ]])
    idx = str(tmp_path / "ex_commit")
    dedup.exact_write_index(mk.filter("doc_id < 10"), idx, prefix_words=PFX)
    p1 = {(r["a"], r["b"]) for r in
          dedup.exact_append(spark, idx, mk.filter("doc_id = 10"),
                             prefix_words=PFX, commit=True).collect()}
    assert p1 == {(1, 10)}
    p2 = {(r["a"], r["b"]) for r in
          dedup.exact_append(spark, idx, mk.filter("doc_id >= 20"),
                             prefix_words=PFX, commit=True).collect()}
    # batch 2 must see BOTH the original corpus and committed batch 1
    assert p2 == {(1, 20), (10, 20), (2, 21)}


def test_exact_append_rerun_emits_no_self_pairs(spark, tmp_path):
    """Re-running an append whose commit landed re-contains the batch's
    own keys in the index with the same fingerprint; the old-new join
    must not emit (x, x) self-pairs for them (ADVICE r08)."""
    mk = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in [
            (1, "alpha beta gamma delta"),
            (10, "alpha beta gamma delta"),
        ]])
    idx = str(tmp_path / "ex_rerun")
    dedup.exact_write_index(mk.filter("doc_id < 10"), idx, prefix_words=PFX)
    batch = mk.filter("doc_id = 10")
    first = {(r["a"], r["b"]) for r in dedup.exact_append(
        spark, idx, batch, prefix_words=PFX, commit=True).collect()}
    assert first == {(1, 10)}
    # accidental re-append of the committed batch: 10 is now 'old' too
    again = {(r["a"], r["b"]) for r in dedup.exact_append(
        spark, idx, batch, prefix_words=PFX, commit=False).collect()}
    assert (10, 10) not in again
    assert again == {(1, 10)}


def test_exact_append_no_commit_leaves_index_untouched(spark, sf_dir,
                                                       tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "ex_nc")
    dedup.exact_write_index(docs.filter("doc_id % 5 != 0"), idx,
                            prefix_words=PFX)
    before = spark.read.parquet(idx).count()
    dedup.exact_append(spark, idx, docs.filter("doc_id % 5 = 0"),
                       prefix_words=PFX, commit=False).collect()
    assert spark.read.parquet(idx).count() == before


def test_exact_append_probe_broadcasts_not_shuffles_index(spark, sf_dir,
                                                          tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "ex_plan")
    dedup.exact_write_index(docs.filter("doc_id % 5 != 0"), idx,
                            prefix_words=PFX)
    out = dedup.exact_append(spark, idx, docs.filter("doc_id % 5 = 0"),
                             prefix_words=PFX, commit=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_exact_append_refuses_commit_into_epoch_layout(spark, tmp_path):
    mk = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    idx = str(tmp_path / "ex_ep")
    (mk.select("doc_id", dedup.exact_fingerprint("text").alias("fp"),
               F.lit(0).alias("ep"))
     .write.partitionBy("ep").parquet(idx))
    with pytest.raises(ValueError, match="epoch-partitioned"):
        dedup.exact_append(spark, idx, mk, commit=True)
    # commit=False must still probe fine through the partitioned layout
    # (distinct batch key: same-key re-probes emit no self-pair, ADVICE r08)
    probe = spark.createDataFrame([Row(doc_id=2, text="a b c")])
    got = dedup.exact_append(spark, idx, probe, commit=False).collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 2)]


def test_exact_fingerprint_full_vs_prefix(spark):
    mk = spark.createDataFrame([
        Row(doc_id=1, text="one two three four five six seven eight TAIL-A"),
        Row(doc_id=2, text="one two three four five six seven eight TAIL-B"),
    ])
    full = mk.select(dedup.exact_fingerprint("text").alias("fp")).collect()
    assert full[0]["fp"] != full[1]["fp"]
    pre = mk.select(dedup.exact_fingerprint("text", 8).alias("fp")).collect()
    assert pre[0]["fp"] == pre[1]["fp"]


# ---------------------------------------------------------------------------
# gopher_signals — n-gram repetition gate
# ---------------------------------------------------------------------------

def test_gopher_signals_values_and_gate(spark):
    docs = spark.createDataFrame([
        # "ab ab ab ab": bigrams [ab ab]x3 -> top ratio 1.0; trigrams
        # [ab ab ab]x2 -> dup frac 0.5 -> dropped on both rules
        Row(doc_id=1, text="ab ab ab ab"),
        # all-distinct words: top bigram 1/3, dup trigrams 0 -> but
        # 1/3 > 0.20 so the bigram rule still drops a 4-word doc; use 7
        # words -> top bigram 1/6 <= 0.20 -> kept
        Row(doc_id=2, text="a b c d e f g"),
        Row(doc_id=3, text="too short"),          # < 3 words: excluded
    ])
    out = {r["doc_id"]: r for r in gopher_signals(docs).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert r1["top_bigram"] == "ab ab"
    assert r1["top_bigram_ratio"] == 1.0
    assert r1["dup_trigram_frac"] == 0.5
    assert r1["keep"] is False
    r2 = out[2]
    assert r2["top_bigram_ratio"] == pytest.approx(1 / 6)
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["keep"] is True


def test_gopher_signals_tie_breaks_to_largest_bigram(spark):
    # "x y x y z z z": bigrams (x y)x2 (y x)x1 (y z)x1 (z z)x2 -> tie at
    # count 2 between "x y" and "z z"; the contract picks the
    # lexicographically largest
    docs = spark.createDataFrame([Row(doc_id=1, text="x y x y z z z")])
    row = gopher_signals(docs).collect()[0]
    assert row["top_bigram"] == "z z"
    assert row["top_bigram_ratio"] == pytest.approx(2 / 6)


# ---------------------------------------------------------------------------
# token_budget_sample — greedy per-stratum token fill
# ---------------------------------------------------------------------------

def _hash8(key, salt):
    return hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:8]


def _greedy(rows, budget, salt):
    """Driver-side replay of the greedy prefix per stratum."""
    kept = set()
    by_s = {}
    for k, s, t in rows:
        by_s.setdefault(s, []).append((k, t))
    for s, docs in by_s.items():
        docs.sort(key=lambda kt: (_hash8(kt[0], salt), kt[0]))
        cum = 0
        for k, t in docs:
            cum += t
            if cum <= budget:
                kept.add(k)
            else:
                break
    return kept


def test_token_budget_greedy_prefix_semantics(spark):
    rows = [(i, f"s{i % 3}", 10 + (i * 7) % 25) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "tok"])
    out = token_budget_sample(df, "source", "doc_id", F.col("tok"),
                              budget=100, salt="t8")
    got = {r["doc_id"] for r in out.collect()}
    assert got == _greedy(rows, 100, "t8")
    # every kept row respects the budget, and cum is the running sum
    for r in out.collect():
        assert r["cum_tokens"] <= 100 and r["n_tokens"] <= r["cum_tokens"]


def test_token_budget_growth_never_evicts_earlier_hashes(spark):
    """Appending a new doc can only displace docs whose hash sorts AFTER
    it — everything the new doc sorts behind keeps its membership."""
    rows = [(i, "s", 30) for i in range(20)]
    df1 = spark.createDataFrame(rows, ["doc_id", "source", "tok"])
    kept1 = {r["doc_id"] for r in
             token_budget_sample(df1, "source", "doc_id", F.col("tok"),
                                 budget=150, salt="g").collect()}
    new_id = 999
    df2 = spark.createDataFrame(rows + [(new_id, "s", 30)],
                                ["doc_id", "source", "tok"])
    kept2 = {r["doc_id"] for r in
             token_budget_sample(df2, "source", "doc_id", F.col("tok"),
                                 budget=150, salt="g").collect()}
    h_new = _hash8(new_id, "g")
    before = {k for k in kept1 if (_hash8(k, "g"), k) < (h_new, new_id)}
    assert before <= kept2


def test_token_budget_zero_and_oversize_budget(spark):
    df = spark.createDataFrame([(1, "s", 10), (2, "s", 10)],
                               ["doc_id", "source", "tok"])
    assert token_budget_sample(df, "source", "doc_id", F.col("tok"),
                               budget=5, salt="").count() == 0
    assert token_budget_sample(df, "source", "doc_id", F.col("tok"),
                               budget=10_000, salt="").count() == 2


# ---------------------------------------------------------------------------
# frame_energy — fixed-window payload energy
# ---------------------------------------------------------------------------

def _media(spark, payloads):
    from klepto_spark.operators.multimodal import attach_media
    df = spark.createDataFrame(
        [Row(doc_id=i, payload=p) for i, p in payloads],
        "doc_id long, payload binary")
    return attach_media(df, "payload", "doc_id", kind="audio")


def test_frame_energy_window_math(spark):
    from klepto_spark.operators.multimodal import frame_energy
    p0 = bytes(range(10))            # windows of 4: [0..3],[4..7],[8,9]
    media = _media(spark, [(0, p0)])
    rows = {r["win_idx"]: r for r in
            frame_energy(media, window_bytes=4).collect()}
    assert len(rows) == 3
    assert (rows[0]["n_bytes"], rows[0]["byte_sum"]) == (4, 0 + 1 + 2 + 3)
    assert (rows[1]["n_bytes"], rows[1]["byte_sum"]) == (4, 4 + 5 + 6 + 7)
    assert (rows[2]["n_bytes"], rows[2]["byte_sum"]) == (2, 8 + 9)


def test_frame_energy_skips_null_and_empty(spark):
    from klepto_spark.operators.multimodal import frame_energy
    media = _media(spark, [(0, None), (1, b""), (2, b"\xff" * 5)])
    rows = frame_energy(media, window_bytes=8).collect()
    assert {r["media_id"] for r in rows} == {2}
    assert rows[0]["byte_sum"] == 255 * 5 and rows[0]["n_bytes"] == 5


def test_frame_energy_batches_multiple_payloads(spark):
    from klepto_spark.operators.multimodal import frame_energy
    payloads = [(i, bytes([i]) * (3 + i)) for i in range(6)]
    out = frame_energy(_media(spark, payloads), window_bytes=3).collect()
    for i, p in payloads:
        mine = sorted((r for r in out if r["media_id"] == i),
                      key=lambda r: r["win_idx"])
        assert sum(r["n_bytes"] for r in mine) == len(p)
        assert sum(r["byte_sum"] for r in mine) == sum(p)


def test_frame_energy_rejects_bad_window(spark):
    from klepto_spark.operators.multimodal import frame_energy
    with pytest.raises(ValueError):
        frame_energy(_media(spark, [(0, b"abc")]), window_bytes=0)


def test_exact_append_max_group_star_caps_mass_dups(spark, tmp_path):
    """A growing true-duplicate class must not emit quadratic pairs:
    above max_group each new member pairs only with the group's min key;
    groups at or under the cap keep the full pair set."""
    big = [(i, "same same same") for i in range(10)]        # giant class
    small = [(100 + i, "rare rare rare") for i in range(2)]  # tiny class
    corpus = spark.createDataFrame(big + small, "doc_id long, text string")
    idx = str(tmp_path / "ex_cap")
    dedup.exact_write_index(corpus, idx)
    batch = spark.createDataFrame(
        [(50, "same same same"), (51, "same same same"),
         (102, "rare rare rare")], "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in
           dedup.exact_append(spark, idx, batch, commit=False,
                              max_group=8).collect()}
    # giant class (12 members > 8): star only — (min key 0, each new)
    # tiny class (3 members <= 8): full pairs with a new endpoint
    assert got == {(0, 50), (0, 51), (100, 102), (101, 102)}
    # uncapped: the giant class emits 10*2 old-new + 1 new-new pairs
    full = dedup.exact_append(spark, idx, batch, commit=False).count()
    assert full == 21 + 2


# ---------------------------------------------------------------------------
# temperature_mixture — UniMax count^alpha resampling
# ---------------------------------------------------------------------------

def test_temperature_mixture_keeps_smallest_whole_thins_heads(spark):
    from klepto_spark.operators.sampling import temperature_mixture
    rows = ([(i, "big") for i in range(400)]
            + [(1000 + i, "small") for i in range(25)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mixture(df, "source", "doc_id", alpha=0.5, salt="t")
    got = {r["source"]: r["count"] for r in
           out.groupBy("source").count().collect()}
    # smallest group's rate is exactly 1.0 by algebra
    assert got["small"] == 25
    # head thins by (400/25)^(0.5-1) = 0.25 -> expectation 100
    assert abs(got["big"] - 100) < 40


def test_temperature_mixture_alpha_one_is_identity_rate(spark):
    from klepto_spark.operators.sampling import temperature_mixture
    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mixture(df, "source", "doc_id", alpha=1.0, salt="t")
    # alpha=1: every group's rate is 1.0 -> nothing dropped
    assert out.count() == 90


def test_temperature_mixture_rejects_bad_alpha(spark):
    from klepto_spark.operators.sampling import temperature_mixture
    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            temperature_mixture(df, "source", "doc_id", alpha=bad)


# ---------------------------------------------------------------------------
# validate: references SQL twin + orphan counting
# ---------------------------------------------------------------------------

def test_references_counts_orphans_and_sql_twin_needs_name(spark):
    from klepto_spark.operators import validate as V
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = V.validate(child, [V.references(["fk"], parent, ["pk"])])
    row = out.collect()[0]
    # fk=99 is the only orphan; NULL fk rows are excluded by contract
    assert (row["check"], row["violations"], row["pass"]) == \
        ("references", 1, False)
    with pytest.raises(ValueError, match="other_name"):
        V.validate_sql("child", [V.references(["fk"], parent, ["pk"])])


# ---------------------------------------------------------------------------
# extract_frames — plan -> single-blob-pass execution
# ---------------------------------------------------------------------------

def test_extract_frames_values_and_tail_wrap(spark):
    from klepto_spark.operators.multimodal import (attach_media,
                                                   extract_frames)
    p = bytes(range(7))
    media = (attach_media(
        spark.createDataFrame([Row(doc_id=1, payload=p)],
                              "doc_id long, payload binary"),
        "payload", "doc_id", kind="video")
        .withColumn("duration_ms", F.lit(2500).cast("long")))
    rows = {r["frame_ts"]: r for r in extract_frames(media, 1000).collect()}
    # plan: ts 0, 1000, 2000; offsets ts % 7 = 0, 6, 5
    assert set(rows) == {0, 1000, 2000}
    assert rows[0]["frame_byte"] == 0 and rows[0]["frame_sig"] == "00010203"
    assert rows[1000]["frame_byte"] == 6
    # offset 6 is the last byte: the signature truncates like the oracle
    assert rows[1000]["frame_sig"] == "06"
    assert rows[2000]["frame_byte"] == 5 and rows[2000]["frame_sig"] == "0506"


def test_extract_frames_skips_empty_and_non_video(spark):
    from klepto_spark.operators.multimodal import (attach_media,
                                                   extract_frames)
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=b""), Row(doc_id=2, payload=None),
         Row(doc_id=3, payload=b"abc")], "doc_id long, payload binary")
    media = (attach_media(df, "payload", "doc_id", kind="video")
             .withColumn("duration_ms", F.lit(1500).cast("long")))
    audio = (attach_media(df.filter("doc_id = 3"), "payload", "doc_id",
                          kind="audio")
             .withColumn("duration_ms", F.lit(1500).cast("long")))
    got = extract_frames(media.unionByName(audio), 1000).collect()
    # only doc 3's VIDEO row emits (2 frames); empty/null/audio drop
    assert {(r["media_id"], r["frame_ts"]) for r in got} == \
        {(3, 0), (3, 1000)}


# ---------------------------------------------------------------------------
# shared_chunk_stats — cross-doc duplicate spans
# ---------------------------------------------------------------------------

def test_shared_chunk_stats_flags_cross_doc_spans(spark):
    from klepto_spark.operators.text import shared_chunk_stats
    boiler = "x" * 10                       # one full chunk, shared
    docs = spark.createDataFrame([
        Row(doc_id=1, text=boiler + "aaaaabbbbb"),   # chunks: boiler, aaaaabbbbb
        Row(doc_id=2, text=boiler + "cccccddddd"),   # chunks: boiler, cccccddddd
        Row(doc_id=3, text="eeeeefffff"),            # unique single chunk
    ])
    out = {r["doc_id"]: r for r in
           shared_chunk_stats(docs, size=10).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["shared_chunks"] == 1
    assert out[1]["shared_frac"] == 0.5
    assert out[2]["shared_chunks"] == 1
    assert out[3]["n_chunks"] == 1 and out[3]["shared_chunks"] == 0
    assert out[3]["shared_frac"] == 0.0


def test_shared_chunk_stats_intra_doc_repeat_not_shared(spark):
    """A chunk repeated WITHIN one document is not cross-doc shared —
    the signal counts distinct-document occurrences, not occurrences."""
    from klepto_spark.operators.text import shared_chunk_stats
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="zzzzz" + "zzzzz"), Row(doc_id=2, text="qqqqq")])
    out = {r["doc_id"]: r for r in
           shared_chunk_stats(docs, size=5).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["shared_chunks"] == 0


def test_exact_append_star_reconnects_history_when_rep_is_new(spark,
                                                              tmp_path):
    """When a new doc becomes the group's minimum key, the star must
    also pair the OLD index members with the new representative —
    otherwise the group's historical component (anchored at the old
    minimum) splits from the new one and a duplicate survives dedup."""
    corpus = spark.createDataFrame(
        [(500 + i, "same same same") for i in range(10)],
        "doc_id long, text string")
    idx = str(tmp_path / "ex_newrep")
    dedup.exact_write_index(corpus, idx)
    batch = spark.createDataFrame(
        [(1, "same same same"), (2, "same same same")],
        "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in
           dedup.exact_append(spark, idx, batch, commit=False,
                              max_group=4).collect()}
    # rep = 1 (new): every member — old AND new — pairs with it
    want = {(1, 2)} | {(1, 500 + i) for i in range(10)}
    assert got == want


def test_exact_fingerprint_sql_prefix_length_matches_engine(spark, duck):
    """The DuckDB twin must hash exactly prefix_words words (DuckDB list
    slices are end-inclusive — an off-by-one here diverges on any pair
    differing at word k+1)."""
    text = "w1 w2 w3 w4 w5 w6 w7 w8 DIVERGES-HERE"
    sdf = spark.createDataFrame([(text,)], "text string")
    got_spark = sdf.select(
        dedup.exact_fingerprint("text", 8).alias("fp")).collect()[0]["fp"]
    got_duck = duck.execute(
        "SELECT " + dedup.exact_fingerprint_sql("t", 8)
        + " FROM (SELECT ? AS t)", [text]).fetchone()[0]
    import hashlib
    want = hashlib.md5(b"w1 w2 w3 w4 w5 w6 w7 w8").hexdigest()
    assert got_spark == want and got_duck == want


def test_cli_append_failed_pairs_out_leaves_index_unchanged(spark, sf_dir,
                                                            tmp_path):
    """The CLI must fold the batch only AFTER the pairs output lands: a
    failed --pairs-out write followed by a retry must not double-fold."""
    from klepto_spark.cli import main as cli_main
    idx = str(tmp_path / "cliidx")
    corpus = str(tmp_path / "corpus.parquet")
    batch = str(tmp_path / "batch.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.filter("doc_id % 5 != 0").write.parquet(corpus)
    docs.filter("doc_id % 5 = 0").write.parquet(batch)
    assert cli_main(["dedup-index", "build", "--mode", "exact",
                     "--source", corpus, "--index", idx,
                     "--prefix-words", "8"]) == 0
    before = spark.read.parquet(idx).count()
    # an unwritable pairs destination: parent is a FILE, not a dir
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    with pytest.raises(Exception):
        cli_main(["dedup-index", "append", "--mode", "exact",
                  "--index", idx, "--batch", batch,
                  "--pairs-out", str(blocker / "pairs"),
                  "--prefix-words", "8"])
    assert spark.read.parquet(idx).count() == before


def test_exact_append_rerun_star_cap_counts_keys_once(spark, tmp_path):
    """Under max_group, a re-appended key (index AND batch, same fp)
    must count once toward the group size and emit one star row — a
    re-run must not push a group over the cap or duplicate pairs."""
    rows = [Row(doc_id=i, text="same text for everyone") for i in
            (1, 2, 3)]
    mk = spark.createDataFrame(rows)
    idx = str(tmp_path / "ex_star_rerun")
    dedup.exact_write_index(mk, idx, prefix_words=PFX)
    # re-append the full committed batch: true membership stays 3, so
    # the group must NOT trip a cap of 3 (a double-counted size of 6
    # would) — the full pair SET survives (the old-new and new-new legs
    # may each contribute a copy; the set is the contract)
    # (orientation-normalised: with overlapping sets the old-new leg
    # emits a = index key, b = batch key, so both directions appear)
    pairs = dedup.exact_append(spark, idx, mk, prefix_words=PFX,
                               commit=False, max_group=3).collect()
    assert {tuple(sorted((r["a"], r["b"]))) for r in pairs} == \
        {(1, 2), (1, 3), (2, 3)}
    # above the cap, FULL re-append: every member counts as OLD after
    # the fold, and old-old star rows are excluded by the inductive
    # invariant (they were connected when first appended) — a replay
    # adds NOTHING rather than duplicate rows
    star = dedup.exact_append(spark, idx, mk, prefix_words=PFX,
                              commit=False, max_group=2).collect()
    assert star == []
    # a genuinely NEW member joining the capped group pairs with the
    # representative exactly once; re-appended old members stay silent
    mk2 = spark.createDataFrame(
        rows + [Row(doc_id=4, text="same text for everyone")])
    star2 = sorted((r["a"], r["b"]) for r in dedup.exact_append(
        spark, idx, mk2, prefix_words=PFX, commit=False,
        max_group=2).collect())
    assert star2 == [(1, 4)]
