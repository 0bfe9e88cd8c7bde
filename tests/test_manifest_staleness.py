"""The min/max manifest must never serve a pruned read that disagrees
with the merged view of the table (ADVICE r04): pending positional /
key-epoch deletes, compactions that rewrite files, and bin-pack must all
either invalidate ``_minmax.json`` or make ``load_range`` stand down to
the plain load()+filter path. ``load_range``'s documented contract is
"same results either way" — these tests pin it across every mutation."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from klepto_spark.sinks.layout import MANIFEST, optimize_table
from klepto_spark.sources.catalog import FileCatalog


def _mk_table(spark, d, n=2000):
    df = spark.range(0, n).select(
        F.col("id").alias("x"), (F.col("id") % 7).alias("y"))
    df.write.parquet(f"{d}/t.parquet")
    optimize_table(spark, d, "t", sort_by=["x"], n_files=4)
    assert os.path.exists(f"{d}/t.parquet/{MANIFEST}")
    return FileCatalog(spark, d)


def test_load_range_stands_down_on_pending_positional_deletes(
        spark, tmp_path):
    from klepto_spark.sinks.positional_dv import positional_delete
    d = str(tmp_path)
    cat = _mk_table(spark, d)
    n = positional_delete(spark, d, "t", predicate="x >= 100 AND x < 120")
    assert n == 20
    got = sorted(r["x"] for r in cat.load_range("t", "x", 90, 130).collect())
    assert got == list(range(90, 100)) + list(range(120, 131))
    # the manifest survives (base files untouched) — it just can't serve
    # reads until the positions fold
    assert os.path.exists(f"{d}/t.parquet/{MANIFEST}")


def test_pdv_compaction_invalidates_manifest(spark, tmp_path):
    from klepto_spark.sinks.positional_dv import (compact_files_pdv,
                                                  positional_delete)
    d = str(tmp_path)
    cat = _mk_table(spark, d)
    positional_delete(spark, d, "t", predicate="x = 105")
    assert compact_files_pdv(spark, d, "t") >= 1
    # rewritten files -> stale manifest must be gone, range read correct
    assert not os.path.exists(f"{d}/t.parquet/{MANIFEST}")
    got = sorted(r["x"] for r in cat.load_range("t", "x", 100, 110).collect())
    assert got == [100, 101, 102, 103, 104, 106, 107, 108, 109, 110]


def test_first_dv_epoch_invalidates_manifest(spark, tmp_path):
    from klepto_spark.sinks.deletion_vectors import merge_files_dv
    d = str(tmp_path)
    cat = _mk_table(spark, d)
    merge_files_dv(
        spark.createDataFrame([(5000, 1)], "x bigint, y bigint"),
        d, "t", "parquet", ["x"], auto_compact=None)
    assert not os.path.exists(f"{d}/t.parquet/{MANIFEST}")
    got = sorted(r["x"] for r in
                 cat.load_range("t", "x", 4000, 6000).collect())
    assert got == [5000]


def test_dv_compaction_invalidates_manifest(spark, tmp_path):
    """An epoch committed against a pre-manifest table, then folded: the
    fold rewrites base files, so a manifest written in between (or
    surviving for any reason) must not outlive it."""
    from klepto_spark.sinks.deletion_vectors import (compact_files_dv,
                                                     merge_files_dv)
    d = str(tmp_path)
    base = spark.range(0, 500).select(F.col("id").alias("x"),
                                      (F.col("id") % 3).alias("y"))
    merge_files_dv(base, d, "t", "parquet", ["x"], auto_compact=None)
    merge_files_dv(
        spark.createDataFrame([(42, 99)], "x bigint, y bigint"),
        d, "t", "parquet", ["x"], auto_compact=None)
    # simulate a stale manifest appearing before the fold
    with open(f"{d}/t.parquet/{MANIFEST}", "w") as f:
        json.dump({"files": [{"file": "gone.parquet",
                              "stats": {"x": [0, 1]}}],
                   "columns": ["x"]}, f)
    assert compact_files_dv(spark, d, "t", "parquet") == 1
    assert not os.path.exists(f"{d}/t.parquet/{MANIFEST}")
    cat = FileCatalog(spark, d)
    assert cat.load_range("t", "x", 42, 42).first()["y"] == 99


def test_binpack_invalidates_manifest_and_range_read_correct(
        spark, tmp_path):
    from klepto_spark.sinks.layout import compact_small_files
    d = str(tmp_path)
    cat = _mk_table(spark, d, n=400)
    # append a tail of tiny files so bin-pack has work; they are not in
    # the manifest, which is exactly the hazard
    for i in range(3):
        spark.range(10_000 + i, 10_001 + i).select(
            F.col("id").alias("x"), F.lit(0).cast("bigint").alias("y")) \
            .coalesce(1).write.mode("append").parquet(f"{d}/t.parquet")
    assert compact_small_files(spark, d, "t", target_mb=1) >= 3
    assert not os.path.exists(f"{d}/t.parquet/{MANIFEST}")
    got = sorted(r["x"] for r in
                 cat.load_range("t", "x", 9_000, 11_000).collect())
    assert got == [10_000, 10_001, 10_002]


def test_manifest_naming_missing_files_is_dropped(spark, tmp_path):
    """Out-of-band rewrite: the manifest names files that no longer exist.
    load_range must fall back (not error / not drop rows) and clear the
    stale manifest so the next optimize starts clean."""
    d = str(tmp_path)
    cat = _mk_table(spark, d, n=300)
    tdir = f"{d}/t.parquet"
    with open(f"{tdir}/{MANIFEST}") as f:
        m = json.load(f)
    m["files"].append({"file": "never-existed.parquet",
                       "stats": {"x": [0, 1]}})
    with open(f"{tdir}/{MANIFEST}", "w") as f:
        json.dump(m, f)
    got = sorted(r["x"] for r in cat.load_range("t", "x", 10, 12).collect())
    assert got == [10, 11, 12]
    assert not os.path.exists(f"{tdir}/{MANIFEST}")


def test_catalog_load_recovers_half_applied_binpack(spark, tmp_path):
    """A crash mid bin-pack publish (news moved in, olds not yet deleted)
    must not show duplicate rows to catalog readers: load() replays the
    journaled plan before reading (read-path recovery, like
    apply_positional's _recover_plan)."""
    d = str(tmp_path)
    tdir = f"{d}/t.parquet"
    for i in range(2):
        spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("x")) \
            .coalesce(1).write.mode("append").parquet(tdir)
    olds = sorted(f"{tdir}/{f}" for f in os.listdir(tdir)
                  if f.endswith(".parquet"))
    # "news" that duplicate the olds' content, moved in already
    spark.read.parquet(*olds).coalesce(1).write.parquet(f"{tdir}/_bpstage")
    staged = [f for f in os.listdir(f"{tdir}/_bpstage")
              if f.endswith(".parquet")]
    news = []
    for i, s in enumerate(staged):
        dst = f"{tdir}/bp-{i}-{s}"
        os.rename(f"{tdir}/_bpstage/{s}", dst)
        news.append(dst)
    with open(f"{tdir}/_binpack.json", "w") as f:
        json.dump({"olds": olds, "news": news}, f)
    # a FRESH journal must refuse: it could be a live publish in another
    # process, and recovery is destructive (ADVICE r05 lease gate)
    cat = FileCatalog(spark, d)
    with pytest.raises(RuntimeError, match="publish journal"):
        cat.load("t")
    # age the remnants past the lease: now it is a crash, and recovery
    # must settle the file set before the read
    stale = time.time() - 120
    os.utime(f"{tdir}/_binpack.json", (stale, stale))
    os.utime(f"{tdir}/_bpstage", (stale, stale))
    got = sorted(r["x"] for r in cat.load("t").collect())
    assert got == list(range(20))
    assert not os.path.exists(f"{tdir}/_binpack.json")


def test_cli_delete_where_reaches_rows_in_pending_epochs(spark, tmp_path,
                                                         capsys):
    """compact --delete-where on a merge-on-read table with pending key
    epochs: rows living only in the epochs must ALSO be deleted (the r04
    compliance hazard was folding them back in as live)."""
    from klepto_spark.cli import main
    from klepto_spark.sinks.deletion_vectors import merge_files_dv
    d = str(tmp_path)
    base = spark.range(0, 100).select(F.col("id").alias("k"),
                                      F.lit("keep").alias("v"))
    merge_files_dv(base, d, "t", "parquet", ["k"], auto_compact=None)
    # epoch upserts: one matching the delete predicate, one not
    merge_files_dv(
        spark.createDataFrame([(500, "secret"), (501, "fine")],
                              "k bigint, v string"),
        d, "t", "parquet", ["k"], auto_compact=None)
    assert main(["compact", "--target", f"parquet://{d}", "--table", "t",
                 "--delete-where", "v = 'secret'"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["tables"]["t"]["positions_recorded"] == 1
    cat = FileCatalog(spark, d)
    rows = {r["k"]: r["v"] for r in cat.load("t").collect()}
    assert 500 not in rows          # the epoch row was deleted
    assert rows[501] == "fine"      # its same-epoch sibling survived
    assert len(rows) == 101


def test_long_string_stats_get_no_envelope(spark, tmp_path):
    """Parquet writers truncate long string statistics; a truncated max
    is a prefix strictly below the true max, so pruning on it can skip a
    matching file. Long-string columns therefore get NO envelope (file
    always kept); short strings and numerics keep theirs."""
    from klepto_spark.sinks import layout
    d = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("x"),
        F.concat(F.lit("p" * 100),
                 F.lpad(F.col("id").cast("string"), 5, "0")).alias("long_s"),
        F.lpad(F.col("id").cast("string"), 5, "0").alias("short_s"))
    layout.write_sorted(df, d, ["x"], n_files=4,
                        stat_cols=["x", "long_s", "short_s"])
    with open(os.path.join(d, MANIFEST)) as f:
        m = json.load(f)
    for e in m["files"]:
        assert "x" in e["stats"]
        assert "short_s" in e["stats"]
    # long strings: either every envelope omitted (old pyarrow heuristic)
    # or present only when the footer marks them exact
    import pyarrow.parquet as pq
    probe = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    st = pq.ParquetFile(os.path.join(d, probe)).metadata \
        .row_group(0).column(1).statistics
    if not hasattr(st, "is_min_value_exact"):
        assert all("long_s" not in e["stats"] for e in m["files"])
    # regardless of how it got there, pruning on the long column must
    # never drop a file with matches
    needle = "p" * 100 + "00042"
    kept = layout.prune_files(d, "long_s", lo=needle, hi=needle)
    hit = spark.read.parquet(*kept).filter(F.col("long_s") == needle)
    assert hit.count() == 1


def test_bare_bpstage_without_journal_recovers_immediately(spark, tmp_path):
    """A _bpstage remnant with NO _binpack.json means nothing was
    published: recovery only drops staging, so blocking reads for the
    lease window bought no safety — it must recover at once (ADVICE
    r06). The lease still applies once a journal exists (test above)."""
    d = str(tmp_path)
    tdir = f"{d}/t.parquet"
    spark.range(0, 10).select(F.col("id").alias("x")) \
        .coalesce(1).write.parquet(tdir)
    # a FRESH pre-journal staging remnant (crash before journalling)
    spark.range(0, 3).coalesce(1).write.parquet(f"{tdir}/_bpstage")
    cat = FileCatalog(spark, d)
    got = sorted(r["x"] for r in cat.load("t").collect())
    assert got == list(range(10))
    assert not os.path.exists(f"{tdir}/_bpstage")
