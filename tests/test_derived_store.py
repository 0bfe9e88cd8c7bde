"""Managed derived-dataset store (VERDICT r05 #6): one copy per source
state, atomic publish, superseded tags vacuumed."""

import os

from pyspark.sql import functions as F

from klepto_spark.sinks import derived


def _src(spark, tmp_path, n=20):
    p = str(tmp_path / "src.parquet")
    spark.range(0, n).select(F.col("id").alias("k")).write \
        .mode("overwrite").parquet(p)
    return p


def test_build_once_then_read(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("KLEPTO_DERIVED_DIR", str(tmp_path / "store"))
    src = _src(spark, tmp_path)
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(src).withColumn("d", F.col("k") * 2)

    a = derived.read_or_build(spark, src, "x2", build)
    b = derived.read_or_build(spark, src, "x2", build)
    assert len(calls) == 1  # second call served at rest
    assert a.count() == b.count() == 20
    final = derived.derived_path(src, "x2")
    assert os.path.exists(os.path.join(final, "_SUCCESS"))
    # no staging remnants after the swap
    parent = os.path.dirname(final)
    assert not [n for n in os.listdir(parent) if n.startswith("_stage-")]


def test_new_source_state_gets_new_tag_and_old_is_vacuumed(
        spark, tmp_path, monkeypatch):
    monkeypatch.setenv("KLEPTO_DERIVED_DIR", str(tmp_path / "store"))
    src = _src(spark, tmp_path)
    build = lambda: spark.read.parquet(src).withColumn("d", F.col("k"))
    derived.read_or_build(spark, src, "x2", build)
    old = derived.derived_path(src, "x2")
    # rewrite the source with a LATER mtime = a new state
    spark.range(0, 5).select(F.col("id").alias("k")).write \
        .mode("overwrite").parquet(src)
    t = os.path.getmtime(src) + 5
    os.utime(src, (t, t))
    got = derived.read_or_build(spark, src, "x2", build)
    assert got.count() == 5
    new = derived.derived_path(src, "x2")
    assert new != old
    assert not os.path.exists(old)  # superseded tag vacuumed
    assert os.path.exists(os.path.join(new, "_SUCCESS"))


def test_vacuum_reports_and_keeps_current(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("KLEPTO_DERIVED_DIR", str(tmp_path / "store"))
    src = _src(spark, tmp_path)
    build = lambda: spark.read.parquet(src)
    derived.read_or_build(spark, src, "k", build)
    parent = os.path.dirname(derived.derived_path(src, "k"))
    os.makedirs(os.path.join(parent, "tag=123"))
    os.makedirs(os.path.join(parent, "_stage-tag=456"))
    assert derived.vacuum(src, "k") == 2
    assert derived.read_or_build(spark, src, "k", build).count() == 20
