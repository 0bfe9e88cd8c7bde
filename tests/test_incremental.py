"""Watermark-based incremental steal: first run full-copies, later runs
copy only the delta, marks persist across runs, crashes replay."""

import json

from klepto_spark.config import Spec, TableSpec
from klepto_spark.incremental import load_marks, steal_incremental
from klepto_spark.sources.catalog import FileCatalog

SCHEMA = "id long, name string, v double"


def _cat(spark, tmp_path):
    return FileCatalog(spark, str(tmp_path / "src"))


def _write(spark, tmp_path, rows, mode="overwrite"):
    (spark.createDataFrame(rows, SCHEMA)
     .write.mode(mode).parquet(str(tmp_path / "src" / "t.parquet")))


def test_incremental_copies_only_the_delta(spark, tmp_path):
    _write(spark, tmp_path, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
    state = str(tmp_path / "marks.json")
    out = f"parquet://{tmp_path}/out"
    spec = Spec(tables=[TableSpec(name="t", anonymise={"name": "FirstName"})])

    # run 1: no mark -> full copy (overwrite), mark lands at 3
    rep1 = steal_incremental(spec, _cat(spark, tmp_path), out,
                             state_path=state, watermarks={"t": "id"})
    assert rep1.ok
    got = spark.read.parquet(f"{tmp_path}/out/t.parquet")
    assert got.count() == 3
    assert load_marks(state)["t"] == {"kind": "int", "value": 3}
    # the pipeline still applies: names anonymised
    assert not [r for r in got.collect() if r.name in ("a", "b", "c")]

    # run 2: two new rows -> append exactly the delta
    _write(spark, tmp_path, [(4, "d", 40.0), (5, "e", 50.0)], mode="append")
    rep2 = steal_incremental(spec, _cat(spark, tmp_path), out,
                             state_path=state, watermarks={"t": "id"})
    assert rep2.ok
    got = spark.read.parquet(f"{tmp_path}/out/t.parquet")
    assert sorted(r.id for r in got.collect()) == [1, 2, 3, 4, 5]
    by = {t.table: t for t in rep2.tables}
    assert by["t"].rows == 2  # only the delta moved
    assert load_marks(state)["t"]["value"] == 5

    # run 3: nothing new -> nothing copied, mark untouched
    rep3 = steal_incremental(spec, _cat(spark, tmp_path), out,
                             state_path=state, watermarks={"t": "id"})
    assert {t.table: t for t in rep3.tables}["t"].rows == 0
    assert spark.read.parquet(f"{tmp_path}/out/t.parquet").count() == 5


def test_incremental_timestamp_watermark(spark, tmp_path, sf_dir):
    """Timestamp watermark on the events table: the second run adds only
    rows past the persisted timestamp mark."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(400)
    from klepto_spark.session import normalise_nanos_ts
    ev = normalise_nanos_ts(ev).orderBy("ts").cache()
    half = ev.limit(200)
    half.write.mode("overwrite").parquet(str(tmp_path / "src" / "t.parquet"))
    state = str(tmp_path / "m.json")
    out = f"parquet://{tmp_path}/out"

    steal_incremental(Spec(), _cat(spark, tmp_path), out,
                      state_path=state, watermarks={"t": "ts"})
    assert spark.read.parquet(f"{tmp_path}/out/t.parquet").count() == 200
    assert load_marks(state)["t"]["kind"] == "timestamp"

    ev.subtract(half).write.mode("append").parquet(
        str(tmp_path / "src" / "t.parquet"))
    rep = steal_incremental(Spec(), _cat(spark, tmp_path), out,
                            state_path=state, watermarks={"t": "ts"})
    got = spark.read.parquet(f"{tmp_path}/out/t.parquet")
    # every source event copied exactly once (no dupes at the boundary)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    assert rep.ok


def test_incremental_state_is_atomic_and_replayable(spark, tmp_path):
    """A failed run must NOT advance the mark — the window replays."""
    _write(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    state = str(tmp_path / "marks.json")
    out = f"parquet://{tmp_path}/out"
    steal_incremental(Spec(), _cat(spark, tmp_path), out,
                      state_path=state, watermarks={"t": "id"})
    before = json.dumps(load_marks(state), sort_keys=True)

    _write(spark, tmp_path, [(3, "c", 3.0)], mode="append")
    import pytest
    with pytest.raises(RuntimeError):
        # unwritable sink -> the copy fails -> mark must not move
        steal_incremental(Spec(), _cat(spark, tmp_path),
                          "unknownscheme://nope", state_path=state,
                          watermarks={"t": "id"})
    assert json.dumps(load_marks(state), sort_keys=True) == before
    # the retry picks the same window up
    rep = steal_incremental(Spec(), _cat(spark, tmp_path), out,
                            state_path=state, watermarks={"t": "id"})
    assert {t.table: t for t in rep.tables}["t"].rows == 1
    assert load_marks(state)["t"]["value"] == 3
