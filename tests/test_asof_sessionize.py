"""As-of join and sessionization tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from klepto_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00:00"), 100.0),
         ("A", _ts("2024-01-01 10:05:00"), 101.0),
         ("B", _ts("2024-01-01 10:01:00"), 50.0)],
        "sym string, qtime timestamp, px double")
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:03:00")),   # after A@10:00
         (2, "A", _ts("2024-01-01 10:05:00")),   # ties A@10:05 (<= match)
         (3, "B", _ts("2024-01-01 10:00:30")),   # before any B quote
         (4, "C", _ts("2024-01-01 12:00:00"))],  # key with no quotes
        "tid long, sym string, ttime timestamp")
    return quotes, trades


def test_asof_backward(spark, quotes_trades):
    quotes, trades = quotes_trades
    got = {r.tid: r.px for r in
           asof_join(trades, quotes, key="sym", left_time="ttime",
                     right_time="qtime", payload=["px"]).collect()}
    assert got == {1: 100.0, 2: 101.0, 3: None, 4: None}


def test_asof_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    got = {r.tid: r.px for r in
           asof_join(trades, quotes, key="sym", left_time="ttime",
                     right_time="qtime", payload=["px"],
                     direction="forward").collect()}
    # forward: earliest quote at-or-after the trade
    assert got == {1: 101.0, 2: 101.0, 3: 50.0, 4: None}


def test_asof_collision_rename(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 00:01:00"), "L")],
                                 "k long, t timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"), "R")],
                                  "k long, rt timestamp, tag string")
    out = asof_join(left, right, key="k", left_time="t", right_time="rt",
                    payload=["tag"])
    row = out.first()
    assert row.tag == "L" and row.r_tag == "R"


def test_asof_null_payload_comes_from_matching_row(spark):
    """Whole-row semantics: when the true as-of right row carries a NULL in
    one payload column, that NULL must surface — not a stale value filled
    from an older right row (per-column last(ignorenulls) did that)."""
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100.0, "old"),
         (1, _ts("2024-01-01 10:02:00"), None, "new")],
        "k long, rt timestamp, px double, tag string")
    left = spark.createDataFrame(
        [(7, 1, _ts("2024-01-01 10:03:00"))], "tid long, k long, t timestamp")
    row = asof_join(left, right, key="k", left_time="t",
                    right_time="rt", payload=["px", "tag"]).first()
    assert row.tag == "new"
    assert row.px is None  # from the matching row, not 100.0 from the older


def test_asof_single_shuffle(spark, quotes_trades):
    from klepto_spark.plans import inspect as I
    quotes, trades = quotes_trades
    df = asof_join(trades, quotes, key="sym", left_time="ttime",
                   right_time="qtime", payload=["px"])
    # union-marker pattern: exactly one shuffle (window partitioning), no
    # join blow-up
    assert I.shuffle_count(df) == 1


# ------------------------------------------------------ sessionization ----

def _events(spark):
    rows = []
    # user 1: two sessions separated by a 2h gap
    for m in (0, 5, 10):
        rows.append((1, _ts(f"2024-03-01 09:{m:02d}:00"), 1.0))
    for m in (0, 1):
        rows.append((1, _ts(f"2024-03-01 12:{m:02d}:00"), 2.0))
    # user 2: one session
    rows.append((2, _ts("2024-03-01 09:00:00"), 5.0))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_batch(spark):
    got = sorted(
        ((r.user_id, r.n_events, r.sum_value)
         for r in __import__("klepto_spark.streaming.sessionize",
                             fromlist=["sessionize_batch"])
         .sessionize_batch(_events(spark), gap_s=1800).collect()))
    assert got == [(1, 2, 4.0), (1, 3, 3.0), (2, 1, 5.0)]


def test_sessionize_stream_agrees_with_batch(spark, tmp_path):
    from klepto_spark.streaming.sessionize import (
        sessionize_batch, sessionize_stream)

    _events(spark).write.parquet(str(tmp_path / "ev"))
    schema = spark.read.parquet(str(tmp_path / "ev")).schema
    stream = spark.readStream.schema(schema).parquet(str(tmp_path / "ev"))
    q = (sessionize_stream(stream, gap_s=1800, timeout="none")
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.n_events, r.sum_value)
           for r in spark.table("sessions").collect()}
    # the stream emits CLOSED sessions; the final open session per user
    # stays in state (would emit on timeout in a live stream)
    batch = sessionize_batch(_events(spark), gap_s=1800)
    all_sessions = {(r.user_id, r.n_events, r.sum_value)
                    for r in batch.collect()}
    assert got <= all_sessions
    assert (1, 3, 3.0) in got  # user 1's first session closed by the gap
