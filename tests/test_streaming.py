"""Structured Streaming operator tests (bounded drains, deterministic)."""

import datetime

from pyspark.sql import functions as F

from co_new_spark.streaming import pipeline as sp


def _mk_events(spark, tmp_path):
    base = datetime.datetime(2025, 3, 1, 0, 0, 0)
    rows = []
    for uid in (1, 2):
        for k in range(6):
            # two sessions per user: 3 events 1 min apart, then a 30-min gap
            off = k * 60 + (1800 if k >= 3 else 0)
            rows.append((uid, base + datetime.timedelta(seconds=off), f"e{k % 2}"))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    p = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(p)
    return p


def test_windowed_counts_stream(spark, tmp_path):
    p = _mk_events(spark, tmp_path)
    ev = sp.parquet_stream(spark, p).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sp.run_available_now(
        sp.windowed_counts(ev, "ts", ["user_id"], window="1 hour"), "complete")
    got = {(r.user_id, r.n) for r in out.collect()}
    assert got == {(1, 6), (2, 6)}  # all events in one hour window per user


def test_session_windows_stream(spark, tmp_path):
    p = _mk_events(spark, tmp_path)
    ev = sp.parquet_stream(spark, p).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sp.run_available_now(
        sp.session_windows(ev, "ts", ["user_id"], gap="5 minutes"), "complete")
    rows = out.collect()
    assert len(rows) == 4  # 2 users x 2 sessions
    assert all(r.n == 3 for r in rows)


def test_dedup_stream(spark, tmp_path):
    p = _mk_events(spark, tmp_path)
    ev = sp.parquet_stream(spark, p).withColumn("ts", F.col("ts").cast("timestamp"))
    sink = sp.run_available_now(
        sp.dedup_stream(ev, ["user_id", "event_type"], "ts"), "append")
    assert sink.count() == 4  # 2 users x 2 event types


def test_stream_static_join(spark, tmp_path):
    p = _mk_events(spark, tmp_path)
    ev = sp.parquet_stream(spark, p).withColumn("ts", F.col("ts").cast("timestamp"))
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], ["user_id", "tier"])
    sink = sp.run_available_now(sp.stream_static_join(ev, dim, "user_id"), "append")
    got = sink.groupBy("tier").count().collect()
    assert {(r.tier, r["count"]) for r in got} == {("gold", 6), ("silver", 6)}


def test_single_file_shim_reads_testdata(spark):
    ev = sp.parquet_stream(spark, "/root/testdata/sf0.001/events.parquet")
    assert "ts" in ev.columns and ev.isStreaming
