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


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-key state across micro-batches."""
    import datetime

    base = datetime.datetime(2025, 4, 1)
    d = tmp_path / "st"
    df1 = spark.createDataFrame(
        [("a", base), ("a", base), ("b", base)], ["host", "ts"])
    df2 = spark.createDataFrame(
        [("a", base + datetime.timedelta(minutes=1)),
         ("b", base + datetime.timedelta(minutes=2))], ["host", "ts"])
    df1.coalesce(1).write.mode("overwrite").parquet(str(d))
    import time as _t
    _t.sleep(1.1)
    df2.coalesce(1).write.mode("append").parquet(str(d))

    schema = spark.read.parquet(str(d)).schema
    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(str(d))
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = sp.run_available_now(sp.stateful_running_counts(ev, "host", "ts"), "update")
    # final (max) running count per key across BOTH batches
    final = {r.host: r.n for r in
             out.groupBy("host").agg(F.max("n_total").alias("n")).collect()}
    assert final == {"a": 3, "b": 2}
    # state updated incrementally: >1 emission for at least one key
    assert out.count() >= 3


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """C6: an event older than the advanced watermark is discarded (append)."""
    import datetime

    base = datetime.datetime(2025, 5, 1, 12, 0, 0)
    d = tmp_path / "late"
    # batch 1: on-time events up to 12:00 + 3h
    rows1 = [(1, base + datetime.timedelta(hours=h)) for h in range(4)]
    # batch 2: one very-late event (10 h before max seen, watermark is 1 h)
    rows2 = [(1, base - datetime.timedelta(hours=7)),
             (1, base + datetime.timedelta(hours=4))]
    spark.createDataFrame(rows1, ["uid", "ts"]).coalesce(1) \
        .write.mode("overwrite").parquet(str(d))
    import time as _t
    _t.sleep(1.1)
    spark.createDataFrame(rows2, ["uid", "ts"]).coalesce(1) \
        .write.mode("append").parquet(str(d))

    schema = spark.read.parquet(str(d)).schema
    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(str(d))
          .withColumn("ts", F.col("ts").cast("timestamp")))
    agg = (ev.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour").alias("win"))
           .agg(F.count("*").alias("n")))
    sink = sp.run_available_now(agg, "append")
    total = sink.agg(F.sum("n")).first()[0] or 0
    # 6 events arrived; the one 7h-early (far below watermark) is dropped,
    # so at most 5 contribute to emitted windows
    assert total <= 5


def test_stream_to_ledger_checkpointed(spark, tmp_path):
    """foreachBatch -> ledgered dataset; checkpoint makes restarts incremental."""
    from co_new_spark.plans import lineage

    src = tmp_path / "src"
    base = str(tmp_path / "ds")
    ckpt = str(tmp_path / "ckpt")
    df1 = spark.range(100).select(F.col("id"), F.pmod("id", 4).alias("b"))
    df1.coalesce(1).write.mode("append").parquet(str(src))
    import time as _t
    _t.sleep(1.1)
    spark.range(100, 150).select(F.col("id"), F.pmod("id", 4).alias("b")) \
        .coalesce(1).write.mode("append").parquet(str(src))

    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(str(src))
    sp.stream_to_ledger(stream, base, "b", ckpt)
    assert lineage.dataset(spark, base, "__ledger_bucket").count() == 150

    # restart with the same checkpoint: nothing new to read, nothing re-added
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    sp.stream_to_ledger(stream2, base, "b", ckpt)
    assert lineage.dataset(spark, base, "__ledger_bucket").count() == 150

    # a third file arrives: only IT is processed on the next drain
    _t.sleep(1.1)
    spark.range(150, 170).select(F.col("id"), F.pmod("id", 4).alias("b")) \
        .coalesce(1).write.mode("append").parquet(str(src))
    stream3 = spark.readStream.schema(schema).parquet(str(src))
    sp.stream_to_ledger(stream3, base, "b", ckpt)
    got = lineage.dataset(spark, base, "__ledger_bucket")
    assert got.count() == 170
    assert got.select(F.sum("id")).first()[0] == sum(range(170))


def test_stream_upsert_merges_latest_per_key(spark, tmp_path):
    """CDC-style streaming MERGE: micro-batches with overlapping keys end in
    latest-per-key state, one snapshot commit per non-empty batch."""
    from pyspark.sql import functions as F

    from co_new_spark.plans import lineage
    from co_new_spark.streaming import pipeline as sp

    src = str(tmp_path / "cdc_src")
    base = str(tmp_path / "cdc_ds")
    ck = str(tmp_path / "cdc_ck")

    # seed the store
    init = spark.range(100).select(
        F.col("id").alias("k"), F.pmod("id", 4).alias("bucket"),
        F.lit(1).cast("long").alias("ts"), F.lit(0).cast("long").alias("v"))
    lineage.resumable_write(init, base, "bucket")

    # two CDC files -> two micro-batches (maxFilesPerTrigger=1)
    upd1 = spark.range(0, 30).select(
        F.col("id").alias("k"), F.pmod("id", 4).alias("bucket"),
        F.lit(2).cast("long").alias("ts"), F.lit(10).cast("long").alias("v"))
    upd2 = spark.range(20, 40).select(
        F.col("id").alias("k"), F.pmod("id", 4).alias("bucket"),
        F.lit(3).cast("long").alias("ts"), F.lit(20).cast("long").alias("v"))
    upd1.coalesce(1).write.parquet(src + "/f1")
    upd2.coalesce(1).write.parquet(src + "/f2")

    stream = (spark.readStream.schema("k long, bucket long, ts long, v long")
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/*"))
    sp.stream_upsert_to_ledger(stream, base, "k", "ts", "bucket", ck)

    got = {r["k"]: (r["ts"], r["v"])
           for r in lineage.dataset(spark, base, "bucket").collect()}
    assert len(got) == 100                      # exactly-once per key
    for k in range(100):
        if 20 <= k < 40:
            assert got[k] == (3, 20)
        elif k < 30:
            assert got[k] == (2, 10)
        else:
            assert got[k] == (1, 0)
    # seed commit + one merge commit per micro-batch
    assert lineage.snapshots(spark, base).count() >= 3


def test_stream_hll_registers_equal_batch(spark):
    """Streaming register maintenance == the same aggregate run as a plain
    batch query (stream-equals-batch inside Spark, on top of the DuckDB
    oracle), and sketch state stays bounded by types x 64."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR

    from co_new_spark.queries.streaming_q import s_hll_registers
    from co_new_spark.queries.webtext8 import _HLL_M, md5_h60, rho_of_rest
    from co_new_spark.sources.tables import load

    got = [(r.event_type, r.idx, r.reg)
           for r in s_hll_registers(spark, SF_DIR).collect()]
    ev = load(spark, SF_DIR, "events")
    key = F.concat(F.lit("u"), F.col("user_id").cast("string"))
    batch = (ev.select("event_type", md5_h60(key).alias("h"))
               .withColumn("rest", F.expr(f"h div {_HLL_M}"))
               .select("event_type",
                       F.pmod(F.col("h"), F.lit(_HLL_M)).alias("idx"),
                       rho_of_rest(F.col("rest")).alias("rho"))
               .groupBy("event_type", "idx")
               .agg(F.max("rho").alias("reg")))
    want = sorted((r.event_type, r.idx, r.reg) for r in batch.collect())
    assert sorted(got) == want
    n_types = ev.select("event_type").distinct().count()
    assert len(got) <= n_types * _HLL_M      # bounded sketch state
