"""Structured Streaming surface (SURVEY.md §2.C): the late-page ingestion path.

The reference has no streaming concept; this exists because the engine's
north rule targets continuously-crawled pages.  All operators are pure Spark
built-ins (watermarks, tumbling/session windows, stateful dedup,
stream-static joins) — at scale the sink is a partitioned parquet/Iceberg
table; tests and the driver contract use ``availableNow`` + an in-memory sink
so a bounded input drains deterministically and the result is queryable as a
batch table.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SINK_IDS = itertools.count()
_SINK_KEEP: list[str] = []


def parquet_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of a parquet file/dir (schema pinned from a batch read).

    The file-stream source requires a DIRECTORY; a single-file path is shimmed
    through a temp dir holding a symlink (read-only testdata stays untouched).
    """
    import hashlib
    import os
    import tempfile

    if os.path.isfile(path):
        target = os.path.abspath(path)  # relative targets would dangle
        d = os.path.join(tempfile.gettempdir(), "co_stream_src",
                         hashlib.sha1(target.encode()).hexdigest()[:12])
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(target))
        try:
            os.symlink(target, link)
        except FileExistsError:  # concurrent creators race benignly
            pass
        path = d
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(stream: DataFrame, ts_col: str, keys: list[str],
                    window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """C2+C3: watermarked tumbling-window counts per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(F.count("*").alias("n"))
    )


def session_windows(stream: DataFrame, ts_col: str, keys: list[str],
                    gap: str = "5 minutes", watermark: str = "2 hours") -> DataFrame:
    """C4: session windows (merge events closer than ``gap`` per key)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *keys)
        .agg(F.count("*").alias("n"), F.min(ts_col).alias("first_ts"))
    )


def dedup_stream(stream: DataFrame, keys: list[str], ts_col: str,
                 watermark: str = "2 hours") -> DataFrame:
    """C5: stateful streaming dedup — first row per key wins within watermark."""
    return stream.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)


def stream_static_join(stream: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """C7: stream x broadcast static dimension (no state, map-side)."""
    return stream.join(F.broadcast(dim), on, how)


def stateful_running_counts(stream: DataFrame, key: str, ts_col: str,
                            key_type: str = "string") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    row count + last-seen timestamp, carried across micro-batches in
    GroupState (the 'custom stateful operator' path of SURVEY.md §2.C when
    built-ins can't express the semantics).

    Emits one UPDATE row per key per batch: (key, n_total, last_ts).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, pdfs, state: GroupState):
        n, last = (state.get if state.exists else (0, None))
        for pdf in pdfs:
            n += len(pdf)
            m = pdf[ts_col].max()  # NaT when the batch's timestamps are all null
            ms = int(pd.Timestamp(m).value // 1000) if pd.notna(m) else None
            if ms is not None and (last is None or ms > last):
                last = ms
        state.update((n, last))
        yield pd.DataFrame({key: [key_tuple[0]], "n_total": [n],
                            "last_ts_us": [last]})

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=f"{key} {key_type}, n_total long, last_ts_us long",
        stateStructType="n long, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_to_ledger(stream: DataFrame, base: str, bucket_col: str,
                     checkpoint: str) -> None:
    """Drain a bounded stream into a ledgered dataset via foreachBatch.

    Composes the two resumability layers: Spark's streaming checkpoint
    (source offsets — a restart never re-reads processed files) and the
    lineage ledger (per-bucket commit metrics + snapshot/time-travel reads).
    Each micro-batch appends its buckets' rows through a dynamic-partition
    overwrite keyed by (bucket, batch) so replays of an interrupted batch
    are idempotent.
    """
    from ..plans import lineage

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # bucket per (batch, bucket_col): replayed batches overwrite
        # themselves.  Encoding (bucket << 20) | batch_id is guarded: fail
        # LOUD on out-of-range ids rather than silently wrap/collide.
        if batch_id >= (1 << 20):
            raise ValueError(f"batch_id {batch_id} exceeds ledger encoding range")
        b = F.col(bucket_col).cast("bigint")
        # out-of-range/NULL buckets encode to NULL; resumable_write raises
        # ValueError on NULL buckets, so bad ids fail loud, never wrap
        enc = F.when((b >= 0) & (b < (1 << 42)),
                     F.shiftleft(b, 20) + F.lit(batch_id))
        out = batch_df.withColumn("__ledger_bucket", enc)
        lineage.resumable_write(out, base, "__ledger_bucket")

    (stream.writeStream.foreachBatch(sink)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True).start().awaitTermination())


def run_available_now(result: DataFrame, output_mode: str,
                      state_partitions: int | None = None) -> DataFrame:
    """Drain a bounded stream with Trigger.AvailableNow into a memory sink.

    Returns the sink as a batch DataFrame.  ``output_mode``: 'complete' for
    full aggregations, 'append' for row streams (joins, dedup).

    ``state_partitions``: stateful operators (windowed aggs, dedup,
    applyInPandasWithState) open one state-store instance per shuffle
    partition, and that width is captured from the session conf at QUERY
    START — inheriting the fact-table shuffle width pays state-store init
    for partitions that will hold a handful of keys.  Pass the expected key
    cardinality's scale here (e.g. 4 for per-event-type state) and the
    session conf is set for the start and restored right after; a real
    deployment sizes the session conf instead.

    LIFETIME: the returned DataFrame reads a temp view that is evicted once
    8 newer sinks have drained (bounded driver memory).  Callers holding a
    result across many subsequent drains must materialize first (collect,
    cache+count, or write); afterwards the view may be unresolvable.
    """
    spark = result.sparkSession
    name = f"co_stream_sink_{next(_SINK_IDS)}"
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q = (result.writeStream.format("memory").queryName(name)
             .outputMode(output_mode).trigger(availableNow=True).start())
        q.awaitTermination()
        q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set(key, prev)
    # bound driver memory: memory-sink tables live for the session; keep the
    # last few and drop older drained sinks
    _SINK_KEEP.append(name)
    while len(_SINK_KEEP) > 8:
        old = _SINK_KEEP.pop(0)
        try:
            spark.catalog.dropTempView(old)
        except Exception:
            pass
    return spark.table(name)


def stream_upsert_to_ledger(stream: DataFrame, base: str, key: str,
                            ts_col: str, bucket_col: str,
                            checkpoint: str) -> None:
    """Streaming MERGE: drain a bounded CDC-style stream into the ledgered
    dataset via foreachBatch + lineage.upsert_latest — every micro-batch
    merges latest-per-``key`` into only the buckets it touches, each merge a
    new snapshot commit.

    The two resumability layers compose as in stream_to_ledger, with one
    semantic difference: upserts are idempotent BY VALUE (re-merging a
    replayed batch rewrites the same winners), so a crash between the data
    write and the streaming checkpoint replays the batch into an identical
    state instead of appending a duplicate bucket.  Requires bucket_col to
    be a stable function of key (upsert_latest's contract).
    """
    from ..plans import lineage

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        lineage.upsert_latest(batch_df, base, key, ts_col, bucket_col)

    (stream.writeStream.foreachBatch(sink)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True).start().awaitTermination())
