"""Per-partition lineage ledger + resumable partitioned writes (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

No Iceberg runtime exists in this environment (SURVEY.md §7 R4), so snapshot
semantics are emulated over plain Parquet with an explicit ledger:

* data lands under ``<base>/data/<bucket_col>=K/...`` (one bucket = one unit
  of resumability — e.g. the L0 cell digit, or pmod(hash(url), N));
* a ledger table under ``<base>/_ledger/`` records one row per COMPLETED
  bucket: (bucket, n_rows, wall_s, run_id, finished_at) — appended only
  AFTER the bucket's data is fully written;
* resume = anti-join pending buckets against the ledger: completed buckets
  are skipped entirely, incomplete buckets are atomically rewritten via
  dynamic partition overwrite (a crash between data write and ledger append
  re-runs just that bucket — idempotent because overwrite replaces it).

This is the same protocol an Iceberg commit gives per-snapshot, restated at
bucket granularity; the IO interface is thin so a real catalog slots in.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = "bucket BIGINT, n_rows BIGINT, wall_s DOUBLE, run_id STRING, finished_at TIMESTAMP"


def _ledger_path(base: str) -> str:
    return os.path.join(base, "_ledger")


def read_ledger(spark: SparkSession, base: str) -> DataFrame:
    p = _ledger_path(base)
    try:
        return spark.read.schema(LEDGER_SCHEMA).parquet(p)
    except Exception:
        return spark.createDataFrame([], LEDGER_SCHEMA)


def completed_buckets(spark: SparkSession, base: str) -> set[int]:
    return {r.bucket for r in read_ledger(spark, base).select("bucket").distinct().collect()}


def resumable_write(df: DataFrame, base: str, bucket_col: str = "bucket",
                    max_buckets: int | None = None) -> dict:
    """Write ``df`` partitioned by ``bucket_col``, skipping ledgered buckets.

    ``max_buckets`` bounds how many pending buckets this invocation commits
    (used by tests to simulate a mid-job crash; a production run leaves it
    None).  Returns {written: [...], skipped: [...], n_rows: int}.

    One Spark job writes ALL pending buckets (dynamic partition overwrite —
    no driver-side per-bucket loop), one job counts per-bucket rows for the
    metrics ledger, then the ledger append commits them.
    """
    spark = df.sparkSession
    done = completed_buckets(spark, base)
    pending_df = df.filter(~F.col(bucket_col).isin(list(done)) if done else F.lit(True))

    pending = sorted(
        r[0] for r in pending_df.select(bucket_col).distinct().collect())
    if max_buckets is not None:
        pending = pending[:max_buckets]
        pending_df = df.filter(F.col(bucket_col).isin(pending))
    if not pending:
        return {"written": [], "skipped": sorted(done), "n_rows": 0}

    t0 = time.time()
    (pending_df.write
     .mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(bucket_col)
     .parquet(os.path.join(base, "data")))
    wall = time.time() - t0

    # metrics: per-bucket row counts read back from the committed files
    # (counts what actually landed, not what the plan promised)
    written = (spark.read.parquet(os.path.join(base, "data"))
               .filter(F.col(bucket_col).isin(pending))
               .groupBy(bucket_col).agg(F.count("*").alias("n_rows")))
    run_id = uuid.uuid4().hex[:12]
    entries = written.select(
        F.col(bucket_col).cast("bigint").alias("bucket"),
        F.col("n_rows"),
        F.lit(round(wall, 3)).alias("wall_s"),
        F.lit(run_id).alias("run_id"),
        F.current_timestamp().alias("finished_at"),
    )
    entries.write.mode("append").parquet(_ledger_path(base))
    n = sum(r.n_rows for r in entries.select("n_rows").collect())
    return {"written": pending, "skipped": sorted(done), "n_rows": n}


def dataset(spark: SparkSession, base: str, bucket_col: str = "bucket") -> DataFrame:
    """Read back only LEDGERED buckets — uncommitted partials are invisible,
    which is the reader-isolation half of the snapshot contract."""
    data = spark.read.parquet(os.path.join(base, "data"))
    led = read_ledger(spark, base) \
        .select(F.col("bucket").cast("bigint").alias("__b")).distinct()
    return data.join(F.broadcast(led),
                     data[bucket_col].cast("bigint") == F.col("__b"),
                     "left_semi")


def metrics(spark: SparkSession, base: str) -> DataFrame:
    """Per-bucket lineage metrics (rows, wall seconds, run id, finish time)."""
    return read_ledger(spark, base).orderBy("bucket")


def snapshots(spark: SparkSession, base: str) -> DataFrame:
    """Commit history: one row per run_id with its bucket/row counts —
    the snapshot-log half of the emulated Iceberg contract."""
    led = read_ledger(spark, base)
    return led.groupBy("run_id").agg(
        F.min("finished_at").alias("committed_at"),
        F.count("*").alias("n_buckets"),
        F.sum("n_rows").alias("n_rows"),
    ).orderBy("committed_at")


def dataset_at(spark: SparkSession, base: str, as_of_run: str,
               bucket_col: str = "bucket") -> DataFrame:
    """Time travel: the dataset as of (and including) commit ``as_of_run`` —
    only buckets whose ledger entry was appended at or before that run's
    commit time are visible."""
    led = read_ledger(spark, base)
    cutoff_rows = led.filter(F.col("run_id") == as_of_run) \
                     .agg(F.max("finished_at")).collect()
    cutoff = cutoff_rows[0][0]
    if cutoff is None:
        raise ValueError(f"unknown run_id {as_of_run!r}")
    vis = led.filter(F.col("finished_at") <= cutoff) \
             .select(F.col("bucket").cast("bigint").alias("__b")).distinct()
    data = spark.read.parquet(os.path.join(base, "data"))
    return data.join(F.broadcast(vis),
                     data[bucket_col].cast("bigint") == F.col("__b"),
                     "left_semi")
