"""SparkSession construction with scale-oriented defaults.

Single place for engine tuning so tests, the driver contract, and bench all
run the same plan-shaping configs.  Values chosen for the 100 TB design
target (AQE on, skew-join on, Arrow batches) but safe on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONFS: dict[str, str] = {
    # Adaptive execution: runtime re-plan, partition coalescing, skew-join split
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow boundary for pandas UDFs — the geocode kernel's transport
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 100k-row Arrow batches: measured +26% flagship throughput vs the 10k
    # default (412k -> 518k pages/s at 1M rows; per-batch python-worker
    # dispatch overhead amortizes, and the widest UDF input here — url+text
    # strings — stays ~20 MB/batch/worker)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
    # Broadcast all dimension tables (citycover 1.1k rows, synonym 7.7k, polygons)
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Parquet scan sizing: target ~128MB splits at scale
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Generated methods must stay under janino's 64 KB limit or the whole
    # stage silently drops to interpreted eval (10-30x slower).  The default
    # split threshold suffices once expressions are kept lookup-shaped
    # (sources/pages.py); a lower threshold was measured to ADD ~6s of janino
    # compile time on wide-agg plans (32-min MinHash) with no benefit.
    "spark.sql.codegen.methodSplitThreshold": "1024",
    "spark.sql.parquet.filterPushdown": "true",
    # Deterministic timestamps across JVMs
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app: str = "co_new_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = SparkSession.builder.appName(app).master(master)
    for k, v in ENGINE_CONFS.items():
        b = b.config(k, v)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = b.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    if os.environ.get("SPARK_GRAFT_NO_PROGRESS"):
        # sweep tools pipe stdout to files; the \r-redrawn console progress
        # bar glues stage fragments onto result lines there
        b = b.config("spark.ui.showConsoleProgress", "false")
    return b.getOrCreate()
