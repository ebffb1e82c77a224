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

# run_wall_s = the COMMITTING RUN's wall time, repeated on each of its
# bucket rows (not a per-bucket cost; see snapshots() for per-run totals)
LEDGER_SCHEMA = "bucket BIGINT, n_rows BIGINT, run_wall_s DOUBLE, run_id STRING, finished_at TIMESTAMP"


# INVARIANT: the ledger is keyed on a BOUNDED-cardinality bucket column —
# a partition-unit key (L0 cell digit: <= 20; 4^k cell prefix: 4^k;
# pmod(hash(url), N): N), never a data-carrying column like url or cell.
# Every commit collects the distinct bucket list to the driver (the resume
# anti-join and the per-bucket metrics need it), so an unbounded key would
# turn the driver into the bottleneck and the ledger into a second fact
# table.  _distinct_buckets enforces the bound; raise the cap consciously
# if a legitimate layout needs more partitions.
MAX_LEDGER_BUCKETS = 65536


def _distinct_buckets(df: DataFrame, bucket_col: str, op: str) -> list:
    """The ONLY reader of a commit's distinct-bucket list.  Guards the two
    failure modes a future caller could introduce: NULL buckets (silently
    dropped by the later isin filters) and unbounded bucket cardinality
    (driver-side collect of a fact-sized key).  The limit(+1) bounds what
    the driver materializes even when the column IS unbounded."""
    rows = (df.select(bucket_col).distinct()
            .limit(MAX_LEDGER_BUCKETS + 1).collect())
    if len(rows) > MAX_LEDGER_BUCKETS:
        raise ValueError(
            f"{op}: {bucket_col!r} has > {MAX_LEDGER_BUCKETS} distinct "
            "values — the ledger must be keyed on a bounded partition-unit "
            "column (cell prefix, hash-mod bucket), not a data column; "
            "re-bucket upstream or raise lineage.MAX_LEDGER_BUCKETS")
    buckets = [r[0] for r in rows]
    if any(b is None for b in buckets):
        raise ValueError(
            f"{op}: {bucket_col!r} contains NULL — refusing to silently "
            "drop rows; clean or re-bucket upstream")
    return buckets


def _ledger_path(base: str) -> str:
    return os.path.join(base, "_ledger")


def read_ledger(spark: SparkSession, base: str) -> DataFrame:
    """Missing ledger == empty ledger (first run); any OTHER read error
    (permissions, corrupt files) propagates — silently treating it as empty
    would make dataset() return zero rows and resumable_write re-commit
    every bucket."""
    from pyspark.errors import AnalysisException

    p = _ledger_path(base)
    try:
        return spark.read.schema(LEDGER_SCHEMA).parquet(p)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], LEDGER_SCHEMA)
        raise


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
    # distinct buckets BEFORE any done-filter: a NULL bucket must fail loud
    # here — `~isin(done)` would evaluate NULL and silently drop those rows
    all_buckets = _distinct_buckets(df, bucket_col, "resumable_write")
    pending = sorted(b for b in all_buckets if b not in done)
    if max_buckets is not None:
        pending = pending[:max_buckets]
    pending_df = df.filter(F.col(bucket_col).isin(pending)) if pending else df.limit(0)
    if not pending:
        return {"written": [], "skipped": sorted(done), "n_rows": 0}

    run_id, n = _commit_buckets(pending_df, base, bucket_col, pending)
    return {"written": pending, "skipped": sorted(done), "n_rows": n}


def _commit_buckets(df: DataFrame, base: str, bucket_col: str,
                    buckets: list) -> tuple[str, int]:
    """The shared commit protocol: timed dynamic-partition-overwrite write of
    ``df``, per-bucket row counts read back from the COMMITTED files (what
    actually landed, not what the plan promised), one ledger append under a
    fresh run_id.  Used by resumable_write and upsert_latest — one place to
    evolve the ledger schema/count semantics."""
    spark = df.sparkSession
    t0 = time.time()
    (df.write
     .mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(bucket_col)
     .parquet(os.path.join(base, "data")))
    wall = time.time() - t0

    counts = (spark.read.parquet(os.path.join(base, "data"))
              .filter(F.col(bucket_col).isin(buckets))
              .groupBy(bucket_col).agg(F.count("*").alias("n_rows"))).collect()
    run_id = uuid.uuid4().hex[:12]
    rows = [(int(r[bucket_col]), int(r["n_rows"]), round(wall, 3), run_id)
            for r in counts]
    entries = spark.createDataFrame(
        rows, "bucket BIGINT, n_rows BIGINT, run_wall_s DOUBLE, run_id STRING"
    ).withColumn("finished_at", F.current_timestamp())
    entries.write.mode("append").parquet(_ledger_path(base))
    return run_id, sum(r[1] for r in rows)


def dataset(spark: SparkSession, base: str, bucket_col: str = "bucket",
            merge_schema: bool = False) -> DataFrame:
    """Read back only LEDGERED buckets — uncommitted partials are invisible,
    which is the reader-isolation half of the snapshot contract.

    ``merge_schema=True`` reads with parquet schema merging, so buckets
    committed before an additive column change surface NULLs for the new
    columns (the add-column half of schema evolution; dropping/renaming
    stays a rewrite, as in Hive-style tables)."""
    reader = spark.read.option("mergeSchema", "true") if merge_schema \
        else spark.read
    data = reader.parquet(os.path.join(base, "data"))
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


def upsert_latest(new_df: DataFrame, base: str, key: str, ts_col: str,
                  bucket_col: str = "bucket") -> dict:
    """MERGE ``new_df`` into the ledgered dataset: latest row per ``key``
    (by ``ts_col``; on an exact ts tie the NEW row wins — a deterministic
    correction semantics) — ONLY the buckets that carry new keys are
    rewritten; untouched buckets' files are never opened.

    CONTRACT: ``bucket_col`` must be a stable function of ``key`` — a key
    whose new version lands in a DIFFERENT bucket than its stored version
    would leave the stale row alive in the unread bucket (the same
    restriction Hive-style dynamic-overwrite upserts have; Iceberg MERGE
    lifts it only by scanning every partition).  ``new_df`` is checkpointed
    before planning so nondeterministic inputs (e.g. un-ordered limits)
    cannot diverge between the bucket probe and the write.

    This is the Iceberg MERGE-INTO verb restated on the bucket ledger: read
    the affected buckets' committed state, union the new rows, keep the
    winning version per key, dynamic-overwrite those buckets, append a
    new-run ledger entry (so snapshots() shows the merge commit).  Like an
    Iceberg rewrite without file retention, the PREVIOUS contents of the
    rewritten buckets are not kept — dataset_at() time travel remains exact
    only for buckets no later upsert touched (documented contract).

    Returns {written: [...buckets...], n_rows: int, run_id: str}.
    """
    spark = new_df.sparkSession
    new_df = new_df.localCheckpoint(eager=True)
    buckets = _distinct_buckets(new_df, bucket_col, "upsert_latest")
    if not buckets:
        return {"written": [], "n_rows": 0, "run_id": None}
    from pyspark.sql import Window

    existing = dataset(spark, base, bucket_col, merge_schema=True) \
        .filter(F.col(bucket_col).isin(buckets)) \
        .withColumn("__src", F.lit(0))
    # allowMissingColumns: on an additively-evolved table either side may
    # lack the other's newest columns; missing values surface as NULLs
    merged = existing.unionByName(new_df.withColumn("__src", F.lit(1)),
                                  allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(),
                                        F.col("__src").desc())
    latest = (merged.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn", "__src"))

    run_id, n = _commit_buckets(latest, base, bucket_col, buckets)
    return {"written": sorted(int(b) for b in buckets),
            "n_rows": n, "run_id": run_id}


def _rewrite_buckets(spark: SparkSession, base: str, bucket_col: str,
                     buckets: list | None, layout) -> dict:
    """Shared rewrite scaffold for the ``rewrite_data_files``-style verbs:
    resolve committed buckets, snapshot the current content (checkpoint
    BEFORE overwriting — and before ``layout``, since a checkpointed plan
    loses outputOrdering and the dynamic-partition writer would re-sort by
    bucket alone, scrambling any within-bucket ordering the layout set up),
    apply the verb's layout transform, commit through the ledger protocol."""
    done = completed_buckets(spark, base)
    todo = sorted(done) if buckets is None else [b for b in buckets
                                                 if b in done]
    if not todo:
        return {"written": [], "n_rows": 0, "run_id": None}
    data = (dataset(spark, base, bucket_col, merge_schema=True)
            .filter(F.col(bucket_col).isin(todo))
            .localCheckpoint(eager=True))  # read fully BEFORE overwriting
    run_id, n = _commit_buckets(layout(data, todo), base, bucket_col, todo)
    return {"written": [int(b) for b in todo], "n_rows": n, "run_id": run_id}


def compact_files(spark: SparkSession, base: str, bucket_col: str = "bucket",
                  buckets: list | None = None,
                  target_partitions: int = 1) -> dict:
    """Table maintenance: rewrite buckets' data into ``target_partitions``
    files each (the Iceberg ``rewrite_data_files`` verb) — content is
    byte-identical, only the file layout changes, and the rewrite commits as
    a new snapshot run so readers flip atomically at the ledger append.

    At 100 TB this is the periodic job that heals small-file buildup from
    many incremental upsert/streaming commits; each bucket rewrite is
    independent, so a scheduler can spread buckets across maintenance
    windows.  Returns {written: [...], n_rows: int, run_id: str}.
    """
    def layout(data, todo):
        # secondary content-hash spread key: repartition by bucket alone would
        # hash every bucket into ONE task/file and ignore target_partitions
        spread = F.pmod(F.xxhash64(*[F.col(c) for c in data.columns]),
                        F.lit(target_partitions))
        return data.repartition(max(len(todo) * target_partitions, 1),
                                F.col(bucket_col), spread)

    return _rewrite_buckets(spark, base, bucket_col, buckets, layout)


def cluster_files(spark: SparkSession, base: str, order_col: str,
                  bucket_col: str = "bucket", buckets: list | None = None,
                  files_per_bucket: int = 1) -> dict:
    """Table maintenance: sort-order rewrite (the Iceberg
    ``rewrite_data_files`` verb with a sort order, a.k.a. clustering) —
    content-identical, but each bucket's rows land range-partitioned and
    sorted by ``order_col``, so every output file/row-group carries a NARROW
    min/max span for that column and selective scans skip most of them
    (parquet row-group pruning locally; file-level skipping under a
    stats-aware table format).

    At 100 TB this is what makes spatial range queries cheap after many
    arrival-ordered commits: cluster on a space-filling-curve key
    (``functions.cells_sql.with_hilbert_index`` / the Morton cell id) and a
    bbox scan touches only the curve-contiguous slice.  Commits through the
    shared ledger protocol, so readers flip atomically.
    """
    def layout(data, todo):
        return (data.repartitionByRange(max(len(todo) * files_per_bucket, 1),
                                        F.col(bucket_col), F.col(order_col))
                .sortWithinPartitions(bucket_col, order_col))

    return _rewrite_buckets(spark, base, bucket_col, buckets, layout)
