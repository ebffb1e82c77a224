"""Materialized-intermediate oracle support (round-2 VERDICT ask #4).

Some operators are only rows-only-checkable because ONE step uses a hash
family DuckDB lacks (Spark's xxhash64).  Splitting the pipeline at that step
makes everything downstream oracle-checkable: the query WRITES the
hash-dependent intermediate (signatures / band hashes / buckets) to a
deterministic parquet path as part of its execution and rebuilds its result
FROM that parquet; the DuckDB oracle reads the very same bytes and re-derives
the downstream logic (bucket capping, self-join pair emission, re-ranking)
independently.  The hash family itself stays gated by the recall/property
pytests (tests/test_properties_ops.py).

The path is fixed per entry name (not per sf): the driver and check_oracle
run the Spark query immediately before its oracle within one process, so the
file always reflects the current sf_dir.  Contents are deterministic for a
given input table, so re-runs are idempotent.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame


def mat_path(name: str) -> str:
    # pid-suffixed root: the Spark query and its DuckDB oracle always resolve
    # the path in ONE process (driver contract, bench, check_oracle), so a
    # per-process root costs nothing — and two concurrent processes (e.g. a
    # pytest run next to an oracle sweep) can no longer overwrite each
    # other's in-flight intermediates (observed: FAILED_READ_FILE mid-scan
    # when a parallel run rewrote simhash_sigs).  Dirs are small (MBs at
    # oracle sf) and /tmp-ephemeral; no cleanup pass needed.
    return os.path.join(tempfile.gettempdir(),
                        f"co_oracle_mat_{os.getpid()}", name)


def run_tmp(name: str) -> str:
    """Pid-scoped scratch dir for entry-local stores (stream sources,
    ledgers, partitioned scans).  Same rationale as mat_path: each entry
    rmtree-and-recreates its store, which is safe within one serial
    process (driver, bench, sweep) but races a CONCURRENT process using
    the same fixed /tmp name (observed: a parallel window-scan session
    failed a sweep's stream_cdc_merge mid-run)."""
    return os.path.join(tempfile.gettempdir(), f"co_run_{os.getpid()}", name)


def mat_glob(name: str) -> str:
    """The read_parquet() pattern for the oracle side."""
    return os.path.join(mat_path(name), "*.parquet")


# Per-process memo (round-3 VERDICT asks #1/#2): name -> the key (sf_dir)
# whose bytes CURRENTLY sit at mat_path(name).  When a caller passes ``key``,
# a repeat materialization of the same deterministic intermediate — e.g. the
# MinHash band table, computed by BOTH train_minhash_lsh and
# train_neardup_scaled in one suite run — skips the recompute+rewrite and
# reads the existing bytes.  The map holds one key per name because the
# on-disk path holds one dataset per name: alternating sf dirs in a process
# must rewrite every time the dir changes (a (name, key)-SET memo would
# serve one sf's bytes for another on the third call).  The input is a pure
# function of (entry, sf_dir); callers whose input is NOT uniquely keyed by
# sf_dir (lineage scenarios, fixture-driven tests) don't pass a key and
# always write.
_MAT_DONE: dict[str, str] = {}


def reset(name: str | None = None) -> None:
    """Drop the memo (for one name, or all) so the next materialize()
    re-executes and re-writes.  Benchmarks call this between timed trials:
    with the memo warm, a repeat trial would time only the
    post-materialization half of the entry (the lazy upstream — signature
    computation — would never execute)."""
    if name is None:
        _MAT_DONE.clear()
    else:
        _MAT_DONE.pop(name, None)


def materialize(df: DataFrame, name: str, key: str | None = None) -> DataFrame:
    """Write ``df`` to the entry's materialization path and read it back, so
    the Spark result provably derives from the same bytes the oracle reads.

    With ``key`` (normally the sf_dir), the write is memoized per process:
    the first call executes and persists, later calls with the same current
    (name, key) skip straight to the read — the lazy ``df`` is never
    executed, so shared upstream work (signature computation) runs once per
    suite/oracle-sweep process instead of once per entry."""
    import os as _os

    path = mat_path(name)
    k = _os.path.realpath(key) if key is not None else None
    if k is None or _MAT_DONE.get(name) != k:
        df.write.mode("overwrite").parquet(path)
        if k is not None:
            _MAT_DONE[name] = k
        else:
            # a keyless write replaced the bytes for this name — a later
            # KEYED call must not serve the stale memo entry
            _MAT_DONE.pop(name, None)
    return df.sparkSession.read.parquet(path)


def mat_json_glob(name: str) -> str:
    """The read_json() pattern for the oracle side (JSONL datasets)."""
    return os.path.join(mat_path(name), "*.json")


def materialize_json(df: DataFrame, name: str, schema: str) -> DataFrame:
    """JSON-lines variant of materialize(): write ``df`` as JSONL and read it
    back with an EXPLICIT schema — never inference, which at scale is a full
    extra pass over the files."""
    path = mat_path(name)
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(schema).json(path)
