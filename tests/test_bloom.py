"""Partitioned Bloom prefilter (operators/bloom.py, queries/training5.py).

The oracle gate proves the END RESULT is exact; these tests pin the two
properties the oracle cannot see: the sketch never lies about absence
(no false negatives — the correctness load-bearer) and it actually
filters (most absent keys skip verification — the scale load-bearer).
"""

from pyspark.sql import functions as F

from conftest import SF_DIR

from co_new_spark.operators.bloom import bloom_flag, build_blooms
from co_new_spark.queries.training5 import t_dedup_bloom


def _kv(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "fp string")


def test_no_false_negatives(spark):
    """Every stored key must probe True — across buckets, including keys
    colliding into the same bucket."""
    keys = [f"key-{i:04d}" for i in range(500)]
    store = _kv(spark, keys)
    flagged = bloom_flag(_kv(spark, keys), store, "fp", n_buckets=8)
    assert flagged.filter(~F.col("bloom_maybe")).count() == 0


def test_absent_keys_mostly_rejected(spark):
    """Disjoint probe set: False for the vast majority (FPR ~1% at
    10 bits/key; allow 5% slack) — the property that makes the prefilter
    worth its build cost."""
    store = _kv(spark, [f"stored-{i}" for i in range(1000)])
    probe = _kv(spark, [f"novel-{i}" for i in range(1000)])
    flagged = bloom_flag(probe, store, "fp", n_buckets=8)
    n_maybe = flagged.filter(F.col("bloom_maybe")).count()
    assert n_maybe <= 50, f"FPR too high: {n_maybe}/1000"


def test_empty_bucket_is_exact_miss(spark):
    """A bucket with no stored keys has no bloom row; the cogroup must
    treat that as a certain miss, not a crash or a conservative True."""
    store = _kv(spark, ["only-one-key"])
    probe = _kv(spark, [f"p{i}" for i in range(64)])
    flagged = bloom_flag(probe, store, "fp", n_buckets=16)
    # at most the single stored key's bucket can say "maybe"
    assert flagged.filter(F.col("bloom_maybe")).count() <= 8


def test_bloom_rows_bounded_and_sized(spark):
    """One row per occupied bucket; per-bucket m scales with the bucket's
    own key count (skew-flat FPR)."""
    store = _kv(spark, [f"k{i}" for i in range(200)])
    rows = build_blooms(store, "fp", n_buckets=4).collect()
    assert len(rows) <= 4
    for r in rows:
        assert r["m"] >= 67 and r["m"] % 2 == 1
        assert len(r["bits"]) == (r["m"] + 7) // 8


def test_entry_matches_plain_antijoin(spark):
    """train_dedup_bloom == the straightforward exact plan, row for row
    (the same equivalence the driver's DuckDB oracle hashes)."""
    got = t_dedup_bloom(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fp = F.md5(F.col("text"))
    store = docs.filter(F.col("doc_id") % 5 != 0).select(fp.alias("fp"))
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", fp.alias("fp"), "lang", "source")
    from pyspark.sql import Window
    w = Window.partitionBy("fp").orderBy("doc_id")
    exp = (batch.join(store, "fp", "left_anti")
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("doc_id", "fp", "lang", "source"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
