"""Tests: resumable ledgered writes (crash/resume) + salted aggregation parity."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from co_new_spark.operators.salt import salted_agg, salted_count, salted_topk
from co_new_spark.plans import lineage


def _fact(spark, n=10_000):
    # skewed: bucket 3 holds ~half the rows; buckets 0..7 all occur
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 3)
        .otherwise(F.pmod(F.xxhash64(F.col("id")), 8)).alias("bucket"),
        (F.col("id") * 7 % 101).alias("v"),
    )


def test_resumable_write_then_resume(spark, tmp_path):
    base = str(tmp_path / "ds")
    df = _fact(spark)

    # simulated crash: only 3 buckets commit
    r1 = lineage.resumable_write(df, base, "bucket", max_buckets=3)
    assert len(r1["written"]) == 3 and r1["skipped"] == []
    assert lineage.completed_buckets(spark, base) == set(r1["written"])
    # reader isolation: only ledgered buckets are visible
    visible = lineage.dataset(spark, base).select("bucket").distinct()
    assert {r.bucket for r in visible.collect()} == set(r1["written"])

    # resume: remaining buckets commit, completed ones are skipped
    r2 = lineage.resumable_write(df, base, "bucket")
    assert set(r2["skipped"]) == set(r1["written"])
    assert set(r2["written"]) == {0, 1, 2, 3, 4, 5, 6, 7} - set(r1["written"])

    # final content equals the input exactly (no dupes, no loss)
    got = lineage.dataset(spark, base)
    assert got.count() == df.count()
    assert got.select(F.sum("v")).first()[0] == df.select(F.sum("v")).first()[0]

    # idempotent re-run: nothing pending
    r3 = lineage.resumable_write(df, base, "bucket")
    assert r3["written"] == [] and r3["n_rows"] == 0

    # metrics ledger: one row per bucket, counts match the data
    m = {r.bucket: r.n_rows for r in lineage.metrics(spark, base).collect()}
    exp = {r.bucket: r.n for r in df.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert m == exp


def test_interrupted_bucket_is_rewritten_not_duplicated(spark, tmp_path):
    """A bucket written but NOT ledgered (crash before commit) re-runs cleanly."""
    base = str(tmp_path / "ds2")
    df = _fact(spark, 1_000)
    # write bucket 3's data directly, without a ledger entry (simulated torn write)
    df.filter(F.col("bucket") == 3).write.mode("overwrite") \
      .partitionBy("bucket").parquet(str(tmp_path / "ds2" / "data"))
    assert lineage.completed_buckets(spark, base) == set()
    lineage.resumable_write(df, base, "bucket")
    got = lineage.dataset(spark, base)
    assert got.count() == df.count()  # dynamic overwrite replaced the torn bucket


def test_salted_count_parity(spark):
    df = _fact(spark, 5_000)
    direct = {r.bucket: r.n for r in
              df.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    salted = {r.bucket: r.n for r in salted_count(df, ["bucket"]).collect()}
    assert direct == salted


def test_salted_agg_sum_parity(spark):
    df = _fact(spark, 5_000)
    direct = {r.bucket: (r.n, r.s) for r in df.groupBy("bucket")
              .agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()}
    two = salted_agg(df, ["bucket"],
                     {"n": F.count("*"), "s": F.sum("v")},
                     {"n": F.sum("n"), "s": F.sum("s")})
    got = {r.bucket: (r.n, r.s) for r in two.collect()}
    assert direct == got


def test_salted_topk_parity(spark):
    df = _fact(spark, 5_000)
    order = [F.col("v").desc(), F.col("id")]
    w = Window.partitionBy("bucket").orderBy(*order)
    direct = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    got = salted_topk(df, ["bucket"], order, 5)
    d = {(r.bucket, r.rn): r.id for r in direct.collect()}
    g = {(r.bucket, r.rn): r.id for r in got.collect()}
    assert d == g


def test_salted_topk_order_overload(spark):
    # single-column order also works (non-list)
    df = _fact(spark, 200)
    got = salted_topk(df, ["bucket"], F.col("id"), 2)
    assert got.filter(F.col("rn") > 2).count() == 0


def test_snapshots_and_time_travel(spark, tmp_path):
    base = str(tmp_path / "tt")
    df = _fact(spark, 2_000)
    lineage.resumable_write(df, base, "bucket", max_buckets=3)
    lineage.resumable_write(df, base, "bucket")
    snaps = lineage.snapshots(spark, base).collect()
    assert len(snaps) == 2
    first, second = snaps[0], snaps[1]
    assert first.n_buckets == 3
    # time travel to the first commit sees only its 3 buckets
    old = lineage.dataset_at(spark, base, first.run_id)
    assert old.select("bucket").distinct().count() == 3
    assert old.count() == first.n_rows
    # the second commit sees everything
    new = lineage.dataset_at(spark, base, second.run_id)
    assert new.count() == df.count()
    import pytest as _pt
    with _pt.raises(ValueError):
        lineage.dataset_at(spark, base, "nope")


def test_resumable_write_rejects_null_buckets(spark, tmp_path):
    import pytest as _pt

    df = spark.range(10).select(
        F.col("id"), F.when(F.col("id") < 5, F.col("id") % 2).alias("bucket"))
    with _pt.raises(ValueError, match="NULL"):
        lineage.resumable_write(df, str(tmp_path / "nb"), "bucket")


def test_upsert_latest_merges_and_commits(spark, tmp_path):
    base = str(tmp_path / "ups")
    df = _fact(spark, 2_000).withColumn("ts", F.lit(1).cast("long"))
    lineage.resumable_write(df, base, "bucket")
    before_runs = lineage.snapshots(spark, base).count()

    # new versions for 100 existing keys (2 buckets) + 10 brand-new keys
    upd = (df.filter(F.col("bucket").isin([3, 5]) & (F.col("id") < 200))
             .limit(100)
             .withColumn("v", F.lit(-1).cast("long"))
             .withColumn("ts", F.lit(2).cast("long")))
    new = spark.range(1_000_000, 1_000_010).select(
        "id", F.lit(3).cast("long").alias("bucket"),
        F.lit(7).cast("long").alias("v"), F.lit(2).cast("long").alias("ts"))
    res = lineage.upsert_latest(upd.unionByName(new), base, "id", "ts")
    assert set(res["written"]) <= {0, 1, 2, 3, 4, 5, 6, 7}

    got = lineage.dataset(spark, base)
    # updated keys now carry v=-1
    upd_ids = [r["id"] for r in upd.select("id").collect()]
    assert got.filter(F.col("id").isin(upd_ids)) \
              .filter(F.col("v") != -1).count() == 0
    # exactly-once per key, inserts landed, untouched rows intact
    assert got.count() == df.count() + 10
    assert got.groupBy("id").count().filter("count > 1").count() == 0
    assert got.filter(F.col("id") >= 1_000_000).count() == 10
    untouched = got.filter(~F.col("bucket").isin(res["written"]))
    base_untouched = df.filter(~F.col("bucket").isin(res["written"]))
    assert untouched.count() == base_untouched.count()
    # the merge shows up as a new commit in the snapshot log
    assert lineage.snapshots(spark, base).count() == before_runs + 1


def test_upsert_latest_null_bucket_fails_loud(spark, tmp_path):
    import pytest

    base = str(tmp_path / "upsnull")
    df = _fact(spark, 100).withColumn("ts", F.lit(1).cast("long"))
    lineage.resumable_write(df, base, "bucket")
    bad = df.limit(5).withColumn("bucket", F.lit(None).cast("long"))
    with pytest.raises(ValueError):
        lineage.upsert_latest(bad, base, "id", "ts")


def test_upsert_latest_equal_ts_new_row_wins(spark, tmp_path):
    base = str(tmp_path / "upstie")
    df = _fact(spark, 200).withColumn("ts", F.lit(5).cast("long"))
    lineage.resumable_write(df, base, "bucket")
    # correction rows: SAME ts, different value — the new row must win
    corr = df.filter(F.col("id") < 20).withColumn("v", F.lit(-9).cast("long"))
    lineage.upsert_latest(corr, base, "id", "ts")
    got = lineage.dataset(spark, base)
    assert got.filter((F.col("id") < 20) & (F.col("v") != -9)).count() == 0
    assert got.count() == df.count()


def test_compact_files_preserves_content_and_commits(spark, tmp_path):
    import glob

    base = str(tmp_path / "cmp")
    # many tiny files: 16 partitions per bucket
    df = _fact(spark, 4_000).repartition(16)
    lineage.resumable_write(df, base, "bucket")
    files_before = len(glob.glob(f"{base}/data/bucket=*/part-*.parquet"))
    before = {(r["id"], r["v"]) for r in lineage.dataset(spark, base).collect()}
    runs_before = lineage.snapshots(spark, base).count()

    res = lineage.compact_files(spark, base, target_partitions=1)
    files_after = len(glob.glob(f"{base}/data/bucket=*/part-*.parquet"))
    after = {(r["id"], r["v"]) for r in lineage.dataset(spark, base).collect()}
    assert after == before                      # content byte-identical
    assert files_after < files_before           # layout actually healed
    assert lineage.snapshots(spark, base).count() == runs_before + 1
    assert res["n_rows"] == len(before)


def test_schema_evolution_additive_column(spark, tmp_path):
    """Buckets written before an additive column change read back with NULLs
    for the new column under merge_schema (old rows untouched on disk)."""
    base = str(tmp_path / "evo")
    v1 = _fact(spark, 400).filter(F.col("bucket") < 4)
    lineage.resumable_write(v1, base, "bucket")
    v2 = (_fact(spark, 400).filter(F.col("bucket") >= 4)
          .withColumn("lang", F.lit("es")))
    lineage.resumable_write(v2, base, "bucket")

    got = lineage.dataset(spark, base, merge_schema=True)
    assert "lang" in got.columns
    assert got.count() == v1.count() + v2.count()
    old = got.filter(F.col("bucket") < 4)
    assert old.filter(F.col("lang").isNotNull()).count() == 0
    new = got.filter(F.col("bucket") >= 4)
    assert new.filter(F.col("lang") != "es").count() == 0


def test_compact_files_respects_target_partitions_and_schema(spark, tmp_path):
    import glob

    base = str(tmp_path / "cmp2")
    v1 = _fact(spark, 400).filter(F.col("bucket") < 4)
    lineage.resumable_write(v1, base, "bucket")
    v2 = (_fact(spark, 400).filter(F.col("bucket") >= 4)
          .withColumn("lang", F.lit("es")))
    lineage.resumable_write(v2, base, "bucket")

    n_total = v1.count() + v2.count()
    lineage.compact_files(spark, base, target_partitions=3)
    # evolved column SURVIVES the rewrite
    got = lineage.dataset(spark, base, merge_schema=True)
    assert "lang" in got.columns
    assert got.filter((F.col("bucket") >= 4)
                      & (F.col("lang") != "es")).count() == 0
    assert got.count() == n_total
    # the spread key yields multiple files per (non-tiny) bucket
    per_bucket = {}
    for f in glob.glob(f"{base}/data/bucket=*/part-*.parquet"):
        b = f.split("bucket=")[1].split("/")[0]
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert max(per_bucket.values()) > 1


def test_cluster_files_narrows_rowgroup_stats(spark, tmp_path):
    """Sort-order rewrite (cluster_files): content-identical, but each file's
    row groups carry narrow min/max spans on the cluster column, so a
    selective range predicate overlaps far fewer row groups than in the
    arrival-ordered layout (the stats a parquet reader / stats-aware table
    format prunes by)."""
    import glob

    import pyarrow.parquet as pq

    base = str(tmp_path / "clu")
    # arrival order: v = id*7 % 101 cycles, so EVERY file spans ~[0, 100]
    lineage.resumable_write(_fact(spark, 8_000).repartition(8), base, "bucket")

    def rowgroups_overlapping(lo, hi):
        hit = total = 0
        for f in glob.glob(f"{base}/data/bucket=*/part-*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                grp = meta.row_group(rg)
                col = next(grp.column(i) for i in range(grp.num_columns)
                           if grp.column(i).path_in_schema == "v")
                total += 1
                st = col.statistics
                if st is None or not (st.max < lo or st.min > hi):
                    hit += 1
        return hit, total

    before = {(r["id"], r["v"]) for r in lineage.dataset(spark, base).collect()}
    runs_before = lineage.snapshots(spark, base).count()
    hit_b, total_b = rowgroups_overlapping(40, 49)
    assert hit_b == total_b  # arrival order: no row group is skippable

    res = lineage.cluster_files(spark, base, "v", files_per_bucket=2)
    after = {(r["id"], r["v"]) for r in lineage.dataset(spark, base).collect()}
    assert after == before                                # content identical
    assert lineage.snapshots(spark, base).count() == runs_before + 1
    assert res["n_rows"] == len(before)
    hit_a, total_a = rowgroups_overlapping(40, 49)
    # a ~10%-selectivity probe must now skip at least half the row groups
    assert hit_a <= total_a // 2
    assert hit_a < hit_b


def test_ledger_rejects_unbounded_bucket_column(spark, tmp_path, monkeypatch):
    """Round-4 verdict ask #7: the ledger must refuse a bucket column whose
    cardinality exceeds the bound — keying commits on a data column (url,
    cell id) would collect a fact-sized list to the driver every commit."""
    monkeypatch.setattr(lineage, "MAX_LEDGER_BUCKETS", 10)
    df = spark.range(200).select(
        F.col("id").alias("bucket"), (F.col("id") * 2).alias("v"))
    with pytest.raises(ValueError, match="distinct"):
        lineage.resumable_write(df, str(tmp_path / "unbounded"))
    with pytest.raises(ValueError, match="distinct"):
        lineage.upsert_latest(
            df.withColumn("ts", F.current_timestamp()),
            str(tmp_path / "unbounded2"), key="v", ts_col="ts")
    # a bounded column at the same row count commits fine
    ok = spark.range(200).select(
        F.pmod(F.col("id"), F.lit(8)).alias("bucket"), F.col("id").alias("v"))
    res = lineage.resumable_write(ok, str(tmp_path / "bounded"))
    assert len(res["written"]) == 8 and res["n_rows"] == 200
