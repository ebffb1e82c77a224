"""Physical-plan shape gates: the 100 TB properties (broadcast joins, filter
pushdown, partition pruning, no stray shuffles) asserted on `.explain` output
so perf regressions fail CI, not production."""

from pyspark.sql import functions as F

from co_new_spark.functions import geo
from co_new_spark.operators.cover import cover_lookup_best
from co_new_spark.sources.pages import pages
from co_new_spark.sources.reference_data import load_citycover

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_cover_join_is_broadcast_only(spark):
    """The cover lookup must never shuffle or sort-merge the fact table."""
    cover = load_citycover(spark)
    pg = pages(spark, 1000)
    pts = pg.select("url", geo.encode_b_cell_from_text(F.col("text"), 26).alias("cell")) \
            .filter(F.col("cell") >= 0)
    hit = cover_lookup_best(pts, cover, keep=["url", "cell"], dedup=False)
    plan = _plan(hit)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan  # zero fact-table shuffle


def test_flagship_has_single_shuffle(spark):
    """geocode -> cover join -> agg: exactly ONE exchange (the final agg)."""
    cover = load_citycover(spark)
    pg = pages(spark, 1000)
    pts = pg.select("url", geo.encode_b_cell_from_text(F.col("text"), 26).alias("cell")) \
            .filter(F.col("cell") >= 0)
    hit = cover_lookup_best(pts, cover, keep=["url", "cell"], dedup=False)
    agg = hit.groupBy("isolabel_ext").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "partial" in plan  # map-side combine


def test_parquet_filter_pushdown(spark):
    """A selective filter must reach the parquet scan as PushedFilters."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read the full 16-column schema."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    rs = plan.split("ReadSchema: ")[1]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs and "l_shipdate" not in rs


def test_partition_pruning(spark, tmp_path):
    """A filter on the hive partition column lists only matching partitions."""
    base = str(tmp_path / "pp")
    spark.range(1000).withColumn("b", F.pmod("id", 8)) \
        .write.partitionBy("b").parquet(base)
    q = spark.read.parquet(base).filter(F.col("b") == 3)
    plan = _plan(q)
    assert "PartitionFilters: [" in plan
    # only 1 of 8 partitions survives pruning
    assert q.rdd.getNumPartitions() <= 4
    assert q.count() == 125


def test_small_dim_join_broadcasts_automatically(spark):
    """Catalyst (+ our 64MB threshold) must broadcast the nation dim."""
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    j = cust.join(nat, cust.c_nationkey == nat.n_nationkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_whole_stage_codegen_covers_generator(spark):
    """The pages generator must stay inside whole-stage codegen (the 64KB
    regression this repo hit: interpreted fallback = 10-30x slower)."""
    pg = pages(spark, 1000)
    plan = _plan(pg)
    assert plan.lstrip().startswith("*(")  # '*' prefix = codegen'd stage


def test_fused_udf_single_arrow_crossing(spark):
    """Flagship geocode: exactly one ArrowEvalPython node (one crossing)."""
    pg = pages(spark, 1000)
    pts = pg.select("url", geo.encode_b_cell_from_text(F.col("text"), 26).alias("cell"))
    assert _plan(pts).count("ArrowEvalPython") == 1
