"""Flagship end-to-end pipeline (SURVEY.md §3.4) with lineage + resume (M5).

pages -> geoparse -> Grid B geocode (one Arrow crossing) -> broadcast cover
join -> per-cell agg -> resumable partitioned write (L0-digit buckets) with
the per-bucket lineage ledger.  Registered rows-only: the returned DataFrame
is the METRICS LEDGER (bucket, n_rows, ...) so the driver check asserts the
whole pipeline ran and committed every bucket.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cells_sql, geo
from ..operators.cover import cover_lookup_best
from ..plans import lineage
from ..sources.pages import pages
from ..sources.reference_data import load_citycover

_PAGES_N = int(os.environ.get("CO_Q_PAGES", "4000"))


def geocoded_pages(spark: SparkSession, n: int, rbits: int = 26,
                   partitions: int | None = None) -> DataFrame:
    """pages -> (url, lang, cell, l0) — the shared front half of the pipeline."""
    pg = pages(spark, n, partitions=partitions)
    return (
        pg.select("url", "lang",
                  geo.encode_b_cell_from_text(F.col("text"), rbits).alias("cell"))
        .filter(F.col("cell") >= 0)
        .withColumn("l0", cells_sql.cell_l0_digit(F.col("cell")))
    )


def p_resumable_flagship(spark: SparkSession, sf: str) -> DataFrame:
    """Run the flagship pipeline twice against one dataset dir: a partial
    'crashed' run (2 buckets), then the resuming run; return the final ledger.

    Driver-visible invariants: 16 ledger rows (one per L0 bucket present),
    two distinct run_ids (proof the resume path executed), counts summing to
    the geocoded page count.
    """
    base = os.path.join(tempfile.gettempdir(), "co_flagship_ledger")
    shutil.rmtree(base, ignore_errors=True)

    pts = geocoded_pages(spark, _PAGES_N)
    cover = load_citycover(spark)
    hit = cover_lookup_best(pts.select("url", "lang", "cell", "l0"), cover)
    per_cell = hit.groupBy("l0", "isolabel_ext").agg(F.count("*").alias("n_pages"))

    lineage.resumable_write(per_cell, base, "l0", max_buckets=2)  # simulated crash
    lineage.resumable_write(per_cell, base, "l0")                 # resume
    led = lineage.metrics(spark, base)
    n_runs = F.size(F.collect_set("run_id").over(Window.partitionBy()))
    return led.select(
        F.col("bucket").alias("l0"),
        "n_rows",
        (n_runs >= 2).alias("resumed"),
    ).orderBy("l0")


def p_sql_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's SQL entry-point shape (gridLib.sql) end-to-end via
    spark.sql over registered kernel UDFs (rows-only; codes are
    pytest-gated bit-exact)."""
    from ..plans.register import example_sql_pipeline

    return example_sql_pipeline(spark)


def p_upsert_merge(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE-INTO over the ledgered store: write a url-keyed dataset, then
    upsert late re-crawls (same urls, newer warc_ts, different lang tag) +
    brand-new urls; return per-bucket counts with the commit count.

    Rows-only (side-effecting, tempdir-stateful); the merge semantics are
    pytest-gated (tests/test_lineage_salt.py upsert cases).  Driver-visible
    invariants: row count == initial urls + inserts (exactly-once per key),
    n_commits == 2.
    """
    base = os.path.join(tempfile.gettempdir(), "co_upsert_ledger")
    shutil.rmtree(base, ignore_errors=True)

    pts = geocoded_pages(spark, 2_000).withColumn(
        "ts", F.lit(1).cast("long"))
    rows = pts.select("url", "lang", "cell", "l0", "ts").dropDuplicates(["url"])
    lineage.resumable_write(rows, base, "l0")

    recrawl = (rows.filter(F.col("l0").isin([3, 12]))
                   .orderBy("url").limit(200)
                   .withColumn("lang", F.lit("und"))
                   .withColumn("ts", F.lit(2).cast("long")))
    fresh = rows.orderBy("url").limit(10).select(
        F.concat(F.col("url"), F.lit("?v=2")).alias("url"),
        "lang", "cell", "l0", F.lit(2).cast("long").alias("ts"))
    lineage.upsert_latest(recrawl.unionByName(fresh), base, "url", "ts", "l0")

    ds = lineage.dataset(spark, base, "l0")
    n_commits = lineage.snapshots(spark, base).count()
    return (ds.groupBy("l0").agg(
                F.count("*").alias("n_urls"),
                F.sum(F.when(F.col("lang") == "und", 1).otherwise(0))
                .alias("n_updated"))
              .withColumn("n_commits", F.lit(n_commits))
              .orderBy("l0"))


QUERIES = {
    "pipeline_resumable_flagship": (p_resumable_flagship, None),
    "pipeline_sql_surface": (p_sql_surface, None),
    "pipeline_upsert_merge": (p_upsert_merge, None),
}
