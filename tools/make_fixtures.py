"""Regenerate the committed deterministic pages fixture.

tests/fixtures/pages2k.parquet is the synthetic Common-Crawl-style pages
table (sources/pages.py, 2,000 rows) written ONCE and committed, so that
DuckDB oracle SQL can read the exact same bytes the Spark queries read —
pages-based entries become driver-hash-checkable instead of rows-only.
Content is a pure function of row id; rerunning this script reproduces the
same rows (row order inside the single parquet file included, since the
generator is a narrow projection over spark.range).

    python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures")
PAGES_2K = os.path.join(FIXTURE_DIR, "pages2k.parquet")
PAGES_2K_XY = os.path.join(FIXTURE_DIR, "pages2k_xy.parquet")
N = 2_000


def main() -> None:
    from co_new_spark.plans.session import get_spark
    from co_new_spark.sources.pages import pages

    spark = get_spark(app="make-fixtures", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    df = pages(spark, N, partitions=1)
    df.coalesce(1).write.mode("overwrite").parquet(PAGES_2K + ".tmp")
    # keep a single stable .parquet file (no _SUCCESS/part-* clutter in git)
    import glob
    import shutil

    part = glob.glob(os.path.join(PAGES_2K + ".tmp", "part-*.parquet"))[0]
    if os.path.exists(PAGES_2K):
        os.remove(PAGES_2K)
    shutil.move(part, PAGES_2K)
    shutil.rmtree(PAGES_2K + ".tmp")

    # pages2k_xy.parquet: one row per DISTINCT geocodable url — parsed
    # lat/lon + the EPSG:9377 forward projection, frozen at fixture time.
    # Oracle SQL reads x/y from here (the TM series isn't SQL-expressible)
    # while the Spark queries RE-DERIVE them with the live kernel, so any
    # later parse/projection regression breaks the driver hash; absolute
    # projection truth stays pinned by the reference assert vectors
    # (geo_gridlib_asserts + tests/test_grid_golden.py).
    from pyspark.sql import functions as F

    from co_new_spark.functions import geo
    from co_new_spark.functions import text as txf

    pg = spark.read.parquet(PAGES_2K)
    parsed = (pg.select("url", "text").distinct()
              .select("url",
                      txf.parse_lat(F.col("text")).alias("lat"),
                      txf.parse_lon(F.col("text")).alias("lon"))
              .filter(F.col("lat").isNotNull()))
    xy = parsed.withColumn("p", geo.latlon_to_xy(F.col("lat"), F.col("lon"))) \
               .select("url", "lat", "lon",
                       F.col("p.x").alias("x"), F.col("p.y").alias("y")) \
               .orderBy("url")
    xy.coalesce(1).write.mode("overwrite").parquet(PAGES_2K_XY + ".tmp")
    part = glob.glob(os.path.join(PAGES_2K_XY + ".tmp", "part-*.parquet"))[0]
    if os.path.exists(PAGES_2K_XY):
        os.remove(PAGES_2K_XY)
    shutil.move(part, PAGES_2K_XY)
    shutil.rmtree(PAGES_2K_XY + ".tmp")

    import duckdb

    n, h = duckdb.sql(
        f"SELECT count(*), sum(hash(url || text || lang)) "
        f"FROM read_parquet('{PAGES_2K}')").fetchone()
    print(f"wrote {PAGES_2K}: {n} rows, content hash {h}")
    n2, h2 = duckdb.sql(
        f"SELECT count(*), sum(hash(url || x || y)) "
        f"FROM read_parquet('{PAGES_2K_XY}')").fetchone()
    print(f"wrote {PAGES_2K_XY}: {n2} rows, content hash {h2}")


if __name__ == "__main__":
    main()
