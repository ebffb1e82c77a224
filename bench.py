"""Benchmark harness — prints ONE JSON line with headline timings.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_PAGES          synthetic pages rows for the geocode pipeline
                       (default 1,000,000)

The flagship metric is pages geocoded + grid-joined per second (the
BASELINE.json north rule); per-query seconds for the operator suite ride
along in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run() -> dict:
    from pyspark.sql import functions as F

    from co_new_spark.functions import cells_sql, geo
    from co_new_spark.functions import text as txf
    from co_new_spark.operators.cover import cover_lookup_best
    from co_new_spark.plans.session import get_spark
    from co_new_spark.queries import REGISTRY
    from co_new_spark.sources.pages import pages
    from co_new_spark.sources.reference_data import load_citycover

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "1000000"))
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)

    spark = get_spark(app="co_new_spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- flagship: pages geocoded + cover-joined per second -----------------
    cover = load_citycover(spark)
    t0 = time.time()
    pg = pages(spark, n_pages, partitions=cpus * 4)
    parsed = pg.select(
        "url",
        txf.parse_lat(F.col("text")).alias("lat"),
        txf.parse_lon(F.col("text")).alias("lon"),
    ).filter(F.col("lat").isNotNull())
    pts = parsed.withColumn("cell", geo.encode_b_cell(F.col("lat"), F.col("lon"), 26)) \
                .filter(F.col("cell") >= 0)
    hit = cover_lookup_best(pts.select("url", "cell"), cover)
    agg = hit.groupBy("isolabel_ext").agg(F.count("*").alias("n"))
    n_geocoded = agg.agg(F.sum("n")).collect()[0][0]
    t_flag = time.time() - t0
    timings["flagship_geocode_cover_join"] = round(t_flag, 3)
    pages_per_sec = n_pages / t_flag

    # --- operator suite on the sf tables ------------------------------------
    headline = [
        "rel_pricing_summary", "rel_topk_revenue", "rel_region_rollup",
        "rel_asof_latest", "rel_moving_avg",
        "train_dedup_exact", "train_minhash_lsh", "train_simhash",
        "train_knn_brute", "train_knn_lsh",
        "geo_cell_assign", "geo_tile_assign", "geo_knn_ring",
    ]
    for name in headline:
        fn, _sql = REGISTRY[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline suite wall seconds (flagship 1M-page geocode+cover-join + operator suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages": n_pages,
        "pages_geocoded_per_sec": round(pages_per_sec, 1),
        "n_geocoded": int(n_geocoded),
        "cpus": cpus,
    }


if __name__ == "__main__":
    print(json.dumps(run()))
