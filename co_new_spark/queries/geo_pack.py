"""Geospatial surface: STR R-tree bulk-load packing (Leutenegger 1997).

Why it exists: bulk-loading a spatial index is the write-side twin of the
engine's read-side grid joins — every tiled storage layout (R-tree leaves,
GeoParquet row groups, spatial Z-ordering alternatives) starts with
Sort-Tile-Recursive: rank by x, cut into vertical slices, rank each slice
by y, cut into leaves.  The interesting kernel is EXACT GLOBAL RANKING
WITHOUT A GLOBAL SORT — the naive xrank is `row_number() OVER (ORDER BY
x)`, a single-reducer window the registry bans on fact tables.

Decomposition: rank = bucket-histogram + broadcast prefix offsets +
bucket-partitioned row_number:
  1. bucket x by a fixed grid (<= 129 buckets on the event lattice),
  2. per-bucket counts -> dim; EXCLUSIVE prefix sum over the limit-bounded
     dim window = global rank offset of each bucket,
  3. in-bucket row_number (window PARTITIONED by bucket, parallel) + the
     broadcast offset = exact global rank, bit-identical to the oracle's
     sequential row_number yet never single-partition.
The y-ranking inside each slice is naturally partitioned (by slice), so
only x needed the trick.  Slice and leaf cuts are pure integer arithmetic
on ranks: slice = (xrank-1)*S DIV n, leaf-in-slice = (yrank-1)*S DIV n_s
— no data-dependent driver scalars; n arrives as a broadcast 1-row count.

Exactness: ranks are over the total order (x, y, event_id) — event_id is
unique, so the order (and therefore every slice/leaf assignment) is
deterministic and partition-invariant.  All arithmetic is int64.

Scale design (10^12 rects): two hash shuffles (bucket agg, slice window)
+ one broadcast each of a <=129-row dim and a 1-row count; leaf MBR
aggregation is map-side combined.  S scales as ceil(sqrt(n/C)) in
production; a fixed S=16 (256 leaves) keeps the fixture deterministic.

Oracle: DuckDB computes xrank/yrank with its sequential global
row_number windows and restates the cut arithmetic — same math, opposite
physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .geospatial import _XENG, _YENG, _event_points

_BW = 16384  # x bucket width for the rank histogram
_S = 16      # slices (and leaves per slice): 256 leaves total


def g_str_pack(spark: SparkSession, sf: str) -> DataFrame:
    """STR leaf directory: (leaf, n, x_min, x_max, y_min, y_max)."""
    pts = (_event_points(spark, sf)
           .select("event_id", F.col("x").cast("long").alias("x"),
                   F.col("y").cast("long").alias("y")))
    b = pts.withColumn("gx", F.expr(f"x DIV {_BW}"))

    # exact global x-rank without a global sort (see module docstring)
    dim = b.groupBy("gx").agg(F.count("*").alias("c")).limit(2 ** 21 // _BW + 2)
    wd = Window.orderBy("gx").rowsBetween(Window.unboundedPreceding, -1)
    off = dim.select(
        "gx", F.coalesce(F.sum("c").over(wd), F.lit(0)).alias("off"))
    wb = Window.partitionBy("gx").orderBy("x", "y", "event_id")
    ranked = (b.join(F.broadcast(off), "gx")
              .withColumn("xrank", F.col("off") + F.row_number().over(wb)))

    n = pts.groupBy().agg(F.count("*").alias("n"))
    ranked = ranked.join(F.broadcast(n))
    ranked = ranked.withColumn(
        "slice", F.expr(f"(xrank - 1) * {_S} DIV n"))

    ws = Window.partitionBy("slice").orderBy("y", "x", "event_id")
    ns = Window.partitionBy("slice")
    sliced = (ranked
              .withColumn("yrank", F.row_number().over(ws))
              .withColumn("ns", F.count("*").over(ns))
              .withColumn("leaf", F.col("slice") * _S
                          + F.expr(f"(yrank - 1) * {_S} DIV ns")))
    return (sliced.groupBy("leaf")
            .agg(F.count("*").alias("n_rects"),
                 F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                 F.min("y").alias("y_min"), F.max("y").alias("y_max"))
            .orderBy("leaf"))


SQL_STR_PACK = f"""
WITH pts AS (
  SELECT event_id,
         CAST({_XENG} AS BIGINT) AS x,
         CAST({_YENG} AS BIGINT) AS y
  FROM events
), xr AS (
  SELECT *, row_number() OVER (ORDER BY x, y, event_id) AS xrank,
         count(*) OVER () AS n
  FROM pts
), sl AS (
  SELECT *, (xrank - 1) * {_S} // n AS slice FROM xr
), yr AS (
  SELECT *, row_number() OVER (PARTITION BY slice
                               ORDER BY y, x, event_id) AS yrank,
         count(*) OVER (PARTITION BY slice) AS ns
  FROM sl
), lf AS (
  SELECT *, slice * {_S} + (yrank - 1) * {_S} // ns AS leaf FROM yr
)
SELECT leaf, CAST(count(*) AS BIGINT) AS n_rects,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM lf GROUP BY leaf ORDER BY leaf
"""


QUERIES = {
    "geo_str_pack": (g_str_pack, SQL_STR_PACK),
}
