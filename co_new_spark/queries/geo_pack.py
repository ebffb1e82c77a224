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


def _leaf_points(spark: SparkSession, sf: str) -> DataFrame:
    """(event_id, x, y, leaf) — the STR leaf assignment every consumer
    (directory build, index probe) shares."""
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
    return sliced.select("event_id", "x", "y", "leaf")


def g_str_pack(spark: SparkSession, sf: str) -> DataFrame:
    """STR leaf directory: (leaf, n, x_min, x_max, y_min, y_max)."""
    return (_leaf_points(spark, sf).groupBy("leaf")
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


# --------------------------------------------------------------------------
# geo_rtree_probe — the READ side of the STR index: windowed range queries
# answered through the leaf directory, refined exactly, and proven equal to
# a full-scan oracle that knows nothing about R-trees.
# --------------------------------------------------------------------------
#
# Probe shape (10^12 rects): the 256-row leaf directory broadcasts; each
# query box equi-joins it with the bbox-intersection predicate INSIDE the
# join condition, yielding (query, candidate leaf) pairs — on a production
# layout where the fact table is STORED partitioned by leaf, that candidate
# set IS the partition-pruning list, so the refine join touches only the
# overlapping leaves' data (pytest gates avg candidate leaves << 256).
# Exact containment refines candidates; a LEFT join re-attaches zero-hit
# queries (every 5th query box is displaced outside the domain to exercise
# that path — an in-domain box always contains its own center event).

_RTP_NQ = 40         # query boxes: event_id < 40
_RTP_HW = "20000 + (event_id * 7919) % 60000"     # half-width
_RTP_HH = "20000 + (event_id * 104729) % 80000"   # half-height
_RTP_SHIFT = 3_000_000   # displacement for the planted empty queries


def _query_boxes(spark: SparkSession, sf: str) -> DataFrame:
    q = (_event_points(spark, sf)
         .filter(F.col("event_id") < _RTP_NQ)
         .select(F.col("event_id").alias("qid"),
                 F.col("x").cast("long").alias("cx"),
                 F.col("y").cast("long").alias("cy")))
    q = q.withColumn("cx", F.when(F.col("qid") % 5 == 0,
                                  F.col("cx") + _RTP_SHIFT)
                           .otherwise(F.col("cx")))
    hw = F.expr(_RTP_HW.replace("event_id", "qid"))
    hh = F.expr(_RTP_HH.replace("event_id", "qid"))
    return q.select("qid",
                    (F.col("cx") - hw).alias("qx1"),
                    (F.col("cx") + hw).alias("qx2"),
                    (F.col("cy") - hh).alias("qy1"),
                    (F.col("cy") + hh).alias("qy2"))


def g_rtree_probe(spark: SparkSession, sf: str) -> DataFrame:
    lp = _leaf_points(spark, sf).localCheckpoint(eager=True)  # 2 consumers
    dirm = (lp.groupBy("leaf")
            .agg(F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                 F.min("y").alias("y_min"), F.max("y").alias("y_max")))
    q = _query_boxes(spark, sf)
    cand = dirm.join(
        F.broadcast(q),
        (F.col("qx1") <= F.col("x_max")) & (F.col("qx2") >= F.col("x_min"))
        & (F.col("qy1") <= F.col("y_max")) & (F.col("qy2") >= F.col("y_min")))
    hits = (cand.select("qid", "leaf", "qx1", "qx2", "qy1", "qy2")
            .join(lp, "leaf")
            .filter(F.col("x").between(F.col("qx1"), F.col("qx2"))
                    & F.col("y").between(F.col("qy1"), F.col("qy2")))
            .groupBy("qid")
            .agg(F.count("*").alias("n_hits"),
                 F.sum("event_id").alias("id_sum"),
                 F.min("event_id").alias("id_min"),
                 F.max("event_id").alias("id_max")))
    return (q.select("qid").join(hits, "qid", "left")
            .select("qid",
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                     .alias("n_hits"),
                    F.coalesce("id_sum", F.lit(0)).cast("long")
                     .alias("id_sum"),
                    F.coalesce("id_min", F.lit(-1)).cast("long")
                     .alias("id_min"),
                    F.coalesce("id_max", F.lit(-1)).cast("long")
                     .alias("id_max"))
            .orderBy("qid"))


SQL_RTREE_PROBE = f"""
WITH pts AS (
  SELECT event_id,
         CAST({_XENG} AS BIGINT) AS x,
         CAST({_YENG} AS BIGINT) AS y
  FROM events
), q AS (
  SELECT event_id AS qid,
         CASE WHEN event_id % 5 = 0 THEN x + {_RTP_SHIFT} ELSE x END AS cx,
         y AS cy,
         {_RTP_HW} AS hw, {_RTP_HH} AS hh
  FROM pts WHERE event_id < {_RTP_NQ}
)
-- full scan: the oracle knows nothing about leaves or directories
SELECT q.qid,
       CAST(count(p.event_id) AS BIGINT) AS n_hits,
       CAST(coalesce(sum(p.event_id), 0) AS BIGINT) AS id_sum,
       CAST(coalesce(min(p.event_id), -1) AS BIGINT) AS id_min,
       CAST(coalesce(max(p.event_id), -1) AS BIGINT) AS id_max
FROM q LEFT JOIN pts p
  ON p.x BETWEEN q.cx - q.hw AND q.cx + q.hw
 AND p.y BETWEEN q.cy - q.hh AND q.cy + q.hh
GROUP BY q.qid
ORDER BY q.qid
"""


QUERIES["geo_rtree_probe"] = (g_rtree_probe, SQL_RTREE_PROBE)
