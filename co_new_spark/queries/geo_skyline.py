"""Geospatial surface: skyline (Pareto frontier) over event points.

Why it exists: the skyline operator (Börzsönyi, Kossmann & Stocker, ICDE
2001) — "all points not dominated by any other" — is the canonical
multi-criteria selection: nearest-and-cheapest POIs, best quality-vs-size
documents, southwest building frontier.  No Spark built-in expresses it,
and the textbook 2-D algorithm (sort by x, keep the running min of y) is
a SEQUENTIAL scan — i.e. an unpartitioned global window, exactly the plan
shape this repo bans on fact tables.

Decomposition (the point of the entry): bucket x by a fixed grid, then
  1. per-bucket min(y) — one map-side-combined agg, output = #buckets,
  2. exclusive prefix-min over that BUCKET-SIZED dim (the only ordered
     window, over ~128 rows) = "best y strictly west of this bucket",
  3. broadcast-join the threshold back and keep y < threshold,
  4. the residual in-bucket dominance is a window PARTITIONED BY BUCKET
     in (x, y) lex order — embarrassingly parallel.
A point q in an earlier bucket has q.x < p.x by construction, so it
dominates p iff q.y <= p.y (the threshold test); a same-bucket q
lex-before p has q.x <= p.x, so the same test applies (the prefix-min
window).  Together they cover every potential dominator exactly once.

Semantics: dominance is (q.x <= p.x AND q.y <= p.y AND q != p) over the
DISTINCT point set (coincident duplicates collapse first, so they never
"dominate each other"); minimizing both axes.  All comparisons are on
integer-valued coordinates — no FP drift.

Scale design (10^12 points): dedup and the per-bucket agg are one hash
shuffle each with map-side combine; the ordered window runs on a
#buckets-row dim, never on facts; the in-bucket windows partition on the
bucket key (tune bucket width to executor memory); the threshold join is
a broadcast.  Expected frontier of n scattered points is O(log n), so
the output is tiny — but nothing in the plan relies on that.

Oracle: DuckDB runs the textbook SEQUENTIAL scan (global lex sort +
running min) — a genuinely different algorithm, so a decomposition error
(threshold off-by-one-bucket, lex-tie mishandling) diffs immediately.

Cites reference semantics: points derive from the same event lattice as
geospatial.py's _XENG/_YENG (src/assert/gridLib.sql fixtures' planar
frame), minimizing x and maximizing y (see g_skyline docstring for why NW).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .geospatial import _XENG, _YENG, _event_points

_BW = 16384  # bucket width (x spans 2^21 => ~128 buckets)


def g_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """Northwest Pareto frontier (min x, MAX y) of distinct event points.

    The NW corner is chosen because the event lattice's multiplicative
    structure collapses the SW frontier to a single point (measured: 1 row
    at every sf) — NW keeps 13-32 points, so the bucket threshold AND the
    in-bucket window both do real work.  Internally the kernel always
    minimizes both axes; we feed it (x, -y) and restore y on output."""
    pts = (_event_points(spark, sf)
           .select(F.col("x").cast("long").alias("x"),
                   (-F.col("y").cast("long")).alias("y"))
           .distinct())
    b = pts.withColumn("gx", F.expr(f"x DIV {_BW}"))

    # bucket dim: min y per bucket, then EXCLUSIVE prefix min (dim-sized).
    # The limit never truncates — the x lattice spans 2^21 so there are at
    # most ceil(2^21/_BW)+1 = 129 buckets — it ENCODES that static bound in
    # the plan so the registry-wide no-unbounded-global-window gate can see
    # the window's input is dimension-sized (same pattern as DSIR top-K).
    dim = b.groupBy("gx").agg(F.min("y").alias("by")).limit(2 ** 21 // _BW + 2)
    wd = Window.orderBy("gx").rowsBetween(Window.unboundedPreceding, -1)
    thr = dim.select("gx", F.min("by").over(wd).alias("thr"))

    j = b.join(F.broadcast(thr), "gx")
    j = j.filter(F.col("thr").isNull() | (F.col("y") < F.col("thr")))

    # residual in-bucket dominance: prefix min in (x, y) lex order,
    # partitioned by bucket — parallel across buckets.  Running it AFTER
    # the threshold filter is sound by transitivity: if an in-bucket
    # dominator q of p was itself threshold-killed by some r west of the
    # bucket, then r.y <= q.y <= p.y kills p at the threshold too — so
    # every in-bucket dominator of a threshold SURVIVOR is a survivor.
    wb = (Window.partitionBy("gx").orderBy("x", "y")
          .rowsBetween(Window.unboundedPreceding, -1))
    j = j.withColumn("pm", F.min("y").over(wb))
    return (j.filter(F.col("pm").isNull() | (F.col("y") < F.col("pm")))
            .select("x", (-F.col("y")).alias("y")).orderBy("x"))


SQL_SKYLINE = f"""
WITH pts AS (
  SELECT DISTINCT
         CAST({_XENG} AS BIGINT) AS x,
         -CAST({_YENG} AS BIGINT) AS y
  FROM events
), scan AS (
  -- textbook sequential skyline: lex sort, running exclusive min of y
  SELECT x, y,
         min(y) OVER (ORDER BY x, y
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM pts
)
SELECT x, -y AS y FROM scan WHERE pm IS NULL OR y < pm
ORDER BY x
"""


QUERIES = {
    "geo_skyline": (g_skyline, SQL_SKYLINE),
}
