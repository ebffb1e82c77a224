"""Spatial self-join surfaces built on the grid index (round 2 additions).

* ``geo_distance_join`` — all point pairs within a radius, WITHOUT a theta
  join: bucket every point into its Grid B cell at a refinement whose cell
  side >= the radius, duplicate ONE side to its king-move ring-1 cells
  (A17 ``neighbors_b`` — handles cross-L0 adjacency through the global
  (i, j) frame), hash equi-join on cell, then the exact distance predicate.
  The ring prefilter is lossless by construction (|dx|, |dy| <= R <= side
  implies lattice indices differ by at most 1), which the DuckDB oracle
  proves per run: it is the plain brute-force cross join with the same
  radius.  At 100 TB the plan is a shuffle hash join on cell id (AQE
  handles hot-cell skew); the x9 duplication is on one side only and the
  candidate set is bounded by cell occupancy, never O(N^2).

* ``geo_od_matrix`` — origin/destination transition counts between grid
  cells per user ordered by event time (trajectory analytics): one window
  shuffle on user_id (lag), one aggregation shuffle on the (from, to) pair.
  Cell assignment reuses the grid-spec restatement
  (/root/reference/conf.yaml:21-26 via queries.sql_grid) on the oracle side
  and the engine encode kernel on the Spark side, so the driver check
  covers the encode semantics too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geo
from ..grid import grids
from ..operators.knn import ring_cells_d2_udf, ring_cells_udf
from .geospatial import _XENG, _YENG, _event_points
from .sql_grid import l0_case, morton_ref

# ---------------------------------------------------------------------------
# geo_distance_join — within-radius pairs via cell-bucket + ring-1 equi-join
# ---------------------------------------------------------------------------

_DJ_N = 3000          # points (first _DJ_N event ids) — keeps the oracle's
                      # brute-force cross join at ~4.5M candidate pairs
_DJ_RBITS = 8         # cell side = L0_SIDE / 2^(rbits/2) = 32768 m
_DJ_RADIUS = 20_000.0  # must be <= cell side for ring-1 losslessness

assert _DJ_RADIUS <= grids.L0_SIDE / (1 << (_DJ_RBITS // 2))


def g_distance_join(spark: SparkSession, sf: str) -> DataFrame:
    """All pairs of grid-valid points within ``_DJ_RADIUS`` m of each other.

    dist2 is exact: coordinates are integer-valued doubles < 2^22, so the
    squared distance is an integer < 2^53 — bit-identical on both engines.
    """
    pts = (_event_points(spark, sf)
           .filter(F.col("event_id") < _DJ_N)
           .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _DJ_RBITS))
           .filter(F.col("cell") >= 0))
    a = pts.select(F.col("event_id").alias("id_a"), F.col("x").alias("xa"),
                   F.col("y").alias("ya"), "cell")
    b = (pts.select(F.col("event_id").alias("id_b"), F.col("x").alias("xb"),
                    F.col("y").alias("yb"),
                    F.explode(ring_cells_udf(1)(F.col("cell"))).alias("nbcell")))
    r2 = _DJ_RADIUS * _DJ_RADIUS
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (a.join(b, a["cell"] == b["nbcell"])
             .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(r2)))
             .select("id_a", "id_b", d2.cast("long").alias("dist2")))


_L0_CASE = l0_case()

SQL_DISTANCE_JOIN = f"""
WITH raw AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
  WHERE event_id < {_DJ_N}
), v AS (
  SELECT event_id, x, y,
         CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {grids.L0_SIDE!r}) AS BIGINT) AS i,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {grids.L0_SIDE!r}) AS BIGINT) AS j
  FROM raw
), pts AS (
  SELECT event_id, x, y FROM v WHERE {_L0_CASE} >= 0
)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist2
FROM pts a JOIN pts b ON a.event_id < b.event_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_DJ_RADIUS * _DJ_RADIUS!r}
"""

# ---------------------------------------------------------------------------
# geo_od_matrix — per-user cell-to-cell transition counts (trajectories)
# ---------------------------------------------------------------------------

_OD_RBITS = 4  # 4x4 refinement below L0 -> cells of 131 km; dense transitions


def g_od_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Origin/destination matrix: per user, order events by time, emit the
    (previous cell -> current cell) transition, count trips + distinct users
    per directed cell pair.  Grid-invalid points are dropped BEFORE
    sequencing (both engines agree on the resulting per-user order)."""
    ev = _event_points(spark, sf, extra=("user_id", "ts"))
    seq = (ev.withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _OD_RBITS))
             .filter(F.col("cell") >= 0)
             .withColumn("prev", F.lag("cell").over(
                 Window.partitionBy("user_id").orderBy("ts", "event_id")))
             .filter(F.col("prev").isNotNull()))
    return (seq.groupBy(F.col("prev").alias("from_cell"),
                        F.col("cell").alias("to_cell"))
               .agg(F.count("*").alias("n_trips"),
                    F.countDistinct("user_id").alias("n_users")))


_MORTON4 = morton_ref(_OD_RBITS, "iy", "ix")

SQL_OD_MATRIX = f"""
WITH raw AS (
  SELECT event_id, user_id, ts, {_XENG} AS x, {_YENG} AS y FROM events
), c AS (
  SELECT event_id, user_id, ts,
         CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {grids.L0_SIDE!r}) AS BIGINT) AS i,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {grids.L0_SIDE!r}) AS BIGINT) AS j,
         (x - {grids.L0_ORIGIN_X!r}) / {grids.L0_SIDE!r}
           - floor((x - {grids.L0_ORIGIN_X!r}) / {grids.L0_SIDE!r}) AS u,
         (y - {grids.L0_ORIGIN_Y!r}) / {grids.L0_SIDE!r}
           - floor((y - {grids.L0_ORIGIN_Y!r}) / {grids.L0_SIDE!r}) AS v
  FROM raw
), d AS (
  SELECT event_id, user_id, ts, {_L0_CASE} AS digit,
         CAST(floor(u * {1 << (_OD_RBITS // 2)}) AS BIGINT) AS ix,
         CAST(floor(v * {1 << (_OD_RBITS // 2)}) AS BIGINT) AS iy
  FROM c
), cells AS (
  SELECT event_id, user_id, ts,
         (digit * {1 << _OD_RBITS} + {_MORTON4}) * 64 + {4 + _OD_RBITS} AS cell
  FROM d WHERE digit >= 0
), seq AS (
  SELECT user_id, cell,
         lag(cell) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM cells
)
SELECT prev AS from_cell, cell AS to_cell,
       CAST(count(*) AS BIGINT) AS n_trips,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE prev IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# geo_focal_sum — raster map algebra: king-neighborhood focal aggregation
# ---------------------------------------------------------------------------

_FOCAL_RBITS = 6  # 8x8 refinement below L0 -> 65,536 m raster cells


def g_focal_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Focal (moving-window) sum over the per-cell event-count raster: each
    target cell receives the summed counts of its 3x3 king neighborhood
    (coverage-clipped — off-grid neighbors contribute nothing and are never
    emitted).  The raster-analytics primitive behind heatmap smoothing /
    density surfaces.

    Plan shape at scale: ONE aggregation shuffle builds the raster
    (cells << points), then the focal pass explodes each occupied cell to
    <=9 valid targets (adjacency is symmetric, so pushing counts TO ring
    targets equals pulling FROM ring sources) and re-aggregates — a second
    shuffle over the raster, never over the raw points."""
    counts = (_event_points(spark, sf)
              .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _FOCAL_RBITS))
              .filter(F.col("cell") >= 0)
              .groupBy("cell").agg(F.count("*").alias("n")))
    spread = counts.select(
        F.col("n"),
        F.explode(ring_cells_udf(1)(F.col("cell"))).alias("target"))
    return (spread.groupBy(F.col("target").alias("cell"))
                  .agg(F.sum("n").alias("focal_sum"),
                       F.count("*").alias("n_contrib")))


_FS_NSIDE = 1 << (_FOCAL_RBITS // 2)      # per-axis cells below one L0
_FS_S = grids.L0_SIDE / _FS_NSIDE          # raster cell side (m)
_MORTON6 = morton_ref(_FOCAL_RBITS, "iy", "ix")
_L0T_CASE = l0_case("tj", "ti")

SQL_FOCAL_SUM = f"""
WITH raw AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), g AS (
  SELECT CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {_FS_S!r}) AS BIGINT) AS gi,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {_FS_S!r}) AS BIGINT) AS gj
  FROM raw
), occ AS (  -- per-cell raster, grid-valid lattice cells only
  SELECT gi, gj, count(*) AS n
  FROM (SELECT gi, gj, gi // {_FS_NSIDE} AS i, gj // {_FS_NSIDE} AS j FROM g)
  WHERE {_L0_CASE} >= 0
  GROUP BY gi, gj
), spread AS (
  SELECT occ.gi + d.di AS tgi, occ.gj + d.dj AS tgj, occ.n
  FROM occ
  CROSS JOIN (SELECT a.di, b.dj
              FROM (SELECT unnest(range(-1, 2)) AS di) a,
                   (SELECT unnest(range(-1, 2)) AS dj) b) d
), valid AS (
  SELECT tgi, tgj, n,
         tgi // {_FS_NSIDE} AS ti, tgj // {_FS_NSIDE} AS tj,
         tgi % {_FS_NSIDE} AS ix, tgj % {_FS_NSIDE} AS iy
  FROM spread WHERE tgi >= 0 AND tgj >= 0
)
SELECT (({_L0T_CASE}) * {1 << _FOCAL_RBITS} + {_MORTON6}) * 64
         + {4 + _FOCAL_RBITS} AS cell,
       CAST(sum(n) AS BIGINT) AS focal_sum,
       CAST(count(*) AS BIGINT) AS n_contrib
FROM valid WHERE {_L0T_CASE} >= 0
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# geo_trajectory_stats — per-user path length / leg metrics
# ---------------------------------------------------------------------------


def g_trajectory_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user trajectory metrics over time-ordered event positions:
    leg count, total path length, and longest leg.

    Hash-exactness across engines: each leg is rounded to integer
    millimeters BEFORE summing (sqrt is IEEE-754 correctly rounded, so both
    engines compute the identical double per leg; the subsequent integer sum
    is order-independent — a raw double sum would not be).  One window
    shuffle on user_id; the final aggregate rides the same partitioning."""
    ev = _event_points(spark, sf, extra=("user_id", "ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = (ev.withColumn("px", F.lag("x").over(w))
              .withColumn("py", F.lag("y").over(w))
              .filter(F.col("px").isNotNull())
              .withColumn("leg_mm", F.round(F.sqrt(
                  (F.col("x") - F.col("px")) * (F.col("x") - F.col("px"))
                  + (F.col("y") - F.col("py")) * (F.col("y") - F.col("py"))
              ) * 1000).cast("long")))
    return (legs.groupBy("user_id")
                .agg(F.count("*").alias("n_legs"),
                     F.sum("leg_mm").alias("path_mm"),
                     F.max("leg_mm").alias("max_leg_mm")))


SQL_TRAJECTORY = f"""
WITH pts AS (
  SELECT event_id, user_id, ts, {_XENG} AS x, {_YENG} AS y FROM events
), legs AS (
  SELECT user_id,
         x, y,
         lag(x) OVER w AS px, lag(y) OVER w AS py
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), mm AS (
  SELECT user_id,
         CAST(round(sqrt((x - px) * (x - px) + (y - py) * (y - py)) * 1000)
              AS BIGINT) AS leg_mm
  FROM legs WHERE px IS NOT NULL
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_legs,
       CAST(sum(leg_mm) AS BIGINT) AS path_mm,
       max(leg_mm) AS max_leg_mm
FROM mm GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# geo_grid_cluster — DBSCAN-style density clustering, no pairwise distances
# ---------------------------------------------------------------------------

_CL_RBITS = 8     # 16x16 refinement below L0 -> 32,768 m cells
_CL_MIN_PTS = 4   # density threshold: a cell is "dense" with >= this many pts

# Correctness-path point cap (round-2 review): at sf0.1 the dense-cell CC
# loop's driver probes amplify bench noise to ~7 s; the algorithm is proven
# by the recursive-CTE oracle at any size, so the REGISTERED entry caps the
# event count sf-independently (>= every sf<=0.01 table, so driver results
# are unchanged there).  bench.py raises the cap via env to keep measuring
# the full-input path.
_CL_EVENTS = int(os.environ.get("CO_CLUSTER_EVENTS", "20000"))


def g_grid_cluster(spark: SparkSession, sf: str) -> DataFrame:
    """Density-based spatial clustering at scale: points -> per-cell counts,
    keep dense cells (>= ``_CL_MIN_PTS``), connect king-adjacent dense cells,
    label connected components (alternating large-star/small-star), roll up
    per cluster.  The DBSCAN core-cell approximation — O(points) + O(dense
    cells) with NO pairwise distance computation; at 100 TB the only
    fact-sized operation is the first per-cell aggregate, the component
    iteration runs on the (tiny) dense-cell graph."""
    from .training import _spread

    # spread the raw event rows before the Arrow encode kernel + per-cell
    # agg — a single-split parquet serializes the one fact-sized pass
    pts = (_spread(_event_points(spark, sf)
                   .filter(F.col("event_id") < _CL_EVENTS), "event_id")
           .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _CL_RBITS))
           .filter(F.col("cell") >= 0))
    # cache: dense feeds both sides of the edge join, the nodes arg and the
    # final rollup — without it each consumer re-runs the fact-sized
    # per-cell aggregate (the one operation that touches all points)
    dense = (pts.groupBy("cell").agg(F.count("*").alias("n"))
                .filter(F.col("n") >= _CL_MIN_PTS)).cache()
    nb = (dense.select(F.col("cell").alias("u"),
                       F.explode(ring_cells_udf(1)(F.col("cell"))).alias("v"))
               .filter(F.col("u") != F.col("v")))
    edges = nb.join(dense.select(F.col("cell").alias("v")), "v")
    from ..operators.components import connected_components

    comp = connected_components(edges, nodes=dense.select("cell"))
    lab = dense.join(comp.withColumnRenamed("node", "cell"), "cell")
    return (lab.groupBy(F.col("component").alias("cluster_id"))
               .agg(F.count("*").alias("n_cells"),
                    F.sum("n").alias("n_points")))


_CL_NSIDE = 1 << (_CL_RBITS // 2)
_CL_S = grids.L0_SIDE / _CL_NSIDE
_MORTON8 = morton_ref(_CL_RBITS, "iy", "ix")

SQL_GRID_CLUSTER = f"""
WITH RECURSIVE raw AS (
  SELECT {_XENG} AS x, {_YENG} AS y FROM events
  WHERE event_id < {_CL_EVENTS}
), g AS (
  SELECT CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {_CL_S!r}) AS BIGINT) AS gi,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {_CL_S!r}) AS BIGINT) AS gj
  FROM raw
), lat AS (
  SELECT gi, gj, gi // {_CL_NSIDE} AS i, gj // {_CL_NSIDE} AS j,
         gi % {_CL_NSIDE} AS ix, gj % {_CL_NSIDE} AS iy
  FROM g
), dense AS (
  SELECT gi, gj,
         ((min({_L0_CASE}) * {1 << _CL_RBITS} + min({_MORTON8})) * 64
          + {4 + _CL_RBITS}) AS cell,
         count(*) AS n
  FROM lat WHERE {_L0_CASE} >= 0
  GROUP BY gi, gj HAVING count(*) >= {_CL_MIN_PTS}
), ed AS (
  SELECT a.cell AS u, b.cell AS v
  FROM dense a JOIN dense b
    ON abs(a.gi - b.gi) <= 1 AND abs(a.gj - b.gj) <= 1 AND a.cell <> b.cell
), reach(src, dst) AS (
  SELECT cell, cell FROM dense
  UNION
  SELECT r.src, e.v FROM reach r JOIN ed e ON e.u = r.dst
), lbl AS (
  SELECT src AS cell, min(dst) AS component FROM reach GROUP BY src
)
SELECT lbl.component AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(dense.n) AS BIGINT) AS n_points
FROM dense JOIN lbl ON dense.cell = lbl.cell
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# geo_hotspot_gi — Getis-Ord Gi* hot-spot z-scores over the cell raster
# ---------------------------------------------------------------------------

def g_hotspot_gi(spark: SparkSession, sf: str) -> DataFrame:
    """Getis–Ord Gi* (Getis & Ord 1992 / Ord & Getis 1995) over the
    occupied-cell event raster: the statistic behind 'find the Bogotá
    density hot spots'.  Universe = occupied grid-valid cells; weights =
    binary king ring-1 restricted to the universe (W_i = occupied
    neighbors incl. self, so border/sparse cells get their true smaller
    W_i).  Gi* = (focal_sum_i - x̄ W_i) / (S sqrt((n W_i - W_i²)/(n-1))),
    reported in micro-units; NULL when the denominator degenerates (all
    counts equal, or W_i = n).

    Cross-engine exactness: counts/sums are integers; x̄, S and the z-score
    use IDENTICAL double op order in both engines (IEEE divide/sqrt are
    correctly rounded, so the doubles match bit-for-bit).

    Plan shape at scale: the raster aggregation is the only point-sized
    shuffle (same as geo_focal_sum); the spread re-agg and the
    occupied-target join shuffle the raster (cells << points); the global
    (n, Σx, Σx²) scalars are ONE tiny agg broadcast back."""
    counts = (_event_points(spark, sf)
              .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _FOCAL_RBITS))
              .filter(F.col("cell") >= 0)
              .groupBy("cell").agg(F.count("*").alias("n")))
    tot = counts.agg(F.count("*").alias("nc"),
                     F.sum("n").alias("sx"),
                     F.sum(F.col("n") * F.col("n")).alias("sxx"))
    spread = counts.select(
        F.col("n").alias("sn"),
        F.explode(ring_cells_udf(1)(F.col("cell"))).alias("target"))
    foc = (spread.join(counts, spread.target == counts.cell)  # occupied only
                 .groupBy("cell", "n")
                 .agg(F.sum("sn").alias("focal_sum"),
                      F.count("*").alias("w_i")))
    xbar = F.col("sx").cast("double") / F.col("nc")
    s = F.sqrt(F.col("sxx").cast("double") / F.col("nc") - xbar * xbar)
    num = F.col("focal_sum") - xbar * F.col("w_i")
    den = s * F.sqrt((F.col("nc").cast("double") * F.col("w_i")
                      - F.col("w_i").cast("double") * F.col("w_i"))
                     / (F.col("nc") - 1))
    return (foc.crossJoin(F.broadcast(tot))
               .select("cell", "n", "focal_sum", "w_i",
                       F.round(F.lit(1000000.0) * num
                               / F.nullif(den, F.lit(0.0)))
                        .cast("long").alias("gi_micro"))
               .orderBy("cell"))


SQL_HOTSPOT_GI = f"""
WITH raw AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), g AS (
  SELECT CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {_FS_S!r}) AS BIGINT) AS gi,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {_FS_S!r}) AS BIGINT) AS gj
  FROM raw
), occ AS MATERIALIZED (
  SELECT gi, gj, count(*) AS n
  FROM (SELECT gi, gj, gi // {_FS_NSIDE} AS i, gj // {_FS_NSIDE} AS j FROM g)
  WHERE {_L0_CASE} >= 0
  GROUP BY gi, gj
), tot AS (
  SELECT count(*) AS nc, CAST(sum(n) AS BIGINT) AS sx,
         CAST(sum(n * n) AS BIGINT) AS sxx
  FROM occ
), spread AS (
  SELECT occ.gi + d.di AS tgi, occ.gj + d.dj AS tgj, occ.n AS sn
  FROM occ
  CROSS JOIN (SELECT a.di, b.dj
              FROM (SELECT unnest(range(-1, 2)) AS di) a,
                   (SELECT unnest(range(-1, 2)) AS dj) b) d
), foc AS (
  SELECT o.gi, o.gj, o.n, CAST(sum(s.sn) AS BIGINT) AS focal_sum,
         CAST(count(*) AS BIGINT) AS w_i
  FROM occ o JOIN spread s ON s.tgi = o.gi AND s.tgj = o.gj
  GROUP BY 1, 2, 3
), z AS (
  SELECT gi, gj, n, focal_sum, w_i,
         CAST(round(1000000.0
              * (focal_sum - (CAST(sx AS DOUBLE) / nc) * w_i)
              / nullif((sqrt(CAST(sxx AS DOUBLE) / nc
                             - (CAST(sx AS DOUBLE) / nc)
                               * (CAST(sx AS DOUBLE) / nc))
                        * sqrt((CAST(nc AS DOUBLE) * w_i
                                - CAST(w_i AS DOUBLE) * w_i)
                               / (nc - 1))), 0)) AS BIGINT) AS gi_micro,
         gi % {_FS_NSIDE} AS ix, gj % {_FS_NSIDE} AS iy,
         gi // {_FS_NSIDE} AS ti, gj // {_FS_NSIDE} AS tj
  FROM foc, tot
)
SELECT (({_L0T_CASE}) * {1 << _FOCAL_RBITS} + {_MORTON6}) * 64
         + {4 + _FOCAL_RBITS} AS cell,
       n, focal_sum, w_i, gi_micro
FROM z
ORDER BY cell
"""


# ---------------------------------------------------------------------------
# geo_morans_i — global spatial autocorrelation over the cell raster
# ---------------------------------------------------------------------------

def g_morans_i(spark: SparkSession, sf: str) -> DataFrame:
    """Global Moran's I (Moran 1950) over the occupied-cell event raster
    with binary king ring-1 weights (w_ii = 0): ONE number saying whether
    event density is spatially clustered (+), random (~E[I] = -1/(n-1)) or
    dispersed (-).

    Integer-exactness trick: the centered deviate z_i = n_i - x̄ is not an
    integer, but Z_i = n·n_i - Σx is, and the n² factors cancel in I =
    (n/W)·(Σ w_ij Z_i Z_j)/(Σ Z_i²) — so BOTH quadratic sums are exact
    int64 (order-independent across partitionings/engines) and only the
    final ratio is a double, taken with identical op order.  Headroom:
    |Z| <= n·max(n_i); the quadratic sums must fit int64 — at larger
    corpora coarsen the raster (the documented kmeans/pca convention).

    Plan shape: identical to geo_hotspot_gi (raster-only shuffles after
    the one point-sized agg); the self-pair is excluded by a target !=
    source filter on the ring spread."""
    counts = (_event_points(spark, sf)
              .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _FOCAL_RBITS))
              .filter(F.col("cell") >= 0)
              .groupBy("cell").agg(F.count("*").alias("n")))
    tot = counts.agg(F.count("*").alias("nc"), F.sum("n").alias("sx"))
    zc = (counts.crossJoin(F.broadcast(tot))
                .select("cell", "nc",
                        (F.col("nc") * F.col("n") - F.col("sx")).alias("z")))
    spread = (zc.select(F.col("cell").alias("src"), F.col("z").alias("zj"),
                        F.explode(ring_cells_udf(1)(F.col("cell")))
                         .alias("target"))
                .filter(F.col("target") != F.col("src")))  # w_ii = 0
    pair = (spread.join(zc, spread.target == zc.cell)
                  .agg(F.sum(F.col("z") * F.col("zj")).alias("num"),
                       F.count("*").alias("w")))
    den = zc.agg(F.sum(F.col("z") * F.col("z")).alias("den"),
                 F.count("*").alias("n_cells"))
    i_micro = F.round(F.lit(1000000.0)
                      * (F.col("n_cells").cast("double") * F.col("num"))
                      / (F.col("w").cast("double") * F.col("den"))) \
               .cast("long")
    e_micro = F.round(F.lit(-1000000.0) / (F.col("n_cells") - 1)).cast("long")
    return (pair.crossJoin(den)
                .select(F.col("n_cells"), F.col("w").alias("w_pairs"),
                        i_micro.alias("i_micro"), e_micro.alias("e_i_micro")))


SQL_MORANS_I = f"""
WITH raw AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), g AS (
  SELECT CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {_FS_S!r}) AS BIGINT) AS gi,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {_FS_S!r}) AS BIGINT) AS gj
  FROM raw
), occ AS MATERIALIZED (
  SELECT gi, gj, count(*) AS n
  FROM (SELECT gi, gj, gi // {_FS_NSIDE} AS i, gj // {_FS_NSIDE} AS j FROM g)
  WHERE {_L0_CASE} >= 0
  GROUP BY gi, gj
), tot AS (
  SELECT count(*) AS nc, CAST(sum(n) AS BIGINT) AS sx FROM occ
), zc AS MATERIALIZED (
  SELECT gi, gj, CAST(nc * n - sx AS BIGINT) AS z FROM occ, tot
), spread AS (
  SELECT zc.gi + d.di AS tgi, zc.gj + d.dj AS tgj, zc.z AS zj
  FROM zc
  CROSS JOIN (SELECT a.di, b.dj
              FROM (SELECT unnest(range(-1, 2)) AS di) a,
                   (SELECT unnest(range(-1, 2)) AS dj) b) d
  WHERE NOT (d.di = 0 AND d.dj = 0)
), pair AS (
  SELECT CAST(sum(zc.z * s.zj) AS BIGINT) AS num,
         CAST(count(*) AS BIGINT) AS w
  FROM zc JOIN spread s ON s.tgi = zc.gi AND s.tgj = zc.gj
), den AS (
  SELECT CAST(sum(z * z) AS BIGINT) AS den, count(*) AS n_cells FROM zc
)
SELECT den.n_cells,
       pair.w AS w_pairs,
       CAST(round(1000000.0
            * (CAST(den.n_cells AS DOUBLE) * pair.num)
            / (CAST(pair.w AS DOUBLE) * den.den)) AS BIGINT) AS i_micro,
       CAST(round(-1000000.0 / (den.n_cells - 1)) AS BIGINT) AS e_i_micro
FROM pair, den
"""


# ---------------------------------------------------------------------------
# geo_idw_fill — inverse-distance-weighted gap-fill of the cell raster
# ---------------------------------------------------------------------------

def g_idw_fill(spark: SparkSession, sf: str) -> DataFrame:
    """IDW interpolation (Shepard 1968) at the EMPTY grid-valid cells
    adjacent (king ring-1) to occupied raster cells: the raster gap-fill /
    surface-interpolation verb.  Weight = 1/d² with d² the integer lattice
    distance between cell centers (1 for rook, 2 for diagonal moves).

    Integer-exactness: per-neighbor contributions are exact rationals over
    d² ∈ {{1, 2}}; multiplying by the common denominator 2 makes num =
    Σ 2·n_j/d²_j and den = Σ 2/d²_j exact BIGINTs (order-independent), and
    only the final ratio rounds: idw_milli = round(1000·num/den).

    Target discovery without scanning the full lattice: spread occupied
    cells to their ring (the focal trick), anti-join the occupied set —
    off-grid neighbors were never emitted by the ring kernel, so the
    result is exactly the grid-valid empty fringe.  Raster-sized shuffles
    only."""
    counts = (_event_points(spark, sf)
              .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _FOCAL_RBITS))
              .filter(F.col("cell") >= 0)
              .groupBy("cell").agg(F.count("*").alias("n")))
    spread = (counts.select(
                  "n", F.explode(ring_cells_d2_udf(1)(F.col("cell")))
                        .alias("nb"))
              .select("n", F.col("nb.cell").alias("target"),
                      F.col("nb.d2").alias("d2")))
    # 2·n/d² and 2/d² are exact integers for d² ∈ {1, 2}; the per-row
    # double division is exact, so the cast-then-sum is order-independent
    fringe = (spread
              .join(counts.select(F.col("cell").alias("target")),
                    "target", "left_anti")
              .groupBy(F.col("target").alias("cell"))
              .agg(F.sum((2 * F.col("n") / F.col("d2")).cast("long"))
                    .alias("num2"),
                   F.sum((2 / F.col("d2")).cast("long")).alias("den2"),
                   F.count("*").alias("n_src")))
    return (fringe.select("cell", "n_src", "num2", "den2",
                          F.round(F.lit(1000.0) * F.col("num2")
                                  / F.col("den2")).cast("long")
                           .alias("idw_milli"))
                  .orderBy("cell"))


SQL_IDW_FILL = f"""
WITH raw AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), g AS (
  SELECT CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {_FS_S!r}) AS BIGINT) AS gi,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {_FS_S!r}) AS BIGINT) AS gj
  FROM raw
), occ AS MATERIALIZED (
  SELECT gi, gj, count(*) AS n
  FROM (SELECT gi, gj, gi // {_FS_NSIDE} AS i, gj // {_FS_NSIDE} AS j FROM g)
  WHERE {_L0_CASE} >= 0
  GROUP BY gi, gj
), spread AS (
  SELECT occ.gi + d.di AS tgi, occ.gj + d.dj AS tgj, occ.n,
         d.di * d.di + d.dj * d.dj AS d2
  FROM occ
  CROSS JOIN (SELECT a.di, b.dj
              FROM (SELECT unnest(range(-1, 2)) AS di) a,
                   (SELECT unnest(range(-1, 2)) AS dj) b) d
  WHERE NOT (d.di = 0 AND d.dj = 0)
), fringe AS (  -- grid-valid empty neighbors only
  SELECT s.tgi AS gi, s.tgj AS gj, s.n, s.d2,
         s.tgi % {_FS_NSIDE} AS ix, s.tgj % {_FS_NSIDE} AS iy,
         s.tgi // {_FS_NSIDE} AS ti, s.tgj // {_FS_NSIDE} AS tj
  FROM spread s ANTI JOIN occ o ON o.gi = s.tgi AND o.gj = s.tgj
  WHERE s.tgi >= 0 AND s.tgj >= 0
), agg AS (
  SELECT gi, gj, min(ix) AS ix, min(iy) AS iy, min(ti) AS ti, min(tj) AS tj,
         CAST(count(*) AS BIGINT) AS n_src,
         CAST(sum(2 * n // d2) AS BIGINT) AS num2,
         CAST(sum(2 // d2) AS BIGINT) AS den2
  FROM fringe
  GROUP BY gi, gj
)
SELECT (({_L0T_CASE}) * {1 << _FOCAL_RBITS} + {_MORTON6}) * 64
         + {4 + _FOCAL_RBITS} AS cell,
       n_src, num2, den2,
       CAST(round(1000.0 * num2 / den2) AS BIGINT) AS idw_milli
FROM agg WHERE {_L0T_CASE} >= 0
ORDER BY cell
"""


# ---------------------------------------------------------------------------
# geo_semivariogram — empirical variogram over the cell raster
# ---------------------------------------------------------------------------

def g_semivariogram(spark: SparkSession, sf: str) -> DataFrame:
    """Empirical semivariogram (Matheron 1963) of the event-count raster:
    γ(h) = Σ(n_i - n_j)² / (2·|pairs|) per squared lattice distance bin
    h = d² ∈ {1,2,4,5,8} (king ring-2) — the geostatistics primitive
    behind 'over what range are densities spatially correlated'.

    Engine symmetry: ORDERED pairs on purpose — each unordered pair counts
    twice in both Σ and |pairs|, so γ is unchanged and neither engine
    needs a cell-id vs lattice-coords tie-break to dedup.  Sums are exact
    BIGINTs; only the final ratio is a double with identical op order.

    Plan shape: raster-only — the ring-2 spread (24× per occupied cell) +
    one equi-join on cell + ONE map-side-combined groupBy(d2); never
    point-sized after the first agg."""
    counts = (_event_points(spark, sf)
              .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), _FOCAL_RBITS))
              .filter(F.col("cell") >= 0)
              .groupBy("cell").agg(F.count("*").alias("n")))
    spread = (counts.select(
                  F.col("n").alias("ni"),
                  F.explode(ring_cells_d2_udf(2)(F.col("cell"))).alias("nb"))
              .select("ni", F.col("nb.cell").alias("target"),
                      F.col("nb.d2").alias("d2")))
    pairs = spread.join(
        counts.select(F.col("cell").alias("target"), F.col("n").alias("nj")),
        "target")
    g = (pairs.groupBy("d2")
              .agg(F.count("*").alias("n_pairs"),
                   F.sum((F.col("ni") - F.col("nj"))
                         * (F.col("ni") - F.col("nj"))).alias("ss")))
    return (g.select(F.col("d2").cast("long").alias("d2"), "n_pairs", "ss",
                     F.round(F.lit(1000.0) * F.col("ss")
                             / (2 * F.col("n_pairs"))).cast("long")
                      .alias("gamma_milli"))
             .orderBy("d2"))


SQL_SEMIVARIOGRAM = f"""
WITH raw AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), g AS (
  SELECT CAST(floor((x - {grids.L0_ORIGIN_X!r}) / {_FS_S!r}) AS BIGINT) AS gi,
         CAST(floor((y - {grids.L0_ORIGIN_Y!r}) / {_FS_S!r}) AS BIGINT) AS gj
  FROM raw
), occ AS MATERIALIZED (
  SELECT gi, gj, count(*) AS n
  FROM (SELECT gi, gj, gi // {_FS_NSIDE} AS i, gj // {_FS_NSIDE} AS j FROM g)
  WHERE {_L0_CASE} >= 0
  GROUP BY gi, gj
), pr AS (
  SELECT (a.gi - b.gi) * (a.gi - b.gi)
         + (a.gj - b.gj) * (a.gj - b.gj) AS d2,
         (a.n - b.n) * (a.n - b.n) AS sq
  FROM occ a JOIN occ b
    ON abs(a.gi - b.gi) <= 2 AND abs(a.gj - b.gj) <= 2
   AND NOT (a.gi = b.gi AND a.gj = b.gj)
)
SELECT CAST(d2 AS BIGINT) AS d2,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(sq) AS BIGINT) AS ss,
       CAST(round(1000.0 * sum(sq) / (2 * count(*))) AS BIGINT)
         AS gamma_milli
FROM pr GROUP BY d2 ORDER BY d2
"""


QUERIES = {
    "geo_distance_join": (g_distance_join, SQL_DISTANCE_JOIN),
    "geo_od_matrix": (g_od_matrix, SQL_OD_MATRIX),
    "geo_focal_sum": (g_focal_sum, SQL_FOCAL_SUM),
    "geo_trajectory_stats": (g_trajectory_stats, SQL_TRAJECTORY),
    "geo_grid_cluster": (g_grid_cluster, SQL_GRID_CLUSTER),
    "geo_hotspot_gi": (g_hotspot_gi, SQL_HOTSPOT_GI),
    "geo_morans_i": (g_morans_i, SQL_MORANS_I),
    "geo_idw_fill": (g_idw_fill, SQL_IDW_FILL),
    "geo_semivariogram": (g_semivariogram, SQL_SEMIVARIOGRAM),
}
