"""Geospatial query surface.

Oracle-checked entries derive deterministic planar points from ``events``
with integer arithmetic that DuckDB reproduces exactly (both sides compute
identical doubles — divisors are powers of two), then run the ENGINE kernel
(pandas-UDF cell encode / native tile math) on the Spark side against a
straight SQL re-statement of the grid spec (/root/reference/conf.yaml:21-26)
on the oracle side.  That makes the grid semantics themselves
driver-verified, not just pytest-verified.

Pages-based entries (geoparse -> geocode -> cover join -> kNN) have no SQL
oracle (the TM projection isn't SQL-expressible) — driver records rows-only;
bit-exactness is gated by tests/test_grid_golden.py instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells_sql, geo
from ..grid import grids
from ..operators import tiles
from ..sources.tables import load

# deterministic planar points from events (exact in float64 on both engines)
_XENG = "3678500.0 + ((event_id * 2654435761) % 2097152)"
_YENG = "970000.0 + ((event_id * 40503) % 2621440)"


def position_cols():
    """The deterministic position hash as Spark Columns — THE single Spark-side
    implementation of _XENG/_YENG (every query deriving planar positions from
    event_id must use this, so the hash constants live in exactly one
    Python + one SQL place)."""
    x = (F.lit(grids.L0_ORIGIN_X) + (F.col("event_id") * 2654435761) % 2097152).alias("x")
    y = (F.lit(grids.L0_ORIGIN_Y) + (F.col("event_id") * 40503) % 2621440).alias("y")
    return x, y


def _event_points(spark: SparkSession, sf: str, extra: tuple = ()) -> DataFrame:
    ev = load(spark, sf, "events")
    x, y = position_cols()
    return ev.select("event_id", *extra, x, y)


def g_cell_assign_parity(spark: SparkSession, sf: str) -> DataFrame:
    """Engine cell encode (pandas-UDF kernel) vs SQL spec re-statement."""
    pts = _event_points(spark, sf)
    out = pts.withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 4))
    return out.groupBy("cell").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_ev"),
    )


from .sql_grid import l0_case as _sql_l0_case  # noqa: E402
from .sql_grid import morton_ref as _sql_morton_ref  # noqa: E402

_L0_CASE = _sql_l0_case()

SQL_CELL_ASSIGN = f"""
WITH pts AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), c AS (
  SELECT event_id,
         CAST(floor((x - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((y - 970000.0) / 524288.0) AS BIGINT) AS j,
         (x - 3678500.0) / 524288.0 - floor((x - 3678500.0) / 524288.0) AS u,
         (y - 970000.0) / 524288.0 - floor((y - 970000.0) / 524288.0) AS v
  FROM pts
), d AS (
  SELECT event_id, {_L0_CASE} AS digit,
         CAST(floor(u * 4) AS BIGINT) AS ix, CAST(floor(v * 4) AS BIGINT) AS iy
  FROM c
)
SELECT CASE WHEN digit >= 0
            THEN ((digit * 16 + (iy // 2) * 8 + (ix // 2) * 4 + (iy % 2) * 2 + (ix % 2)) * 64 + 8)
            ELSE -1 END AS cell,
       count(*) AS n, min(event_id) AS min_ev
FROM d GROUP BY 1
"""

_TILE_Z = 6


def g_tile_assign(spark: SparkSession, sf: str) -> DataFrame:
    """XYZ tile + quadkey assignment (pure native column math, A26)."""
    pts = _event_points(spark, sf)
    return (
        pts.select(
            "event_id",
            tiles.tile_id(F.col("x"), F.col("y"), _TILE_Z).alias("tile"),
            tiles.tile_quadkey_num(F.col("x"), F.col("y"), _TILE_Z).alias("quadkey"),
        )
        .groupBy("tile", "quadkey").agg(F.count("*").alias("n"))
    )


def _sql_quadkey(z: int) -> str:
    terms = []
    for k in range(z - 1, -1, -1):
        terms.append(f"(((ty >> {k}) & 1) * 2 + ((tx >> {k}) & 1))")
    expr = "0"
    for t in terms:
        expr = f"({expr}) * 4 + {t}"
    return expr


SQL_TILE = f"""
WITH pts AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), t AS (
  SELECT event_id,
         CAST(floor((x - 3678500.0) / {tiles.X_EXTENT / (1 << _TILE_Z)!r}) AS BIGINT) AS tx,
         CAST(floor(({tiles.Y0 + tiles.Y_EXTENT!r} - y) / {tiles.Y_EXTENT / (1 << _TILE_Z)!r}) AS BIGINT) AS ty
  FROM pts
)
SELECT CASE WHEN tx BETWEEN 0 AND {(1 << _TILE_Z) - 1} AND ty BETWEEN 0 AND {(1 << _TILE_Z) - 1}
            THEN ty * {1 << _TILE_Z} + tx END AS tile,
       CASE WHEN tx BETWEEN 0 AND {(1 << _TILE_Z) - 1} AND ty BETWEEN 0 AND {(1 << _TILE_Z) - 1}
            THEN {_sql_quadkey(_TILE_Z)} END AS quadkey,
       count(*) AS n
FROM t GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Pages-based pipelines moved to queries/geo_pages.py (round-3): they now run
# over the COMMITTED fixtures so the driver hash-checks them end to end.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Cover compaction: fixed-depth point cells -> minimal mixed-depth cover
# ---------------------------------------------------------------------------

_COMPACT_RBITS = 8  # refinement bits -> nbits 12 cells, 4 merge levels to L0


def g_cover_compact(spark: SparkSession, sf: str) -> DataFrame:
    """Engine kernel encode at depth 12 -> operators.compact.compact_cover;
    oracle re-states the encode from the grid spec and unrolls the four
    quad-merge levels as window-count CTEs."""
    from ..operators.compact import compact_cover

    pts = _event_points(spark, sf)
    cells = pts.select(
        geo.xy_to_cell_b(F.col("x"), F.col("y"), _COMPACT_RBITS).alias("cell"))
    return compact_cover(cells, min_depth=4)


def _sql_morton_yx(iy: str, ix: str, nbits: int) -> str:
    """y-first MSB Morton interleave of two nbits-wide SQL ints (thin wrapper
    over the single-source sql_grid.morton_ref)."""
    return _sql_morton_ref(2 * nbits, iy, ix)


def _sql_merge_level(prev: str) -> str:
    """One simultaneous quad-merge pass over a distinct cell set."""
    return f"""
  SELECT DISTINCT CASE WHEN mrg THEN par ELSE cell END AS cell FROM (
    SELECT cell, par,
           par IS NOT NULL AND count(*) OVER (PARTITION BY par) = 4 AS mrg
    FROM (SELECT cell,
                 CASE WHEN cell % 64 >= 6
                      THEN ((cell // 64) // 4) * 64 + (cell % 64 - 2) END AS par
          FROM {prev})
  )"""


SQL_COVER_COMPACT = f"""
WITH pts AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), c AS (
  SELECT CAST(floor((x - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((y - 970000.0) / 524288.0) AS BIGINT) AS j,
         (x - 3678500.0) / 524288.0 - floor((x - 3678500.0) / 524288.0) AS u,
         (y - 970000.0) / 524288.0 - floor((y - 970000.0) / 524288.0) AS v
  FROM pts
), d AS (
  SELECT {_L0_CASE} AS digit,
         CAST(floor(u * 16) AS BIGINT) AS ix, CAST(floor(v * 16) AS BIGINT) AS iy
  FROM c
), l0 AS (
  SELECT DISTINCT (digit * 256 + {_sql_morton_yx('iy', 'ix', 4)}) * 64 + 12 AS cell
  FROM d WHERE digit >= 0
), l1 AS ({_sql_merge_level('l0')}
), l2 AS ({_sql_merge_level('l1')}
), l3 AS ({_sql_merge_level('l2')}
), l4 AS ({_sql_merge_level('l3')}
)
SELECT cell, cell % 64 AS depth FROM l4
"""


# ---------------------------------------------------------------------------
# Segment -> cell trace (route coverage, operators/trace.py)
# ---------------------------------------------------------------------------

_TRACE_N_SEG = 100


def g_segment_cells(spark: SparkSession, sf: str) -> DataFrame:
    """Trajectory segments (event point k -> point k+1) rasterized to the
    distinct depth-12 cells they touch; engine = densify + pandas-UDF encode,
    oracle = the same bit-exact lerp + grid-spec restatement."""
    from ..operators.trace import segment_cells

    ev = load(spark, sf, "events").filter(F.col("event_id") < _TRACE_N_SEG)
    x1 = F.lit(grids.L0_ORIGIN_X) + (F.col("event_id") * 2654435761) % 2097152
    y1 = F.lit(grids.L0_ORIGIN_Y) + (F.col("event_id") * 40503) % 2621440
    x2 = F.lit(grids.L0_ORIGIN_X) + ((F.col("event_id") + 1) * 2654435761) % 2097152
    y2 = F.lit(grids.L0_ORIGIN_Y) + ((F.col("event_id") + 1) * 40503) % 2621440
    return segment_cells(ev, x1, y1, x2, y2, rbits=8, keep=["event_id"])


SQL_SEGMENT_CELLS = f"""
WITH seg AS (
  SELECT event_id, {_XENG} AS x1, {_YENG} AS y1,
         3678500.0 + ((event_id + 1) * 2654435761) % 2097152 AS x2,
         970000.0 + ((event_id + 1) * 40503) % 2621440 AS y2
  FROM events WHERE event_id < {_TRACE_N_SEG}
), samp AS (
  SELECT event_id,
         x1 + (x2 - x1) * (CAST(t AS DOUBLE) / 64.0) AS x,
         y1 + (y2 - y1) * (CAST(t AS DOUBLE) / 64.0) AS y
  FROM seg, generate_series(0, 64) AS g(t)
), c AS (
  SELECT event_id,
         CAST(floor((x - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((y - 970000.0) / 524288.0) AS BIGINT) AS j,
         (x - 3678500.0) / 524288.0 - floor((x - 3678500.0) / 524288.0) AS u,
         (y - 970000.0) / 524288.0 - floor((y - 970000.0) / 524288.0) AS v
  FROM samp
), d AS (
  SELECT event_id, {_L0_CASE} AS digit,
         CAST(floor(u * 16) AS BIGINT) AS ix, CAST(floor(v * 16) AS BIGINT) AS iy
  FROM c
)
SELECT DISTINCT event_id,
       (digit * 256 + {_sql_morton_yx('iy', 'ix', 4)}) * 64 + 12 AS cell
FROM d WHERE digit >= 0
"""


# ---------------------------------------------------------------------------
# Spatial range (bbox) query: cell-index prefilter + exact predicate
# ---------------------------------------------------------------------------

_BBOX = (4_200_000.0, 1_800_000.0, 4_900_000.0, 2_600_000.0)  # xmin ymin xmax ymax


def _bbox_cover_cells(xmin: float, ymin: float, xmax: float, ymax: float,
                      rbits: int = 8) -> list[int]:
    """All depth-(4+rbits) cells overlapping the half-open box [min, max) —
    driver-side lattice enumeration (tiny: bbox_area / cell_area entries),
    the list an indexed scan prunes with.

    The inclusive max lattice index is ceil(max/w) - 1: a box edge exactly on
    a cell boundary excludes that boundary's cell, an edge any amount above
    it includes it — no epsilon.  Cell ids come from the ONE canonical
    encode (grids.grid_b_encode_xy on cell centers), not a re-derivation.
    """
    import math

    import numpy as np

    n = 1 << (rbits // 2)
    w = grids.L0_SIDE / n
    gx0 = math.floor((xmin - grids.L0_ORIGIN_X) / w)
    gx1 = math.ceil((xmax - grids.L0_ORIGIN_X) / w) - 1
    gy0 = math.floor((ymin - grids.L0_ORIGIN_Y) / w)
    gy1 = math.ceil((ymax - grids.L0_ORIGIN_Y) / w) - 1
    gx, gy = np.meshgrid(np.arange(gx0, gx1 + 1), np.arange(gy0, gy1 + 1))
    cx = grids.L0_ORIGIN_X + (gx.ravel() + 0.5) * w
    cy = grids.L0_ORIGIN_Y + (gy.ravel() + 0.5) * w
    bits, valid = grids.grid_b_encode_xy(cx, cy, rbits)
    cells = (bits[valid] << 6) | (4 + rbits)
    return [int(c) for c in cells]


def g_bbox_query(spark: SparkSession, sf: str) -> DataFrame:
    """Range query the scale way: enumerate the bbox's cover cells on the
    driver (~500 for this box), prune the indexed cell column with IN, then
    apply the exact coordinate predicate — candidate set is bbox-area-bound
    instead of table-size-bound.  The oracle states the plain x/y WHERE, so
    any point the prefilter wrongly drops fails the hash."""
    cand_cells = _bbox_cover_cells(*_BBOX)
    xmin, ymin, xmax, ymax = _BBOX
    pts = _event_points(spark, sf).withColumn(
        "cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 8))
    hit = (pts.filter(F.col("cell").isin(cand_cells))
              .filter((F.col("x") >= xmin) & (F.col("x") < xmax)
                      & (F.col("y") >= ymin) & (F.col("y") < ymax)))
    return hit.agg(F.count("*").alias("n_points"),
                   F.min("event_id").alias("min_ev"),
                   F.max("event_id").alias("max_ev"),
                   F.countDistinct("cell").cast("long").alias("n_cells"))


SQL_BBOX_QUERY = f"""
WITH pts AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), c AS (
  SELECT event_id, x, y,
         CAST(floor((x - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((y - 970000.0) / 524288.0) AS BIGINT) AS j,
         (x - 3678500.0) / 524288.0 - floor((x - 3678500.0) / 524288.0) AS u,
         (y - 970000.0) / 524288.0 - floor((y - 970000.0) / 524288.0) AS v
  FROM pts
), cells AS (
  SELECT event_id, x, y,
         (({_L0_CASE} * 256
           + {_sql_morton_yx('CAST(floor(v * 16) AS BIGINT)',
                             'CAST(floor(u * 16) AS BIGINT)', 4)}) * 64 + 12)
           AS cell,
         {_L0_CASE} AS digit
  FROM c
)
SELECT CAST(count(*) AS BIGINT) AS n_points, min(event_id) AS min_ev,
       max(event_id) AS max_ev,
       CAST(count(DISTINCT cell) AS BIGINT) AS n_cells
FROM cells
WHERE digit >= 0
  AND x >= {_BBOX[0]!r} AND x < {_BBOX[2]!r}
  AND y >= {_BBOX[1]!r} AND y < {_BBOX[3]!r}
"""


# ---------------------------------------------------------------------------
# Multi-resolution pyramid rollup (tile-pyramid build from leaf aggregates)
# ---------------------------------------------------------------------------

_PYRAMID_DEPTHS = (4, 6, 8, 10, 12)


def g_pyramid_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Counts at EVERY pyramid level from one leaf aggregation: aggregate
    depth-12 leaves once, then each coarser level re-aggregates the previous
    level with a 2-bit shift — never re-scanning the points (design rule #5;
    the map-tile pyramid build).  Output (depth, cell, n)."""
    pts = _event_points(spark, sf)
    leaf_d = max(_PYRAMID_DEPTHS)
    leaf = (pts.withColumn("cell",
                           geo.xy_to_cell_b(F.col("x"), F.col("y"), leaf_d - 4))
               .filter(F.col("cell") >= 0)
               .groupBy("cell").agg(F.count("*").alias("n")))
    levels = [leaf.select(F.lit(leaf_d).alias("depth"), "cell",
                          F.col("n").cast("long").alias("n"))]
    cur = leaf
    for d in sorted(_PYRAMID_DEPTHS)[:-1][::-1]:
        cur = (cur.select(cells_sql.cell_parent(F.col("cell"), 2).alias("cell"), "n")
                  .groupBy("cell").agg(F.sum("n").alias("n")))
        levels.append(cur.select(F.lit(d).alias("depth"), "cell",
                                 F.col("n").cast("long").alias("n")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


SQL_PYRAMID = f"""
WITH pts AS (
  SELECT {_XENG} AS x, {_YENG} AS y FROM events
), c AS (
  SELECT CAST(floor((x - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((y - 970000.0) / 524288.0) AS BIGINT) AS j,
         (x - 3678500.0) / 524288.0 - floor((x - 3678500.0) / 524288.0) AS u,
         (y - 970000.0) / 524288.0 - floor((y - 970000.0) / 524288.0) AS v
  FROM pts
), leaf AS (
  SELECT (digit * 256 + m) * 64 + 12 AS cell, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT {_L0_CASE} AS digit,
               {_sql_morton_yx('CAST(floor(v * 16) AS BIGINT)',
                               'CAST(floor(u * 16) AS BIGINT)', 4)} AS m
        FROM c) WHERE digit >= 0 GROUP BY 1
)
SELECT CAST(depth AS INT) AS depth,
       ((cell // 64) >> (12 - depth)) * 64 + depth AS cell,
       CAST(sum(n) AS BIGINT) AS n
FROM leaf CROSS JOIN (SELECT unnest([{", ".join(map(str, _PYRAMID_DEPTHS))}]) AS depth)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Region centroid + snap: aggregate geometry, re-encoded through the kernel
# ---------------------------------------------------------------------------


def g_region_centroid(spark: SparkSession, sf: str) -> DataFrame:
    """Per depth-8 cell: the member points' centroid (bit-stable: the event
    lattice coordinates are integer-valued, so the sums aggregate in BIGINT
    and ONE final double division is the only FP op) and that centroid
    snapped to its depth-12 cell via the engine encode kernel — the
    'aggregate geometry then re-index' shape of POI conflation / label
    placement."""
    pts = _event_points(spark, sf)
    enc = pts.withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 4)) \
             .filter(F.col("cell") >= 0)
    agg = enc.groupBy("cell").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("long")).alias("sx"),
        F.sum(F.col("y").cast("long")).alias("sy"))
    cx = F.col("sx").cast("double") / F.col("n")
    cy = F.col("sy").cast("double") / F.col("n")
    return agg.select(
        "cell", F.col("n").cast("long").alias("n"),
        F.round(cx, 6).alias("cx"), F.round(cy, 6).alias("cy"),
        geo.xy_to_cell_b(cx, cy, 8).alias("snap_cell"))


SQL_REGION_CENTROID = f"""
WITH pts AS (
  SELECT {_XENG} AS x, {_YENG} AS y FROM events
), c8 AS (
  SELECT x, y,
         CAST(floor((x - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((y - 970000.0) / 524288.0) AS BIGINT) AS j,
         (x - 3678500.0) / 524288.0 - floor((x - 3678500.0) / 524288.0) AS u,
         (y - 970000.0) / 524288.0 - floor((y - 970000.0) / 524288.0) AS v
  FROM pts
), enc AS (
  SELECT x, y,
         (({_L0_CASE} * 16
           + {_sql_morton_yx('CAST(floor(v * 4) AS BIGINT)',
                             'CAST(floor(u * 4) AS BIGINT)', 2)}) * 64 + 8) AS cell,
         {_L0_CASE} AS digit
  FROM c8
), agg AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS sy
  FROM enc WHERE digit >= 0 GROUP BY cell
), ctr AS (
  SELECT cell, n,
         CAST(sx AS DOUBLE) / n AS cx, CAST(sy AS DOUBLE) / n AS cy
  FROM agg
), snapc AS (
  SELECT cell, n, cx, cy,
         CAST(floor((cx - 3678500.0) / 524288.0) AS BIGINT) AS i,
         CAST(floor((cy - 970000.0) / 524288.0) AS BIGINT) AS j,
         (cx - 3678500.0) / 524288.0 - floor((cx - 3678500.0) / 524288.0) AS u,
         (cy - 970000.0) / 524288.0 - floor((cy - 970000.0) / 524288.0) AS v
  FROM ctr
)
SELECT cell, n, round(cx, 6) AS cx, round(cy, 6) AS cy,
       CASE WHEN {_L0_CASE} >= 0
            THEN (({_L0_CASE} * 256
                  + {_sql_morton_yx('CAST(floor(v * 16) AS BIGINT)',
                                    'CAST(floor(u * 16) AS BIGINT)', 4)}) * 64 + 12)
            ELSE -1 END AS snap_cell
FROM snapc
"""


# ---------------------------------------------------------------------------
# Voronoi / nearest-facility assignment (broadcast seeds, no join)
# ---------------------------------------------------------------------------

_VOR_NSEEDS = 20


def g_voronoi_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Assign every point to its nearest of ``_VOR_NSEEDS`` facility seeds
    (events 0..19's positions) — the Voronoi-partition / nearest-warehouse
    primitive.  The seed set is driver-sized, so the whole assignment is ONE
    narrow projection over a broadcast literal array (array_min over
    (dist, seed) structs — no join, no shuffle until the per-seed rollup);
    sqrt is IEEE-correctly-rounded, so distances hash identically.  Ties
    break to the lower seed id on both engines."""
    pts = _event_points(spark, sf)
    seeds = [(int(s), float(grids.L0_ORIGIN_X + (s * 2654435761) % 2097152),
              float(grids.L0_ORIGIN_Y + (s * 40503) % 2621440))
             for s in range(_VOR_NSEEDS)]
    pairs = F.array(*[
        F.struct(
            F.sqrt((F.col("x") - F.lit(sx)) * (F.col("x") - F.lit(sx))
                   + (F.col("y") - F.lit(sy)) * (F.col("y") - F.lit(sy)))
            .alias("d"),
            F.lit(sid).alias("sid"))
        for sid, sx, sy in seeds])
    best = F.array_min(pairs)
    return (pts.select("event_id", best["sid"].cast("long").alias("seed"),
                       F.round(best["d"], 3).alias("dist"))
               .groupBy("seed")
               .agg(F.count("*").alias("n_points"),
                    F.round(F.max("dist"), 3).alias("max_dist"),
                    F.min("event_id").alias("min_ev")))


SQL_VORONOI = f"""
WITH pts AS (
  SELECT event_id, {_XENG} AS x, {_YENG} AS y FROM events
), seeds AS (
  SELECT s AS sid,
         3678500.0 + ((s * 2654435761) % 2097152) AS sx,
         970000.0 + ((s * 40503) % 2621440) AS sy
  FROM (SELECT unnest(range(0, {_VOR_NSEEDS})) AS s)
), scored AS (
  SELECT p.event_id, s.sid,
         sqrt((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) AS d
  FROM pts p CROSS JOIN seeds s
), best AS (
  SELECT event_id, sid AS seed, round(d, 3) AS dist
  FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                     ORDER BY d, sid) AS rn
        FROM scored) WHERE rn = 1
)
SELECT seed, CAST(count(*) AS BIGINT) AS n_points,
       round(max(dist), 3) AS max_dist, min(event_id) AS min_ev
FROM best GROUP BY seed
"""


QUERIES = {
    "geo_cell_assign": (g_cell_assign_parity, SQL_CELL_ASSIGN),
    "geo_tile_assign": (g_tile_assign, SQL_TILE),
    "geo_cover_compact": (g_cover_compact, SQL_COVER_COMPACT),
    "geo_segment_cells": (g_segment_cells, SQL_SEGMENT_CELLS),
    "geo_bbox_query": (g_bbox_query, SQL_BBOX_QUERY),
    "geo_pyramid_rollup": (g_pyramid_rollup, SQL_PYRAMID),
    "geo_region_centroid": (g_region_centroid, SQL_REGION_CENTROID),
    "geo_voronoi_assign": (g_voronoi_assign, SQL_VORONOI),
}
