"""Geospatial surface: convex hull — two-phase distributed monotone chain.

Why it exists: the convex hull is the remaining classic computational-
geometry primitive the registry lacked (alongside PIP, clipping,
Douglas-Peucker, segment intersection, skyline, STR packing); production
uses are coverage footprints, dissolve outlines, and bounding polygons
for tile/partition pruning.

Decomposition (the textbook distributed hull): CH(A ∪ B) = CH(CH(A) ∪
CH(B)) — the hull operator is a SEMIGROUP on point sets, so
  1. each partition computes its LOCAL hull with Andrew's monotone chain
     (an applyInPandas over a hash-assigned group key — int64 numpy cross
     products, no floats),
  2. the union of local hulls (expected O(P·h), h = hull size — tiny) is
     re-hulled in one final group.
This is the map-side-combine shape for a holistic operator: the fact
table is touched once, partition-locally; only candidate vertices — the
points that survive a local hull — ever shuffle.

Semantics: hull VERTICES only — collinear boundary points and interior
points are excluded (strict-turn pops), over the DISTINCT point set.

Exactness: all turn tests are int64 cross products on integer
coordinates (|coord| < 2^12, |cross| < 2^26); the output is the vertex
SET, so no angular ordering (and no atan2 floats) crosses engines.

Scale design (10^12 points): phase 1 is embarrassingly parallel and
output-bounded by O(h) per partition (h ~ log n for scattered points);
phase 2's single group is P·h rows — dimension-sized by construction,
the same "bounded candidates to one combiner" contract as the IVF
centroid build (operators/ann.py).  Nothing fact-sized shuffles.

Oracle (different algorithm entirely): the SUPPORTING-EDGE criterion —
p is a hull vertex iff some directed edge (p, q) has EVERY other point r
strictly to its left or on the closed segment [p, q].  Every vertex's
CCW-next vertex is such a witness; a collinear boundary point always
sees the edge's far vertex fail the segment test, and an interior point
always has someone to the right (proof sketch in tests).  That is one
O(n^2) pair scan x O(n) bool_and in SQL — brute force, sharing zero
structure with monotone chain.

Corpus: 240 md5-derived integer points in [0, 4096)^2 plus 5 planted
far-corner points, one of them the exact midpoint of the hull's top edge
(so the vertex-only semantics is actually exercised), deduped in both
engines.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NPTS = 240
_PARTS = 8
# planted far corners; (5000, 9000) sits exactly midway on the hull's top
# edge (1000, 9000)-(9000, 9000) => collinear boundary point, must be
# excluded by the vertex-only semantics
_PLANT = [(9000, 1000), (9000, 9000), (1000, 9000), (5000, 9000),
          (1000, 1000)]


def _points(spark: SparkSession) -> DataFrame:
    df = spark.range(_NPTS)

    def hx(sfx: str):
        h = F.md5(F.concat_ws("_", F.lit("hull"), F.col("id"), F.lit(sfx)))
        return F.pmod(F.conv(F.substring(h, 1, 3), 16, 10).cast("long"),
                      F.lit(4096))

    rnd = df.select(hx("x").alias("x"), hx("y").alias("y"))
    plant = spark.createDataFrame(_PLANT, "x long, y long")
    return rnd.union(plant).distinct()


def _chain(xs, ys):
    """Monotone chain on int64 arrays -> list[(x, y)] hull vertices."""
    pts = sorted(set(zip((int(a) for a in xs), (int(b) for b in ys))))
    if len(pts) <= 2:
        return pts

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                    (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                    - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(list(reversed(pts)))
    return lower[:-1] + upper[:-1]


def _hull_udf(pdf: pd.DataFrame) -> pd.DataFrame:
    hull = _chain(pdf["x"].to_numpy(), pdf["y"].to_numpy())
    return pd.DataFrame(hull, columns=["x", "y"])


def _hull_points(spark: SparkSession) -> DataFrame:
    """Unordered hull vertex set via local-hull -> merge-hull."""
    pts = _points(spark)
    keyed = pts.withColumn("g", F.pmod(F.hash("x", "y"), F.lit(_PARTS)))
    local = keyed.groupBy("g").applyInPandas(
        lambda _, pdf: _hull_udf(pdf), "x long, y long")
    return local.withColumn("g", F.lit(0)).groupBy("g").applyInPandas(
        lambda _, pdf: _hull_udf(pdf), "x long, y long")


def g_convex_hull(spark: SparkSession, sf: str) -> DataFrame:
    """Hull vertex set (x, y); the sort is presentation-only."""
    return _hull_points(spark).orderBy("x", "y")


_SQL_PTS = f"""
  SELECT DISTINCT x, y FROM (
    SELECT CAST(concat('0x', substring(md5(
             concat('hull_', CAST(range AS VARCHAR), '_x')), 1, 3)) AS BIGINT)
             % 4096 AS x,
           CAST(concat('0x', substring(md5(
             concat('hull_', CAST(range AS VARCHAR), '_y')), 1, 3)) AS BIGINT)
             % 4096 AS y
    FROM range({_NPTS})
    UNION ALL
    SELECT * FROM (VALUES {', '.join(f'({x}, {y})' for x, y in _PLANT)})
  )"""


# the ONE SQL hull derivation (supporting-edge criterion), shared by the
# hull entry and the min-rectangle entry as a CTE block ending in `hull`
_SQL_HULL_CTES = f"""pts AS MATERIALIZED ({_SQL_PTS}
), ids AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY x, y) AS id, x, y FROM pts
), edge AS (
  -- supporting-edge criterion: (p,q) with every r strictly left or on
  -- the closed segment [p,q]
  SELECT p.id AS pid
  FROM ids p
  JOIN ids q ON q.id <> p.id
  JOIN ids r ON r.id <> p.id AND r.id <> q.id
  GROUP BY p.id, q.id, p.x, p.y, q.x, q.y
  HAVING bool_and(
      (q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) > 0
      OR ((q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) = 0
          AND r.x BETWEEN least(p.x, q.x) AND greatest(p.x, q.x)
          AND r.y BETWEEN least(p.y, q.y) AND greatest(p.y, q.y)))
), hull AS MATERIALIZED (
  SELECT DISTINCT i.x, i.y
  FROM ids i JOIN edge e ON e.pid = i.id
)"""

SQL_CONVEX_HULL = f"""
WITH {_SQL_HULL_CTES}
SELECT x, y FROM hull
ORDER BY x, y
"""


def g_diameter(spark: SparkSession, sf: str) -> DataFrame:
    """Farthest-pair (diameter) of the point set: one row
    (d2, x1, y1, x2, y2), pair lex-ordered and lex-min among ties.

    Every maximizer of squared distance is a hull VERTEX (d2 is strictly
    convex along any segment, so a boundary non-vertex or interior point
    is strictly beaten by an endpoint of its containing segment) — so the
    pair search runs on the two-phase hull's candidate set, which is
    dimension-sized no matter how large the input: the 10^12-point
    diameter costs ONE hull reduction (checkpointed — two downstream
    branches consume it, and an uncached hull would re-run the phase-1
    fact scan per branch) plus an O(h^2) literal join."""
    hull = _hull_points(spark).localCheckpoint(eager=True)
    a = hull.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = hull.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    pairs = (a.join(b, (F.col("x1") < F.col("x2"))
                    | ((F.col("x1") == F.col("x2"))
                       & (F.col("y1") < F.col("y2"))))
             .withColumn("d2", (F.col("x2") - F.col("x1"))
                         * (F.col("x2") - F.col("x1"))
                         + (F.col("y2") - F.col("y1"))
                         * (F.col("y2") - F.col("y1"))))
    mx = pairs.groupBy().agg(F.max("d2").alias("d2"))
    return (pairs.join(F.broadcast(mx), "d2")
            .groupBy("d2")
            .agg(F.min(F.struct("x1", "y1", "x2", "y2")).alias("p"))
            .select("d2", "p.x1", "p.y1", "p.x2", "p.y2"))


SQL_DIAMETER = f"""
WITH pts AS MATERIALIZED ({_SQL_PTS}
), pairs AS (
  -- brute force over ALL distinct pairs — the oracle does not know the
  -- maximizers are hull vertices
  SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2,
         (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2
  FROM pts a JOIN pts b ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)
), mx AS (SELECT max(d2) AS d2 FROM pairs)
SELECT d2, min(struct_pack(x1 := x1, y1 := y1, x2 := x2, y2 := y2)).x1 AS x1,
       min(struct_pack(x1 := x1, y1 := y1, x2 := x2, y2 := y2)).y1 AS y1,
       min(struct_pack(x1 := x1, y1 := y1, x2 := x2, y2 := y2)).x2 AS x2,
       min(struct_pack(x1 := x1, y1 := y1, x2 := x2, y2 := y2)).y2 AS y2
FROM pairs JOIN mx USING (d2) GROUP BY d2
"""


def min_rect(hull: DataFrame) -> DataFrame:
    """Minimum-area enclosing rectangle of a hull-vertex DataFrame (x, y)
    -> one row (area, px, py, qx, qy, wpar, wper, len2).

    Rotating-calipers THEOREM as the spec: the minimum rectangle has a side
    collinear with a hull edge, so enumerating every lex-ordered hull
    VERTEX PAIR as a candidate direction is a superset of the edge
    directions — every candidate is a valid enclosing rectangle, the true
    minimum is among them, hence min-over-candidates IS the minimum (and no
    edge-adjacency/angular-ordering computation is needed).  All projection
    extents are exact int64 (par = d·v, perp = d×v; widths multiply within
    int64 at this coordinate range); the ONLY float is one int64->double
    cast + one IEEE division per candidate, identical in both engines, and
    the argmin is a struct-min over (area, pair, widths) so parallel
    same-area directions resolve identically cross-engine.

    Scale: both join sides are the hull candidate set — dimension-sized no
    matter the input (the g_diameter contract); the h^2 x h expansion is
    O(h^3) on tens of vertices, nothing fact-sized."""
    a = hull.select(F.col("x").alias("px"), F.col("y").alias("py"))
    b = hull.select(F.col("x").alias("qx"), F.col("y").alias("qy"))
    dirs = (a.join(b, (F.col("px") < F.col("qx"))
                   | ((F.col("px") == F.col("qx"))
                      & (F.col("py") < F.col("qy"))))
             .select("px", "py", "qx", "qy",
                     (F.col("qx") - F.col("px")).alias("dx"),
                     (F.col("qy") - F.col("py")).alias("dy"))
             .withColumn("len2", F.col("dx") * F.col("dx")
                         + F.col("dy") * F.col("dy")))
    v = hull.select(F.col("x").alias("vx"), F.col("y").alias("vy"))
    par = F.col("dx") * F.col("vx") + F.col("dy") * F.col("vy")
    per = F.col("dx") * F.col("vy") - F.col("dy") * F.col("vx")
    ext = (dirs.crossJoin(v)
           .groupBy("px", "py", "qx", "qy", "len2")
           .agg((F.max(par) - F.min(par)).alias("wpar"),
                (F.max(per) - F.min(per)).alias("wper")))
    cand = ext.select(
        ((F.col("wpar") * F.col("wper")).cast("double")
         / F.col("len2").cast("double")).alias("area"),
        "px", "py", "qx", "qy", "wpar", "wper", "len2")
    s = cand.groupBy().agg(F.min(F.struct(
        "area", "px", "py", "qx", "qy", "wpar", "wper", "len2")).alias("s"))
    return s.select("s.area", "s.px", "s.py", "s.qx", "s.qy",
                    "s.wpar", "s.wper", "s.len2")


def g_min_rect(spark: SparkSession, sf: str) -> DataFrame:
    """Minimum-area oriented bounding rectangle of the hull corpus."""
    hull = _hull_points(spark).localCheckpoint(eager=True)
    return min_rect(hull)


SQL_MIN_RECT = f"""
WITH {_SQL_HULL_CTES}, dirs AS (
  SELECT a.x AS px, a.y AS py, b.x AS qx, b.y AS qy,
         b.x - a.x AS dx, b.y - a.y AS dy,
         (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS len2
  FROM hull a JOIN hull b
    ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)
), ext AS (
  SELECT d.px, d.py, d.qx, d.qy, d.len2,
         max(d.dx * v.x + d.dy * v.y) - min(d.dx * v.x + d.dy * v.y) AS wpar,
         max(d.dx * v.y - d.dy * v.x) - min(d.dx * v.y - d.dy * v.x) AS wper
  FROM dirs d, hull v
  GROUP BY d.px, d.py, d.qx, d.qy, d.len2
), cand AS (
  SELECT CAST(wpar * wper AS DOUBLE) / CAST(len2 AS DOUBLE) AS area,
         px, py, qx, qy, wpar, wper, len2
  FROM ext
), m AS (
  SELECT min(struct_pack(area := area, px := px, py := py, qx := qx,
                         qy := qy, wpar := wpar, wper := wper,
                         len2 := len2)) AS s
  FROM cand
)
SELECT s.area AS area, s.px AS px, s.py AS py, s.qx AS qx, s.qy AS qy,
       s.wpar AS wpar, s.wper AS wper, s.len2 AS len2
FROM m
"""


QUERIES = {
    "geo_convex_hull": (g_convex_hull, SQL_CONVEX_HULL),
    "geo_diameter": (g_diameter, SQL_DIAMETER),
    "geo_min_rect": (g_min_rect, SQL_MIN_RECT),
}
