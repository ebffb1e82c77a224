"""Tests: shoelace area (A24) + Sutherland–Hodgman rect clipping (A19)."""

import numpy as np
from pyspark.sql import functions as F

from co_new_spark.grid.geometry import clip_area_to_rects, clip_to_rect, shoelace_area

SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])


def test_shoelace_basics():
    assert shoelace_area(SQUARE) == 16.0
    tri = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    assert shoelace_area(tri) == 0.5
    assert shoelace_area(np.array([[0.0, 0.0], [1.0, 1.0]])) == 0.0
    # orientation-insensitive
    assert shoelace_area(SQUARE[::-1]) == 16.0


def test_clip_identity_and_disjoint():
    inside = clip_to_rect(SQUARE, -1, -1, 5, 5)
    assert shoelace_area(inside) == 16.0
    assert len(clip_to_rect(SQUARE, 10, 10, 12, 12)) == 0


def test_clip_partial():
    half = clip_to_rect(SQUARE, 2, 0, 6, 4)
    assert shoelace_area(half) == 8.0
    corner = clip_to_rect(SQUARE, 3, 3, 9, 9)
    assert shoelace_area(corner) == 1.0


def test_clip_partition_sums_to_total():
    """Clipping a random polygon by a grid of rects partitions its area."""
    rng = np.random.default_rng(5)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
    ring = np.stack([3 + 2.5 * np.cos(ang), 3 + 2.5 * np.sin(ang)], axis=1)
    total = shoelace_area(ring)
    boxes = [(x, y, x + 1.0, y + 1.0) for x in range(7) for y in range(7)]
    areas = clip_area_to_rects(ring, np.array(boxes, dtype=float) - 0.5)
    assert abs(areas.sum() - total) < 1e-9 * max(total, 1)


def test_concave_polygon_clip():
    # L-shaped (concave) polygon, area 3
    ell = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=float)
    assert shoelace_area(ell) == 3.0
    left = clip_to_rect(ell, 0, 0, 1, 2)
    assert shoelace_area(left) == 2.0
    lowright = clip_to_rect(ell, 1, 0, 2, 2)
    assert shoelace_area(lowright) == 1.0


def test_coverage_clip_query_partitions_polygon(spark):
    """Sum of per-cell clip areas over the full grid == polygon area."""
    from co_new_spark.queries.geo_algebra import _POLY, g_coverage_clip

    out = g_coverage_clip(spark, "/root/testdata/sf0.001")
    got = out.agg(F.sum("clip_area")).first()[0]
    exact = shoelace_area(_POLY)
    assert abs(got - exact) / exact < 1e-6
    assert out.count() > 10  # polygon spans many cells


def test_polygon_cover_generation(spark):
    """§3.2 cover production: full+border cells partition the polygon area,
    and interior points always have a cover ancestor (citycover semantics)."""
    import numpy as np

    from co_new_spark.functions import geo
    from co_new_spark.grid import cells as ncells
    from co_new_spark.operators.cover_gen import polygon_cover
    from co_new_spark.queries.geo_algebra import _POLY

    cov = polygon_cover(spark, _POLY, base_depth=8, max_depth=12).cache()
    rows = cov.collect()
    total = sum(r.area_m2 for r in rows)
    exact = shoelace_area(_POLY)
    assert abs(total - exact) / exact < 1e-9

    # full cells are disjoint (no cell is an ancestor of another full cell)
    full = sorted(r.cell for r in rows if r.kind == "full")
    iv = [ncells.interval(np.array([c]))[0][0] for c in full]
    hi = [ncells.interval(np.array([c]))[1][0] for c in full]
    order = np.argsort(iv)
    for a, b in zip(order[:-1], order[1:]):
        assert hi[a] <= iv[b], "overlapping full cells"

    # interior points resolve to some cover cell by prefix ancestry
    pts = np.array([[4.8e6, 2.0e6], [5.0e6, 2.1e6], [4.6e6, 1.9e6]])
    df = spark.createDataFrame([(float(x), float(y)) for x, y in pts], ["x", "y"]) \
        .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 22))
    pcells = [r.cell for r in df.collect()]
    allc = np.array([r.cell for r in rows])
    for pc in pcells:
        anc = ncells.contains(allc, np.full(allc.shape, pc))
        assert anc.any()
    cov.unpersist()
