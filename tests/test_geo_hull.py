"""Distributed two-phase hull vs direct hull + semigroup property."""

import hashlib
import random

import pytest

from co_new_spark.queries.geo_hull import _NPTS, _PLANT, _chain


def _corpus():
    pts = set()
    for i in range(_NPTS):
        x = int(hashlib.md5(f"hull_{i}_x".encode()).hexdigest()[:3], 16) % 4096
        y = int(hashlib.md5(f"hull_{i}_y".encode()).hexdigest()[:3], 16) % 4096
        pts.add((x, y))
    return pts | set(_PLANT)


def test_engine_matches_direct_hull(spark):
    from co_new_spark.queries.geo_hull import g_convex_hull

    pts = _corpus()
    want = sorted(_chain([p[0] for p in pts], [p[1] for p in pts]))
    got = sorted((r.x, r.y) for r in
                 g_convex_hull(spark, "/root/testdata/sf0.001").collect())
    assert got == want
    # planted collinear midpoint of the (1000,9000)-(9000,9000) top edge
    # must be on the boundary but NOT a vertex
    assert (5000, 9000) not in got
    assert (1000, 9000) in got and (9000, 9000) in got


def test_hull_is_a_semigroup_under_partitioning():
    # CH(A u B) == CH(CH(A) u CH(B)) for random splits — the algebraic
    # fact phase 1/phase 2 relies on.
    rng = random.Random(7)
    for _ in range(20):
        pts = {(rng.randrange(1000), rng.randrange(1000))
               for _ in range(rng.randrange(5, 120))}
        direct = sorted(_chain([p[0] for p in pts], [p[1] for p in pts]))
        parts = [set(), set(), set()]
        for p in pts:
            parts[rng.randrange(3)].add(p)
        cand = set()
        for part in parts:
            if part:
                cand |= set(_chain([p[0] for p in part],
                                   [p[1] for p in part]))
        merged = sorted(_chain([p[0] for p in cand], [p[1] for p in cand]))
        assert merged == direct


@pytest.mark.parametrize("pts,want", [
    # square + center + edge midpoint: vertices only
    ([(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0)],
     [(0, 0), (0, 4), (4, 0), (4, 4)]),
    # all collinear: endpoints only
    ([(0, 0), (1, 1), (2, 2), (3, 3)], [(0, 0), (3, 3)]),
    # duplicates collapse
    ([(0, 0), (0, 0), (1, 0), (0, 1)], [(0, 0), (0, 1), (1, 0)]),
    # two points
    ([(5, 5), (1, 2)], [(1, 2), (5, 5)]),
])
def test_chain_spec_vectors(pts, want):
    assert sorted(_chain([p[0] for p in pts], [p[1] for p in pts])) == want


def test_diameter_matches_brute_force(spark):
    from co_new_spark.queries.geo_hull import g_diameter

    pts = sorted(_corpus())
    best = None
    for i, p in enumerate(pts):
        for q in pts[i + 1:]:
            d2 = (q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2
            key = (-d2, p, q)
            if best is None or key < best:
                best = key
    r = g_diameter(spark, "/root/testdata/sf0.001").collect()
    assert len(r) == 1
    row = r[0]
    assert (row.d2, (row.x1, row.y1), (row.x2, row.y2)) == \
           (-best[0], best[1], best[2])


def _brute_min_rect_area(pts):
    """Exact rational minimum enclosing-rectangle area over ALL pair
    directions of ALL points (Fraction arithmetic — no hull, no doubles)."""
    from fractions import Fraction

    pts = sorted(set(pts))
    best = None
    for i, p in enumerate(pts):
        for q in pts[i + 1:]:
            dx, dy = q[0] - p[0], q[1] - p[1]
            par = [dx * v[0] + dy * v[1] for v in pts]
            per = [dx * v[1] - dy * v[0] for v in pts]
            a = Fraction((max(par) - min(par)) * (max(per) - min(per)),
                         dx * dx + dy * dy)
            if best is None or a < best:
                best = a
    return best


def test_min_rect_rotated_diamond(spark):
    # 45-degree square: the rotated rectangle (area 50) beats the
    # axis-aligned bbox (area 100) — rotation is load-bearing
    from co_new_spark.queries.geo_hull import min_rect

    hull = spark.createDataFrame(
        [(0, 5), (5, 0), (10, 5), (5, 10)], "x long, y long")
    r = min_rect(hull).collect()[0]
    from fractions import Fraction
    assert Fraction(r.wpar * r.wper, r.len2) == 50
    assert r.area == 50.0


def test_min_rect_matches_exact_brute_force(spark):
    # theorem check on random sets: hull-pair directions (engine) reach the
    # same exact minimum as all-pairs directions over all points (brute)
    import random
    from fractions import Fraction

    from co_new_spark.queries.geo_hull import min_rect

    rng = random.Random(20260821)
    for _ in range(3):
        pts = {(rng.randrange(200), rng.randrange(200))
               for _ in range(rng.randrange(6, 40))}
        hull = _chain([p[0] for p in pts], [p[1] for p in pts])
        if len(hull) < 2:
            continue
        hdf = spark.createDataFrame(hull, "x long, y long")
        r = min_rect(hdf).collect()[0]
        assert Fraction(r.wpar * r.wper, r.len2) == _brute_min_rect_area(pts)


def test_min_rect_entry_mirror(spark):
    # python mirror of the full entry pipeline: same hull, same lex-pair
    # enumeration, same double protocol, same struct-min
    from co_new_spark.queries.geo_hull import g_min_rect

    pts = _corpus()
    hull = _chain([p[0] for p in pts], [p[1] for p in pts])
    best = None
    for p in sorted(hull):
        for q in sorted(hull):
            if not (p < q):
                continue
            dx, dy = q[0] - p[0], q[1] - p[1]
            len2 = dx * dx + dy * dy
            par = [dx * v[0] + dy * v[1] for v in hull]
            per = [dx * v[1] - dy * v[0] for v in hull]
            wpar, wper = max(par) - min(par), max(per) - min(per)
            key = (float(wpar * wper) / float(len2), p[0], p[1], q[0], q[1],
                   wpar, wper, len2)
            if best is None or key < best:
                best = key
    r = g_min_rect(spark, "/root/testdata/sf0.001").collect()[0]
    assert (r.area, r.px, r.py, r.qx, r.qy, r.wpar, r.wper, r.len2) == best
