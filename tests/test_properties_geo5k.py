"""Hypothesis properties for the round-5k geometry kernels (pure python
mirrors — the same code the Spark-parity tests pin the engines to)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_geo_hull import _chain
from tests.test_geo_sjoin import _classify

_pt = st.tuples(st.integers(0, 400), st.integers(0, 400))
_seg = st.tuples(st.just(0), st.integers(-200, 200), st.integers(-200, 200),
                 st.integers(-200, 200), st.integers(-200, 200))


def _orient(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


@settings(max_examples=300, deadline=None)
@given(st.sets(_pt, min_size=1, max_size=60))
def test_hull_contains_all_points_and_vertices_are_extreme(pts):
    hull = _chain([p[0] for p in pts], [p[1] for p in pts])
    hs = set(hull)
    assert hs <= pts
    if len(hull) >= 3:
        # hull is CCW (lower then upper chain): every point is left-of or
        # on every directed hull edge
        for i in range(len(hull)):
            a, b = hull[i], hull[(i + 1) % len(hull)]
            for p in pts:
                assert _orient(a, b, p) >= 0
        # vertex-only: no vertex is collinear-between its neighbors
        for i in range(len(hull)):
            a, b, c = hull[i - 1], hull[i], hull[(i + 1) % len(hull)]
            assert _orient(a, b, c) != 0
    # extremes are always vertices
    assert min(pts) in hs and max(pts) in hs


@settings(max_examples=300, deadline=None)
@given(st.sets(_pt, min_size=1, max_size=60),
       st.lists(st.integers(0, 2), min_size=60, max_size=60))
def test_hull_merge_equals_direct(pts, assign):
    direct = sorted(_chain([p[0] for p in pts], [p[1] for p in pts]))
    parts = [set(), set(), set()]
    for i, p in enumerate(sorted(pts)):
        parts[assign[i]].add(p)
    cand = set()
    for part in parts:
        if part:
            cand |= set(_chain([p[0] for p in part], [p[1] for p in part]))
    assert sorted(_chain([p[0] for p in cand],
                         [p[1] for p in cand])) == direct


def _on_closed_segment(a, b, p):
    return (_orient(a, b, p) == 0
            and min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))


def _param_hit(a, b):
    """Rational-arithmetic ground truth: do segments a, b intersect?"""
    (_, x1, y1, x2, y2), (_, x3, y3, x4, y4) = a, b
    from fractions import Fraction

    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if d != 0:
        t = Fraction((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3), d)
        u = Fraction((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1), d)
        return 0 <= t <= 1 and 0 <= u <= 1
    # parallel: intersect iff collinear and spans overlap
    if _orient((x1, y1), (x2, y2), (x3, y3)) != 0:
        return False
    for p in ((x1, y1), (x2, y2)):
        if _on_closed_segment((x3, y3), (x4, y4), p):
            return True
    for p in ((x3, y3), (x4, y4)):
        if _on_closed_segment((x1, y1), (x2, y2), p):
            return True
    # degenerate: both zero-length and equal handled above; a zero-length
    # segment inside the other is covered by the on-segment checks
    return False


@settings(max_examples=500, deadline=None)
@given(_seg, _seg)
def test_orientation_predicate_equals_parametric_truth(a, b):
    got = _classify(a, b) is not None
    assert got == _param_hit(a, b)


@settings(max_examples=300, deadline=None)
@given(st.sets(_pt, min_size=2, max_size=50))
def test_skyline_bucket_decomposition_equals_brute(pts):
    # mirror of geo_skyline's threshold+in-bucket plan, minimizing (x, y)
    BW = 64
    brute = {p for p in pts
             if not any(q != p and q[0] <= p[0] and q[1] <= p[1]
                        for q in pts)}
    from collections import defaultdict
    buckets = defaultdict(list)
    for x, y in pts:
        buckets[x // BW].append((x, y))
    miny, acc = {}, None
    for g in sorted(buckets):
        miny[g] = acc  # EXCLUSIVE prefix min
        m = min(y for _, y in buckets[g])
        acc = m if acc is None else min(acc, m)
    out = set()
    for g, rows in buckets.items():
        thr = miny[g]
        surv = [p for p in rows if thr is None or p[1] < thr]
        pm = None
        for p in sorted(surv):
            if pm is None or p[1] < pm:
                out.add(p)
            pm = p[1] if pm is None else min(pm, p[1])
    assert out == brute
