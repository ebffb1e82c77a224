"""Douglas–Peucker distributed simplification vs a full recursive python DP.

Two claims, which together pin the engine to textbook DP:
  1. the engine's depth-_R unrolled rounds equal a python mirror with the
     SAME depth bound (algebra parity), and
  2. on this corpus the depth bound is not binding — the unbounded recursive
     DP gives the identical kept set (so the engine IS exact DP here).
"""

import hashlib

import pytest

from co_new_spark.queries.geo_simplify import _NP, _NT, _R, _TOL


def _mirror_pts():
    """{t: [(x, y), ...]} — the md5 random-walk corpus, mirrored."""
    out = {}
    for t in range(_NT):
        x = y = 0
        pts = []
        for k in range(_NP):
            dx = int(hashlib.md5(f"{t}_{k}_x".encode()).hexdigest()[:2], 16) - 128
            dy = int(hashlib.md5(f"{t}_{k}_y".encode()).hexdigest()[:2], 16) - 128
            x, y = x + dx, y + dy
            pts.append((x, y))
        out[t] = pts
    return out


def _dp_kept(pts, depth):
    """Kept vertex indices, depth-limited DP (depth=None -> unbounded)."""
    kept = {0, len(pts) - 1}

    def split(i, j, d):
        if j <= i + 1 or (depth is not None and d >= depth):
            return
        xa, ya = pts[i]
        xb, yb = pts[j]
        dx, dy = xb - xa, yb - ya
        len2 = dx * dx + dy * dy
        best_v, best_k = -1, None
        for k in range(i + 1, j):
            px, py = pts[k][0] - xa, pts[k][1] - ya
            if len2 == 0:
                v, th = px * px + py * py, _TOL * _TOL
            else:
                c = dx * py - dy * px
                v, th = c * c, _TOL * _TOL * len2
            if v > best_v:
                best_v, best_k, best_th = v, k, th
        if best_k is not None and best_v > best_th:
            kept.add(best_k)
            split(i, best_k, d + 1)
            split(best_k, j, d + 1)

    split(0, len(pts) - 1, 0)
    return kept


@pytest.fixture(scope="module")
def mirror():
    return _mirror_pts()


def test_depth_bound_not_binding(mirror):
    # unbounded recursion == depth-_R recursion on every trajectory, so the
    # engine's fixed _R rounds implement EXACT Douglas–Peucker here.
    for t, pts in mirror.items():
        assert _dp_kept(pts, None) == _dp_kept(pts, _R), f"t={t}"


def test_engine_matches_recursive_dp(spark, mirror):
    from co_new_spark.queries.geo_simplify import g_polyline_simplify

    got = {}
    for r in g_polyline_simplify(spark, "/root/testdata/sf0.001").collect():
        got.setdefault(r.t, set()).add(r.idx)
        assert (r.x, r.y) == mirror[r.t][r.idx]
    want = {t: _dp_kept(pts, None) for t, pts in mirror.items()}
    assert got == want


def test_some_trajectory_actually_simplifies(mirror):
    # guard against a degenerate corpus where DP keeps everything or only
    # endpoints — both extremes would make the parity test vacuous.
    sizes = [len(_dp_kept(p, None)) for p in mirror.values()]
    assert any(2 < s < _NP for s in sizes)
    assert any(s > 3 for s in sizes)
