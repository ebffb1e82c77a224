"""Planar polygon geometry kernels: shoelace area (A24) and
Sutherland–Hodgman rectangle clipping (A19) — pure numpy, no GEOS.

Reference evidence: ``osmcode_decode_polyXY`` + ``ST_Area`` asserts
(/root/reference/src/assert/gridLib.sql:15-16) and the per-cell coverage
clips of /root/reference/data/grid256L0coverage.geojson (grid cells ∩
Colombia boundary).  Cells are axis-aligned rects, so clipping a boundary
polygon to a cell is the classic 4-halfplane Sutherland–Hodgman pass.
"""

from __future__ import annotations

import numpy as np


def shoelace_area(ring: np.ndarray) -> float:
    """Signed-area magnitude of a closed or open ring (n, 2)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) >= 2 and (r[0] == r[-1]).all():
        r = r[:-1]
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def _clip_halfplane(poly: np.ndarray, axis: int, bound: float, keep_leq: bool) -> np.ndarray:
    """One Sutherland–Hodgman pass: keep points with coord <=/>= bound."""
    if len(poly) == 0:
        return poly
    out: list[np.ndarray] = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        cin = (cur[axis] <= bound) if keep_leq else (cur[axis] >= bound)
        nin = (nxt[axis] <= bound) if keep_leq else (nxt[axis] >= bound)
        if cin:
            out.append(cur)
        if cin != nin:
            t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
            out.append(cur + t * (nxt - cur))
    return np.asarray(out, dtype=np.float64) if out else np.empty((0, 2))


def clip_to_rect(ring: np.ndarray, xmin: float, ymin: float,
                 xmax: float, ymax: float) -> np.ndarray:
    """Clip a (convex or concave, non-self-intersecting) ring to a rect.

    Returns the clipped OPEN ring (k, 2); empty when no overlap.  Concave
    subject polygons may yield degenerate connecting edges (standard S–H
    behavior); areas remain exact.
    """
    poly = np.asarray(ring, dtype=np.float64)
    if len(poly) >= 2 and (poly[0] == poly[-1]).all():
        poly = poly[:-1]
    poly = _clip_halfplane(poly, 0, xmax, True)
    poly = _clip_halfplane(poly, 0, xmin, False)
    poly = _clip_halfplane(poly, 1, ymax, True)
    poly = _clip_halfplane(poly, 1, ymin, False)
    return poly


def clip_area_to_rects(ring: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Area of ring ∩ each box; boxes (n, 4) as (xmin, ymin, xmax, ymax)."""
    boxes = np.asarray(boxes, dtype=np.float64)
    return np.array([
        shoelace_area(clip_to_rect(ring, *b)) for b in boxes
    ])
