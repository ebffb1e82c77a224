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
    """One Sutherland–Hodgman pass: keep points with coord <=/>= bound.

    Fully vectorized over the vertex array: per edge, emit the current
    vertex (if inside) then the boundary intersection (if the edge crosses),
    preserving edge order via an interleaved (n, 2, 2) slot layout.
    """
    n = len(poly)
    if n == 0:
        return poly
    cur = poly
    nxt = np.roll(poly, -1, axis=0)
    if keep_leq:
        cin = cur[:, axis] <= bound
        nin = nxt[:, axis] <= bound
    else:
        cin = cur[:, axis] >= bound
        nin = nxt[:, axis] >= bound
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (bound - cur[:, axis]) / (nxt[:, axis] - cur[:, axis])
        inter = cur + t[:, None] * (nxt - cur)  # nan/inf slots are masked out
    slots = np.stack([cur, inter], axis=1)          # (n, 2, 2): vertex, crossing
    mask = np.stack([cin, cin != nin], axis=1)       # emit flags, edge order kept
    return slots.reshape(-1, 2)[mask.reshape(-1)]


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
    """Area of ring ∩ each box; boxes (n, 4) as (xmin, ymin, xmax, ymax).

    Fast paths: bbox-disjoint boxes are 0 without clipping, and boxes that
    contain the whole ring bbox get the full polygon area — only boxes
    straddling the boundary pay the 4-pass clip.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64)
    rx0, ry0 = r.min(axis=0)
    rx1, ry1 = r.max(axis=0)
    out = np.zeros(len(boxes))
    disjoint = (boxes[:, 2] <= rx0) | (boxes[:, 0] >= rx1) \
        | (boxes[:, 3] <= ry0) | (boxes[:, 1] >= ry1)
    contains_ring = (boxes[:, 0] <= rx0) & (boxes[:, 1] <= ry0) \
        & (boxes[:, 2] >= rx1) & (boxes[:, 3] >= ry1)
    full = None
    for k in np.nonzero(~disjoint)[0]:
        if contains_ring[k]:
            if full is None:
                full = shoelace_area(r)
            out[k] = full
        else:
            out[k] = shoelace_area(clip_to_rect(r, *boxes[k]))
    return out
