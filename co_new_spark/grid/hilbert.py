"""Hilbert-curve indexing, numpy-vectorized — the reference's open decision #6.

/root/reference/README.md ("Decisiones abiertas" item 6) leaves Morton vs
Hilbert open for the refinement ordering; the adopted grids use Morton
(README.md:51), which the engine implements as the default (grid/morton.py).
This module provides the Hilbert alternative as an ENGINE CAPABILITY so a
jurisdiction choosing Hilbert locality (better worst-case neighbor distance
for range scans) can switch without a new engine: the classic iterative
xy<->d mapping (Hamilton's / Wikipedia's rot-swap formulation), vectorized
over uint64 lattice coordinates.

Properties pinned by tests/test_cover_sql.py::test_hilbert_properties:
bijectivity over the full 2^k x 2^k lattice and unit-step adjacency
(consecutive d values are 4-neighbor lattice moves — the locality Morton
lacks at quadrant boundaries).
"""

from __future__ import annotations

import numpy as np

U = np.uint64
ONE = U(1)


def xy_to_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """(x, y) lattice coords -> Hilbert index d on the 2^order lattice."""
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    n = ONE << U(order)
    s = n >> ONE
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((U(3) * rx) ^ ry)
        # rotate quadrant (canonical formulation: reflection uses n here)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, n - ONE - x, x)
        y_f = np.where(flip, n - ONE - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= ONE
    return d


def d_to_xy(d: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert index d -> (x, y) lattice coords on the 2^order lattice."""
    t = np.asarray(d, dtype=np.uint64).copy()
    x = np.zeros(t.shape, dtype=np.uint64)
    y = np.zeros(t.shape, dtype=np.uint64)
    s = ONE
    n = ONE << U(order)
    while s < n:
        rx = ONE & (t // U(2))
        ry = ONE & (t ^ rx)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - ONE - x, x)
        y_f = np.where(flip, s - ONE - y, y)
        x_r = np.where(swap, y_f, x_f)
        y_r = np.where(swap, x_f, y_f)
        x = x_r + s * rx
        y = y_r + s * ry
        t //= U(4)
        s <<= ONE
    return x, y
