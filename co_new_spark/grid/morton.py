"""Bit-interleave (Morton / ggeohash) kernels, numpy-vectorized on uint64.

Semantics pinned by the reference's encode asserts
(``/root/reference/src/assert/gridLib.sql:6-11``) and the grid spec
(``/root/reference/README.md:51``: recursive 4-way partition, Morton order).

Convention: a cell's bit string is MSB-first binary subdivision of the bbox;
the *first* axis is the axis of bit 0 (x for Grid A, y for Grid B refinement —
see grids.py).  ``interleave(first, second, n)`` packs an ``n``-bit stream
``f s f s ...``; when ``n`` is odd the first axis has one extra (trailing) bit.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)
_M32 = np.uint64(0x00000000FFFFFFFF)

_S1, _S2, _S4, _S8, _S16 = (np.uint64(s) for s in (1, 2, 4, 8, 16))
ONE = np.uint64(1)


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread lower 32 bits of uint64 to even bit positions (0,2,4,...)."""
    v = v & _M32
    v = (v | (v << _S16)) & _M16
    v = (v | (v << _S8)) & _M8
    v = (v | (v << _S4)) & _M4
    v = (v | (v << _S2)) & _M2
    v = (v | (v << _S1)) & _M1
    return v


def _squash(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread: collect even bit positions into lower 32 bits."""
    v = v & _M1
    v = (v | (v >> _S1)) & _M2
    v = (v | (v >> _S2)) & _M4
    v = (v | (v >> _S4)) & _M8
    v = (v | (v >> _S8)) & _M16
    v = (v | (v >> _S16)) & _M32
    return v


def interleave(first: np.ndarray, second: np.ndarray, nbits: int) -> np.ndarray:
    """Pack integer axis coords into an MSB-first alternating bit stream.

    ``first`` holds ceil(nbits/2) bits, ``second`` floor(nbits/2).
    Stream order: f s f s ... ; returned as uint64 with stream bit 0 at
    integer bit (nbits-1).
    """
    first = np.asarray(first, dtype=np.uint64)
    second = np.asarray(second, dtype=np.uint64)
    if nbits % 2 == 0:
        # f at odd (upper) positions of each pair
        return (_spread(first) << _S1) | _spread(second)
    # odd: first axis bit m sits at integer position 2m; second at 2m+1
    return _spread(first) | (_spread(second) << _S1)


def deinterleave(code: np.ndarray, nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`interleave` -> (first, second) axis ints."""
    code = np.asarray(code, dtype=np.uint64)
    if nbits % 2 == 0:
        return _squash(code >> _S1), _squash(code)
    return _squash(code), _squash(code >> _S1)


def n_first(nbits: int) -> int:
    return (nbits + 1) // 2


def n_second(nbits: int) -> int:
    return nbits // 2
