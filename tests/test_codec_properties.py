"""Hypothesis property tests for the cell-ID codecs and cell algebra."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from co_new_spark.grid import cells as ncells
from co_new_spark.grid.codec import (
    b16h_decode, b16h_encode, b32nvu_decode, b32nvu_encode,
)


@st.composite
def bits_nbits(draw, max_bits=57, multiple_of=1):
    nb = draw(st.integers(1, max_bits // multiple_of)) * multiple_of
    bits = draw(st.integers(0, (1 << nb) - 1))
    return bits, nb


@settings(max_examples=200, deadline=None)
@given(bits_nbits(max_bits=55, multiple_of=5))
def test_b32nvu_roundtrip_property(bn):
    bits, nb = bn
    code = b32nvu_encode(np.array([bits], dtype=np.uint64), nb)
    back, back_nb = b32nvu_decode(code)
    assert int(back[0]) == bits and int(back_nb[0]) == nb


@settings(max_examples=300, deadline=None)
@given(bits_nbits(max_bits=57))
def test_b16h_roundtrip_property(bn):
    bits, nb = bn
    code = b16h_encode(np.array([bits], dtype=np.uint64), nb)
    back, back_nb = b16h_decode(code)
    assert int(back[0]) == bits and int(back_nb[0]) == nb, code


@settings(max_examples=200, deadline=None)
@given(bits_nbits(max_bits=40), st.integers(1, 6))
def test_parent_contains_property(bn, k):
    bits, nb = bn
    cell = ncells.pack(np.array([bits], dtype=np.uint64), np.array([nb]))
    k = min(k, nb)
    par = ncells.parent(cell, k)
    assert ncells.contains(par, cell)[0]
    lo_p, hi_p = ncells.interval(par)
    lo_c, hi_c = ncells.interval(cell)
    assert lo_p[0] <= lo_c[0] and hi_c[0] <= hi_p[0]


@settings(max_examples=100, deadline=None)
@given(bits_nbits(max_bits=30))
def test_children_partition_parent_property(bn):
    bits, nb = bn
    cell = ncells.pack(np.array([bits], dtype=np.uint64), np.array([nb]))
    ch = ncells.children(cell, 2)[0]
    lo_p, hi_p = ncells.interval(cell)
    los, his = ncells.interval(ch)
    order = np.argsort(los)
    assert los[order][0] == lo_p[0] and his[order][-1] == hi_p[0]
    for a, b in zip(order[:-1], order[1:]):
        assert his[a] == los[b]  # contiguous, disjoint
