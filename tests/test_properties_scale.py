"""Hypothesis properties for the round-5f primitives — pure-Python mirrors
of the Spark-side arithmetic, so they run fast and explore corners the
fixture can't: Misra-Gries superset guarantee on random streams, Bloom
no-false-negative on random key sets, HRW minimal disruption for any
shard count, and the Hilbert range decomposition's partition law."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from co_new_spark.queries import scale_ops as so


# --- Misra-Gries: candidates ⊇ {k : cnt(k) * (cap+1) > N}, any stream -----

@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=400),
       st.integers(2, 8),
       st.integers(1, 4))
def test_mg_superset_random_streams(stream, cap, n_batches):
    old = so._HH_CAP
    so._HH_CAP = cap
    try:
        cuts = sorted({0, len(stream)}
                      | set(range(0, len(stream), max(1, len(stream) // n_batches))))
        batches = [pd.DataFrame({"hk": stream[a:b]})
                   for a, b in zip(cuts, cuts[1:]) if b > a]
        out = pd.concat(list(so._mg_candidates(batches)))
    finally:
        so._HH_CAP = old
    cands = set(out[out["n_part"] == 0]["hk"])
    n = int(out["n_part"].sum())
    assert n == len(stream)
    exact = {}
    for k in stream:
        exact[k] = exact.get(k, 0) + 1
    heavy = {k for k, c in exact.items() if c * (cap + 1) > n}
    assert heavy <= cands, f"lost heavy keys {heavy - cands}"


# --- Bloom: the word set/get arithmetic round-trips any position set -------
# (the xxhash64 position derivation itself is JVM-side and covered by the
# no-false-negative Spark test in test_scale_ops.py)

@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(0, so._BF_BITS - 1), min_size=1, max_size=500))
def test_bloom_word_arithmetic_roundtrip(positions):
    # build the word array exactly as bloom_build's agg does
    words = [0] * so._m64
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    # signed-int64 wraparound as the JVM would store it
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    for p in positions:
        w = words[p >> 6]
        assert (w >> (p & 63)) & 1 == 1
    # and a cleared position reads 0
    for p in range(0, so._BF_BITS, 977):
        if p not in positions:
            assert (words[p >> 6] >> (p & 63)) & 1 == 0


# --- HRW rendezvous: adding a shard moves keys only TO the new shard -------

def _md5_hrw(doc_id: int, s: int) -> int:
    import hashlib

    h = hashlib.md5(f"{doc_id}:{s}".encode()).hexdigest()
    return int(h[:15], 16)


def _argmax_shard(doc_id: int, n: int) -> int:
    return max(range(n), key=lambda s: (_md5_hrw(doc_id, s), s))


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10**9), st.integers(2, 12))
def test_hrw_minimal_disruption_any_resize(doc_id, n_shards):
    before = _argmax_shard(doc_id, n_shards)
    after = _argmax_shard(doc_id, n_shards + 1)
    assert after == before or after == n_shards


# --- Hilbert bbox ranges: disjoint maximal runs that tile the bbox ---------

@settings(max_examples=50, deadline=None)
@given(st.integers(0, 100), st.integers(0, 100),
       st.integers(1, 27), st.integers(1, 27))
def test_hilbert_ranges_partition_any_bbox(gx0, gy0, w, h):
    old = (so._HR_GX, so._HR_GY)
    so._HR_GX = (gx0, min(gx0 + w, 127))
    so._HR_GY = (gy0, min(gy0 + h, 127))
    try:
        ranges = so._hilbert_bbox_ranges()
    finally:
        so._HR_GX, so._HR_GY = old
    n_bbox = ((min(gx0 + w, 127) - gx0 + 1) * (min(gy0 + h, 127) - gy0 + 1))
    assert sum(n for _, _, n in ranges) == n_bbox
    assert all(hi - lo + 1 == n for lo, hi, n in ranges)
    # sorted, disjoint, maximal
    for (_, hi, _), (lo2, _, _) in zip(ranges, ranges[1:]):
        assert lo2 > hi + 1
    # the keys really are the Hilbert indices of the bbox lattice
    from co_new_spark.grid.hilbert import xy_to_d

    xs = np.arange(gx0, min(gx0 + w, 127) + 1, dtype=np.uint64)
    ys = np.arange(gy0, min(gy0 + h, 127) + 1, dtype=np.uint64)
    xx, yy = np.meshgrid(xs, ys)
    want = set(xy_to_d(xx.ravel(), yy.ravel(), so._HR_ORDER)
               .astype(np.int64).tolist())
    got = {d for lo, hi, _ in ranges for d in range(lo, hi + 1)}
    assert got == want
