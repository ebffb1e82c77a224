"""Silhouette envelope vs a brute-force python sweep + properties."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from co_new_spark.queries.geo_envelope import _BX, _LEN, _NI


def _ivals():
    out = []
    for i in range(_NI):
        hp = hashlib.md5(f"sil_{i}_p".encode()).hexdigest()
        hh = hashlib.md5(f"sil_{i}_h".encode()).hexdigest()
        x1 = int(hp[:3], 16) % _BX
        out.append((x1, x1 + 1 + int(hp[3:5], 16) % _LEN,
                    1 + int(hh[:2], 16) % 100))
    return out


def _brute(ivals):
    """Change points [(x, h)] by evaluating every breakpoint directly."""
    bps = sorted({x for x1, x2, _ in ivals for x in (x1, x2)})
    out, prev = [], None
    for b in bps:
        h = max((h for x1, x2, h in ivals if x1 <= b < x2), default=0)
        if prev is None or h != prev:
            out.append((b, h))
        prev = h
    return out


def test_engine_matches_brute_sweep(spark):
    from co_new_spark.queries.geo_envelope import g_silhouette

    want = _brute(_ivals())
    got = [(r.x, r.h) for r in
           g_silhouette(spark, "/root/testdata/sf0.001").collect()]
    assert got == want


def test_profile_shape_invariants():
    prof = _brute(_ivals())
    # consecutive change points never repeat a height, ends closed at 0
    for (_, a), (_, b) in zip(prof, prof[1:]):
        assert a != b
    assert prof[-1][1] == 0
    assert any(h > 0 for _, h in prof)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 500), st.integers(1, 80),
                          st.integers(1, 30)),
                min_size=1, max_size=40))
def test_bucketed_mirror_equals_brute(raw):
    # mirror of the engine's decomposition: bucketed cover + in-bucket lag
    # with the previous-non-empty-bucket boundary — vs direct evaluation
    BW = 64
    ivals = [(x1, x1 + ln, h) for x1, ln, h in raw]
    want = _brute(ivals)

    from collections import defaultdict
    bps = sorted({x for x1, x2, _ in ivals for x in (x1, x2)})
    prof = defaultdict(dict)
    for b in bps:
        g = b // BW
        hs = [h for x1, x2, h in ivals
              if x1 // BW <= g <= (x2 - 1) // BW and x1 <= b < x2]
        prof[g][b] = max(hs, default=0)
    lasth = {g: prof[g][max(prof[g])] for g in prof}
    order = sorted(prof)
    boundary = {g: (lasth[order[i - 1]] if i else None)
                for i, g in enumerate(order)}
    got = []
    for g in order:
        prev = boundary[g]
        for b in sorted(prof[g]):
            if prev is None or prof[g][b] != prev:
                got.append((b, prof[g][b]))
            prev = prof[g][b]
    assert got == want


def test_bucket_bound_covers_every_possible_bucket():
    # the engine's limit(_NB) on the unordered bucket dim must never
    # truncate: max breakpoint is a start (< _BX) plus a length (<= _LEN),
    # so the largest bucket id is (_BX - 1 + _LEN) // _BW < _NB
    from co_new_spark.queries.geo_envelope import _BW, _BX, _LEN, _NB

    assert (_BX - 1 + _LEN) // _BW < _NB
