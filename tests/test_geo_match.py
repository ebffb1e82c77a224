"""Viterbi map-matching vs an independent python Viterbi + planted truth."""

import hashlib

import pytest

from co_new_spark.queries.geo_match import _CS, _K, _NTJ, _NZ, _T, _W


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _corpus():
    """{traj: ([(cx, cy) truth], [(ox, oy) pings])}."""
    out = {}
    for r in range(_NTJ):
        cx = 64 + _h(f"{r}_sx") % 128
        cy = 64 + _h(f"{r}_sy") % 128
        cells, pings = [], []
        for t in range(_T):
            if t > 0:
                cx += _h(f"{r}_{t}_mx") % 3 - 1
                cy += _h(f"{r}_{t}_my") % 3 - 1
            cells.append((cx, cy))
            pings.append((cx * _CS + _CS // 2 + _h(f"{r}_{t}_nx") % (2 * _NZ + 1) - _NZ,
                          cy * _CS + _CS // 2 + _h(f"{r}_{t}_ny") % (2 * _NZ + 1) - _NZ))
        out[r] = (cells, pings)
    return out


def _viterbi(pings):
    """Matched cell path, exact ints, ties to lowest (cost, state id)."""
    def cands(ox, oy):
        bx, by = ox // _CS, oy // _CS
        out = []
        for i in (-1, 0, 1):
            for j in (-1, 0, 1):
                sx, sy = bx + i, by + j
                ex = ox - (sx * _CS + _CS // 2)
                ey = oy - (sy * _CS + _CS // 2)
                out.append((sx * _K + sy, ex * ex + ey * ey))
        return out

    dp = {sid: c for sid, c in cands(*pings[0])}
    bps = []
    for t in range(1, _T):
        ndp, bp = {}, {}
        for sid, emit in cands(*pings[t]):
            sx, sy = sid // _K, sid % _K
            best = None
            for psid, pc in dp.items():
                px, py = psid // _K, psid % _K
                tot = pc + _W * ((sx - px) ** 2 + (sy - py) ** 2) + emit
                if best is None or (tot, psid) < best:
                    best = (tot, psid)
            ndp[sid], bp[sid] = best[0], best[1]
        dp, _ = ndp, bps.append(bp)
    sid = min(dp, key=lambda s: (dp[s], s))
    path = [sid]
    for bp in reversed(bps):
        sid = bp[sid]
        path.append(sid)
    path.reverse()
    return [(s // _K, s % _K) for s in path]


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def test_engine_matches_python_viterbi(spark, corpus):
    from co_new_spark.queries.geo_match import g_map_match

    want = {r: _viterbi(pings) for r, (_, pings) in corpus.items()}
    got = {}
    for row in g_map_match(spark, "/root/testdata/sf0.001").collect():
        got.setdefault(row.traj, {})[row.t] = (row.sx, row.sy)
    assert set(got) == set(want)
    for r, path in want.items():
        assert [got[r][t] for t in range(_T)] == path, f"traj {r}"


def _recovery(corpus, w):
    hit = tot = 0
    for cells, pings in corpus.values():
        path = _viterbi_with(pings, w)
        hit += sum(p == c for p, c in zip(path, cells))
        tot += _T
    return hit / tot


def _viterbi_with(pings, w):
    global _W
    old, _W = _W, w
    try:
        return _viterbi(pings)
    finally:
        _W = old


def test_viterbi_recovers_planted_truth_and_beats_baseline(corpus):
    # noise < one cell side, so the true cell is always a candidate; the
    # matched path should follow the planted walk AND beat the memoryless
    # nearest-cell assignment (w=0), which this noise level defeats.
    viterbi = _recovery(corpus, _W)
    nearest = _recovery(corpus, 0)
    assert viterbi >= 0.85, viterbi
    assert viterbi > nearest + 0.05, (viterbi, nearest)


def test_truth_always_in_candidate_ring(corpus):
    for cells, pings in corpus.values():
        for (cx, cy), (ox, oy) in zip(cells, pings):
            assert abs(ox // _CS - cx) <= 1 and abs(oy // _CS - cy) <= 1
