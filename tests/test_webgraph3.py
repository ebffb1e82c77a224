"""Redirect-chain resolution (queries/webgraph3.py): pointer doubling.

The oracle gate proves cross-engine identity of the full result; these
tests pin what it cannot: the DOUBLING ALGEBRA itself vs a pure-python
step-by-step walk of the same arithmetic chain rules (a bug mirrored into
the SQL restatement — e.g. an off-by-one in hop composition both sides —
cannot hide from an independent sequential walk), plus structural facts:
cycle flags land exactly on the urls that feed the planted 5-cycles, and a
cross-group jump chain resolves with the hand-computed hop count.
"""

from co_new_spark.queries.webgraph3 import (_FMT, _G, _N, _NG,
                                            w_redirect_chains)

SF = "/root/testdata/sf0.001"


def _py_next(gid: int, p: int):
    """(gid, p) of the redirect target, or None if terminal."""
    if p == 0:
        return (gid, 4) if gid % 40 == 7 else None
    if p == 6 and gid % 3 == 0:
        return ((gid + 1) % _NG, 2)
    return (gid, p - 1)


def _py_resolve():
    out = {}
    for i in range(_N):
        gid, p = i // _G, i % _G
        url = _FMT % (gid, p)
        cur, hops = (gid, p), 0
        while hops <= 16:
            nxt = _py_next(*cur)
            if nxt is None:
                out[url] = (_FMT % cur, hops, False)
                break
            cur, hops = nxt, hops + 1
        else:
            out[url] = (None, None, True)
    return out


def test_doubling_matches_sequential_walk(spark):
    got = {r.url: (r.final_url, r.hops, r.is_cycle)
           for r in w_redirect_chains(spark, SF).collect()}
    assert got == _py_resolve()


def test_cycle_flags_and_cross_group_chain(spark):
    res = {r.url: r for r in w_redirect_chains(spark, SF).collect()}
    # gid 7 is a cycle group with no p6 escape (7 % 3 != 0): all 13 cycle
    for p in range(_G):
        assert res[_FMT % (7, p)].is_cycle
    # gid 87 is cyclic BUT 87 % 3 == 0: p7..p12 escape through the p6 jump
    assert res[_FMT % (87, 5)].is_cycle
    assert not res[_FMT % (87, 7)].is_cycle
    assert res[_FMT % (87, 7)].final_url == _FMT % (88, 0)
    # hand-computed cross-group chain: g3p12 -5-> p7 -> p6 -jump-> g4p2
    # -> p1 -> p0 (terminal): 9 hops
    r = res[_FMT % (3, 12)]
    assert (r.final_url, r.hops, r.is_cycle) == (_FMT % (4, 0), 9, False)
    # every acyclic url resolves within the corpus's documented max (12)
    assert max(r.hops for r in res.values() if not r.is_cycle) <= 12
    # terminals resolve to themselves at 0 hops
    assert res[_FMT % (0, 0)].hops == 0
