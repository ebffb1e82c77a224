"""Bucket-decomposed skyline vs brute-force O(n^2) dominance."""

import duckdb
import pytest

from co_new_spark.queries.geospatial import _XENG, _YENG

SF = "/root/testdata/sf0.001"


def _points():
    rows = duckdb.sql(
        f"SELECT DISTINCT CAST({_XENG} AS BIGINT), CAST({_YENG} AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')").fetchall()
    return [(x, y) for x, y in rows]


def _brute_nw(pts):
    """min x, max y; q dominates p iff q.x<=p.x, q.y>=p.y, q!=p."""
    s = set(pts)
    out = set()
    for p in s:
        if not any(q != p and q[0] <= p[0] and q[1] >= p[1] for q in s):
            out.add(p)
    return out


@pytest.fixture(scope="module")
def pts():
    return _points()


def test_engine_matches_bruteforce(spark, pts):
    from co_new_spark.queries.geo_skyline import g_skyline

    got = {(r.x, r.y) for r in g_skyline(spark, SF).collect()}
    assert got == _brute_nw(pts)


def test_frontier_is_mutually_nondominating(spark, pts):
    from co_new_spark.queries.geo_skyline import g_skyline

    f = sorted((r.x, r.y) for r in g_skyline(spark, SF).collect())
    assert 2 < len(f) < len(pts)
    # min-x/max-y frontier sorted by x must trade off: strictly rising y
    # (a later point with lower-or-equal y would be dominated by an
    # earlier one)
    ys = [y for _, y in f]
    assert all(a < b for a, b in zip(ys, ys[1:]))


def test_buckets_actually_split_the_frontier(pts):
    # guard: the frontier must span several x-buckets, otherwise the
    # threshold path of the decomposition is untested by parity.
    from co_new_spark.queries.geo_skyline import _BW

    assert len({x // _BW for x, _ in _brute_nw(pts)}) >= 3
