"""PBSM segment-intersection join vs brute-force python + spec vectors."""

import hashlib

import pytest

from co_new_spark.queries.geo_sjoin import _BOX, _NS


def _h(s, a, b):
    return int(hashlib.md5(s.encode()).hexdigest()[a:b], 16)


def _segs(tag):
    out = []
    for i in range(_NS):
        x1 = _h(f"{tag}_{i}_p", 0, 3) % _BOX
        y1 = _h(f"{tag}_{i}_p", 3, 6) % _BOX
        out.append((i, x1, y1,
                    x1 + _h(f"{tag}_{i}_d", 0, 2) * 4 - 512,
                    y1 + _h(f"{tag}_{i}_d", 2, 4) * 4 - 512))
    return out


def _classify(a, b):
    """None | 'proper' | 'touch' — CLRS 33.1 orientation predicate."""
    _, x1, y1, x2, y2 = a
    _, x3, y3, x4, y4 = b

    def cr(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = cr(x3, y3, x4, y4, x1, y1)
    d2 = cr(x3, y3, x4, y4, x2, y2)
    d3 = cr(x1, y1, x2, y2, x3, y3)
    d4 = cr(x1, y1, x2, y2, x4, y4)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and \
       ((d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)):
        return "proper"

    def on(ax, ay, bx, by, cx, cy):
        return min(ax, bx) <= cx <= max(ax, bx) and \
               min(ay, by) <= cy <= max(ay, by)

    if (d1 == 0 and on(x3, y3, x4, y4, x1, y1)) or \
       (d2 == 0 and on(x3, y3, x4, y4, x2, y2)) or \
       (d3 == 0 and on(x1, y1, x2, y2, x3, y3)) or \
       (d4 == 0 and on(x1, y1, x2, y2, x4, y4)):
        return "touch"
    return None


SPEC = [
    # (segment a, segment b, expected class)
    ((0, 0, 0, 10, 10), (0, 0, 10, 10, 0), "proper"),    # transversal X
    ((0, 0, 0, 10, 0), (0, 5, 0, 5, 8), "touch"),        # T endpoint on interior
    ((0, 0, 0, 10, 0), (0, 4, 0, 20, 0), "touch"),       # collinear overlap
    ((0, 0, 0, 10, 0), (0, 11, 0, 20, 0), None),         # collinear disjoint
    ((0, 0, 0, 10, 0), (0, 0, 1, 10, 1), None),          # parallel disjoint
    ((0, 0, 0, 10, 0), (0, 10, 0, 10, 9), "touch"),      # shared endpoint
    ((0, 3, 3, 3, 3), (0, 0, 0, 6, 6), "touch"),         # degenerate point on line
    ((0, 3, 4, 3, 4), (0, 0, 0, 6, 6), None),            # degenerate point off line
]


@pytest.mark.parametrize("a,b,want", SPEC)
def test_predicate_spec_vectors(a, b, want):
    assert _classify(a, b) == want
    # symmetry: swapping the operands must not change the class
    assert _classify(b, a) == want


def test_engine_matches_bruteforce(spark):
    from co_new_spark.queries.geo_sjoin import g_segment_intersect

    sa, sb = _segs("a"), _segs("b")
    want = {}
    for a in sa:
        for b in sb:
            c = _classify(a, b)
            if c:
                want[(a[0], b[0])] = 1 if c == "proper" else 0
    rows = g_segment_intersect(spark, "/root/testdata/sf0.001").collect()
    got = {(r.aid, r.bid): r.proper for r in rows}
    assert len(rows) == len(got), "reference-point dedup emitted a duplicate"
    assert got == want


def test_corpus_exercises_both_classes():
    sa, sb = _segs("a"), _segs("b")
    classes = {_classify(a, b) for a in sa for b in sb}
    assert "proper" in classes and None in classes


def test_closest_pair_matches_brute_and_precondition_holds(spark):
    import duckdb

    from co_new_spark.queries.geo_sjoin import _CP_CAP, _CP_CS, g_closest_pair
    from co_new_spark.queries.geospatial import _XENG, _YENG

    pts = duckdb.sql(
        f"SELECT DISTINCT CAST({_XENG} AS BIGINT), CAST({_YENG} AS BIGINT)"
        f" FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
        f" WHERE event_id < {_CP_CAP}").fetchall()
    best = None
    for i, p in enumerate(pts):
        for q in pts[i + 1:]:
            a, b = min(p, q), max(p, q)
            d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            key = (d2, a, b)
            if best is None or key < best:
                best = key
    # the one-round grid search is exact only while the true minimum is
    # below the cell side — pin the precondition the docstring claims
    assert best[0] < _CP_CS * _CP_CS
    r = g_closest_pair(spark, "/root/testdata/sf0.001").collect()
    assert len(r) == 1
    row = r[0]
    assert (row.d2, (row.x1, row.y1), (row.x2, row.y2)) == best
