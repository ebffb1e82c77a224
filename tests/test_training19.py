"""Boosted stumps (queries/training19.py): mirror parity + boosting law."""

import duckdb

from conftest import SF_DIR

from co_new_spark.queries.training19 import _BS_K, _BS_SCALE, _BS_T, g_boost_stumps
from co_new_spark.queries.training18 import (
    _LR_CAP,
    _LR_DOCS,
    _LR_NOISE_MOD,
    _LR_NOISE_MUL,
)


def _data():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id, least(len(string_split(text, ' ')), {_LR_CAP}),
               least(length(text) - length(replace(text, 'e', '')),
                     {_LR_CAP})
        FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE doc_id < {_LR_DOCS}""").fetchall()
    return [(x1, x2,
             (3 * x1 - 2 * x2 + (d * _LR_NOISE_MUL) % _LR_NOISE_MOD - 10)
             * _BS_SCALE)
            for d, x1, x2 in rows]


def _mirror(data):
    res = [y for _, _, y in data]
    out = []
    for t in range(_BS_T):
        best = None
        for f in (0, 1):
            for th in range(_LR_CAP + 1):
                L = [r for (xa, xb, _), r in zip(data, res)
                     if (xa if f == 0 else xb) <= th]
                R = [r for (xa, xb, _), r in zip(data, res)
                     if (xa if f == 0 else xb) > th]
                if not L or not R:
                    continue
                sl, sr, nl, nr = sum(L), sum(R), len(L), len(R)
                g = (sl * sl * nr + sr * sr * nl) / (nl * nr)
                key = (-g, f, th, sl, nl, sr, nr)
                if best is None or key < best:
                    best = key
        _negg, f, th, sl, nl, sr, nr = best
        pl = (sl + _BS_K * nl) // nl - _BS_K
        pr = (sr + _BS_K * nr) // nr - _BS_K
        res = [r - (pl if (xa if f == 0 else xb) <= th else pr)
               for (xa, xb, _), r in zip(data, res)]
        out.append((t, f, th, pl, pr, sum(r * r for r in res)))
    return out


def test_entry_matches_mirror_and_boosts(spark):
    data = _data()
    want = _mirror(data)
    got = [(r.round, r.f, r.th, r.pl, r.pr, r.sse)
           for r in g_boost_stumps(spark, SF_DIR).collect()]
    assert got == want
    # boosting law: SSE strictly decreases every round, and beats the
    # constant-model baseline
    sses = [row[5] for row in got]
    assert all(a > b for a, b in zip(sses, sses[1:]))
    ybar_sse = None
    ys = [y for _, _, y in data]
    mu = sum(ys) // len(ys)
    ybar_sse = sum((y - mu) ** 2 for y in ys)
    assert sses[0] < ybar_sse
    # rounds alternate features on this corpus (regression pin)
    assert [row[1] for row in got[:2]] == [1, 0]
