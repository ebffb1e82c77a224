"""Closed-form OLS (queries/training18.py): mirror, recovery, numpy anchor."""

import duckdb

from conftest import SF_DIR

from co_new_spark.queries.training18 import (
    _LR_CAP,
    _LR_DOCS,
    _LR_NOISE_MOD,
    _LR_NOISE_MUL,
    g_linreg,
)


def _feature_rows():
    con = duckdb.connect()
    return con.execute(
        f"""SELECT doc_id, least(len(string_split(text, ' ')), {_LR_CAP}),
               least(length(text) - length(replace(text, 'e', '')),
                     {_LR_CAP})
        FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE doc_id < {_LR_DOCS}""").fetchall()


def _xy():
    rows = _feature_rows()
    X, y = [], []
    for did, x1, x2 in rows:
        X.append((1, x1, x2))
        y.append(3 * x1 - 2 * x2 + (did * _LR_NOISE_MUL) % _LR_NOISE_MOD - 10)
    return X, y


def test_entry_matches_exact_python_cramer(spark):
    X, y = _xy()
    n = len(X)
    s1 = sum(r[1] for r in X)
    s2 = sum(r[2] for r in X)
    s11 = sum(r[1] * r[1] for r in X)
    s12 = sum(r[1] * r[2] for r in X)
    s22 = sum(r[2] * r[2] for r in X)
    sy = sum(y)
    s1y = sum(r[1] * v for r, v in zip(X, y))
    s2y = sum(r[2] * v for r, v in zip(X, y))

    def det3(a, b, c, d, e, f, g, h, i):
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    r = g_linreg(spark, SF_DIR).collect()[0]
    assert (r.n, r.det, r.b0_num, r.b1_num, r.b2_num) == (n, det, b0, b1, b2)
    # int64 headroom for the silent-wrap hazard the docstring names
    for v in (det, b0, b1, b2):
        assert abs(v) < 2 ** 62

    # coefficient recovery: the planted signal is y = 3*x1 - 2*x2 + noise
    assert abs(b1 / det - 3) < 0.2
    assert abs(b2 / det + 2) < 0.2
    assert abs(b0 / det) < 5          # noise mean ~0, intercept near 0

    # numpy least-squares anchor (independent solver)
    import numpy as np
    A = np.array([[n, s1, s2], [s1, s11, s12], [s2, s12, s22]], dtype=float)
    bb = np.array([sy, s1y, s2y], dtype=float)
    sol = np.linalg.solve(A, bb)
    assert abs(sol[0] - b0 / det) < 1e-6
    assert abs(sol[1] - b1 / det) < 1e-6
    assert abs(sol[2] - b2 / det) < 1e-6
