"""Trajectory resampling (queries/geo_resample.py): mirror + properties."""

from fractions import Fraction

import duckdb

from conftest import SF_DIR

from co_new_spark.queries.geo_resample import _RS_DT, _RS_USERS, g_resample


def _legs():
    con = duckdb.connect()
    rows = con.execute(f"""
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
             CAST(3678500.0 + ((event_id * 2654435761) % 2097152) AS BIGINT),
             CAST(970000.0 + ((event_id * 40503) % 2621440) AS BIGINT)
      FROM read_parquet('{SF_DIR}/events.parquet')
      WHERE user_id < {_RS_USERS}
      ORDER BY user_id, t, event_id""").fetchall()
    by_user = {}
    for u, t, _e, x, y in rows:
        by_user.setdefault(u, []).append((t, x, y))
    legs = []
    for u, pts in by_user.items():
        for (t1, x1, y1), (t2, x2, y2) in zip(pts, pts[1:]):
            if t2 > t1:
                legs.append((u, t1, x1, y1, t2, x2, y2))
    return legs


def _mirror():
    out = []
    for u, t1, x1, y1, t2, x2, y2 in _legs():
        k1, k2 = t1 // _RS_DT + 1, t2 // _RS_DT
        for k in range(k1, k2 + 1):
            T = k * _RS_DT
            xi = x1 + (x2 - x1) * (T - t1) // (t2 - t1)  # python // floors
            yi = y1 + (y2 - y1) * (T - t1) // (t2 - t1)
            out.append((u, T, xi, yi))
    return sorted(out)


def test_entry_matches_floor_interpolation_mirror(spark):
    want = _mirror()
    got = sorted((r.user_id, r.tick, r.xi, r.yi)
                 for r in g_resample(spark, SF_DIR).collect())
    assert got == want
    assert len(got) > 100


def test_interpolation_properties(spark):
    legs = {}
    for u, t1, x1, y1, t2, x2, y2 in _legs():
        legs.setdefault(u, []).append((t1, x1, y1, t2, x2, y2))
    for r in g_resample(spark, SF_DIR).collect():
        leg = next((lg for lg in legs[r.user_id]
                    if lg[0] < r.tick <= lg[3]), None)
        assert leg is not None                      # tick lies inside a leg
        t1, x1, y1, t2, x2, y2 = leg
        assert min(x1, x2) - 1 <= r.xi <= max(x1, x2)   # floor can undershoot
        assert min(y1, y2) - 1 <= r.yi <= max(y1, y2)
        # exact rational check: xi == floor of the exact interpolant
        exact = Fraction(x1 * (t2 - r.tick) + x2 * (r.tick - t1), t2 - t1)
        assert r.xi == exact.numerator // exact.denominator
