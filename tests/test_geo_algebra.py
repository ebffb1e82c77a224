"""Tests for the PIP operator and the geo_algebra query surface."""

import numpy as np
from pyspark.sql import functions as F

from co_new_spark.operators.pip import point_in_rings, pip_filter, rings_bbox

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
HOLE = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]])


def test_pip_square():
    x = np.array([5.0, -1.0, 10.5, 0.5, 9.99])
    y = np.array([5.0, 5.0, 5.0, 0.5, 9.99])
    got = point_in_rings(x, y, [SQUARE])
    assert got.tolist() == [True, False, False, True, True]


def test_pip_hole_parity():
    x = np.array([5.0, 2.0])
    y = np.array([5.0, 2.0])
    got = point_in_rings(x, y, [SQUARE, HOLE])
    assert got.tolist() == [False, True]  # center falls in the hole


def test_pip_matches_shoelace_winding_random():
    rng = np.random.default_rng(7)
    # random convex-ish pentagon: PIP must agree with matplotlib-free oracle
    ang = np.sort(rng.uniform(0, 2 * np.pi, 5))
    ring = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    pts = rng.uniform(-1.2, 1.2, size=(500, 2))
    got = point_in_rings(pts[:, 0], pts[:, 1], [ring])
    # oracle: convex polygon -> inside iff on same side of every edge
    inside = np.ones(len(pts), dtype=bool)
    for k in range(len(ring) - 1):
        ex, ey = ring[k + 1] - ring[k]
        cross = ex * (pts[:, 1] - ring[k, 1]) - ey * (pts[:, 0] - ring[k, 0])
        inside &= cross > 0
    # boundary-exact points are measure-zero under rng; require full agreement
    assert (got == inside).all()


def test_rings_bbox():
    x0, y0, x1, y1 = rings_bbox([SQUARE, HOLE])
    assert (x0, y0, x1, y1) == (0.0, 0.0, 10.0, 10.0)


def test_pip_filter_spark(spark):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 20).cast("double").alias("x"),
        (F.col("id") / 10).cast("double").alias("y"),
    )
    got = pip_filter(df, [SQUARE]).select("id").toPandas()["id"].to_numpy()
    pdf = df.toPandas()
    exp = pdf.id[point_in_rings(pdf.x.to_numpy(), pdf.y.to_numpy(), [SQUARE])].to_numpy()
    assert sorted(got) == sorted(exp)


def test_registry_complete():
    """Every oracle key has a query; geo_algebra entries are registered."""
    from co_new_spark.queries import REGISTRY, oracle_sqls, spark_queries

    q, o = spark_queries(), oracle_sqls()
    assert set(o) <= set(q)
    for name in ("geo_parent_rollup", "geo_children", "geo_neighbors",
                 "geo_cell_box", "geo_cell_codec", "geo_grid_generate",
                 "geo_pip_poly"):
        assert name in q and name in o, name
    assert len(REGISTRY) >= 38


def test_approx_distinct_accuracy(spark):
    from co_new_spark.queries.relational import q_approx_distinct, q_distinct_users

    sf = "/root/testdata/sf0.01"
    exact = {r.event_type: r.n_users for r in q_distinct_users(spark, sf).collect()}
    rows = q_approx_distinct(spark, sf).collect()
    got = {r.event_type: r for r in rows}
    for k, v in exact.items():
        assert got[k].n_users == v, (k, v, got[k])
        assert got[k].approx_within_5pct, (k, got[k])
