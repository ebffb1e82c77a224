"""Parity gates for the zero-UDF geocode path (functions/geo_native).

Contracts (see the module docstring):
* xy -> cell is IEEE-exact arithmetic only => EXACT equality vs the numpy
  kernel, every depth.
* text -> cell goes through JVM transcendentals => gated as exact equality
  on the committed pages fixture (a flip needs the projected point within
  ~1 ulp of a 64 m cell edge; measured 0 mismatches on 1M synthetic pages).
"""

import numpy as np
from pyspark.sql import functions as F

from co_new_spark.functions import geo, geo_native
from co_new_spark.queries.webtext_q import FIXTURE_PAGES

SF = "/root/testdata/sf0.001"


def test_xy_to_cell_native_exact_parity(spark):
    from co_new_spark.queries.geospatial import _event_points

    ev = _event_points(spark, SF)
    for r in (4, 8, 11, 26):  # 11 exercises odd refinement (n_first != n_second)
        d = ev.select("x", "y",
                      geo.xy_to_cell_b(F.col("x"), F.col("y"), r).alias("k"),
                      geo_native.xy_to_cell_b_native(F.col("x"), F.col("y"), r)
                      .alias("n"))
        # the staged twin (the registered query path) must agree at EVERY
        # depth too, not just the depth-26 end-to-end gate
        d = geo_native.with_cell_from_xy(d, "x", "y", r, "s")
        assert d.filter((F.col("k") != F.col("n"))
                        | (F.col("k") != F.col("s"))).count() == 0, r


def test_native_text_chain_parity(spark):
    pg = spark.read.parquet(FIXTURE_PAGES).select("text")
    d = geo_native.with_cell_from_text(pg, "text", 26, "n") \
        .withColumn("k", geo.encode_b_cell_from_text(F.col("text"), 26))
    rows = d.select("k", "n").collect()
    assert rows and all(r.k == r.n for r in rows)
    assert any(r.k >= 0 for r in rows)  # the fixture must geocode something


def test_native_tm_matches_numpy_kernel(spark):
    from co_new_spark.grid import proj

    lats = np.linspace(-4.0, 12.0, 41)
    lons = np.linspace(-78.0, -67.0, 41)
    rows = [(float(a), float(o)) for a in lats for o in lons]
    df = spark.createDataFrame(rows, ["lat", "lon"])
    got = geo_native.with_tm_forward(df, "lat", "lon", "x", "y") \
        .select("lat", "lon", "x", "y").collect()
    la = np.array([r.lat for r in got])
    lo = np.array([r.lon for r in got])
    x, y = proj.forward(la, lo)
    gx = np.array([r.x for r in got])
    gy = np.array([r.y for r in got])
    # transcendental-ulp tolerance: nanometers on ~1e6 m coordinates
    assert np.max(np.abs(gx - x)) < 1e-6
    assert np.max(np.abs(gy - y)) < 1e-6


def test_pushdown_fence_is_identity(spark):
    df = spark.range(100).select(
        (F.col("id") * 7 - 3).alias("v"))
    out = df.select(geo_native.pushdown_fence(F.col("v")).alias("w"),
                    F.col("v")).collect()
    assert all(r.w == r.v for r in out)
