"""(E)WKB point codec: canonical byte vectors + contracts + entry parity."""

import numpy as np
import pytest

from co_new_spark.functions import wkb


def test_canonical_wkb_le_point():
    # OGC canonical hex for little-endian POINT(1 2)
    payload = bytes.fromhex(
        "0101000000000000000000f03f0000000000000040")
    m = wkb.decode_wkb_point(payload)
    assert (m["x"], m["y"], m["srid"], m["little_endian"]) == (1.0, 2.0, 0, True)
    assert wkb.encode_wkb_point(1.0, 2.0, little_endian=True) == payload


def test_canonical_wkb_be_point():
    payload = bytes.fromhex(
        "00000000013ff00000000000004000000000000000")
    m = wkb.decode_wkb_point(payload)
    assert (m["x"], m["y"], m["srid"], m["little_endian"]) == (1.0, 2.0, 0, False)
    assert wkb.encode_wkb_point(1.0, 2.0, little_endian=False) == payload


def test_canonical_ewkb_srid_4326():
    # PostGIS EWKB hex for SRID=4326;POINT(1 2), little-endian:
    # type word 0x20000001, srid e6100000 (= 4326 LE)
    payload = bytes.fromhex(
        "0101000020e6100000000000000000f03f0000000000000040")
    m = wkb.decode_wkb_point(payload)
    assert (m["x"], m["y"], m["srid"]) == (1.0, 2.0, 4326)
    assert wkb.encode_wkb_point(1.0, 2.0, little_endian=True,
                                srid=4326) == payload


def test_ewkb_big_endian_srid_roundtrip():
    p = wkb.encode_wkb_point(-73.5, 4.25, little_endian=False, srid=9377)
    m = wkb.decode_wkb_point(p)
    assert (m["x"], m["y"], m["srid"], m["little_endian"]) == (
        -73.5, 4.25, 9377, False)
    assert len(p) == 25


def test_decode_rejects_bad_records():
    with pytest.raises(ValueError):  # short
        wkb.decode_wkb_point(b"\x01\x01\x00")
    with pytest.raises(ValueError):  # bad byte-order flag
        wkb.decode_wkb_point(b"\x07" + bytes(24))
    # LineString (type 2) must raise, not guess
    bad = bytearray(wkb.encode_wkb_point(1.0, 2.0))
    bad[1] = 2
    with pytest.raises(ValueError):
        wkb.decode_wkb_point(bytes(bad))
    # EWKB header truncated before coordinates
    good = wkb.encode_wkb_point(1.0, 2.0, srid=9377)
    with pytest.raises(ValueError):
        wkb.decode_wkb_point(good[:20])


def test_float64_exactness_through_wire():
    rng = np.random.default_rng(7)
    for _ in range(50):
        x, y = rng.uniform(-1e7, 1e7, 2)
        for le in (True, False):
            for srid in (None, 9377):
                m = wkb.decode_wkb_point(
                    wkb.encode_wkb_point(x, y, little_endian=le, srid=srid))
                assert m["x"] == x and m["y"] == y  # bit-exact


def test_wkb_entry_matches_direct_arithmetic(spark):
    """The registry entry's per-class sums equal sums computed straight
    from the shared position hash (no WKB round trip) — codec transparency
    on the real input."""
    from co_new_spark.queries.geo_wkb import t_wkb_decode
    from co_new_spark.queries.geospatial import _event_points
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = {tuple(r[:2]): tuple(r[2:])
           for r in t_wkb_decode(spark, sf).collect()}
    pts = _event_points(spark, sf)
    exp = (pts.groupBy((F.col("event_id") % 2 == 1).alias("le"),
                       F.when(F.col("event_id") % 3 == 0, 9377)
                        .otherwise(0).alias("srid"))
           .agg(F.count("*").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.when(F.col("event_id") % 3 == 0, 25)
                      .otherwise(21)).alias("wb")).collect())
    assert len(got) == 4  # both byte orders x (plain, EWKB)
    for r in exp:
        assert got[(r["le"], r["srid"])] == (r["n"], r["sx"], r["sy"], r["wb"])
