"""(E)WKB geometry-column ingestion — the PostGIS wire-format scan path.

The reference's executable functions live in PostGIS (README.md:24-33), and
a PostGIS table dump ships its geometry column as EWKB bytes, so "a user of
the reference could switch" requires a real binary-geometry scan, not just
GeoJSON (geo_index.py).  ``geo_wkb_decode`` round-trips every event position
through genuine (E)WKB bytes:

* encode: per event, a WKB point record with event-dependent shape —
  little-endian for odd ids, BIG-endian for even ids, and the PostGIS EWKB
  SRID header (srid 9377, the reference CRS, conf.yaml:21) on every 3rd id.
  The mix forces the decoder to honor the byte-order flag and the
  variable-length EWKB header rather than memorizing one fixed layout.
* decode: ``functions/wkb.py`` — numpy ``frombuffer`` with explicit
  ``<f8``/``>f8`` dtypes; a byte-order or offset bug yields garbage doubles
  and breaks the oracle hash (float64 -> bytes -> float64 is exact, so the
  decoded coordinates must equal the arithmetic positions bit-for-bit).

The Arrow boundary is crossed once (one fused mapInPandas); the aggregate
after it is JVM codegen.  Scale note: records here are fixed-width per
(srid-present) class, so the 100 TB path batches each class with one
``frombuffer`` reshape per Arrow batch instead of a per-row parse — the
per-row loop below is the correctness reference for that kernel.  The
DuckDB oracle re-derives everything from the shared integer position hash
(geospatial.py protocol): matching sums PROVE decode(encode(x)) == x across
both byte orders and both header layouts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import wkb
from .geospatial import _XENG, _YENG, _event_points

_SRID = 9377  # the reference grid CRS (conf.yaml:21)


def t_wkb_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Decode stats per (little_endian, srid) class: n, exact coordinate
    sums (positions are integer-valued -> BIGINT-exact), total record
    bytes (21 plain / 25 EWKB — proves header-layout handling)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for eid, x, y in zip(pdf["event_id"], pdf["x"], pdf["y"]):
                eid = int(eid)
                le = bool(eid % 2)
                srid = _SRID if eid % 3 == 0 else None
                payload = wkb.encode_wkb_point(
                    float(x), float(y), little_endian=le, srid=srid)
                m = wkb.decode_wkb_point(payload)
                rows.append((m["little_endian"], m["srid"], m["x"], m["y"],
                             len(payload)))
            yield pd.DataFrame(rows, columns=[
                "little_endian", "srid", "x", "y", "rec_len"])

    pts = _event_points(spark, sf)
    dec = pts.mapInPandas(
        batches,
        "little_endian boolean, srid long, x double, y double, rec_len long")
    return (dec.groupBy("little_endian", "srid")
            .agg(F.count("*").alias("n"),
                 F.sum("x").cast("long").alias("sum_x"),
                 F.sum("y").cast("long").alias("sum_y"),
                 F.sum("rec_len").alias("wire_bytes"))
            .orderBy("little_endian", "srid"))


SQL_WKB_DECODE = f"""
WITH p AS (
  SELECT event_id % 2 = 1 AS little_endian,
         CASE WHEN event_id % 3 = 0 THEN {_SRID} ELSE 0 END AS srid,
         {_XENG} AS x, {_YENG} AS y,
         CASE WHEN event_id % 3 = 0 THEN 25 ELSE 21 END AS rec_len
  FROM events
)
SELECT little_endian, CAST(srid AS BIGINT) AS srid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(rec_len) AS BIGINT) AS wire_bytes
FROM p GROUP BY little_endian, srid ORDER BY little_endian, srid
"""


QUERIES = {
    "geo_wkb_decode": (t_wkb_decode, SQL_WKB_DECODE),
}
