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


# ---------------------------------------------------------------------------
# geo_polyline_codec — the Google Encoded Polyline Algorithm Format (public
# spec: developers.google.com/maps/documentation/utilities/polylinealgorithm),
# the OTHER ubiquitous geometry wire format next to (E)WKB: per-point E5
# integer lat/lng deltas, zigzag-signed, emitted as little-endian 5-bit
# chunks with a 0x20 continuation bit, each chunk + 63 into printable ASCII.
#
# Engine shape: the ENCODE side is pure Columns — the varint loop unrolls to
# a fixed 6-chunk conditional concat (deltas here fit in 24 bits; 6 chunks =
# 30 bits of headroom), so the whole wire string is built inside whole-stage
# codegen with ONE window shuffle (per-user lag for deltas) and one groupBy
# riding the same user_id partitioning.  The DECODE side is the genuinely
# sequential part (each char's continuation bit gates the next), so it is an
# Arrow-batched pandas_udf over the per-user strings — never per-row Python.
# Positions are integer E5 values derived from event_id (no float anywhere),
# so decode(encode(x)) == x must hold BIT-FOR-BIT; the oracle rebuilds the
# identical wire string from the same 6-chunk unrolling restated in SQL and
# compares md5(polyline) + the DECODED coordinate sums — a one-chunk, one-
# continuation-bit, or one-ordering error breaks the hash.
# ---------------------------------------------------------------------------

# E5 integer positions (Colombia-ish window: lat -4..4, lng -75..-68) —
# pure int64 arithmetic shared verbatim by both engines.
_LAT5 = "-400000 + (event_id * 48271) % 800000"
_LNG5 = "-7500000 + (event_id * 69621) % 700000"
_PL_CHUNKS = 6  # fixed unroll: covers |delta| < 2^29 (max here is ~2^24)


def _pl_enc_col(v):
    """Polyline varint encode of a NON-NEGATIVE zigzag Column -> string
    Column, 6-chunk unrolled (chunk k present iff k == 0 or v >> 5k > 0;
    continuation bit 0x20 iff v >> 5(k+1) > 0)."""
    parts = []
    for k in range(_PL_CHUNKS):
        rest = F.shiftright(v, 5 * k)
        more = F.shiftright(v, 5 * (k + 1)) > 0
        ch = F.char(rest.bitwiseAND(F.lit(31))
                    + F.when(more, F.lit(32)).otherwise(F.lit(0))
                    + F.lit(63))
        cond = F.lit(True) if k == 0 else (rest > 0)
        parts.append(F.when(cond, ch).otherwise(F.lit("")))
    return F.concat(*parts)


def _pl_enc_sql(v: str) -> str:
    """The SAME 6-chunk unrolling restated for the DuckDB oracle."""
    parts = []
    for k in range(_PL_CHUNKS):
        rest = f"(({v}) >> {5 * k})"
        more = f"(({v}) >> {5 * (k + 1)}) > 0"
        ch = f"chr(CAST(({rest} & 31) + CASE WHEN {more} THEN 32 ELSE 0 END + 63 AS INTEGER))"
        parts.append(ch if k == 0 else f"CASE WHEN {rest} > 0 THEN {ch} ELSE '' END")
    return " || ".join(parts)


def _pl_zigzag_col(d):
    return F.when(d < 0, -2 * d - 1).otherwise(2 * d)


def t_polyline_codec(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user encoded polyline over time-ordered E5 positions, plus the
    decoded-walk totals: (user_id, n_points, poly_chars, poly_md5,
    sum_lat5, sum_lng5).  sum_* come from the pandas DECODER, not the
    source integers — equality with the oracle's direct sums proves the
    full encode->wire->decode loop is lossless."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from ..sources.tables import load

    ev = load(spark, sf, "events").select(
        "event_id", "user_id", "ts",
        F.expr(_LAT5).cast("long").alias("lat5"),
        F.expr(_LNG5).cast("long").alias("lng5"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (ev.withColumn("dlat", F.col("lat5") - F.coalesce(
             F.lag("lat5").over(w), F.lit(0)))
           .withColumn("dlng", F.col("lng5") - F.coalesce(
             F.lag("lng5").over(w), F.lit(0))))
    pair = F.concat(_pl_enc_col(_pl_zigzag_col(F.col("dlat"))),
                    _pl_enc_col(_pl_zigzag_col(F.col("dlng"))))
    enc = d.select("user_id", "ts", "event_id", pair.alias("pair"))
    agg = (enc.groupBy("user_id")
           .agg(F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(
                            F.struct("ts", "event_id", "pair"))),
                        lambda s: s["pair"]),
                    "").alias("poly")))

    @pandas_udf("n_points long, sum_lat5 long, sum_lng5 long")
    def pl_decode(polys: pd.Series) -> pd.DataFrame:
        out = []
        for s in polys:
            lat = lng = 0
            sums = [0, 0]
            n = 0
            i, m = 0, len(s)
            vals = []
            while i < m:
                v, shift = 0, 0
                while True:
                    b = ord(s[i]) - 63
                    i += 1
                    v |= (b & 31) << shift
                    shift += 5
                    if b < 32:
                        break
                vals.append((v >> 1) ^ -(v & 1))
                if len(vals) == 2:
                    lat += vals[0]
                    lng += vals[1]
                    sums[0] += lat
                    sums[1] += lng
                    n += 1
                    vals = []
            out.append((n, sums[0], sums[1]))
        return pd.DataFrame(out, columns=["n_points", "sum_lat5", "sum_lng5"])

    dec = agg.withColumn("d", pl_decode(F.col("poly")))
    return (dec.select(
                "user_id",
                F.col("d.n_points").alias("n_points"),
                F.length("poly").cast("long").alias("poly_chars"),
                F.md5("poly").alias("poly_md5"),
                F.col("d.sum_lat5").alias("sum_lat5"),
                F.col("d.sum_lng5").alias("sum_lng5"))
            .orderBy("user_id"))


def _sql_polyline_codec() -> str:
    zz_lat = "CASE WHEN dlat < 0 THEN -2*dlat - 1 ELSE 2*dlat END"
    zz_lng = "CASE WHEN dlng < 0 THEN -2*dlng - 1 ELSE 2*dlng END"
    return f"""
WITH pts AS (
  SELECT event_id, user_id, ts,
         CAST({_LAT5} AS BIGINT) AS lat5,
         CAST({_LNG5} AS BIGINT) AS lng5
  FROM events
), d AS (
  SELECT user_id, ts, event_id, lat5, lng5,
         lat5 - COALESCE(lag(lat5) OVER w, 0) AS dlat,
         lng5 - COALESCE(lag(lng5) OVER w, 0) AS dlng
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), e AS (
  SELECT user_id, ts, event_id, lat5, lng5,
         {_pl_enc_sql(zz_lat)} || {_pl_enc_sql(zz_lng)} AS pair
  FROM d
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(length(string_agg(pair, '' ORDER BY ts, event_id)) AS BIGINT)
         AS poly_chars,
       md5(string_agg(pair, '' ORDER BY ts, event_id)) AS poly_md5,
       CAST(sum(lat5) AS BIGINT) AS sum_lat5,
       CAST(sum(lng5) AS BIGINT) AS sum_lng5
FROM e GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "geo_wkb_decode": (t_wkb_decode, SQL_WKB_DECODE),
    "geo_polyline_codec": (t_polyline_codec, _sql_polyline_codec()),
}
