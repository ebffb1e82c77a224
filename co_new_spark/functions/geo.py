"""Geospatial Spark surface: Arrow-batched pandas UDFs + native Column helpers.

Design rule (SURVEY.md §3.1): projection + morton + codec run inside a
*single* pandas UDF per direction so each row crosses the Arrow boundary
once.  Everything that can stay JVM-side (geo-URI parsing, hierarchy algebra,
tile math) is a native Column expression, not a UDF.

Reference parity anchors:
* encode semantics — /root/reference/src/assert/gridLib.sql:6-11
* grid parameters — /root/reference/conf.yaml:21-33
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..grid import cells, grids, proj

# ---------------------------------------------------------------------------
# A1: geo-URI parsing — pure native Columns (no UDF)
# ---------------------------------------------------------------------------

def geo_uri_lat(uri: Column) -> Column:
    """'geo:LAT,LON' -> lat double (NULL if not a geo URI).

    Pattern shared with functions.text (single grammar source)."""
    from .text import GEO_URI_RE

    s = F.regexp_extract(uri, GEO_URI_RE, 1)
    return F.when(s != "", s.cast("double"))


def geo_uri_lon(uri: Column) -> Column:
    from .text import GEO_URI_RE

    s = F.regexp_extract(uri, GEO_URI_RE, 2)
    return F.when(s != "", s.cast("double"))


# ---------------------------------------------------------------------------
# A2/A4/A6 composed: encode UDF factories (one Arrow crossing per direction)
# ---------------------------------------------------------------------------

def _to_np(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.float64, na_value=np.nan)


@lru_cache(maxsize=None)
def _encode_a_udf(ndigits: int):
    @F.pandas_udf(StringType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        codes = grids.osmcode_encode_a(_to_np(lat), _to_np(lon), ndigits)
        out = pd.Series(codes, dtype="object")
        out[out == ""] = None
        return out

    return enc


def encode_a(lat: Column, lon: Column, ndigits: int = 9) -> Column:
    """(lat, lon) -> Grid A base32nvu code (osmcode_encode); NULL off-grid."""
    return _encode_a_udf(ndigits)(lat, lon)


@lru_cache(maxsize=None)
def _encode_b_cell_udf(rbits: int):
    @F.pandas_udf(LongType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la, lo = _to_np(lat), _to_np(lon)
        x, y = proj.forward(la, lo)
        finite = np.isfinite(x) & np.isfinite(y)
        bits, valid = grids.grid_b_encode_xy(
            np.where(finite, x, 0.0), np.where(finite, y, 0.0), rbits
        )
        cell = cells.pack(bits, np.full(bits.shape, 4 + rbits, dtype=np.int64))
        return pd.Series(np.where(valid & finite, cell, -1))

    return enc


def encode_b_cell(lat: Column, lon: Column, rbits: int) -> Column:
    """(lat, lon) -> canonical Grid B cell long at ``rbits`` refinement; -1 off-grid."""
    return _encode_b_cell_udf(rbits)(lat, lon)


@lru_cache(maxsize=None)
def _xy_cell_udf(rbits: int):
    @F.pandas_udf(LongType())
    def enc(x: pd.Series, y: pd.Series) -> pd.Series:
        bits, valid = grids.grid_b_encode_xy(_to_np(x), _to_np(y), rbits)
        cell = cells.pack(bits, np.full(bits.shape, 4 + rbits, dtype=np.int64))
        return pd.Series(np.where(valid, cell, -1))

    return enc


def xy_to_cell_b(x: Column, y: Column, rbits: int) -> Column:
    """EPSG:9377 planar (x, y) -> Grid B cell long (projection already done)."""
    return _xy_cell_udf(rbits)(x, y)


_LATLON = StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())])
_XY = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])
_XYC = StructType([StructField("x", DoubleType()), StructField("y", DoubleType()),
                   StructField("cell", LongType())])
_BOX = StructType([StructField(n, DoubleType()) for n in ("xmin", "ymin", "xmax", "ymax")])


@lru_cache(maxsize=None)
def _latlon_to_xy_cell_udf(rbits: int):
    @F.pandas_udf(_XYC)
    def enc(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
        la, lo = _to_np(lat), _to_np(lon)
        x, y = proj.forward(la, lo)
        finite = np.isfinite(x) & np.isfinite(y)
        bits, valid = grids.grid_b_encode_xy(
            np.where(finite, x, 0.0), np.where(finite, y, 0.0), rbits)
        cell = cells.pack(bits, np.full(bits.shape, 4 + rbits, dtype=np.int64))
        return pd.DataFrame({"x": x, "y": y,
                             "cell": np.where(valid & finite, cell, -1)})

    return enc


def latlon_to_xy_cell(lat: Column, lon: Column, rbits: int) -> Column:
    """(lat, lon) -> struct(x, y, cell): projection + encode in ONE crossing.

    Use this instead of chaining latlon_to_xy |> xy_to_cell_b — each chained
    pandas UDF in a stage holds its own Python worker per task, and a filter
    on the chain's output re-evaluates the whole chain.
    """
    return _latlon_to_xy_cell_udf(rbits)(lat, lon)


@F.pandas_udf(_XY)
def latlon_to_xy(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
    """Forward EPSG:9377 projection (A2)."""
    x, y = proj.forward(_to_np(lat), _to_np(lon))
    return pd.DataFrame({"x": x, "y": y})


@F.pandas_udf(_LATLON)
def xy_to_latlon(x: pd.Series, y: pd.Series) -> pd.DataFrame:
    """Inverse EPSG:9377 projection (A3)."""
    la, lo = proj.inverse(_to_np(x), _to_np(y))
    return pd.DataFrame({"lat": la, "lon": lo})


@F.pandas_udf(_LATLON)
def decode_a_center(code: pd.Series) -> pd.DataFrame:
    """Grid A base32nvu code -> cell-center (lat, lon) (osmcode_decode, A10)."""
    la, lo = grids.osmcode_decode_a(code.fillna("").to_numpy(dtype=object))
    return pd.DataFrame({"lat": la, "lon": lo})


@F.pandas_udf(StringType())
def cell_b_code(cell: pd.Series) -> pd.Series:
    """Canonical Grid B cell long -> base16h string; NULL for -1."""
    c = cell.to_numpy(dtype=np.int64, na_value=-1)
    out = pd.Series(cells.cell_b_to_code(c), dtype="object")
    out[c < 0] = None
    return out


@F.pandas_udf(LongType())
def cell_b_from_code(code: pd.Series) -> pd.Series:
    """base16h string -> canonical Grid B cell long; -1 invalid."""
    return pd.Series(cells.cell_b_from_code(code.fillna("").to_numpy(dtype=object)))


@F.pandas_udf(_BOX)
def cell_b_box(cell: pd.Series) -> pd.DataFrame:
    """Grid B cell long -> EPSG:9377 bounding box (A5/A16)."""
    x0, y0, x1, y1 = cells.cell_b_box(cell.to_numpy(dtype=np.int64, na_value=-1))
    return pd.DataFrame({"xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1})


@F.pandas_udf(_XY)
def cell_b_center(cell: pd.Series) -> pd.DataFrame:
    cx, cy = cells.cell_b_center(cell.to_numpy(dtype=np.int64, na_value=-1))
    return pd.DataFrame({"x": cx, "y": cy})


@lru_cache(maxsize=None)
def _encode_b_cell_from_text_udf(rbits: int):
    # RE2 via pyarrow.compute (~4x pandas str.extract).  Patterns come from
    # functions.text (single source; RE2-safe constructs + explicit [ \t]
    # separator so Java/RE2/Python engines agree — see text.py note).
    from . import text as _tx

    @F.pandas_udf(LongType())
    def enc(text: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(text.fillna("").astype(str))
        g = pc.extract_regex(arr, _tx.GEO_URI_RE_NAMED)
        g_lat = pc.struct_field(g, "lat")
        if g_lat.null_count:  # pair fallback only when some rows missed geo:
            p = pc.extract_regex(arr, _tx.PLAIN_PAIR_RE_NAMED)
            lat_s = pc.coalesce(g_lat, pc.struct_field(p, "lat"))
            lon_s = pc.coalesce(pc.struct_field(g, "lon"), pc.struct_field(p, "lon"))
        else:
            lat_s, lon_s = g_lat, pc.struct_field(g, "lon")
        lat = pc.cast(lat_s, pa.float64()).to_numpy(zero_copy_only=False)
        lon = pc.cast(lon_s, pa.float64()).to_numpy(zero_copy_only=False)
        ok = np.isfinite(lat) & np.isfinite(lon)
        x, y = proj.forward(np.where(ok, lat, 0.0), np.where(ok, lon, 0.0))
        f = ok & np.isfinite(x) & np.isfinite(y)
        bits, valid = grids.grid_b_encode_xy(
            np.where(f, x, 0.0), np.where(f, y, 0.0), rbits)
        cell = cells.pack(bits, np.full(bits.shape, 4 + rbits, dtype=np.int64))
        return pd.Series(np.where(valid & f, cell, -1))

    return enc


def encode_b_cell_from_text(text: Column, rbits: int) -> Column:
    """A27+A2+A4 fused: geoparse text (geo: URI first, plain decimal pair
    fallback — same precedence as functions.text.parse_lat) + project +
    encode to a Grid B cell in ONE Arrow crossing; -1 where no coordinates
    or off-grid.  This is the flagship hot path: regex runs vectorized in
    pandas instead of four interpreted JVM regexp_extracts per row.
    """
    return _encode_b_cell_from_text_udf(rbits)(text)


@F.pandas_udf(StringType())
def cell_b_geojson(cell: pd.Series) -> pd.Series:
    """Grid B cell -> GeoJSON Feature string (WGS84 ring + base16h code).

    The visualization sink of the reference's decode path
    (osmcode_decode_polyXY -> GeoJSON, /root/reference/src/assert/
    gridLib.sql:15-16 + README.md:109-114; the grid256*.geojson files are
    exactly such products).  Deterministic 7-decimal formatting.
    """
    import json as _json

    c = cell.to_numpy(dtype=np.int64, na_value=-1)
    x0, y0, x1, y1 = cells.cell_b_box(c)
    codes = cells.cell_b_to_code(c)
    out = []
    for k in range(len(c)):
        if c[k] < 0 or not np.isfinite(x0[k]):
            out.append(None)
            continue
        xs = np.array([x0[k], x1[k], x1[k], x0[k], x0[k]])
        ys = np.array([y0[k], y0[k], y1[k], y1[k], y0[k]])
        la, lo = proj.inverse(xs, ys)
        ring = [[round(float(o), 7), round(float(a), 7)] for o, a in zip(lo, la)]
        out.append(_json.dumps({
            "type": "Feature",
            "properties": {"code": str(codes[k])},
            "geometry": {"type": "Polygon", "coordinates": [ring]},
        }, separators=(",", ":")))
    return pd.Series(out, dtype="object")


@F.pandas_udf(StringType())
def b16h_string(bits: pd.Series, nbits: pd.Series) -> pd.Series:
    """Generic (bits, nbits) -> base16h string (suffix-letter grammar §1.5).

    Used for shortcode suffixes (A23): the trailing bits below a jurisdiction's
    cover-cell prefix re-encoded standalone.  NULL where nbits < 0.
    """
    from ..grid.codec import b16h_encode

    b = bits.to_numpy(dtype=np.uint64, na_value=0)
    nb = nbits.to_numpy(dtype=np.int64, na_value=-1)
    out = pd.Series(b16h_encode(b, np.maximum(nb, 0)), dtype="object")
    out[nb < 0] = None
    return out


@F.pandas_udf(StringType())
def b32nvu_string(bits: pd.Series, nbits: pd.Series) -> pd.Series:
    """Generic (bits, nbits) -> base32nvu string (logistic codes, A23).

    Grammar per /root/reference/conf.yaml:33 (``log_base: 32nvu``): 5 bits
    per character, MSB first — so ``nbits`` must be a multiple of 5; NULL
    where it is not (or negative), never a silently truncated code.
    """
    from ..grid.codec import b32nvu_encode

    b = bits.to_numpy(dtype=np.uint64, na_value=0)
    nb = nbits.to_numpy(dtype=np.int64, na_value=-1)
    bad = (nb < 0) | (nb % 5 != 0)
    out = pd.Series(b32nvu_encode(b, np.where(bad, 0, nb)), dtype="object")
    out[bad] = None
    return out


@F.pandas_udf(StringType())
def encode_a_from_uri(uri: pd.Series) -> pd.Series:
    """'geo:LAT,LON' -> 9-digit Grid A code in ONE Arrow crossing (A8 fused).

    The fully-fused fast path for the flagship pipeline: regex parse is also
    available natively (geo_uri_lat/lon) when the plan wants pushdown first.
    """
    s = uri.fillna("").astype(str)
    m = s.str.extract(r"geo:(-?\d+\.?\d*),(-?\d+\.?\d*)")
    lat = pd.to_numeric(m[0], errors="coerce").to_numpy(dtype=np.float64)
    lon = pd.to_numeric(m[1], errors="coerce").to_numpy(dtype=np.float64)
    codes = grids.osmcode_encode_a(lat, lon, 9)
    out = pd.Series(codes, dtype="object")
    out[(out == "") | ~np.isfinite(lat)] = None
    return out
