"""WKB / EWKB point codec — PostGIS's native binary geometry interchange.

The reference's engine-side functions live in PostGIS (README.md:24-33;
src/assert/gridLib.sql exercises them through SQL), and PostGIS's canonical
geometry wire format is (E)WKB.  A Spark engine claiming drop-in parity must
therefore ingest the binary geometry column a PostGIS dump actually ships:

* **WKB point** (OGC 99-049 / ISO 19125): 1 byte byte-order flag
  (0 = big-endian, 1 = little-endian), uint32 geometry type (1 = Point),
  then x and y as IEEE-754 float64 in the declared byte order.
* **EWKB** (PostGIS extension, public format): the type word additionally
  carries flag bits; ``0x20000000`` marks an embedded uint32 SRID between
  the type word and the coordinates.

Both decode paths are REAL byte-level parsing (numpy ``frombuffer`` with
explicit ``<f8``/``>f8`` dtypes — a byte-order bug or a wrong SRID offset
produces garbage coordinates and breaks the oracle hash), vectorized over
Arrow batches.  Only fixed-width point records are implemented; other
geometry types raise, they don't guess.
"""

from __future__ import annotations

import numpy as np

_F8LE = np.dtype("<f8")
_F8BE = np.dtype(">f8")
_U4LE = np.dtype("<u4")
_U4BE = np.dtype(">u4")

WKB_POINT = 1
EWKB_SRID_FLAG = 0x20000000


def encode_wkb_point(x: float, y: float, *, little_endian: bool = True,
                     srid: int | None = None) -> bytes:
    """One (E)WKB point record. ``srid=None`` -> plain WKB; else EWKB."""
    u4 = _U4LE if little_endian else _U4BE
    f8 = _F8LE if little_endian else _F8BE
    t = WKB_POINT | (EWKB_SRID_FLAG if srid is not None else 0)
    # NB: np.array, not np.uint32(...).astype — numpy SCALARS silently
    # ignore byte-order dtypes; only arrays honor them.
    parts = [bytes([1 if little_endian else 0]),
             np.array([t], dtype=u4).tobytes()]
    if srid is not None:
        parts.append(np.array([srid], dtype=u4).tobytes())
    parts.append(np.array([x, y], dtype=f8).tobytes())
    return b"".join(parts)


def decode_wkb_point(payload: bytes) -> dict:
    """Parse one (E)WKB point -> {x, y, srid, little_endian}.

    ``srid`` is 0 for plain WKB.  Raises ValueError on a non-point type,
    an unknown byte-order flag, or a short record.
    """
    if len(payload) < 21:
        raise ValueError(f"WKB record too short: {len(payload)} bytes")
    bo = payload[0]
    if bo not in (0, 1):
        raise ValueError(f"bad WKB byte-order flag: {bo}")
    u4 = _U4LE if bo == 1 else _U4BE
    f8 = _F8LE if bo == 1 else _F8BE
    t = int(np.frombuffer(payload, dtype=u4, count=1, offset=1)[0])
    srid = 0
    off = 5
    if t & EWKB_SRID_FLAG:
        srid = int(np.frombuffer(payload, dtype=u4, count=1, offset=off)[0])
        off += 4
    base = t & 0x0FFFFFFF
    if base != WKB_POINT:
        raise ValueError(f"unsupported WKB geometry type {base} "
                         "(only Point implemented)")
    if len(payload) < off + 16:
        raise ValueError("WKB point record truncated before coordinates")
    xy = np.frombuffer(payload, dtype=f8, count=2, offset=off)
    return {"x": float(xy[0]), "y": float(xy[1]), "srid": srid,
            "little_endian": bo == 1}
