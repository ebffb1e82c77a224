"""Raster XYZ tile assignment over the Grid B plane (A26) — pure native math.

Tiles are the XYZ/TMS convention applied to the grid's bounding matrix in
EPSG:9377: at zoom z the bbox (origin /root/reference/conf.yaml:22, extent
4x5 L0 cells) splits into 2^z x 2^z tiles; y counts from the TOP row (XYZ).
tile <-> cell relations reduce to prefix algebra on the shared lattice.
All column expressions — participates in whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..grid import grids

X0 = grids.L0_ORIGIN_X
Y0 = grids.L0_ORIGIN_Y
X_EXTENT = grids.L0_NI * grids.L0_SIDE  # 2,097,152 m
Y_EXTENT = grids.L0_NJ * grids.L0_SIDE  # 2,621,440 m


def tile_x(x: Column, z: int) -> Column:
    return F.floor((x - F.lit(X0)) / F.lit(X_EXTENT / (1 << z))).cast("long")


def tile_y(y: Column, z: int) -> Column:
    """XYZ convention: y=0 is the TOP tile row."""
    return F.floor((F.lit(Y0 + Y_EXTENT) - y) / F.lit(Y_EXTENT / (1 << z))).cast("long")


def tile_id(x: Column, y: Column, z: int) -> Column:
    """Row-major tile id at zoom z; NULL outside the grid bbox."""
    tx, ty = tile_x(x, z), tile_y(y, z)
    ok = (tx >= 0) & (tx < (1 << z)) & (ty >= 0) & (ty < (1 << z))
    return F.when(ok, ty * (1 << z) + tx)


def tile_quadkey_num(x: Column, y: Column, z: int) -> Column:
    """Bing-style quadkey as an integer: sum over levels of digit*4^k.

    digit_k = 2*bit_k(ty) + bit_k(tx), k from the top zoom bit down.
    """
    tx, ty = tile_x(x, z), tile_y(y, z)
    out = F.lit(0).cast("long")
    for k in range(z - 1, -1, -1):
        digit = (
            F.shiftrightunsigned(ty, k).bitwiseAND(F.lit(1)) * 2
            + F.shiftrightunsigned(tx, k).bitwiseAND(F.lit(1))
        )
        out = out * 4 + digit
    ok = (tx >= 0) & (tx < (1 << z)) & (ty >= 0) & (ty < (1 << z))
    return F.when(ok, out)
