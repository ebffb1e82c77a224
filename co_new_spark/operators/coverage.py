"""A19 coverage clip as a Spark operator: cell geometry ∩ broadcast polygon.

Reproduces the shape of the reference's grid256L0coverage.geojson product
(each L0 cell clipped to the Colombia boundary) for arbitrary polygons and
cell depths: one Arrow crossing computes box + Sutherland–Hodgman clip +
shoelace area per cell (numpy, polygon captured in the UDF closure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..grid import cells as ncells
from ..grid import geometry


def clip_area_udf(ring: np.ndarray):
    frozen = np.asarray(ring, dtype=np.float64).copy()

    @F.pandas_udf(DoubleType())
    def clip_area(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64, na_value=-1)
        x0, y0, x1, y1 = ncells.cell_b_box(c)
        boxes = np.stack([x0, y0, x1, y1], axis=1)
        areas = np.full(len(c), np.nan)
        ok = c >= 0
        areas[ok] = geometry.clip_area_to_rects(frozen, boxes[ok])
        return pd.Series(areas)

    return clip_area


def coverage_clip(cells_df: DataFrame, ring: np.ndarray,
                  cell_col: str = "cell") -> DataFrame:
    """cells (+ any cols) -> + clip_area (m²) of cell ∩ polygon; keeps only
    overlapping cells.  The polygon is broadcast via closure; at scale,
    candidate cells should be prefiltered by the polygon bbox (cheap prefix
    algebra) before this Arrow crossing."""
    out = cells_df.withColumn("clip_area", clip_area_udf(ring)(F.col(cell_col)))
    return out.filter(F.col("clip_area") > 0)
