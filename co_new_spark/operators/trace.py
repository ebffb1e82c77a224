"""Segment -> cell trace: which grid cells does a straight planar segment
pass through?  (Route/trajectory coverage — the line-rasterization analogue
of point geocoding; feeds road-snapping, trip-to-cell rollups, linear-asset
joins.)

Semantics: densify-then-encode — N+1 evenly spaced samples along the
segment, encode each, keep the distinct cells.  That is the contract real
pipelines use at scale (an exact supercover needs per-cell boundary algebra;
densification is one narrow projection + the existing vectorized encode UDF
and its error is bounded by the sample spacing vs cell size).

Everything is native until the one Arrow crossing of the cell encode:
sequence -> explode -> fused lerp arithmetic -> pandas-UDF encode ->
distinct.  The sample fraction t/N uses N = a power of two so the lerp is
bit-exact reproducible in any IEEE engine (the DuckDB oracle re-states it
verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import geo

N_SAMPLES = 64  # power of two: t/N exact in float64


def segment_cells(df: DataFrame, x1: Column, y1: Column, x2: Column, y2: Column,
                  rbits: int, keep: list[str] | None = None,
                  n_samples: int = N_SAMPLES) -> DataFrame:
    """One row per (kept columns, distinct cell) the segment touches;
    off-grid samples (cell < 0) are dropped.  ``n_samples`` must be a power
    of two (bit-exact lerp contract)."""
    if n_samples <= 0 or n_samples & (n_samples - 1):
        raise ValueError(f"n_samples must be a power of two, got {n_samples}")
    keep = keep or []
    t = F.explode(F.sequence(F.lit(0), F.lit(n_samples))).alias("__t")
    s = df.select(*keep, x1.alias("__x1"), y1.alias("__y1"),
                  x2.alias("__x2"), y2.alias("__y2")).select(*keep, "__x1", "__y1", "__x2", "__y2", t)
    frac = F.col("__t").cast("double") / F.lit(float(n_samples))
    xs = F.col("__x1") + (F.col("__x2") - F.col("__x1")) * frac
    ys = F.col("__y1") + (F.col("__y2") - F.col("__y1")) * frac
    enc = s.select(*keep, geo.xy_to_cell_b(xs, ys, rbits).alias("cell"))
    return enc.filter(F.col("cell") >= 0).distinct()
