"""Cell-cover join: point-cells vs mixed-precision jurisdiction covers (A21/B8).

Semantics from /root/reference/data/citycover.csv: each municipality's
footprint is a set of Grid B cells at *mixed* depths (3-hex cells next to
4-hex+half-bit cells).  A point matches a municipality when any cover cell is
a prefix-ancestor of the point's cell.

Scale strategy (SURVEY.md §2.B8): the naive formulation is an interval join
(point_key BETWEEN cover.lo AND cover.hi) -> BroadcastNestedLoopJoin, which
dies at 10^12 rows.  Rewrite: covers exist at only a handful of distinct
depths D (|D| <= ~8), so compute each point-cell's ancestor at every d in D
(cheap native bit-shifts, map-side) and do ONE hash equi-join on the ancestor
cell id against the broadcast cover dim.  No shuffle of the fact table at all
when the dim is broadcast.

Border cells legitimately appear in several municipalities' covers; the join
therefore yields candidate sets.  ``cover_lookup_best`` picks the
deterministic min(isolabel_ext) (exact disambiguation = PIP refinement, A20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells_sql


def cover_depths(cover: DataFrame) -> list[int]:
    return sorted(r.depth for r in cover.select("depth").distinct().collect())


def cover_join_candidates(points: DataFrame, cover: DataFrame,
                          cell_col: str = "cell") -> DataFrame:
    """points (any cols + cell_col) x cover -> + (isolabel_ext, cover_cell).

    One broadcast hash equi-join on exploded per-depth ancestors.
    """
    depths = cover_depths(cover)
    anc = F.array(*[cells_sql.cell_ancestor_at(F.col(cell_col), d) for d in depths])
    exploded = points.withColumn("__anc", F.explode(anc)).filter(F.col("__anc") >= 0)
    dim = cover.select(F.col("cell").alias("__anc"),
                       F.col("isolabel_ext"),
                       F.col("cell").alias("cover_cell"))
    return exploded.join(F.broadcast(dim), "__anc").drop("__anc")


def cover_lookup_best(points: DataFrame, cover: DataFrame,
                      cell_col: str = "cell", keep: list[str] | None = None) -> DataFrame:
    """Deterministic single-match cover lookup (min isolabel per point)."""
    keep = keep or [c for c in points.columns]
    cand = cover_join_candidates(points, cover.filter(F.col("kind") == "cover"), cell_col)
    return cand.groupBy(*keep).agg(F.min("isolabel_ext").alias("isolabel_ext"))
