"""Cover compaction — collapse every complete quad of sibling cells into its
parent, cascading upward, producing the minimal mixed-depth cover of a cell
set (the normalization step after rasterizing points/polygons to fixed-depth
cells; the same op S2 calls ``CellUnion.Normalize``).

Spark-native shape: one pass merges ALL complete quads at every depth
simultaneously (groupBy parent -> count == 4), and passes repeat
``(max_depth - min_depth) / 2`` times so cascades propagate; each pass's
input shrinks by >= the number of merged quads, and the shuffle key is the
parent cell — at 100 TB this is a handful of small aggregations over an
already-aggregated cell set, not the raw points.

Cell packing per co_new_spark.functions.cells_sql: ``(bits << 6) | nbits``;
parent = 2 bits up (quadtree, /root/reference/README.md:51 recursive 4-way
Morton partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells_sql


def compact_cover(cells: DataFrame, cell_col: str = "cell",
                  min_depth: int = 4,
                  group_cols: Sequence[str] = ()) -> DataFrame:
    """``cells[cell_col]`` (a disjoint cell set, any mix of depths) ->
    DataFrame(*group_cols, cell, depth): the equivalent cover where no
    complete sibling quad survives above ``min_depth``.  Invalid cells
    (< 0) are dropped.  With ``group_cols`` every group compacts
    independently (the shuffle key of each pass is (group, parent), so a
    hot group behaves like any other hot key and groups never synchronize).
    """
    gc = list(group_cols)
    # checkpoint the distinct input ONCE so the (possibly expensive) upstream
    # — e.g. a pandas-UDF encode — is not re-executed by the max-depth probe
    # AND the first merge pass
    cur = (cells.select(*gc, F.col(cell_col).alias("cell"))
                .filter(F.col("cell") >= 0).distinct()
                .localCheckpoint(eager=True))
    max_d = cur.agg(F.max(cells_sql.cell_depth(F.col("cell")))).first()[0]
    if max_d is None:
        return cur.select(*gc, "cell",
                          cells_sql.cell_depth(F.col("cell")).alias("depth"))
    for _ in range((int(max_d) - min_depth) // 2):
        stat = cur.withColumn(
            "__p",
            F.when(cells_sql.cell_depth(F.col("cell")) >= min_depth + 2,
                   cells_sql.cell_parent(F.col("cell"), 2)))
        quads = (stat.filter(F.col("__p").isNotNull())
                     .groupBy(*gc, "__p").agg(F.count("*").alias("__n"))
                     .filter(F.col("__n") == 4).select(*gc, "__p")
                     .localCheckpoint(eager=True))
        if quads.count() == 0:  # fixpoint: nothing merged, stop early
            break
        cur = (stat.join(quads, [*gc, "__p"], "left_anti").select(*gc, "cell")
                   .union(quads.select(*gc, F.col("__p").alias("cell")))
                   .localCheckpoint(eager=True))
    return cur.select(*gc, "cell",
                      cells_sql.cell_depth(F.col("cell")).alias("depth"))


def dissolve_cover(cells: DataFrame, group_cols: Sequence[str],
                   cell_col: str = "cell", min_depth: int = 4) -> DataFrame:
    """Attribute dissolve over cell covers — the cell-algebra form of
    ``ST_Union(geom) GROUP BY attr``: per group, union the member features'
    covers (dedup), drop every cell that has a PROPER ancestor in the same
    group's set (sibling features' covers overlap at mixed depths along
    shared boundaries — the union must not double-represent that area),
    then quad-compact the resulting antichain via :func:`compact_cover`.

    Scale shape: pruning is an ancestor-chain explode (bounded by
    ``depth - min_depth`` ≤ 26 rows per cell, a narrow projection) followed
    by two equi-joins keyed on (group, cell) — never an interval range join
    or an all-pairs compare; compaction inherits compact_cover's
    per-(group, parent) keyed passes.  Descendant pruning guarantees the
    compaction input is an antichain, which quad merges preserve (a created
    parent's other content would have been under one of its four children),
    so no DISTINCT is needed after merge passes.
    """
    gc = list(group_cols)
    base = (cells.select(*gc, F.col(cell_col).alias("cell"))
                 .filter(F.col("cell") >= 0).distinct()
                 .localCheckpoint(eager=True))
    d = cells_sql.cell_depth(F.col("cell"))
    anc_chain = F.when(
        d > min_depth,
        F.transform(F.sequence(F.lit(min_depth), d - F.lit(1)),
                    lambda dep: cells_sql.cell_ancestor_at(F.col("cell"), dep))
    ).otherwise(F.array().cast("array<long>"))
    anc = (base.select(*gc, "cell", F.explode(anc_chain).alias("__anc"))
               .join(base.select(*gc, F.col("cell").alias("__anc")),
                     [*gc, "__anc"], "left_semi")
               .select(*gc, "cell").distinct())
    pruned = base.join(anc, [*gc, "cell"], "left_anti")
    return compact_cover(pruned, min_depth=min_depth, group_cols=gc)
