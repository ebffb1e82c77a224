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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells_sql


def compact_cover(cells: DataFrame, cell_col: str = "cell",
                  min_depth: int = 4) -> DataFrame:
    """``cells[cell_col]`` (a disjoint cell set, any mix of depths) ->
    DataFrame(cell, depth): the equivalent cover where no complete sibling
    quad survives above ``min_depth``.  Invalid cells (< 0) are dropped.
    """
    # checkpoint the distinct input ONCE so the (possibly expensive) upstream
    # — e.g. a pandas-UDF encode — is not re-executed by the max-depth probe
    # AND the first merge pass
    cur = (cells.select(F.col(cell_col).alias("cell"))
                .filter(F.col("cell") >= 0).distinct()
                .localCheckpoint(eager=True))
    max_d = cur.agg(F.max(cells_sql.cell_depth(F.col("cell")))).first()[0]
    if max_d is None:
        return cur.select("cell", cells_sql.cell_depth(F.col("cell")).alias("depth"))
    for _ in range((int(max_d) - min_depth) // 2):
        stat = cur.withColumn(
            "__p",
            F.when(cells_sql.cell_depth(F.col("cell")) >= min_depth + 2,
                   cells_sql.cell_parent(F.col("cell"), 2)))
        quads = (stat.filter(F.col("__p").isNotNull())
                     .groupBy("__p").agg(F.count("*").alias("__n"))
                     .filter(F.col("__n") == 4).select("__p")
                     .localCheckpoint(eager=True))
        if quads.count() == 0:  # fixpoint: nothing merged, stop early
            break
        cur = (stat.join(quads, "__p", "left_anti").select("cell")
                   .union(quads.select(F.col("__p").alias("cell")))
                   .localCheckpoint(eager=True))
    return cur.select("cell", cells_sql.cell_depth(F.col("cell")).alias("depth"))
