"""kNN via grid cell-ring expansion (A17 + B16/B17).

The north-star kNN path: instead of a cross join, each query point expands to
its grid cell + king-move ring cells (native once the ring array is computed;
the ring itself needs the L0 ji lookup, so it's one Arrow crossing per query
batch — queries are the SMALL side).  Candidates join by exact cell id (hash
join), then exact planar distance + ranking window keep the top k.

Completeness: a ring-r expansion finds all true neighbors within r*cell_side
of the query's cell; callers pick (depth, ring) so that the k-th neighbor is
expected well inside that radius.  Queries that end up with fewer than k
matches fall back to a wider ring (second pass over only those queries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..grid import cells as ncells


def _ring_udf(ring: int):
    @F.pandas_udf(ArrayType(LongType()))
    def ring_cells(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64, na_value=-1)
        nb = ncells.neighbors_b(c, ring=ring)
        out = []
        for me, row in zip(c, nb):
            cs = [int(v) for v in row if v >= 0]
            if me >= 0:
                cs.append(int(me))
            out.append(cs)
        return pd.Series(out)

    return ring_cells


def ring_cells_udf(ring: int):
    """Public surface for the ring-expansion UDF (cell -> array<cell> incl. self)."""
    return _ring_udf(ring)


def ring_cells_d2_udf(ring: int):
    """Ring expansion that keeps the lattice geometry: cell ->
    array<struct<cell, d2>> of GRID-VALID neighbors (self excluded), with
    d2 = dy² + dx² in lattice units — derived from neighbors_b's fixed
    (dy, dx) column order, so it stays correct at grid borders where
    off-grid columns are dropped."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    offs = [(dy, dx) for dy in range(-ring, ring + 1)
            for dx in range(-ring, ring + 1) if not (dy == 0 and dx == 0)]
    d2s = [dy * dy + dx * dx for dy, dx in offs]
    out_t = ArrayType(StructType([StructField("cell", LongType()),
                                  StructField("d2", IntegerType())]))

    @F.pandas_udf(out_t)
    def ring_cells_d2(cell: pd.Series) -> pd.Series:
        c = cell.to_numpy(dtype=np.int64, na_value=-1)
        nb = ncells.neighbors_b(c, ring=ring)
        out = []
        for row in nb:
            out.append([{"cell": int(v), "d2": d2s[k]}
                        for k, v in enumerate(row) if v >= 0])
        return pd.Series(out)

    return ring_cells_d2


def knn_ring(queries: DataFrame, candidates: DataFrame, k: int = 5,
             ring: int = 1, exclude_self: bool = False,
             fallback_ring: int | None = None) -> DataFrame:
    """queries(qid, x, y, cell) x candidates(cid, x, y, cell) -> top-k per qid.

    Both inputs carry a Grid B cell at the SAME (even) refinement depth.
    ``exclude_self`` drops qid == cid pairs (self-kNN over one table).

    ``fallback_ring``: queries that found fewer than k matches at ``ring``
    re-run ONCE at this wider ring (the completeness fallback of SURVEY.md
    §2.A17) — a second small broadcast pass over only the short queries,
    never a cross join.
    """
    first = _knn_pass(queries, candidates, k, ring, exclude_self)
    if fallback_ring is None:
        return first
    counts = first.groupBy("qid").agg(F.count("*").alias("__n"))
    full = first.join(
        F.broadcast(counts.filter(F.col("__n") >= k).select("qid")), "qid")
    short_q = queries.join(F.broadcast(counts), "qid", "left") \
                     .filter(F.coalesce(F.col("__n"), F.lit(0)) < k).drop("__n")
    second = _knn_pass(short_q, candidates, k, fallback_ring, exclude_self)
    return full.unionByName(second)


def _knn_pass(queries: DataFrame, candidates: DataFrame, k: int,
              ring: int, exclude_self: bool) -> DataFrame:
    q = queries.withColumn("__ring", F.explode(_ring_udf(ring)(F.col("cell")))) \
               .select(F.col("qid"), F.col("x").alias("qx"), F.col("y").alias("qy"),
                       F.col("__ring").alias("cell"))
    c = candidates.select("cid", F.col("x").alias("cx"), F.col("y").alias("cy"), "cell")
    pairs = c.join(F.broadcast(q), "cell")
    if exclude_self:
        pairs = pairs.filter(F.col("qid") != F.col("cid"))
    d2 = (F.col("qx") - F.col("cx")) ** 2 + (F.col("qy") - F.col("cy")) ** 2
    scored = pairs.select("qid", "cid", F.sqrt(d2).alias("dist"))
    w = Window.partitionBy("qid").orderBy(F.col("dist"), F.col("cid"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("qid", "cid", F.round(F.col("dist"), 3).alias("dist"), "rn"))
