"""Connected components over a candidate-pair graph — the clustering step of
large-scale near-duplicate removal (LSH/Jaccard pairs -> duplicate CLUSTERS,
keep one representative per cluster).

Implements the alternating **large-star / small-star** algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014 — public
algorithm, independently coded here as DataFrame ops).  Each round is two
shuffle-by-node aggregations; the edge set converges to stars (every node
pointing at its component's minimum id) in O(log^2 n) rounds — at 100 TB this
is the standard shape (no driver-side adjacency, no per-row Python), and each
round's shuffle shrinks geometrically as stars collapse.

Driver involvement is one tiny convergence probe per round (count + hash-sum
of the edge set), the same pattern GraphX/Pregel uses; the data never leaves
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Orient (hi, lo), drop self-loops, dedupe — the canonical edge form."""
    return (e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
             .filter(F.col("u") != F.col("v")).distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return (sym.join(mins, "u")
               .filter(F.col("v") > F.col("u"))
               .select(F.col("v").alias("u"),
                       F.least("mn", F.col("u")).alias("v")))


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor (and u itself) to the min."""
    o = _canon(e)
    mins = o.groupBy("u").agg(F.min("v").alias("mn"))
    to_min = o.join(mins, "u").select(F.col("v").alias("u"),
                                      F.col("mn").alias("v"))
    self_edge = mins.select("u", F.col("mn").alias("v"))
    return to_min.union(self_edge)


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         max_iter: int = 25) -> DataFrame:
    """``edges(u, v)`` undirected -> ``(node, component)`` where component is
    the minimum node id reachable.  ``nodes(node)`` optionally adds isolated
    nodes (component = themselves).

    Convergence is detected by an order-insensitive fingerprint of the
    canonical edge set (count + sum of xxhash64(u, v)); each round is
    localCheckpointed so lineage stays linear in rounds, not exponential.
    """
    e = _canon(edges).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iter):
        # lazy checkpoint: the probe's collect below is the round's ONLY job —
        # it materializes the checkpoint as it runs (eager=True would pay a
        # second full pass over the round's shuffles just to checkpoint)
        e = _canon(_small_star(_large_star(e))).localCheckpoint(eager=False)
        # decimal(38,0) sum: immune to ANSI long-overflow on the hash sum
        fp = e.agg(F.count("*").alias("n"),
                   F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h")
                   ).collect()[0]
        cur = (fp["n"], fp["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # at convergence the canonical edges form stars: hi-node -> component min
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    comp = (sym.groupBy("u").agg(F.min("v").alias("mn"))
               .select(F.col("u").alias("node"),
                       F.least("mn", F.col("u")).alias("component")))
    if nodes is not None:
        comp = (nodes.select(F.col(nodes.columns[0]).alias("node"))
                     .join(comp, "node", "left")
                     .select("node", F.coalesce("component", "node")
                             .alias("component")))
    return comp
