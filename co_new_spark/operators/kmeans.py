"""Distributed k-means (Lloyd's algorithm) over embedding columns,
integer-exact across engines and partitionings.

Public method (Lloyd 1957 / MacQueen 1967); the distributed formulation is
the textbook one: broadcast the K centroids, per-vector argmin assignment,
per-cluster mean recompute.  Cross-engine exactness is engineered the same
way as geo_graph.pagerank_int: embeddings quantize ONCE to integer
micro-units, so every distance is exact 64-bit arithmetic and every
centroid mean is a floor division — no float accumulation order anywhere.
Seeding is a deterministic "random" sample: the first K vectors ordered by
md5(vec_id) (engine-agnostic, data-independent of insertion order).

Scale shape per round:
* assignment — centroids broadcast (K x D longs), one narrow xK projection,
  then a (vec)-keyed min-struct aggregate; ties break on (d2, cid)
  lexicographically, so the argmin is total.
* recompute — posexplode to (cluster, dim) and ONE map-side-combined sum
  (the only fact-sized exchange), then a K*D-row reassembly.  Centroids
  never touch the driver; an empty cluster carries its previous centroid
  (left-join coalesce), so K is stable across rounds.
* rounds are UNROLLED (fixed T) — no convergence probes, no driver loops
  on data (the geo_graph.pagerank_int / bfs_hops precedent).

Magnitude headroom: |q| <= ~1e7 micro-units -> d2 <= D * (2e7)^2 ~= 2.6e16
at D = 64, well inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize(emb: DataFrame, vec_col: str = "embedding",
             out: str = "q") -> DataFrame:
    """float vector -> integer micro-unit vector (exact in both engines:
    identical float32 bits widen to identical doubles before round)."""
    return emb.withColumn(out, F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * SCALE).cast("long")))


def seed_centroids(vecs: DataFrame, k: int,
                   id_col: str = "vec_id") -> DataFrame:
    """First k vectors by md5(id) -> (cid, cq).  Distributed limit first
    (TakeOrderedAndProject); the row_number window sees only <= k rows."""
    key = F.md5(F.col(id_col).cast("string"))
    top = vecs.orderBy(key, F.col(id_col)).limit(k)
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (top.withColumn("cid", (F.row_number().over(w) - 1).cast("int"))
               .select("cid", F.col("q").alias("cq")))


def _d2(q, cq):
    return F.aggregate(
        F.zip_with(q, cq, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def assign(vecs: DataFrame, cents: DataFrame,
           id_col: str = "vec_id") -> DataFrame:
    """(vec_id, q) x (cid, cq) -> (vec_id, q, cluster, d2) under argmin."""
    scored = (vecs.crossJoin(F.broadcast(cents))
                  .withColumn("d2", _d2(F.col("q"), F.col("cq"))))
    m = (scored.groupBy(id_col)
               .agg(F.min(F.struct("d2", "cid", "q")).alias("m")))
    return m.select(id_col, F.col("m.q").alias("q"),
                    F.col("m.cid").alias("cluster"),
                    F.col("m.d2").alias("d2"))


def recompute(asn: DataFrame, prev: DataFrame) -> DataFrame:
    """Per-cluster integer-mean centroids; empty clusters keep prev."""
    sums = (asn.select("cluster", F.posexplode("q").alias("pos", "v"))
               .groupBy("cluster", "pos")
               .agg(F.sum("v").alias("s"), F.count("*").alias("c")))
    means = sums.withColumn(
        "m", F.floor(F.col("s") / F.col("c")).cast("long"))
    newc = (means.groupBy("cluster")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "m"))),
                     lambda x: x["m"]).alias("nq"))
                 .select(F.col("cluster").alias("cid"), "nq"))
    return (prev.join(newc, "cid", "left")
                .select("cid", F.coalesce("nq", "cq").alias("cq")))


def kmeans_fit(vecs: DataFrame, k: int, rounds: int,
               id_col: str = "vec_id") -> DataFrame:
    """T Lloyd rounds; returns the FINAL model: (cid, cq) centroids."""
    cents = seed_centroids(vecs, k, id_col).localCheckpoint(eager=True)
    for _ in range(rounds):
        asn = assign(vecs, cents, id_col)
        cents = recompute(asn, cents).localCheckpoint(eager=True)
    return cents


def kmeans_lloyd(vecs: DataFrame, k: int, rounds: int,
                 id_col: str = "vec_id", with_vec: bool = False) -> DataFrame:
    """T Lloyd rounds; returns the assignment under the FINAL model:
    (vec_id, cluster, d2) — plus the quantized vector ``q`` when
    ``with_vec`` (consumers like SemDeDup pair within the cluster)."""
    cents = kmeans_fit(vecs, k, rounds, id_col)
    cols = [id_col, "cluster", "d2"] + (["q"] if with_vec else [])
    return assign(vecs, cents, id_col).select(*cols)
