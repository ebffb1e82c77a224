"""Training-pipeline surface, part 6: iterative embedding clustering.

``train_kmeans_lloyd`` — distributed k-means (operators/kmeans.py) over the
``embeddings`` table: K = 8 centroids, T = 3 unrolled Lloyd rounds, output
is each vector's final cluster and exact squared distance to its centroid.
The corpus-curation use: cluster the document embedding space to balance /
sample / diagnose a training mixture (the clustering stage of
semantic-dedup-style pipelines), here as a first-class oracle-checked
operator.

``train_semdedup`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540) on top
of that clustering: pair vectors ONLY within their k-means cluster, call a
pair a semantic duplicate when its exact integer squared distance is at
most ``_SD_EPS2`` micro-units², and keep, per duplicate relation, the
vector FARTHEST from its centroid (the paper's keep-low-centroid-similarity
rule), ties broken on vec_id.  Scale shape: the quadratic pair compare is
confined to one cluster (an equi-join on the cluster id — never all-pairs);
at corpus scale K grows with N so cluster populations stay bounded, which
is exactly the paper's reason for clustering first.  The drop rule is a
local tournament (EXISTS a better in-eps neighbour), not a global CC — one
self-join + one anti-join semantics, no iteration.

Cross-engine exactness (no materialized intermediates needed, unlike the
hash-seeded DSIR/perplexity entries): quantization, distances, argmin
tie-breaks and floor-division means are ALL integer-deterministic, and the
md5 seeding is the same string hash in both engines — so the oracle can
restate every round as unrolled CTEs (the geo_cell_pagerank recipe) and
hash-match the final assignment bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import assign, kmeans_fit, kmeans_lloyd, quantize
from ..operators.pca import top_direction
from ..sources.tables import load

_KM_K = 8
_KM_T = 3


def t_kmeans_lloyd(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    vecs = quantize(emb).select("vec_id", "q")
    return kmeans_lloyd(vecs, k=_KM_K, rounds=_KM_T).orderBy("vec_id")


_D2 = ("CAST(list_sum(list_transform(list_zip(e.q, c.cq), "
       "x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT)")


def _sql_assign(cent: str, alias: str) -> str:
    return f"""
{alias} AS (
  SELECT vec_id, q, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2, cid) AS rn
    FROM (SELECT e.vec_id, e.q, c.cid, {_D2} AS d2
          FROM e CROSS JOIN {cent} c))
  WHERE rn = 1)"""


def _sql_update(asn: str, prev: str, new: str) -> str:
    return f"""
{new} AS (
  SELECT c.cid, coalesce(n.nq, c.cq) AS cq
  FROM {prev} c LEFT JOIN (
    SELECT cid, array_agg(m ORDER BY pos) AS nq FROM (
      SELECT cid, pos,
             CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS m
      FROM (SELECT cid, unnest(q) AS v,
                   generate_subscripts(q, 1) AS pos FROM {asn})
      GROUP BY cid, pos) GROUP BY cid) n ON n.cid = c.cid)"""


def _sql_kmeans_ctes() -> str:
    """The full unrolled clustering as a CTE chain ending in ``afin``
    (vec_id, q, cid, d2) — shared by the k-means entry and train_semdedup."""
    parts = [f"""e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS INT) AS cid,
         q AS cq
  FROM (SELECT vec_id, q FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_KM_K}))"""]
    for r in range(_KM_T):
        parts.append(_sql_assign(f"c{r}", f"a{r}"))
        parts.append(_sql_update(f"a{r}", f"c{r}", f"c{r + 1}"))
    parts.append(_sql_assign(f"c{_KM_T}", "afin"))
    return ",".join(parts)


def _sql_kmeans() -> str:
    return f"""
WITH {_sql_kmeans_ctes()}
SELECT vec_id, cid AS cluster, d2 FROM afin ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# train_semdedup — within-cluster semantic dedup over the final assignment
# ---------------------------------------------------------------------------

_SD_EPS2 = 1_300_000_000_000  # micro-units²; ~p1 of within-cluster pair d2
# (drops ~17% of sf0.001 vectors — a dedup-like rate on synthetic data)


def semdedup(vecs: DataFrame, k: int = _KM_K, rounds: int = _KM_T,
             eps: int = _SD_EPS2) -> DataFrame:
    """Cluster-then-pair semantic dedup over (vec_id, q) -> (vec_id,
    cluster, d2, kept).  ``k`` is the caller's corpus-size knob: the pair
    stage is quadratic IN THE CLUSTER, so the paper's contract K ∝ N keeps
    per-cluster populations (and therefore cost) linear — measured in the
    BENCH.md probe table (fixed K=8 at 10x input: 19.0x wall; K=80 at the
    same 10x input: 2.76x)."""
    asn = (kmeans_lloyd(vecs, k=k, rounds=rounds, with_vec=True)
           .localCheckpoint(eager=True))  # pair both sides off ONE run
    a = asn.select(F.col("cluster").alias("cl"), F.col("vec_id").alias("ia"),
                   F.col("q").alias("qa"), F.col("d2").alias("da"))
    b = asn.select(F.col("cluster").alias("cl"), F.col("vec_id").alias("ib"),
                   F.col("q").alias("qb"), F.col("d2").alias("db"))
    pd2 = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    # b is dropped when an in-eps a beats it: farther from the centroid,
    # ties to the smaller vec_id (a strict total order, so one survivor
    # always remains in every duplicate clique).
    beats = (F.col("da") > F.col("db")) | \
            ((F.col("da") == F.col("db")) & (F.col("ia") < F.col("ib")))
    dropped = (a.join(b, "cl")
                .where((F.col("ia") != F.col("ib")) & beats
                       & (pd2 <= F.lit(eps)))
                .select(F.col("ib").alias("vec_id"))
                .distinct()
                .withColumn("drop", F.lit(True)))
    return (asn.join(dropped, "vec_id", "left")
               .select("vec_id", "cluster", "d2",
                       F.coalesce(~F.col("drop"), F.lit(True)).alias("kept")))


def t_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    vecs = quantize(emb).select("vec_id", "q")
    return semdedup(vecs).orderBy("vec_id")


def _sql_semdedup() -> str:
    pd2 = ("CAST(list_sum(list_transform(list_zip(a.q, b.q), "
           "x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT)")
    return f"""
WITH {_sql_kmeans_ctes()},
drops AS (
  SELECT DISTINCT b.vec_id
  FROM afin a JOIN afin b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  WHERE {pd2} <= {_SD_EPS2}
    AND (a.d2 > b.d2 OR (a.d2 = b.d2 AND a.vec_id < b.vec_id)))
SELECT f.vec_id, f.cid AS cluster, f.d2,
       (d.vec_id IS NULL) AS kept
FROM afin f LEFT JOIN drops d ON d.vec_id = f.vec_id
ORDER BY f.vec_id
"""


# ---------------------------------------------------------------------------
# train_cluster_metrics — clustering validity report over the fitted model
# ---------------------------------------------------------------------------

def t_cluster_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cluster size / inertia / mean-d2 plus a Davies–Bouldin-style
    worst-ratio index (Davies & Bouldin 1979, restated on SQUARED integer
    distances so it stays cross-engine exact: R_ij = (s_i + s_j) / m_ij with
    s = floor-mean within-cluster d2 and m = centroid-pair d2; db_milli =
    floor(1000 * max_j R_ij)).  Scale shape: ONE map-side-combined
    groupBy(cluster) is the only fact-sized exchange; everything after —
    centroid pair distances, ratio, max — lives on K-row frames (the model
    is broadcast-sized by construction)."""
    emb = load(spark, sf, "embeddings")
    vecs = quantize(emb).select("vec_id", "q")
    cents = kmeans_fit(vecs, k=_KM_K, rounds=_KM_T).localCheckpoint(eager=True)
    asn = assign(vecs, cents)
    stats = (asn.groupBy("cluster")
                .agg(F.count("*").alias("n"), F.sum("d2").alias("inertia"))
                .withColumn("mean_d2",
                            F.floor(F.col("inertia") / F.col("n"))
                             .cast("long")))
    ci = cents.select(F.col("cid").alias("i"), F.col("cq").alias("qi"))
    cj = cents.select(F.col("cid").alias("j"), F.col("cq").alias("qj"))
    m = F.aggregate(
        F.zip_with(F.col("qi"), F.col("qj"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    pairs = (ci.join(cj, F.col("i") != F.col("j"))
               .withColumn("m", m).where(F.col("m") > 0)
               .select("i", "j", "m"))
    si = stats.select(F.col("cluster").alias("i"), F.col("mean_d2").alias("s_i"))
    sj = stats.select(F.col("cluster").alias("j"), F.col("mean_d2").alias("s_j"))
    r = (pairs.join(si, "i").join(sj, "j")
              .withColumn("r", F.floor(
                  (F.col("s_i") + F.col("s_j")).cast("double") * 1000
                  / F.col("m")).cast("long")))
    db = r.groupBy(F.col("i").alias("cluster")).agg(F.max("r").alias("db_milli"))
    return (stats.join(db, "cluster")
                 .select("cluster", "n", "inertia", "mean_d2", "db_milli")
                 .orderBy("cluster"))


def _sql_cluster_metrics() -> str:
    m = ("CAST(list_sum(list_transform(list_zip(a.cq, b.cq), "
         "x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT)")
    return f"""
WITH {_sql_kmeans_ctes()},
stats AS (
  SELECT cid, count(*) AS n, sum(d2) AS inertia,
         CAST(floor(CAST(sum(d2) AS DOUBLE) / count(*)) AS BIGINT) AS mean_d2
  FROM afin GROUP BY cid),
cp AS (
  SELECT a.cid AS i, b.cid AS j, {m} AS m
  FROM c{_KM_T} a JOIN c{_KM_T} b ON a.cid <> b.cid),
r AS (
  SELECT cp.i,
         CAST(floor(CAST(si.mean_d2 + sj.mean_d2 AS DOUBLE) * 1000 / cp.m)
              AS BIGINT) AS r
  FROM cp JOIN stats si ON si.cid = cp.i
          JOIN stats sj ON sj.cid = cp.j
  WHERE cp.m > 0)
SELECT s.cid AS cluster, s.n, s.inertia, s.mean_d2, max(r.r) AS db_milli
FROM stats s JOIN r ON r.i = s.cid
GROUP BY s.cid, s.n, s.inertia, s.mean_d2
ORDER BY cluster
"""


# ---------------------------------------------------------------------------
# train_embed_pca — dominant principal direction via unrolled power iteration
# ---------------------------------------------------------------------------

_PC_D = 64   # embeddings table dimension (the oracle hardcodes it too)
_PC_T = 8    # unrolled power-iteration rounds


def t_embed_pca(spark: SparkSession, sf: str) -> DataFrame:
    """Top scatter-matrix direction of the embedding space
    (operators/pca.py): the 'All-but-the-Top' (Mu & Viswanath 2018)
    corpus-level nuisance component, as a 64-row micro-unit vector.
    Semantics: the exact T-round power iterate (deterministic, oracle-
    exact) — on a corpus with a real dominant component T=8 converges
    (pytest: planted-direction cos > 0.99); on isotropic noise like the
    synthetic table it is simply the well-defined iterate."""
    emb = load(spark, sf, "embeddings")
    vecs = quantize(emb).select("vec_id", "q")
    return top_direction(vecs, dim=_PC_D, rounds=_PC_T)


def _sql_embed_pca() -> str:
    # every multiply-referenced CTE is MATERIALIZED: without it DuckDB
    # re-inlines each round's predecessor TWICE (once via w, once via m),
    # re-running the 2M-row scatter join 2^T times — minutes, not 0.3 s.
    parts = [f"""q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings),
mu AS (
  SELECT pos, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS m
  FROM (SELECT unnest(q) AS v, generate_subscripts(q, 1) AS pos FROM q)
  GROUP BY pos),
mul AS (SELECT list(m ORDER BY pos) AS mu FROM mu),
c AS (
  SELECT vec_id,
         list_transform(list_zip(q.q, mul.mu), x -> x[1] - x[2]) AS c
  FROM q, mul),
cu AS MATERIALIZED (
  SELECT vec_id, unnest(c) AS v, generate_subscripts(c, 1) AS p FROM c),
s AS MATERIALIZED (
  SELECT a.p - 1 AS pa, b.p - 1 AS pb, CAST(sum(a.v * b.v) AS BIGINT) AS s
  FROM cu a JOIN cu b USING (vec_id) GROUP BY 1, 2),
smax AS (SELECT max(abs(s)) AS mx FROM s),
sn AS MATERIALIZED (
  SELECT pa, pb,
         CAST(floor(CAST(s AS DOUBLE) * 1000000 / mx) AS BIGINT) AS val
  FROM s, smax),
v0 AS (SELECT CAST(range AS INT) AS pos, CAST(1000000 AS BIGINT) AS v
       FROM range({_PC_D}))"""]
    for r in range(_PC_T):
        parts.append(f"""
w{r} AS MATERIALIZED (
  SELECT sn.pa AS pos, sum(sn.val * v{r}.v) AS v
  FROM sn JOIN v{r} ON sn.pb = v{r}.pos GROUP BY sn.pa),
m{r} AS (SELECT max(abs(v)) AS mx FROM w{r}),
v{r + 1} AS MATERIALIZED (
  SELECT pos, CAST(floor(CAST(v AS DOUBLE) * 1000000 / mx) AS BIGINT) AS v
  FROM w{r}, m{r})""")
    return f"""
WITH {",".join(parts)}
SELECT pos, v FROM v{_PC_T} ORDER BY pos
"""


QUERIES = {
    "train_kmeans_lloyd": (t_kmeans_lloyd, _sql_kmeans()),
    "train_semdedup": (t_semdedup, _sql_semdedup()),
    "train_cluster_metrics": (t_cluster_metrics, _sql_cluster_metrics()),
    "train_embed_pca": (t_embed_pca, _sql_embed_pca()),
}
