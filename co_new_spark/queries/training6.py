"""Training-pipeline surface, part 6: iterative embedding clustering.

``train_kmeans_lloyd`` — distributed k-means (operators/kmeans.py) over the
``embeddings`` table: K = 8 centroids, T = 3 unrolled Lloyd rounds, output
is each vector's final cluster and exact squared distance to its centroid.
The corpus-curation use: cluster the document embedding space to balance /
sample / diagnose a training mixture (the clustering stage of
semantic-dedup-style pipelines), here as a first-class oracle-checked
operator.

Cross-engine exactness (no materialized intermediates needed, unlike the
hash-seeded DSIR/perplexity entries): quantization, distances, argmin
tie-breaks and floor-division means are ALL integer-deterministic, and the
md5 seeding is the same string hash in both engines — so the oracle can
restate every round as unrolled CTEs (the geo_cell_pagerank recipe) and
hash-match the final assignment bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.kmeans import kmeans_lloyd, quantize
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


def _sql_kmeans() -> str:
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
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT vec_id, cid AS cluster, d2 FROM afin ORDER BY vec_id
"""


QUERIES = {
    "train_kmeans_lloyd": (t_kmeans_lloyd, _sql_kmeans()),
}
