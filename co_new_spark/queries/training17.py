"""Product-quantization ANN with ADC shortlist + exact re-rank
(``train_pq_ann``) — the memory-scale path for similarity search (Jégou et
al. 2011, public algorithm, independently coded as DataFrame ops).

Why it exists: the registry's ANN family covers brute force (correctness
scale), LSH buckets, and IVF probing; PQ is the fourth production technique
and the one that changes the MEMORY equation — vectors compress to M
per-sub-space codebook codes and query-time distance is computed against
codes alone (asymmetric distance computation), so a 100 TB vector corpus
scans as bits-per-dimension while the float vectors stay cold until the
final re-rank touches only the shortlist.

Configuration is the SQ limit of PQ — M = 64 one-dimensional sub-quantizers
with K = 8 entries each (3 bits/dim vs 32-bit floats, a 10.7x compression)
— chosen by MEASUREMENT: on this corpus 8-dim sub-quantizers (classic
PQ8x8) reach only 0.52 exact-top-5-in-shortlist-50 recall while the scalar
configuration reaches 1.00 (noise-dominated synthetic embeddings have no
low-dimensional subspace structure for coarse sub-quantizers to exploit);
the pipeline (codebook -> codes -> ADC shortlist -> exact re-rank) is
identical for any (M, SUB, K).

Exactness protocol: vectors integerize as floor(emb[j] * 1024) + 1024 —
float32 -> double exact, power-of-two scale exact, floor unambiguous, and
the offset keeps every value NON-NEGATIVE so integer-division truncation
equals floor in both engines (Spark ``div`` truncates, and trunc == floor
only for non-negatives — the Lloyd means below divide).  Every distance,
mean, and ADC total is exact int64.

Codebook: deterministic, fully SQL-derivable, and NEVER collected — the
initial K entries per dim are the sub-values of md5-min-wise sampled winner
vectors (stratum = vec_id % K, the operators/ann.py convention), refined by
ONE distributed Lloyd round (assign via broadcast codebook dim join,
integer means sum div count, empty clusters keep the old entry).  The whole
model stays a broadcast-sized DataFrame end to end; the oracle re-derives
codebook, codes, ADC, shortlist, and re-rank entirely in SQL.

Scale shape: the only fact-sized operations are the posexplode to
(vec_id, dim, value) — partial-aggregated mapper-side onto the 512-group
(dim, k) model — the code assignment (same shape), and the ADC scan, which
joins the CODE table against the broadcast 10k-row query distance table and
collapses immediately to (qid, cid) partial sums.  Shortlist (R = 50) and
re-rank windows are per-query bounded.  Recall vs exact integer brute force
is pytest-gated (measured 1.00 at R = 50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

_PQ_DIMS = 64    # embedding dimensionality (checked by the oracle shape)
_PQ_K = 8        # codebook entries per dimension (3 bits/dim)
_PQ_NQ = 20      # query set: vec_id < 20
_PQ_R = 50       # ADC shortlist size
_PQ_TOPK = 5


def _int_vec(col):
    """array<float> -> exact NON-NEGATIVE array<long>: floor(v*1024)+1024."""
    return F.transform(col, lambda v: (F.floor(v.cast("double") * 1024)
                                       + 1024).cast("long"))


def _md5_h(idcol):
    return F.conv(F.substring(F.md5(F.concat(F.lit("pq_"),
                                             idcol.cast("string"))), 1, 8),
                  16, 10).cast("long")


def _ints(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", _int_vec(F.col("embedding")).alias("xi"))


def _pe(df: DataFrame, idname: str) -> DataFrame:
    """posexplode to (id, j, x) with 1-based j."""
    return df.select(F.col("vec_id").alias(idname),
                     F.posexplode("xi").alias("j0", "x")) \
             .select(idname, (F.col("j0") + 1).alias("j"), "x")


def _codebook(ints: DataFrame) -> DataFrame:
    """(j, k, c) scalar codebook after one distributed Lloyd round.
    Broadcast-sized (64 x 8); never collected."""
    win = (ints.groupBy(F.pmod(F.col("vec_id"), F.lit(_PQ_K)).alias("k"))
               .agg(F.min(F.struct(_md5_h(F.col("vec_id")).alias("h"),
                                   F.col("vec_id").alias("i"),
                                   F.col("xi").alias("v"))).alias("m")))
    c0 = (win.select("k", F.posexplode("m.v").alias("j0", "c"))
             .select("k", (F.col("j0") + 1).alias("j"), "c"))
    pe = _pe(ints, "vid")
    d0 = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    asg = (pe.join(F.broadcast(c0), "j")
             .groupBy("vid", "j", "x")
             .agg(F.min(F.struct(d0.alias("d"), F.col("k").alias("k")))
                  .getField("k").alias("k0")))
    means = (asg.groupBy("j", F.col("k0").alias("k"))
                .agg(F.expr("sum(x) div count(*)").cast("long").alias("c1")))
    # empty clusters keep the sampled entry
    return (c0.join(means, ["j", "k"], "left")
              .select("j", "k", F.coalesce("c1", "c").alias("c")))


def g_pq_ann(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    ints = _ints(emb).localCheckpoint(eager=True)  # feeds 3 consumers
    cb = _codebook(ints).localCheckpoint(eager=True)

    d = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    codes = (_pe(ints, "cid").join(F.broadcast(cb), "j")
             .groupBy("cid", "j", "x")
             .agg(F.min(F.struct(d.alias("d"), F.col("k").alias("k")))
                  .getField("k").alias("code"))
             .select("cid", "j", "code"))

    qints = ints.filter(F.col("vec_id") < _PQ_NQ)
    qd = (_pe(qints, "qid").join(F.broadcast(cb), "j")
          .select("qid", "j", F.col("k").alias("code"), d.alias("qdist")))

    adc = (codes.join(F.broadcast(qd), ["j", "code"])
                .filter(F.col("qid") != F.col("cid"))
                .groupBy("qid", "cid")
                .agg(F.sum("qdist").alias("adc")))
    ws = Window.partitionBy("qid").orderBy(F.col("adc"), F.col("cid"))
    short = (adc.withColumn("rs", F.row_number().over(ws))
                .filter(F.col("rs") <= _PQ_R).select("qid", "cid"))

    # exact re-rank of the shortlist only — the cold-storage touch
    cv = ints.select(F.col("vec_id").alias("cid"), F.col("xi").alias("cx"))
    qv = qints.select(F.col("vec_id").alias("qid"), F.col("xi").alias("qx"))
    ex = (short.join(cv, "cid").join(F.broadcast(qv), "qid")
          .select("qid", "cid",
                  F.aggregate(F.zip_with("qx", "cx",
                                         lambda a, b: (a - b) * (a - b)),
                              F.lit(0).cast("long"),
                              lambda acc, v: acc + v).alias("d2")))
    wr = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cid"))
    return (ex.withColumn("rn", F.row_number().over(wr))
              .filter(F.col("rn") <= _PQ_TOPK)
              .select("qid", "cid", "d2", "rn")
              .orderBy("qid", "rn"))


SQL_PQ_ANN = f"""
WITH ints AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(floor(CAST(v AS DOUBLE) * 1024) + 1024 AS BIGINT))
           AS xi
  FROM embeddings
), jdim AS (SELECT unnest(generate_series(1, {_PQ_DIMS})) AS j),
pe AS MATERIALIZED (
  SELECT i.vec_id, jdim.j, i.xi[jdim.j] AS x FROM ints i, jdim
), win AS (
  SELECT vec_id % {_PQ_K} AS k,
         min(struct_pack(
             h := CAST(concat('0x', substring(md5(concat('pq_',
                      CAST(vec_id AS VARCHAR))), 1, 8)) AS BIGINT),
             i := vec_id, v := xi)).v AS wv
  FROM ints GROUP BY 1
), c0 AS MATERIALIZED (
  SELECT w.k, jdim.j, w.wv[jdim.j] AS c FROM win w, jdim
), asg AS (
  SELECT pe.vec_id, pe.j, pe.x,
         min(struct_pack(d := (pe.x - c0.c) * (pe.x - c0.c), k := c0.k)).k
           AS k0
  FROM pe JOIN c0 ON c0.j = pe.j
  GROUP BY pe.vec_id, pe.j, pe.x
), means AS (
  SELECT j, k0 AS k, sum(x) // count(*) AS c1
  FROM asg GROUP BY j, k0
), cb AS MATERIALIZED (
  SELECT c0.j, c0.k, coalesce(m.c1, c0.c) AS c
  FROM c0 LEFT JOIN means m ON m.j = c0.j AND m.k = c0.k
), codes AS MATERIALIZED (
  SELECT pe.vec_id AS cid, pe.j,
         min(struct_pack(d := (pe.x - cb.c) * (pe.x - cb.c), k := cb.k)).k
           AS code
  FROM pe JOIN cb ON cb.j = pe.j
  GROUP BY pe.vec_id, pe.j, pe.x
), qd AS (
  SELECT pe.vec_id AS qid, pe.j, cb.k AS code,
         (pe.x - cb.c) * (pe.x - cb.c) AS qdist
  FROM pe JOIN cb ON cb.j = pe.j
  WHERE pe.vec_id < {_PQ_NQ}
), adc AS (
  SELECT qd.qid, codes.cid, sum(qd.qdist) AS adc
  FROM codes JOIN qd ON qd.j = codes.j AND qd.code = codes.code
  WHERE qd.qid <> codes.cid
  GROUP BY qd.qid, codes.cid
), short AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rs
    FROM adc) WHERE rs <= {_PQ_R}
), ex AS (
  SELECT s.qid, s.cid,
         sum((pq.x - pc.x) * (pq.x - pc.x)) AS d2
  FROM short s
  JOIN pe pq ON pq.vec_id = s.qid
  JOIN pe pc ON pc.vec_id = s.cid AND pc.j = pq.j
  GROUP BY s.qid, s.cid
)
SELECT qid, cid, d2, rn FROM (
  SELECT qid, cid, d2,
         row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
  FROM ex) WHERE rn <= {_PQ_TOPK}
ORDER BY qid, rn
"""


QUERIES = {
    "train_pq_ann": (g_pq_ann, SQL_PQ_ANN),
}
