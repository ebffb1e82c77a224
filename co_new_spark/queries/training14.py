"""Training-pipeline surface, part 14: late-interaction retrieval — MaxSim
(ColBERT, Khattab & Zaharia, SIGIR 2020).  The retrieval family's third
scoring model alongside lexical BM25 (training9) and single-vector cosine
(train_knn_*, RRF in training12): every document token keeps its OWN vector
and a query scores  sum over query tokens of the MAX dot product against any
document token — fine-grained term matching that single-vector pooling
destroys, the standard reranker in modern retrieval-augmented pipelines.

One driver-oracle-checked entry:

* ``train_maxsim_topk`` — top-10 documents per query for four fixed
  3-token queries under MaxSim over the first 8 tokens of each document.
  Token vectors are DERIVED, not stored: dimension j of token t is
  ``2*nibble_j(md5(t)) - 15`` (16 dims, odd integers in [-15, 15]) — a
  deterministic hashed embedding both engines compute independently, so
  every dot product is an exact int64 and the ranking has no float drift;
  ties break on doc_id.

Scale notes (100 TB): the doc-token table is the only fact-sized stream
(8 rows/doc); query tokens are a literal broadcast (12 rows), so scoring is
a broadcast nested-loop the size of fact x 12 with NO shuffle until the
per-(doc, query, qtoken) max — which, like the per-(doc, query) sum after
it, is an algebraic agg with map-side combine.  Final per-query top-k uses
the salted two-phase selection (operators/salt.salted_topk) — never a
single-reducer window over all docs of a query.  The 16-nibble dot product
is a row-local Catalyst aggregate; for real 128-dim token embeddings the
vectorized mapInPandas path (operators/ann.py) is the documented swap-in.

Reference context: same documents table and single-space tokenization as
every train_* entry, so MaxSim rankings compose with BM25 (train_bm25_topk)
and RRF fusion (train_rrf_fusion) for hybrid-retrieval audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.salt import salted_topk
from ..sources.tables import load

_DIM = 16        # md5 hex nibbles used per token vector
_NTOK = 8        # document tokens scored per doc
_TOPK = 10

_QUERIES = {
    1: ["sort", "merge", "join"],
    2: ["filter", "scan", "table"],
    3: ["stream", "batch", "window"],
    4: ["hash", "group", "agg"],
}


def _nib(md5col, j):
    """Dimension j of the hashed token vector: 2*nibble_j(md5) - 15."""
    return (F.conv(md5col.substr(j, F.lit(1)), 16, 10).cast("long")
            * 2 - 15)


def maxsim_topk(docs: DataFrame, spark: SparkSession) -> DataFrame:
    """Top-k docs per fixed query under integer MaxSim."""
    dtok = (docs.filter(F.col("text").isNotNull())
            .select("doc_id",
                    F.explode(F.slice(F.split("text", " "), 1, _NTOK))
                     .alias("dt"))
            .select("doc_id", F.md5("dt").alias("md"))
            .distinct())  # dup doc tokens can't change a max

    qrows = [(qid, t) for qid, toks in _QUERIES.items() for t in toks]
    qtok = spark.createDataFrame(qrows, "qid long, qt string") \
                .select("qid", "qt", F.md5("qt").alias("mq"))

    dot = F.aggregate(
        F.sequence(F.lit(1), F.lit(_DIM)), F.lit(0).cast("long"),
        lambda acc, j: acc + _nib(F.col("md"), j) * _nib(F.col("mq"), j))
    scored = (dtok.crossJoin(F.broadcast(qtok))
              .select("doc_id", "qid", "qt", dot.alias("dot"))
              .groupBy("doc_id", "qid", "qt")
              .agg(F.max("dot").alias("best"))
              .groupBy("doc_id", "qid")
              .agg(F.sum("best").alias("score")))
    top = salted_topk(scored, ["qid"],
                      [F.col("score").desc(), F.col("doc_id")], _TOPK)
    return (top.select("qid", F.col("rn").cast("long").alias("rn"),
                       "doc_id", "score")
            .orderBy("qid", "rn"))


def t_maxsim_topk(spark: SparkSession, sf: str) -> DataFrame:
    from .training import _spread

    docs = _spread(load(spark, sf, "documents").select("doc_id", "text"))
    return maxsim_topk(docs, spark)


def _sql_maxsim_topk() -> str:
    qvals = ", ".join(f"({qid}, '{t}')"
                      for qid, toks in _QUERIES.items() for t in toks)
    nib = "(strpos('0123456789abcdef', substr({m}, CAST(j AS INT), 1)) * 2 - 17)"
    return f"""
WITH dtok AS (
  SELECT DISTINCT doc_id, md5(dt) AS md FROM (
    SELECT doc_id, unnest(string_split(text, ' ')[1:{_NTOK}]) AS dt
    FROM documents WHERE text IS NOT NULL)),
qtok AS (
  SELECT qid, md5(qt) AS mq FROM (VALUES {qvals}) q(qid, qt)),
dots AS (
  SELECT doc_id, qid, mq,
         list_sum(list_transform(range(1, {_DIM} + 1),
           j -> {nib.format(m='md')} * {nib.format(m='mq')})) AS dot
  FROM dtok, qtok),
best AS (
  SELECT doc_id, qid, mq, max(dot) AS best FROM dots GROUP BY 1, 2, 3),
score AS (
  SELECT doc_id, qid, sum(best) AS score FROM best GROUP BY 1, 2),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rn
  FROM score)
SELECT qid, CAST(rn AS BIGINT) AS rn, doc_id, CAST(score AS BIGINT) AS score
FROM ranked WHERE rn <= {_TOPK} ORDER BY qid, rn
"""


QUERIES = {
    "train_maxsim_topk": (t_maxsim_topk, _sql_maxsim_topk()),
}
