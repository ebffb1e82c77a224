"""Training-pipeline surface, part 3: near-dup clustering (connected
components), dedup keep-best-representative, greedy sequence packing, and
log-free TF-IDF term ranking — each driver-oracle-checked (the component
oracle is a DuckDB recursive-CTE transitive closure; packing is a recursive
running-total; both recompute the exact same edge/score inputs in SQL).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators.components import connected_components
from ..operators.packing import pack_greedy
from ..sources.tables import load
from .training import jaccard_pairs, sql_jaccard
from .training2 import SQL_QUALITY

# ---------------------------------------------------------------------------
# Near-dup clustering: candidate pairs -> connected components
# ---------------------------------------------------------------------------

# Correctness-path doc cap (round-2 review item: the registered entry ran
# exact Jaccard over ALL docs — 13.1 s at sf0.1 — and crowded the driver's
# per-entry budget).  The recursive-CTE oracle proves the CC algorithm at
# any size, so the REGISTERED entry runs on an sf-independent doc subset;
# bench.py raises the cap via env to keep measuring the full-corpus path.
_ND_DOCS = int(os.environ.get("CO_ND_DOCS", "2000"))
_ND_SRC = f"(SELECT * FROM documents WHERE doc_id < {_ND_DOCS})"


def _nd_docs(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "documents").filter(F.col("doc_id") < _ND_DOCS)


def _doc_components(spark: SparkSession, sf: str) -> DataFrame:
    docs = _nd_docs(spark, sf)
    edges = jaccard_pairs(docs).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    return connected_components(edges, nodes=docs.select("doc_id")).select(
        F.col("node").alias("doc_id"), "component")


def t_neardup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Every doc labelled with its duplicate-cluster id (= min doc_id
    reachable over the exact-Jaccard pair graph); singletons label
    themselves.  Spark side: alternating large-star/small-star
    (operators/components.py); oracle: recursive-CTE transitive closure."""
    return _doc_components(spark, sf)


SQL_COMPONENTS = f"""
WITH RECURSIVE
j AS (SELECT doc_a AS u, doc_b AS v FROM ({sql_jaccard(_ND_SRC)})),
ed AS (SELECT u, v FROM j UNION SELECT v AS u, u AS v FROM j),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM {_ND_SRC}
  UNION
  SELECT r.src, e.v FROM reach r JOIN ed e ON e.u = r.dst
)
SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
"""


def t_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """The full dedup flow: cluster near-dups, then keep ONE canonical doc
    per cluster — highest quality score, doc_id as the deterministic
    tie-break.  This is the row-level outcome a 100 TB pipeline materializes
    (components + quality are both shuffles on already-reduced keys)."""
    comp = _doc_components(spark, sf)
    docs = _nd_docs(spark, sf)
    q = docs.select("doc_id", tx.quality_score(F.col("text")).alias("quality"))
    j = comp.join(q, "doc_id")
    w = Window.partitionBy("component")
    wo = w.orderBy(F.col("quality").desc(), "doc_id")
    return (j.withColumn("n_members", F.count("*").over(w))
             .withColumn("rn", F.row_number().over(wo))
             .filter(F.col("rn") == 1)
             .select("component", F.col("doc_id").alias("canonical_doc"),
                     "n_members", F.col("quality").alias("best_quality")))


SQL_KEEP_BEST = f"""
SELECT component, doc_id AS canonical_doc, n_members, quality AS best_quality
FROM (
  SELECT c.component, q.doc_id, q.quality,
         count(*) OVER (PARTITION BY c.component) AS n_members,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.quality DESC, q.doc_id) AS rn
  FROM ({SQL_COMPONENTS}) c
  JOIN (SELECT * FROM ({SQL_QUALITY}) WHERE doc_id < {_ND_DOCS}) q
    ON q.doc_id = c.doc_id
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# Greedy sequence packing (context-window bin assignment)
# ---------------------------------------------------------------------------

PACK_CAPACITY = 128


def t_seq_pack(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "source", "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    return pack_greedy(docs, "source", "doc_id", "n_tok", PACK_CAPACITY)


SQL_SEQ_PACK = f"""
WITH RECURSIVE t AS (
  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), r(source, doc_id, n_tok, rn, bin_id, acc) AS (
  SELECT source, doc_id, n_tok, rn, CAST(0 AS BIGINT), n_tok
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.doc_id, t.n_tok, t.rn,
         CASE WHEN r.acc + t.n_tok > {PACK_CAPACITY}
              THEN r.bin_id + 1 ELSE r.bin_id END,
         CASE WHEN r.acc + t.n_tok > {PACK_CAPACITY}
              THEN t.n_tok ELSE r.acc + t.n_tok END
  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1
)
SELECT source, doc_id, n_tok, bin_id FROM r
"""

# ---------------------------------------------------------------------------
# TF-IDF top terms per source (log-free scoring for cross-engine bit-parity)
# ---------------------------------------------------------------------------

TFIDF_TOPK = 5


def t_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top distinctive terms per source by tf * (n_sources / source_df).

    The classical idf log() is replaced by the raw inverse-document-frequency
    ratio: identical RANKING for fixed tf (log is monotone), but the score
    stays in +,*,/ — IEEE-identical across engines, so the driver's value
    hash can gate it (libm log differs in ulps between JVM and DuckDB).
    """
    docs = load(spark, sf, "documents")
    toks = (docs.select("source", F.explode(F.split("text", " ")).alias("term"))
                .filter(F.col("term") != ""))
    tf = toks.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(
        F.countDistinct("source").cast("long").alias("df"))
    n_src = docs.agg(F.countDistinct("source").cast("double").alias("n_src"))
    scored = (tf.join(df_, "term").crossJoin(F.broadcast(n_src))
                .withColumn("score", F.round(
                    F.col("tf") * F.col("n_src") / F.col("df"), 6)))
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "term")
    return (scored.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= TFIDF_TOPK)
                  .select("source", "term", F.col("tf").cast("long").alias("tf"),
                          "df", "score", "rn"))


SQL_TFIDF = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), tk AS (
  SELECT * FROM toks WHERE term <> ''
), tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2
), dfx AS (
  SELECT term, CAST(count(DISTINCT source) AS BIGINT) AS df FROM tk GROUP BY 1
), ns AS (
  SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n_src FROM documents
)
SELECT source, term, tf, df, score, rn FROM (
  SELECT tf.source, tf.term, tf.tf, dfx.df,
         round(tf.tf * ns.n_src / dfx.df, 6) AS score,
         row_number() OVER (PARTITION BY tf.source
                            ORDER BY round(tf.tf * ns.n_src / dfx.df, 6) DESC,
                                     tf.term) AS rn
  FROM tf JOIN dfx USING (term) CROSS JOIN ns
) WHERE rn <= {TFIDF_TOPK}
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (content-hash gated, re-runnable)
# ---------------------------------------------------------------------------


def t_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    """80/10/10 split keyed on the content hash (first md5 byte): the split a
    doc lands in never depends on partitioning, row order, or RNG seeds —
    the property a 100 TB pipeline needs so re-runs and backfills agree."""
    docs = load(spark, sf, "documents")
    b = F.conv(F.substring(F.md5(F.col("text")), 1, 2), 16, 10).cast("int")
    split = (F.when(b < 204, "train").when(b < 230, "val").otherwise("test"))
    return (docs.withColumn("split", split)
                .groupBy("source", "split")
                .agg(F.count("*").alias("n_docs"),
                     F.min("doc_id").alias("first_doc")))


SQL_SPLIT = """
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS first_doc
FROM (
  SELECT source, doc_id,
         CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT source, doc_id,
               (strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1) AS b
        FROM documents)
) GROUP BY source, split
"""

# ---------------------------------------------------------------------------
# Token-rarity scoring (integer-exact statistical quality filter)
# ---------------------------------------------------------------------------


def t_rarity_score(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc average corpus frequency of its tokens — the log-free stand-in
    for unigram-LM perplexity filtering.  All aggregation stays in BIGINT
    (token counts), with ONE double division at the end, so the result is
    bit-stable across engines and partitionings (float sums are not
    order-associative; integer sums are)."""
    docs = load(spark, sf, "documents")
    toks = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
                .filter(F.col("term") != ""))
    cnt = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    per_doc = (toks.join(cnt, "term")
                   .groupBy("doc_id")
                   .agg(F.sum("cnt").alias("sum_freq"),
                        F.count("*").cast("long").alias("n_tok")))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
                .select("doc_id",
                        F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
                        F.coalesce("sum_freq", F.lit(0)).alias("sum_freq"),
                        F.round(F.when(F.coalesce("n_tok", F.lit(0)) > 0,
                                       F.col("sum_freq").cast("double")
                                       / F.col("n_tok")).otherwise(0.0), 6)
                        .alias("avg_freq")))


SQL_RARITY = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tk AS (
  SELECT * FROM toks WHERE term <> ''
), cnt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY term
), per_doc AS (
  SELECT doc_id, CAST(sum(cnt.cnt) AS BIGINT) AS sum_freq,
         CAST(count(*) AS BIGINT) AS n_tok
  FROM tk JOIN cnt USING (term) GROUP BY doc_id
)
SELECT d.doc_id, coalesce(p.n_tok, 0) AS n_tok,
       coalesce(p.sum_freq, 0) AS sum_freq,
       round(CASE WHEN coalesce(p.n_tok, 0) > 0
                  THEN CAST(p.sum_freq AS DOUBLE) / p.n_tok
                  ELSE 0.0 END, 6) AS avg_freq
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


# ---------------------------------------------------------------------------
# The SCALE near-dup flow: MinHash-LSH candidates -> connected components
# ---------------------------------------------------------------------------


def t_neardup_scaled(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster size histogram over the LSH candidate graph — the
    composition a 100 TB dedup actually runs (no exact all-pairs Jaccard:
    banded MinHash bounds the candidate join, CC clusters the survivors).
    Rows-only (xxhash64 signatures aren't SQL-visible); the invariant that
    every candidate pair shares a component is pytest-gated."""
    from .training import t_minhash_lsh_candidates

    edges = t_minhash_lsh_candidates(spark, sf).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    docs = load(spark, sf, "documents").select("doc_id")
    comp = connected_components(edges, nodes=docs)
    return (comp.groupBy("component").agg(F.count("*").alias("size"))
                .groupBy("size").agg(F.count("*").alias("n_clusters"))
                .orderBy("size"))


def _sql_neardup_scaled() -> str:
    """Oracle for the scale near-dup flow (upgrades it from rows-only): the
    candidate edges are re-derived from the MATERIALIZED band table the
    query itself writes (mat.py protocol, same bytes), and the large-star/
    small-star clustering is checked against a recursive-CTE closure over
    those edges plus every document as a singleton node."""
    from .mat import mat_glob
    from .training import _sql_capped_pairs

    pairs = _sql_capped_pairs(f"read_parquet('{mat_glob('minhash_bands')}')")
    return f"""
WITH RECURSIVE
j AS (SELECT doc_a AS u, doc_b AS v FROM ({pairs})),
ed AS (SELECT u, v FROM j UNION SELECT v AS u, u AS v FROM j),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.v FROM reach r JOIN ed e ON e.u = r.dst
),
comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
          FROM comp GROUP BY component)
SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY size
"""


QUERIES = {
    "train_neardup_components": (t_neardup_components, SQL_COMPONENTS),
    "train_neardup_scaled": (t_neardup_scaled, _sql_neardup_scaled()),
    "train_split_assign": (t_split_assign, SQL_SPLIT),
    "train_rarity_score": (t_rarity_score, SQL_RARITY),
    "train_dedup_keep_best": (t_dedup_keep_best, SQL_KEEP_BEST),
    "train_seq_pack": (t_seq_pack, SQL_SEQ_PACK),
    "train_tfidf_topk": (t_tfidf_topk, SQL_TFIDF),
}
