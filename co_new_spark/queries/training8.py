"""Corpus indexing + sampling verbs: inverted-index construction
(``train_inverted_postings``) and exact-quota stratified sampling
(``train_stratified_sample``).

Why they exist: an inverted index is the retrieval structure behind the
registry's BM25 entry (train_bm25_topk materializes idf but never the
posting lists themselves — this entry makes posting construction, with
term frequencies AND first positions, a first-class checked operator);
exact per-stratum quotas are the sampling verb mixture design actually
needs when Bernoulli hash gates (train_hash_sample) can't hit an exact
count per class (eval-set construction, per-language pilot corpora).

Scale design:
* Postings: one ``posexplode`` pass over the fact table feeding a
  (term, doc) aggregate that combines map-side (count + min(pos) are both
  partial-aggregable), then everything downstream runs on the posting /
  term tables.  The top-K term selection is ``orderBy(...).limit(K)`` —
  Spark's TakeOrderedAndProject (per-partition heaps + driver merge of K
  rows), NOT a global sort — and the K-row term list broadcasts back onto
  the postings.  The per-term top-10 posting cut is a window PARTITIONED
  by term (registry rule: no unpartitioned windows, tests/test_plan_shapes).
* Stratified sample: one window partitioned by the stratum key; rank by
  (md5(doc_id), doc_id) — a content hash both engines compute identically —
  so selection is deterministic, RNG-free, and independent of partitioning.
  A stratum hotter than a reducer takes the operators/salt two-phase form
  (rank within salted sub-strata first, merge the <= S*K survivors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

_IP_TOPK = 50      # terms kept (by document frequency)
_IP_PERTERM = 10   # postings kept per term (impact-ordered: tf desc)
_SS_QUOTA = 40     # rows kept per stratum (lang)


def t_inverted_postings(spark: SparkSession, sf: str) -> DataFrame:
    """Impact-ordered inverted-index slice: for the top-``_IP_TOPK`` terms
    by df, the top-``_IP_PERTERM`` postings (term, df, doc_id, tf,
    first_pos).  first_pos is 1-based (ties with the oracle's
    generate_subscripts convention)."""
    docs = load(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"))
    posting = (toks.groupBy("term", "doc_id")
               .agg(F.count("*").alias("tf"),
                    (F.min("pos") + 1).cast("long").alias("first_pos")))
    dfreq = posting.groupBy("term").agg(F.count("*").alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), "term").limit(_IP_TOPK)
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), "doc_id")
    return (posting.join(F.broadcast(top), "term")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _IP_PERTERM)
            .select("term", "df", "doc_id", "tf", "first_pos"))


SQL_INVERTED_POSTINGS = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), posting AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         CAST(min(pos) AS BIGINT) AS first_pos
  FROM tok GROUP BY term, doc_id
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM posting GROUP BY term
), top AS (
  SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT {_IP_TOPK}
)
SELECT p.term, t.df, p.doc_id, p.tf, p.first_pos
FROM posting p JOIN top t USING (term)
QUALIFY row_number() OVER (
  PARTITION BY p.term ORDER BY p.tf DESC, p.doc_id) <= {_IP_PERTERM}
"""


def t_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-quota stratified sample: keep ``_SS_QUOTA`` documents per
    language, selected by md5-rank (deterministic, RNG-free)."""
    docs = load(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _SS_QUOTA)
            .select("lang", "doc_id", "rn"))


SQL_STRATIFIED_SAMPLE = f"""
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= {_SS_QUOTA}
"""


QUERIES = {
    "train_inverted_postings": (t_inverted_postings, SQL_INVERTED_POSTINGS),
    "train_stratified_sample": (t_stratified_sample, SQL_STRATIFIED_SAMPLE),
}
