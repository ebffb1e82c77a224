"""Corpus indexing + sampling verbs: inverted-index construction
(``train_inverted_postings``), exact-quota stratified sampling
(``train_stratified_sample``), and PMI collocation mining
(``train_pmi_pairs``).

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


# ---------------------------------------------------------------------------
# PMI collocation mining.  Why it exists: pointwise mutual information over
# adjacent word pairs is the classic collocation/phrase-mining statistic
# (Church & Hanks 1990) — the phrase tables word2vec-style pipelines and
# tokenizer pre-merges are built from.  Scale design: bigrams come from one
# in-row array transform (NO self-join of the fact table — the oracle's
# position self-join is the restatement, not the plan); unigram and bigram
# counts both combine map-side; the vocabulary-sized marginal table joins
# back by BROADCAST; corpus totals are a 1-row broadcast.  Top-K is
# orderBy().limit() — TakeOrderedAndProject, not a global sort.  Cross-engine
# float discipline: the PMI *ratio* (monotone in PMI, log omitted) is
# computed from integer counts with an identical double expression both
# sides and rounded to 6 dp (the SQL_KNN protocol); ordering uses the
# emitted rounded value with (w1, w2) tie-breaks, so the top-K cut is a
# total order in both engines.
# ---------------------------------------------------------------------------

_PMI_TOPK = 20  # pairs kept
_PMI_MINC = 5   # min bigram count (hapax pairs maximize PMI vacuously)


def t_pmi_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-``_PMI_TOPK`` adjacent word pairs by PMI ratio
    p(x,y) / (p(x) p(y)), with pair/marginal counts carried for audit."""
    docs = load(spark, sf, "documents")
    tk = docs.select(F.split(F.col("text"), " ").alias("t"))
    tot = tk.agg(
        F.sum(F.size("t")).cast("long").alias("n_uni"),
        F.sum(F.greatest(F.size("t") - F.lit(1), F.lit(0)))
        .cast("long").alias("n_pairs"))
    uni = (tk.select(F.explode("t").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    big = (tk.select(F.explode(F.expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)),"
        " (w, i) -> struct(w AS w1, t[i + 1] AS w2))")).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MINC))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    scored = (big.join(F.broadcast(u1), "w1").join(F.broadcast(u2), "w2")
              .crossJoin(F.broadcast(tot))
              .withColumn("pmi_ratio", F.round(
                  (F.col("c_xy").cast("double") * F.col("n_uni") * F.col("n_uni"))
                  / (F.col("n_pairs").cast("double") * F.col("c_x") * F.col("c_y")),
                  6)))
    return (scored.select("w1", "w2", "c_xy", "c_x", "c_y", "pmi_ratio")
            .orderBy(F.col("pmi_ratio").desc(), "w1", "w2")
            .limit(_PMI_TOPK))


SQL_PMI_PAIRS = f"""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), tot AS (
  SELECT CAST(sum(len(t)) AS BIGINT) AS n_uni,
         CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS n_pairs
  FROM tk
), tok AS (
  SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS pos FROM tk
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
), big AS (
  SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS c_xy
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
  HAVING count(*) >= {_PMI_MINC}
)
SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
       round((CAST(c_xy AS DOUBLE) * t.n_uni * t.n_uni)
             / (CAST(t.n_pairs AS DOUBLE) * u1.c * u2.c), 6) AS pmi_ratio
FROM big
JOIN uni u1 ON u1.w = big.w1
JOIN uni u2 ON u2.w = big.w2
CROSS JOIN tot t
ORDER BY pmi_ratio DESC, w1, w2 LIMIT {_PMI_TOPK}
"""


QUERIES = {
    "train_inverted_postings": (t_inverted_postings, SQL_INVERTED_POSTINGS),
    "train_stratified_sample": (t_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "train_pmi_pairs": (t_pmi_pairs, SQL_PMI_PAIRS),
}
