"""Training-pipeline surface, part 13: EXACT similarity self-joins with
lossless prefix filtering — set similarity (AllPairs, Bayardo et al., WWW
2007; PPJoin, Xiao et al., WWW 2008) and string edit distance (Ed-Join, Xiao
et al., PVLDB 2008; q-gram count bound from Gravano et al., VLDB 2001).  The
missing deterministic legs of the near-dup family: MinHash-LSH and SimHash
(training.py) are *probabilistic* candidate generators; these entries return
the exact all-pairs-above-threshold answer — no false negatives BY
CONSTRUCTION, without ever materializing the all-pairs cross join.

Two driver-oracle-checked entries:

* ``train_setsim_join`` — all unordered doc pairs with Jaccard >= 3/5 over
  distinct word 3-gram shingles (the same ``_shingles`` every near-dup entry
  uses), with the exact intersection / union sizes and the Jaccard in
  integer micro units.  Distinct from ``train_ngram_jaccard``: that entry
  joins on EVERY shared (df-capped) shingle; this one joins only on the
  PREFIX, so the candidate-generating join shrinks by a factor of ~1/(1-t)
  and needs no df cutoff to stay safe on boilerplate.

* ``train_edit_join`` — all unordered doc pairs whose 64-char text prefixes
  are within Levenshtein distance K=3, over the universe of docs with >= 16
  prefix chars.  The exact metric-space analogue for titles/URLs/headers
  where token sets are too coarse.  Prefix filter with char q-grams (q=4):
  an edit operation destroys at most q of a string's (l-q+1) positional
  q-grams, so two strings with ed <= K share at least one gram among each
  side's K*q+1 = 13 globally-rarest DISTINCT grams (if a's rarest 13 miss
  b's whole gram set, a owns K*q+1 grams outside b's multiset => ed > K;
  the shared-gram-must-be-in-both-prefixes step is the same total-order
  argument as the set case).  Candidates verified with Spark's native
  bounded ``levenshtein(a, b, K)`` (O(K*l) banded DP, not O(l^2)); DuckDB's
  unbounded ``levenshtein`` is the oracle's ground truth over the TRUE
  all-pairs cross join — no pruning shared with the engine under test.

Why the pruning is lossless (so Spark matches the oracle's brute force):
order every token by ascending corpus document-frequency (rarest first, ties
by token string — unique within a doc, so the per-doc order is total).  For
a set x, keep the first  |x| - ceil(t*|x|) + 1  tokens as its *prefix*.  Any
pair with overlap >= alpha = ceil(t/(1+t) * (|x|+|y|))  (the overlap Jaccard
>= t forces) must share a token inside BOTH prefixes — missing the prefix
would require more distinct tokens after it than the set has left.  The
positional refinement: a shared prefix token at (1-based) ranks (pa, pb) can
start an overlap of at most 1 + min(|x|-pa, |y|-pb); a pair is kept iff SOME
shared prefix token admits alpha (a superset of PPJoin's first-match rule —
still lossless, order-insensitive, and cheap to express as a join filter).

With t = 3/5 every test is integer:  length filter  5*min(la,lb) >=
3*max(la,lb);  alpha = (3*(la+lb) + 7) DIV 8  (ceil of 3(la+lb)/8, from
t/(1+t) = 3/8);  final check  5*inter >= 3*(la + lb - inter).  jac_micro =
round(1e6 * inter/union) is a single double division of two exact int64s —
IEEE-identical in Spark and DuckDB.

Scale notes (100 TB): the candidate join is an equi-join on PREFIX tokens
only — the rarest-first order puts high-df stopwords at the END of every
set, so they never enter the inverted prefix index and the hottest join keys
are, by construction, the coldest tokens in the corpus (the classic AllPairs
result: candidate count is near-linear on Zipfian text).  Per-doc token
ranking is a window PARTITIONED BY doc_id (bounded by doc length, never
corpus-sized).  Verification joins candidate pairs back to the token table
twice — both equi-joins AQE can re-plan; nothing is ever all-pairs.  The
oracle's brute-force shared-token join is test-scale-only ground truth.

Grid/reference context: same single-space tokenization as every other
train_* entry (documents table, TESTDATA.md), so exact pairs compose
row-for-row with the LSH candidates (train_minhash_lsh) for recall audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

# Jaccard threshold t = _T_NUM/_T_DEN = 3/5; alpha uses t/(1+t) = 3/8
_T_NUM = 3
_T_DEN = 5


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) — distinct word 3-gram shingles per document (house
    shingling, training.py:_shingles, already array_distinct)."""
    from .training import _shingles

    return (docs
            .filter(F.col("text").isNotNull())
            # <3 tokens => empty shingle set => can never pair; filtering
            # here also dodges _shingles' descending sequence(1, 0) edge
            .filter(F.size(F.split(F.col("text"), " ")) >= 3)
            .select("doc_id", F.explode(_shingles(F.col("text"))).alias("tok")))


def setsim_join(docs: DataFrame) -> DataFrame:
    """Exact Jaccard >= 3/5 self-join via lossless prefix+positional filter."""
    tok = _tokens(docs)

    # rarest-first total order: (corpus df ASC, token ASC); rank within doc
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (tok.join(dfreq, "tok")
              .withColumn("pos", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "tok")))
              .withColumn("la", F.count("*").over(Window.partitionBy("doc_id"))))

    # prefix: first  la - ceil(t*la) + 1  tokens (ceil(3la/5) = (3la+4) div 5)
    pfx = ranked.filter(
        F.col("pos") <= F.col("la")
        - ((_T_NUM * F.col("la") + (_T_DEN - 1)) / _T_DEN).cast("long")
        + F.lit(1))

    a = pfx.select(F.col("doc_id").alias("da"), "tok",
                   F.col("pos").alias("pa"), F.col("la").alias("la"))
    b = pfx.select(F.col("doc_id").alias("db"), "tok",
                   F.col("pos").alias("pb"), F.col("la").alias("lb"))
    alpha = ((_T_NUM * (F.col("la") + F.col("lb")) + (_T_NUM + _T_DEN - 1))
             / (_T_NUM + _T_DEN)).cast("long")
    cand = (a.join(b, "tok")
            .filter(F.col("da") < F.col("db"))
            # length filter: Jaccard >= t forces t*max <= min
            .filter(_T_DEN * F.least("la", "lb") >= _T_NUM * F.greatest("la", "lb"))
            # positional filter: some shared prefix token must admit alpha
            .filter(F.lit(1) + F.least(F.col("la") - F.col("pa"),
                                       F.col("lb") - F.col("pb")) >= alpha)
            .select("da", "db", "la", "lb")
            .distinct())

    # exact verification: count shared tokens per surviving pair
    ta = tok.select(F.col("doc_id").alias("da"), "tok")
    tb = tok.select(F.col("doc_id").alias("db"), "tok")
    inter = (cand.join(ta, "da").join(tb, ["db", "tok"])
             .groupBy("da", "db", "la", "lb")
             .agg(F.count("*").alias("n_inter")))
    uni = F.col("la") + F.col("lb") - F.col("n_inter")
    return (inter
            .filter(_T_DEN * F.col("n_inter") >= _T_NUM * uni)
            .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                    "n_inter", uni.alias("n_union"),
                    F.round(F.lit(1e6) * (F.col("n_inter").cast("double")
                                          / uni.cast("double")))
                     .cast("long").alias("jac_micro"))
            .orderBy("doc_a", "doc_b"))


def t_setsim_join(spark: SparkSession, sf: str) -> DataFrame:
    from .training import _spread

    docs = _spread(load(spark, sf, "documents").select("doc_id", "text"))
    return setsim_join(docs)


# oracle: brute-force ground truth — shared-token join over ALL pairs (no
# pruning), so any false negative in the Spark-side filters would surface as
# a missing row
SQL_SETSIM_JOIN = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(sl)) AS tok FROM (
    SELECT doc_id, string_split(text, ' ') AS w,
           [array_to_string(w[i:i+2], ' ')
            FOR i IN range(1, greatest(len(w) - 1, 1))] AS sl
    FROM documents WHERE text IS NOT NULL)),
len AS (SELECT doc_id, count(*) AS l FROM tok GROUP BY doc_id),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(n_inter AS BIGINT) AS n_inter,
       CAST(la.l + lb.l - n_inter AS BIGINT) AS n_union,
       CAST(round(1e6 * CAST(n_inter AS DOUBLE)
                  / CAST(la.l + lb.l - n_inter AS DOUBLE)) AS BIGINT)
         AS jac_micro
FROM pair
JOIN len la ON la.doc_id = doc_a
JOIN len lb ON lb.doc_id = doc_b
WHERE {_T_DEN} * n_inter >= {_T_NUM} * (la.l + lb.l - n_inter)
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Ed-Join: exact edit-distance self-join (Xiao et al., PVLDB 2008)

# threshold K, q-gram width Q; prefix = K*Q + 1 globally-rarest distinct grams
_ED_K = 3
_ED_Q = 4
_ED_PFX = _ED_K * _ED_Q + 1
_ED_SLEN = 64   # compare the first 64 chars of each document
_ED_MINL = 16   # universe: prefixes with at least 16 chars


def _ed_strings(docs: DataFrame) -> DataFrame:
    """(doc_id, s, l) — the 64-char text prefix and its char length."""
    s = F.substring(F.col("text"), 1, _ED_SLEN)
    return (docs.filter(F.col("text").isNotNull())
            .select("doc_id", s.alias("s"), F.length(s).alias("l"))
            .filter(F.col("l") >= _ED_MINL))


def edit_join(docs: DataFrame) -> DataFrame:
    """Exact Levenshtein <= K self-join via lossless q-gram prefix filter."""
    base = _ed_strings(docs)

    # distinct positional char q-grams, row-local (transform over a sequence
    # of start offsets — no UDF, no shuffle until the df agg)
    grams = (base.select(
        "doc_id", "l",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.col("l") - _ED_Q + 1),
            lambda i: F.col("s").substr(i, F.lit(_ED_Q))))).alias("g")))

    # rarest-first global order (corpus df ASC, gram ASC); per-doc rank is a
    # window PARTITIONED by doc_id — bounded by string length, never corpus-
    # sized.  Keep only the first K*Q+1 grams: the inverted index the
    # candidate join probes excludes every frequent gram by construction.
    dfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    pfx = (grams.join(dfreq, "g")
           .withColumn("pos", F.row_number().over(
               Window.partitionBy("doc_id").orderBy("df", "g")))
           .filter(F.col("pos") <= _ED_PFX)
           .select("doc_id", "l", "g"))

    a = pfx.select(F.col("doc_id").alias("da"), F.col("l").alias("la"), "g")
    b = pfx.select(F.col("doc_id").alias("db"), F.col("l").alias("lb"), "g")
    cand = (a.join(b, "g")
            .filter(F.col("da") < F.col("db"))
            # length filter: each edit changes length by at most 1
            .filter(F.abs(F.col("la") - F.col("lb")) <= _ED_K)
            .select("da", "db")
            .distinct())

    # exact verification on the candidate set only: bounded banded-DP
    # levenshtein (O(K*l) per pair; returns -1 when the distance exceeds K)
    sa = base.select(F.col("doc_id").alias("da"), F.col("s").alias("sa"),
                     F.col("l").alias("len_a"))
    sb = base.select(F.col("doc_id").alias("db"), F.col("s").alias("sb"),
                     F.col("l").alias("len_b"))
    return (cand.join(sa, "da").join(sb, "db")
            .withColumn("ed", F.levenshtein("sa", "sb", _ED_K))
            .filter(F.col("ed") >= 0)
            .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                    F.col("len_a").cast("long").alias("len_a"),
                    F.col("len_b").cast("long").alias("len_b"),
                    F.col("ed").cast("long").alias("ed"))
            .orderBy("doc_a", "doc_b"))


def t_edit_join(spark: SparkSession, sf: str) -> DataFrame:
    from .training import _spread

    docs = _spread(load(spark, sf, "documents").select("doc_id", "text"))
    return edit_join(docs)


# oracle: TRUE all-pairs cross join + unbounded levenshtein — shares no
# pruning with the engine under test, so any false negative from the prefix
# or length filters surfaces as a missing row
SQL_EDIT_JOIN = f"""
WITH s AS (
  SELECT doc_id, substr(text, 1, {_ED_SLEN}) AS s,
         length(substr(text, 1, {_ED_SLEN})) AS l
  FROM documents
  WHERE text IS NOT NULL AND length(substr(text, 1, {_ED_SLEN})) >= {_ED_MINL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(a.l AS BIGINT) AS len_a, CAST(b.l AS BIGINT) AS len_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS ed
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE levenshtein(a.s, b.s) <= {_ED_K}
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "train_setsim_join": (t_setsim_join, SQL_SETSIM_JOIN),
    "train_edit_join": (t_edit_join, SQL_EDIT_JOIN),
}
