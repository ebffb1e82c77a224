"""Training-pipeline surface, part 7: supervised curation classifier.

``train_nb_classifier`` — multinomial Naive Bayes over hashed word tokens
(train + apply in one job), the mechanics of the fasttext-style quality /
language classifier stage in CCNet / GPT-3-like curation pipelines (public
method: McCallum & Nigam 1998 multinomial NB; the curation use is Brown et
al. 2020 §A "quality classifier").  Label column = ``lang`` (the one
supervised label the synthetic corpus carries); the train/apply split is
the engine-agnostic hash gate ``doc_id % 5 != 0``, so a fifth of the corpus
is a genuine holdout and the output carries ``is_holdout``/``correct`` for
both slices.

Cross-engine protocol (the train_dsir_weights / train_perplexity_buckets
recipe, training2.py/training4.py):

1. ``nb_pairs`` (doc_id, lang, h) — the xxhash64-bucketed token stream,
   the only hash-dependent step, materialized (mat.py).
2. ``nb_weights`` (lang, h, ct, w) — per-(class, bucket) Laplace
   log-likelihood in integer MICRO-nats, w = round(1e6 * log((ct+1) /
   (NT_c+B))), Spark-authored over the FULL class x bucket grid (absent
   buckets carry ct = 0); the oracle RE-DERIVES ct from nb_pairs and joins
   on (lang, h, ct) — a wrong count silently drops the bucket and breaks
   the hash.  ``nb_priors`` (lang, nd, prior) gets the same treatment via
   the train-split distinct-doc count.
3. downstream, both engines, integer-exact: per-(doc, class) score =
   prior + BIGINT sum of w; argmax ties break to the lexicographically
   smaller class.

Honesty note: the synthetic corpus's text is statistically INDEPENDENT of
every label column (verified: per-token class counts scale with class
size), so measured accuracy sits at the class prior here — that is a
property of the test data, not the operator.  The learning behavior is
pytest-proven on a planted-vocabulary corpus (tests/test_training7.py:
holdout accuracy 1.0 when classes have disjoint marker tokens).

Scale shape: pairs is the fact table; the weight join fans it out by C
classes (C = |distinct lang|, single digits) and the ONE map-side-combined
(doc_id, class) aggregate is the only fact-sized exchange; the model
(C x B grid + C priors) is broadcast-sized by construction.  The argmax is
a min-struct aggregate, never a window.  Docs with zero tokens have no
evidence rows and are excluded by construction, identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.bpe import bpe_train
from ..sources.tables import load

_NB_B = 4096  # hashed token buckets


def nb_classify(docs: DataFrame, mat_key: str | None = None) -> DataFrame:
    """Train-and-apply the classifier on any (doc_id, lang, text) frame.
    With ``mat_key`` the three model tables materialize for the oracle
    protocol; without it (pytests) the lineage stays in-plan."""
    from .mat import materialize

    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    pairs = (docs.select("doc_id", "lang", F.explode(toks).alias("tok"))
                 .select("doc_id", "lang",
                         F.pmod(F.xxhash64("tok"), F.lit(_NB_B)).alias("h")))
    if mat_key is not None:
        pairs = materialize(pairs, "nb_pairs", key=mat_key)
    train = pairs.filter(F.col("doc_id") % 5 != 0)

    # model: full class x bucket grid, Laplace micro-nat weights
    classes = train.select("lang").distinct()
    hs = pairs.select("h").distinct()
    ntc = train.groupBy("lang").agg(F.count("*").alias("ntc"))
    ct = train.groupBy("lang", "h").agg(F.count("*").alias("ct"))
    w = (hs.crossJoin(F.broadcast(classes))
           .join(ct, ["lang", "h"], "left")
           .select("lang", "h", F.coalesce("ct", F.lit(0)).alias("ct"))
           .join(F.broadcast(ntc), "lang")
           .withColumn("w", F.round(F.log(
               (F.col("ct") + 1).cast("double")
               / (F.col("ntc") + _NB_B).cast("double"))
               * 1_000_000).cast("long"))
           .select("lang", "h", "ct", "w"))
    if mat_key is not None:
        w = materialize(w, "nb_weights", key=mat_key)

    nd = (train.select("doc_id", "lang").distinct()
               .groupBy("lang").agg(F.count("*").alias("nd")))
    ntot = nd.agg(F.sum("nd").alias("ntot"))
    priors = (nd.crossJoin(F.broadcast(ntot))
                .withColumn("prior", F.round(F.log(
                    F.col("nd").cast("double") / F.col("ntot").cast("double"))
                    * 1_000_000).cast("long"))
                .select("lang", "nd", "prior"))
    if mat_key is not None:
        priors = materialize(priors, "nb_priors", key=mat_key)

    # apply: fan pairs out by class, ONE map-side-combined (doc, class) agg
    wts = w.select(F.col("lang").alias("cls"), "h", F.col("w").alias("wv"))
    sc = (pairs.join(wts, "h")
               .groupBy("doc_id", "cls").agg(F.sum("wv").alias("s")))
    tot = (sc.join(F.broadcast(priors.select(F.col("lang").alias("cls"),
                                             "prior")), "cls")
             .withColumn("total", F.col("s") + F.col("prior")))
    pred = (tot.groupBy("doc_id")
               .agg(F.min(F.struct((-F.col("total")).alias("neg"),
                                   F.col("cls"), F.col("total"))).alias("m"))
               .select("doc_id", F.col("m.cls").alias("pred"),
                       F.col("m.total").alias("score_micro")))
    lab = pairs.select("doc_id", "lang").distinct()
    return (lab.join(pred, "doc_id")
               .select("doc_id", "lang", "pred", "score_micro",
                       (F.col("doc_id") % 5 == 0).alias("is_holdout"),
                       (F.col("pred") == F.col("lang")).alias("correct"))
               .orderBy("doc_id"))


def t_nb_classifier(spark: SparkSession, sf: str) -> DataFrame:
    return nb_classify(load(spark, sf, "documents"), mat_key=sf)


def _sql_nb() -> str:
    from .mat import mat_glob

    return f"""
WITH p AS MATERIALIZED (SELECT * FROM read_parquet('{mat_glob("nb_pairs")}')),
wts AS (SELECT * FROM read_parquet('{mat_glob("nb_weights")}')),
pri AS (SELECT * FROM read_parquet('{mat_glob("nb_priors")}')),
tr AS MATERIALIZED (SELECT * FROM p WHERE doc_id % 5 <> 0),
chk AS (  -- full grid re-count; mismatch -> dropped bucket -> hash break
  SELECT c.lang, hh.h, CAST(coalesce(ct.ct, 0) AS BIGINT) AS ct
  FROM (SELECT DISTINCT lang FROM tr) c
  CROSS JOIN (SELECT DISTINCT h FROM p) hh
  LEFT JOIN (SELECT lang, h, count(*) AS ct FROM tr GROUP BY 1, 2) ct
         ON ct.lang = c.lang AND ct.h = hh.h),
v AS MATERIALIZED (
  SELECT w.lang, w.h, w.w FROM wts w
  JOIN chk ON chk.lang = w.lang AND chk.h = w.h AND chk.ct = w.ct),
pchk AS (SELECT lang, count(DISTINCT doc_id) AS nd FROM tr GROUP BY 1),
vp AS (SELECT pr.lang, pr.prior FROM pri pr
       JOIN pchk ON pchk.lang = pr.lang AND pchk.nd = pr.nd),
sc AS (
  SELECT p.doc_id, v.lang AS cls, CAST(sum(v.w) AS BIGINT) AS s
  FROM p JOIN v ON v.h = p.h GROUP BY 1, 2),
tot AS (
  SELECT sc.doc_id, sc.cls, sc.s + vp.prior AS total
  FROM sc JOIN vp ON vp.lang = sc.cls),
pred AS (
  SELECT doc_id, cls, total,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY total DESC, cls) AS rn
  FROM tot),
lab AS (SELECT DISTINCT doc_id, lang FROM p)
SELECT l.doc_id, l.lang, pr.cls AS pred,
       CAST(pr.total AS BIGINT) AS score_micro,
       (l.doc_id % 5 = 0) AS is_holdout,
       (pr.cls = l.lang) AS correct
FROM lab l JOIN pred pr ON pr.doc_id = l.doc_id AND pr.rn = 1
ORDER BY l.doc_id
"""


# ---------------------------------------------------------------------------
# train_bpe_merges — distributed BPE tokenizer training (operators/bpe.py)
# ---------------------------------------------------------------------------

_BPE_T = 3  # unrolled merge rounds


def t_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """The learned BPE merge table after T corpus-wide rounds over the
    documents table — tokenizer training as a first-class distributed op
    (Sennrich et al. 2016).  See operators/bpe.py for the position-table
    formulation and the greedy-overlap parity rule."""
    from .training import _spread

    # spread doc rows across slots before the char explosion; repartitioning
    # BY doc_id also pre-satisfies every round's per-doc window distribution
    docs = _spread(load(spark, sf, "documents").select("doc_id", "text"))
    return bpe_train(docs, rounds=_BPE_T)


def _sql_bpe_round(r: int) -> str:
    """One merge round r: s{r} -> b{r} (winner) -> s{r+1} (merged seq)."""
    return f"""
p{r} AS (
  SELECT doc_id, pos, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM s{r}),
b{r} AS MATERIALIZED (
  SELECT tok AS lhs, nxt AS rhs, count(*) AS cnt
  FROM p{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
m{r} AS (
  SELECT p.doc_id, p.pos, p.tok, b.lhs, b.rhs,
         coalesce(p.tok = b.lhs AND p.nxt = b.rhs, false) AS isc,
         row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS r,
         sum(CASE WHEN coalesce(p.tok = b.lhs AND p.nxt = b.rhs, false)
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY p.doc_id ORDER BY p.pos
                 ROWS UNBOUNDED PRECEDING) AS rc
  FROM p{r} p, b{r} b),
g{r} AS (
  SELECT *, CASE WHEN isc THEN r - rc END AS chain FROM m{r}),
h{r} AS (
  SELECT *, isc AND ((rc - min(CASE WHEN isc THEN rc END)
                        OVER (PARTITION BY doc_id, chain)) % 2 = 0) AS merged
  FROM g{r}),
s{r + 1} AS MATERIALIZED (
  SELECT doc_id, pos,
         CASE WHEN merged THEN lhs || rhs ELSE tok END AS tok
  FROM (SELECT *, coalesce(lag(merged)
                    OVER (PARTITION BY doc_id ORDER BY pos), false)
                  AS consumed
        FROM h{r})
  WHERE NOT consumed),
n{r} AS (SELECT count(*) AS n_tokens_after FROM s{r + 1})"""


def _sql_bpe() -> str:
    parts = ["""s0 AS MATERIALIZED (
  SELECT doc_id, pos - 1 AS pos, tok FROM (
    SELECT doc_id, unnest(string_split(text, '')) AS tok,
           generate_subscripts(string_split(text, ''), 1) AS pos
    FROM documents)
  WHERE tok <> '')"""]
    parts += [_sql_bpe_round(r) for r in range(_BPE_T)]
    rows = " UNION ALL ".join(
        f"SELECT {r} AS rnd, lhs, rhs, cnt, n_tokens_after FROM b{r}, n{r}"
        for r in range(_BPE_T))
    return f"""
WITH {",".join(parts)}
SELECT rnd, lhs, rhs, CAST(cnt AS BIGINT) AS cnt,
       CAST(n_tokens_after AS BIGINT) AS n_tokens_after
FROM ({rows}) ORDER BY rnd
"""


# ---------------------------------------------------------------------------
# train_bm25_topk — ranked retrieval (decontamination-by-retrieval verb)
# ---------------------------------------------------------------------------
#
# BM25 (Robertson & Walker 1994; the Lucene idf variant) ranking the corpus
# against a probe set of "benchmark" documents (doc_id % 100 == 0), top
# _BM_K hits per probe excluding the probe itself — the retrieval side of
# benchmark-decontamination (complementing train_contamination's exact
# n-gram overlap with graded lexical similarity).
#
# Cross-engine protocol: idf is the one transcendental — Spark authors
# ``bm25_idf`` (term, df, idf_micro) and the oracle re-derives df and joins
# on (term, df).  Exactness of the SCORE: the per-(probe, doc, term)
# contribution rounds to integer micro-units BEFORE the per-doc sum, so the
# aggregate is an order-independent BIGINT sum (a documented 1e-6 deviation
# from textbook BM25; the tf saturation factor itself is a double with
# identical op order in both engines).
#
# Scale shape: the term-match join is (corpus postings) x (probe terms) —
# an equi-join on term, never all-pairs; the (probe, doc) agg is map-side
# combined; the final per-probe top-k window partitions on probe id over
# candidates sharing >= 1 term (the rel_window_topk pattern; for web-scale
# probe sets swap in the two-phase distributed-limit trick of
# operators/salt.py).

_BM_K = 5
_BM_K1, _BM_B = 1.2, 0.75


def t_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from .mat import materialize

    docs = load(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    post = (docs.select("doc_id", F.explode(toks).alias("term"))
                .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    gl = dl.agg(F.count("*").alias("n_docs"),
                F.sum("dl").alias("tot_dl"))
    df_t = post.groupBy("term").agg(F.count("*").alias("df"))
    idf = (df_t.crossJoin(F.broadcast(gl.select("n_docs")))
               .withColumn("idf_micro", F.round(F.log(
                   (F.col("n_docs") - F.col("df") + 0.5)
                   / (F.col("df") + 0.5) + 1.0) * 1_000_000).cast("long"))
               .select("term", "df", "idf_micro"))
    idf = materialize(idf, "bm25_idf", key=sf)

    probes = (post.filter(F.col("doc_id") % 100 == 0)
                  .select(F.col("doc_id").alias("qid"), "term").distinct())
    cand = (post.join(probes, "term")
                .filter(F.col("doc_id") != F.col("qid"))
                .join(idf.select("term", "idf_micro"), "term")
                .join(dl, "doc_id")
                .crossJoin(F.broadcast(gl)))
    norm = (F.col("dl").cast("double") * F.col("n_docs")) / F.col("tot_dl")
    contrib = F.round(
        F.col("idf_micro")
        * (F.col("tf") * (_BM_K1 + 1.0))
        / (F.col("tf") + _BM_K1 * (1.0 - _BM_B + _BM_B * norm))
    ).cast("long")
    sc = (cand.select("qid", "doc_id", contrib.alias("c"))
              .groupBy("qid", "doc_id")
              .agg(F.sum("c").alias("score_micro")))
    w = Window.partitionBy("qid").orderBy(F.col("score_micro").desc(),
                                          "doc_id")
    return (sc.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= _BM_K)
              .select("qid", "rank", "doc_id", "score_micro")
              .orderBy("qid", "rank"))


def _sql_bm25() -> str:
    from .mat import mat_glob

    return f"""
WITH post AS MATERIALIZED (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY 1),
gl AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM dl),
dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
i AS (SELECT * FROM read_parquet('{mat_glob("bm25_idf")}')),
v AS MATERIALIZED (  -- df mismatch -> dropped term -> hash break
  SELECT i.term, i.idf_micro FROM i
  JOIN dfr ON dfr.term = i.term AND dfr.df = i.df),
probes AS (
  SELECT DISTINCT doc_id AS qid, term FROM post WHERE doc_id % 100 = 0),
cand AS (
  SELECT p.qid, post.doc_id, post.tf, v.idf_micro, dl.dl
  FROM post JOIN probes p ON p.term = post.term
  JOIN v ON v.term = post.term
  JOIN dl ON dl.doc_id = post.doc_id
  WHERE post.doc_id <> p.qid),
sc AS (
  SELECT qid, doc_id,
         CAST(sum(CAST(round(
           idf_micro
           * (tf * ({_BM_K1} + 1.0))
           / (tf + {_BM_K1} * (1.0 - {_BM_B} + {_BM_B}
              * ((CAST(dl AS DOUBLE) * n_docs) / tot_dl)))) AS BIGINT))
         AS BIGINT) AS score_micro
  FROM cand, gl GROUP BY 1, 2),
r AS (
  SELECT qid, doc_id, score_micro,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_micro DESC, doc_id) AS rank
  FROM sc)
SELECT qid, CAST(rank AS INT) AS rank, doc_id, score_micro
FROM r WHERE rank <= {_BM_K}
ORDER BY qid, rank
"""


QUERIES = {
    "train_nb_classifier": (t_nb_classifier, _sql_nb()),
    "train_bpe_merges": (t_bpe_merges, _sql_bpe()),
    "train_bm25_topk": (t_bm25_topk, _sql_bm25()),
}
