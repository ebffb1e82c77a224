"""Training-pipeline surface, part 4: exact repeated-substring deduplication
(the cross-document k-token span method of Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022) — the corpus-level
stage that finds verbatim text reuse BELOW document granularity, where
whole-doc hashing (train_dedup_exact) and set-similarity (MinHash/Jaccard)
are blind.

Two driver-oracle-checked entries:

* ``train_substring_dedup`` — per-document contamination profile: how many
  of a doc's k-token spans also appear verbatim in some OTHER document.
  The per-doc ``dup_frac`` is the standard cut metric (drop or trim docs
  whose text is mostly recycled boilerplate/copypasta).
* ``train_substring_hotspans`` — the artifact a trim pass consumes: the
  top recycled spans themselves, ranked by occurrence count.

Scale notes (100 TB): span generation is one codegen projection + explode
(no Python, no UDF); "appears in >= 2 distinct docs" is decided by
``min(doc_id) != max(doc_id)`` per span hash — a cheap 2-value aggregate
instead of a COUNT(DISTINCT) expansion.  The raw occurrence stream is first
reduced to ``(h, doc_id, cnt)`` pairs, so the ONLY fact-sized shuffle gets
map-side partial aggregation (a corpus stop-phrase collapses to one row per
(span, doc) per mapper before the wire); the dup flag then runs as a window
over the deduplicated pair set, whose per-key width is the span's DOC
count, not its occurrence count — the skew a power-law phrase distribution
actually produces.  Spans are keyed by md5 (fixed 16-byte key) so shuffle
width never depends on k or token length.

Cross-engine hash-exactness: token split, slicing and joining are
byte-identical string ops in both engines; all counts are BIGINT; the one
double (``dup_frac``) is a single division rounded to 6 places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

# k-token span width. Lee et al. use 50 BPE tokens at web scale; the synthetic
# documents average ~56 whitespace tokens, so 8 keeps per-doc span counts
# (~49) and cross-doc collision rates in a regime where the output
# distribution is non-trivial at every sf.
SPAN_K = 8


def _span_index(w):
    """1-based start positions of every k-token span; empty when the doc is
    shorter than k (Spark's sequence(1, 0) would DESCEND to [1, 0], so the
    short-doc case must be branched, not clamped)."""
    n = F.size(w) - (SPAN_K - 1)
    return F.when(n >= 1, F.sequence(F.lit(1), n)) \
            .otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))


def _spans(docs: DataFrame, as_text: bool = False) -> DataFrame:
    """(doc_id, h|span) — one row per k-token span occurrence."""
    w = F.split(F.col("text"), " ")
    span = lambda i: F.array_join(F.slice(w, i, SPAN_K), " ")  # noqa: E731
    mk = span if as_text else (lambda i: F.md5(span(i)))
    col = "span" if as_text else "h"
    return docs.select(
        "doc_id",
        F.explode(F.transform(_span_index(w), mk)).alias(col))


def substring_profile(docs: DataFrame) -> DataFrame:
    """Per-doc repeated-substring profile: n_spans, spans duplicated in >= 2
    distinct docs, and the duplicated fraction.  Docs shorter than k tokens
    emit (0, 0, 0.0) — the left join back to the doc set keeps them."""
    pairs = (_spans(docs).groupBy("h", "doc_id")
             .agg(F.count("*").alias("cnt")))  # map-side combined
    wh = Window.partitionBy("h")
    flagged = pairs.withColumn(
        "is_dup",
        (F.min("doc_id").over(wh) != F.max("doc_id").over(wh)).cast("long"))
    per_doc = flagged.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_spans"),
        F.sum(F.col("is_dup") * F.col("cnt")).alias("dup_spans"))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
                    F.round(F.when(F.coalesce("n_spans", F.lit(0)) > 0,
                                   F.col("dup_spans").cast("double")
                                   / F.col("n_spans")).otherwise(0.0), 6)
                    .alias("dup_frac")))


def t_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return substring_profile(load(spark, sf, "documents"))


# DuckDB restatement: identical tokenization (string_split on ' ' keeps empty
# tokens exactly like Spark's split), identical 1-based k-slices, same md5
# keys, same min!=max window decision.  range(1, len-k+2) is [] for short
# docs (DuckDB's list range is empty when stop <= start — no descending
# trap).  ONE generator mirrors the Spark-side _spans(as_text=...) switch so
# the slicing/bound arithmetic exists in exactly one SQL copy.


def _spans_sql(as_text: bool = False) -> str:
    span = f"array_to_string(t[i:i + {SPAN_K - 1}], ' ')"
    proj = f"{span} AS span" if as_text else f"md5({span}) AS h"
    return f"""
SELECT doc_id, {proj}
FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SPAN_K - 2})) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
"""

SQL_SUBSTRING_DEDUP = f"""
WITH flagged AS (
  SELECT doc_id,
         CASE WHEN min(doc_id) OVER (PARTITION BY h)
                   <> max(doc_id) OVER (PARTITION BY h)
              THEN 1 ELSE 0 END AS is_dup
  FROM ({_spans_sql()})
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(is_dup) AS BIGINT) AS dup_spans
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_spans, 0) AS n_spans,
       coalesce(p.dup_spans, 0) AS dup_spans,
       round(CASE WHEN coalesce(p.n_spans, 0) > 0
                  THEN CAST(p.dup_spans AS DOUBLE) / p.n_spans
                  ELSE 0.0 END, 6) AS dup_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


HOTSPAN_TOPK = 20


def t_substring_hotspans(spark: SparkSession, sf: str) -> DataFrame:
    """The top recycled k-token spans across the corpus (>= 2 distinct docs),
    ranked by occurrence count — what a substring-trim pass would excise.
    Groups by span TEXT (this entry's output is the artifact, so the key
    must survive to the result); n_docs uses COUNT(DISTINCT) because the
    top-k report needs the true doc spread, not just the >= 2 bit."""
    docs = load(spark, sf, "documents")
    g = (_spans(docs, as_text=True)
         .groupBy("span")
         .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
              F.count("*").alias("n_occ"))
         .filter(F.col("n_docs") >= 2))
    order = [F.col("n_occ").desc(), F.col("n_docs").desc(), F.col("span")]
    # distributed top-k (TakeOrderedAndProject) FIRST; the global
    # row_number window then only ever sees <= HOTSPAN_TOPK rows
    top = g.orderBy(*order).limit(HOTSPAN_TOPK)
    return (top.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
               .select("span", "n_docs", "n_occ", "rn"))


SQL_SUBSTRING_HOTSPANS = f"""
WITH spans AS ({_spans_sql(as_text=True)}), g AS (
  SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occ
  FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= 2
)
SELECT span, n_docs, n_occ, rn FROM (
  SELECT span, n_docs, n_occ,
         row_number() OVER (ORDER BY n_occ DESC, n_docs DESC, span) AS rn
  FROM g
) WHERE rn <= {HOTSPAN_TOPK}
"""


# ---------------------------------------------------------------------------
# Gopher-style intra-document repetition filter (Rae et al. 2021, "Scaling
# Language Models: ... Gopher" — public quality heuristics): a doc whose top
# unigram dominates or whose word 3-grams are mostly repeats is boilerplate/
# copypasta and gets dropped before training.
# ---------------------------------------------------------------------------

REP_TOP1_MAX = 0.2   # max share of the single most frequent unigram
REP_DUP3_MAX = 0.3   # max fraction of duplicated (non-distinct) 3-grams


def t_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc repetition metrics + keep flag.

    Complements train_repetition (training2.py), which computes duplicate
    FRACTIONS via per-row list algebra (right for normal docs, no shuffle):
    this entry adds the Gopher top-1-unigram SHARE and the keep DECISION,
    and uses the aggregation formulation — two map-side-combined
    aggregations over one token explosion each (unigram counts -> top-1
    share; 3-gram counts -> duplicate fraction), joined on doc_id.  Both
    shuffles are (doc, term)-keyed with partial aggregation, so a
    pathological repeated phrase (or a document too large for in-memory
    list algebra) collapses mapper-side.  No UDF, no window.  The compact
    doc rows spread across slots BEFORE the two explosions (training._spread
    — a single-split parquet would serialize both; no-op at scale)."""
    from .training import _spread

    docs = _spread(load(spark, sf, "documents").select("doc_id", "text"))
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    uni = (docs.select("doc_id", F.explode(w).alias("tok"))
               .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
               .groupBy("doc_id")
               .agg(F.sum("c").alias("n_tok"), F.max("c").alias("top1")))
    n3 = F.greatest(F.size(w) - 2, F.lit(0))
    tris = F.when(n3 > 0, F.transform(
        F.sequence(F.lit(1), n3),
        lambda i: F.concat_ws(" ", w[i - 1], w[i], w[i + 1]))
    ).otherwise(F.array().cast("array<string>"))
    tri = (docs.select("doc_id", F.explode(tris).alias("tri"))
               .groupBy("doc_id", "tri").agg(F.count("*").alias("c"))
               .groupBy("doc_id")
               .agg(F.sum("c").alias("n_tri"),
                    F.count("*").alias("n_tri_distinct")))
    top1_share = F.round(F.col("top1").cast("double") / F.col("n_tok"), 6)
    dup3 = F.round(F.lit(1.0) - F.col("n_tri_distinct").cast("double")
                   / F.col("n_tri"), 6)
    return (uni.join(tri, "doc_id", "left")
            .select("doc_id", "n_tok", top1_share.alias("top1_share"),
                    F.coalesce(dup3, F.lit(0.0)).alias("dup3_frac"))
            .withColumn("keep", (F.col("top1_share") <= REP_TOP1_MAX)
                        & (F.col("dup3_frac") <= REP_DUP3_MAX))
            .orderBy("doc_id"))


SQL_REPETITION = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
), uni AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, max(c) AS top1 FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(w) AS tok FROM w) GROUP BY doc_id, tok)
  GROUP BY doc_id
), tri AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
         CAST(count(*) AS BIGINT) AS n_tri_distinct FROM (
    SELECT doc_id, tri, count(*) AS c FROM (
      SELECT doc_id, unnest(
        [array_to_string(w[i:i+2], ' ')
         FOR i IN range(1, greatest(len(w) - 1, 1))]) AS tri
      FROM w) GROUP BY doc_id, tri)
  GROUP BY doc_id
)
SELECT u.doc_id, u.n_tok,
       round(CAST(u.top1 AS DOUBLE) / u.n_tok, 6) AS top1_share,
       coalesce(round(1.0 - CAST(t.n_tri_distinct AS DOUBLE) / t.n_tri, 6),
                0.0) AS dup3_frac,
       (round(CAST(u.top1 AS DOUBLE) / u.n_tok, 6) <= {REP_TOP1_MAX}
        AND coalesce(round(1.0 - CAST(t.n_tri_distinct AS DOUBLE) / t.n_tri,
                           6), 0.0) <= {REP_DUP3_MAX}) AS keep
FROM uni u LEFT JOIN tri t ON t.doc_id = u.doc_id
ORDER BY u.doc_id
"""


# ---------------------------------------------------------------------------
# train_perplexity_buckets — CCNet-style LM-perplexity bucketing (Wenzek et
# al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
# Crawl Data" — public method): score every doc under a character-trigram
# unigram LM trained on the TARGET language's own docs (Laplace-smoothed,
# hashed feature buckets), then split each language into head / middle /
# tail TERCILES by mean negative log-likelihood (low NLL = head = closest
# to the target distribution).
#
# Cross-engine protocol (the train_dsir_weights recipe, training2.py):
#   1. ``ppl_pairs`` (doc_id, lang, h) — the xxhash64-bucketed trigram
#      stream, the only hash-dependent step, materialized (mat.py).
#   2. ``ppl_scores`` (h, ct, score) — per-bucket Laplace NLL in integer
#      MICRO-nats (round(-1e6 * log((ct+1)/(NT+B)))), Spark-authored; the
#      oracle RE-DERIVES ct from ppl_pairs and joins on (h, ct), so a
#      wrong count silently drops buckets and breaks the hash.
#   3. downstream, both engines, integer-exact: nll_micro = BIGINT sum,
#      q = round(nll_micro / n_tg) micro-nats/trigram; tercile cut values
#      are the k-th smallest q per lang with k = ceil(n/3), ceil(2n/3) in
#      INTEGER arithmetic; ties at a cut go to the better bucket.
#
# Scale: the tercile thresholds come from the BOUNDED (lang, q) histogram
# (q's domain is score-bounded, corpus-independent) — the window runs over
# the histogram, never the fact table (same design as
# train_quality_calibrate); thresholds broadcast back as a flag join.
# Docs shorter than one trigram have no distribution evidence and are
# excluded by construction (no pairs rows), identically in both engines.
# ---------------------------------------------------------------------------

_PPL_B = 8192          # hashed trigram buckets
_PPL_TARGET = "es"     # the LM's training slice: Spanish docs


def t_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    from .mat import materialize
    from .training import _spread

    # spread doc rows before the char-trigram explosion (see
    # t_repetition_filter) — serial otherwise on a single-split parquet
    docs = _spread(load(spark, sf, "documents"))
    n = F.length("text")
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.substr(F.col("text"), i, F.lit(3)))
    pairs = (docs.select(
                 "doc_id", "lang",
                 F.explode(F.when(n >= 3, tri)
                           .otherwise(F.array().cast("array<string>")))
                  .alias("tg"))
             .select("doc_id", "lang",
                     F.pmod(F.xxhash64("tg"), F.lit(_PPL_B)).alias("h")))
    pairs = materialize(pairs, "ppl_pairs", key=sf)

    nt = pairs.filter(F.col("lang") == _PPL_TARGET).count()
    counts = (pairs.filter(F.col("lang") == _PPL_TARGET)
                   .groupBy("h").agg(F.count("*").alias("ct")))
    hs = pairs.select("h").distinct()
    score = F.round(
        -F.log((F.col("ct") + 1) / F.lit(float(nt + _PPL_B)))
        * 1_000_000).cast("long")
    scores = (hs.join(counts, "h", "left")
                .select("h", F.coalesce("ct", F.lit(0)).alias("ct"))
                .withColumn("score", score))
    scores = materialize(scores, "ppl_scores", key=sf)

    ww = (pairs.join(scores.select("h", "score"), "h")
          .groupBy("doc_id", "lang")
          .agg(F.count("*").alias("n_tg"), F.sum("score").alias("nll_micro")))
    q = ww.withColumn(
        "q", F.round(F.col("nll_micro") / F.col("n_tg")).cast("long"))

    hist = q.groupBy("lang", "q").agg(F.count("*").alias("c"))
    tot = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    ks = tot.select("lang",
                    ((F.col("n") + 2) / 3).cast("long").alias("k1"),
                    ((2 * F.col("n") + 2) / 3).cast("long").alias("k2"))
    cum = hist.join(F.broadcast(ks), "lang").withColumn(
        "cum", F.sum("c").over(Window.partitionBy("lang").orderBy("q")))
    t1 = (cum.filter(F.col("cum") >= F.col("k1"))
             .groupBy("lang").agg(F.min("q").alias("t1")))
    t2 = (cum.filter(F.col("cum") >= F.col("k2"))
             .groupBy("lang").agg(F.min("q").alias("t2")))
    thr = t1.join(t2, "lang")
    bucket = (F.when(F.col("q") <= F.col("t1"), "head")
               .when(F.col("q") <= F.col("t2"), "middle")
               .otherwise("tail"))
    return (q.join(F.broadcast(thr), "lang")
             .select("doc_id", "lang", "n_tg", "nll_micro", "q",
                     bucket.alias("bucket"))
             .orderBy("doc_id"))


def _sql_perplexity() -> str:
    from .mat import mat_glob

    return f"""
WITH p AS (SELECT * FROM read_parquet('{mat_glob("ppl_pairs")}')),
s AS (SELECT * FROM read_parquet('{mat_glob("ppl_scores")}')),
chk AS (
  SELECT h, CAST(sum(CASE WHEN lang = '{_PPL_TARGET}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS ct
  FROM p GROUP BY h
),
v AS (  -- count mismatch -> dropped bucket -> hash break
  SELECT s.h, s.score FROM s
  JOIN chk ON chk.h = s.h AND chk.ct = s.ct
),
w AS (
  SELECT p.doc_id, p.lang, CAST(count(*) AS BIGINT) AS n_tg,
         CAST(sum(v.score) AS BIGINT) AS nll_micro
  FROM p JOIN v ON v.h = p.h GROUP BY 1, 2
),
q AS (
  SELECT doc_id, lang, n_tg, nll_micro,
         CAST(round(CAST(nll_micro AS DOUBLE) / n_tg) AS BIGINT) AS q
  FROM w
),
n AS (SELECT lang, count(*) AS n FROM q GROUP BY 1),
r AS (SELECT lang, q, row_number() OVER (PARTITION BY lang
                                         ORDER BY q, doc_id) AS rn
      FROM q),
t1 AS (SELECT r.lang, r.q AS t1 FROM r JOIN n ON r.lang = n.lang
       AND r.rn = (n.n + 2) // 3),
t2 AS (SELECT r.lang, r.q AS t2 FROM r JOIN n ON r.lang = n.lang
       AND r.rn = (2 * n.n + 2) // 3)
SELECT q.doc_id, q.lang, q.n_tg, q.nll_micro, q.q,
       CASE WHEN q.q <= t1.t1 THEN 'head'
            WHEN q.q <= t2.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM q JOIN t1 ON q.lang = t1.lang JOIN t2 ON q.lang = t2.lang
ORDER BY q.doc_id
"""


QUERIES = {
    "train_substring_dedup": (t_substring_dedup, SQL_SUBSTRING_DEDUP),
    "train_substring_hotspans": (t_substring_hotspans, SQL_SUBSTRING_HOTSPANS),
    "train_repetition_filter": (t_repetition_filter, SQL_REPETITION),
    "train_perplexity_buckets": (t_perplexity_buckets, _sql_perplexity()),
}
