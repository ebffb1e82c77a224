"""Unigram-LM (SentencePiece-style) Viterbi tokenization as a row-local
Catalyst DP fold (``train_unigram_lm``).

Why it exists: the registry's tokenizer family covers BPE training
(position-table merge rounds) and BPE application (broadcast merge chain);
the OTHER production tokenizer is the unigram language model (Kudo 2018,
SentencePiece) — segment each document into the vocabulary pieces
minimizing total piece cost (= -log p, min-sum Viterbi).  That is a per-
document dynamic program, the 1-D sibling of the DTW fold: best[i] = min
over pieces p ending at i of best[i - |p|] + cost(p).

Engine shape: the vocabulary is a compile-time literal (broadcast-the-
model, the bpe_apply convention), and the DP runs entirely row-local as ONE
`F.aggregate` over character positions carrying the growing best[] array as
fold state — zero Python, zero shuffles (the one exchange is the
presentation sort), whole-stage codegen, embarrassing parallelism over
10^12 documents.

Exactness: costs are integers; the DP state is the COMBINED key
``cost * 64 + tokens`` (token count < 64 by the length cap), so minimizing
the combined key IS lexicographic (cost, tokens) minimization — the value
is unique even when distinct segmentations tie on cost, making the
(cost, tokens) output engine-independent without emitting the (possibly
tied) segmentation itself.

Oracle: the same recurrence walked by a recursive CTE that carries a
SLIDING WINDOW of the last _MAXLEN best values as columns (b0..b4) — the
bounded-lookback trick that keeps the recursive term aggregate-free (cf.
the DTW oracle's inlined-neighbor workaround) — over documents prepped
identically in SQL.  Both engines inline the same literal vocabulary.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

_ULM_CHARS = 40   # per-doc character cap (tokens < 64 needs <= 63)
_ULM_MINLEN = 8

# multi-char vocabulary: pieces common in the documents corpus vocabulary
# plus generic English digrams; costs are md5-derived module-level literals
# inlined into BOTH engines (60..299 — a matched piece often, not always,
# beats its per-char sum of 100-152 each)
_ULM_PIECES = [
    "the", "fast", "key", "row", "join", "filt", "scan", "agg", "query",
    "data", "spark", "group", "hash", "table", "er", "in", "an", "ta",
    "or", "st", "ar", "ow", "le", "ne", "co", "lin",
]


def _piece_cost(p: str) -> int:
    return 60 + int(hashlib.md5(f"uni_{p}".encode()).hexdigest()[:4], 16) % 240


_ULM_VOCAB = [(p, _piece_cost(p)) for p in _ULM_PIECES]

# single-char fallback cost (full coverage): 100 + (ascii * 7) % 53
_CHAR_BASE, _CHAR_MUL, _CHAR_MOD = 100, 7, 53


def g_unigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document Viterbi (cost, tokens) under the literal unigram vocab."""
    d = load(spark, sf, "documents")
    s = F.substring(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""),
                    1, _ULM_CHARS)
    d = d.select("doc_id", s.alias("s")).filter(F.length("s") >= _ULM_MINLEN)

    def step(acc, i):
        cands = [F.element_at(acc, i)
                 + (F.lit(_CHAR_BASE)
                    + (F.ascii(F.substring(F.col("s"), i, 1))
                       * _CHAR_MUL) % _CHAR_MOD) * 64 + 1]
        for p, c in _ULM_VOCAB:
            ln = len(p)
            cands.append(F.when(
                (i >= ln) & (F.substring(F.col("s"), i - ln + 1, ln)
                             == F.lit(p)),
                F.element_at(acc, i - ln + 1) + F.lit(c * 64 + 1)))
        return F.concat(acc, F.array(F.least(*cands)))

    idx = F.sequence(F.lit(1), F.length("s"))
    best = F.aggregate(idx, F.array(F.lit(0).cast("long")), step)
    comb = F.element_at(best, F.length("s") + 1)
    return (d.select("doc_id", comb.alias("comb"))
             .select("doc_id",
                     F.floor(F.col("comb") / 64).cast("long").alias("cost"),
                     F.pmod(F.col("comb"), F.lit(64)).cast("long")
                      .alias("tokens"))
             .orderBy("doc_id"))


def _sql_cands() -> str:
    """The per-step least() candidate list, single-sourced from _ULM_VOCAB.
    Position being filled is i+1; piece of length l uses best[i+1-l], which
    the sliding window carries as b{l-1}."""
    terms = [f"b0 + ({_CHAR_BASE} + (ascii(substring(s, i + 1, 1))"
             f" * {_CHAR_MUL}) % {_CHAR_MOD}) * 64 + 1"]
    for p, c in _ULM_VOCAB:
        ln = len(p)
        terms.append(
            f"CASE WHEN i + 1 >= {ln} AND substring(s, i + 2 - {ln}, {ln})"
            f" = '{p}' THEN b{ln - 1} + {c * 64 + 1} END")
    return ",\n      ".join(terms)


SQL_UNIGRAM_LM = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id,
         substring(regexp_replace(lower(text), '[^a-z]', '', 'g'),
                   1, {_ULM_CHARS}) AS s
  FROM documents
), d2 AS (
  SELECT doc_id, s FROM docs WHERE length(s) >= {_ULM_MINLEN}
), dp AS (
  SELECT doc_id, s, 0 AS i,
         CAST(0 AS BIGINT) AS b0, CAST(NULL AS BIGINT) AS b1,
         CAST(NULL AS BIGINT) AS b2, CAST(NULL AS BIGINT) AS b3,
         CAST(NULL AS BIGINT) AS b4
  FROM d2
  UNION ALL
  SELECT doc_id, s, i + 1,
    least(
      {_sql_cands()}
    ) AS b0,
    b0 AS b1, b1 AS b2, b2 AS b3, b3 AS b4
  FROM dp WHERE i < length(s)
)
SELECT doc_id, b0 // 64 AS cost, b0 % 64 AS tokens
FROM dp WHERE i = length(s)
ORDER BY doc_id
"""


QUERIES = {
    "train_unigram_lm": (g_unigram_lm, SQL_UNIGRAM_LM),
}
