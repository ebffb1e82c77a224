"""Training-pipeline surface, part 11: denoiser target construction.

``train_span_corruption`` — T5-style span corruption (Raffel et al. 2020
§3.1.4; the UL2 R-denoiser, Tay et al. 2022): replace selected token spans
with ordinal sentinels in the input and emit the spans behind the same
sentinels as the target — the data-prep step that turns a raw corpus into
denoising (input, target) pairs.

Deterministic, parallel span selection: candidate starts live on a stride
grid (every 5th token position); grid start g opens a span iff
``(doc_id*31 + g*17) % 7 == 0``, with length ``1 + (doc_id*13 + g*11) % 3``.
Stride (5) exceeds the max span length (3), so spans can NEVER overlap —
the sequential overlap-suppression loop of the reference samplers is
designed out, and membership of token p is pure row-local arithmetic
against its own grid point ``g = p - p % 5``.  The gates are engine-neutral
integer arithmetic (no hash, no mat protocol): the oracle is fully
self-contained.

Plan shape: ONE token explosion (codegen), one doc-bounded window to
rank span ordinals (spans per doc <= tokens/5, partitioned by doc_id —
the audit-sanctioned window class), one (doc_id, g) equi-join of tokens to
their span ordinal, and one groupBy(doc_id) with order-restored
array_sort(collect_list(struct(pos, piece))) assembly.  ``input_md5`` /
``target_md5`` prove both reconstructed strings byte-identical
cross-engine — sentinel numbering, spacing, and the trailing sentinel
convention included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

_SC_STRIDE = 5   # candidate-start grid; > max span length => no overlap
_SC_GATE = 7     # a grid start opens a span with probability 1/7
_SC_MAXLEN = 3   # span length in 1..3


def span_corrupt(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.col("text"), " "),
                              lambda x: x != "")).alias("p", "tok"))
    g = F.col("p") - F.col("p") % _SC_STRIDE
    gate = (F.col("doc_id") * 31 + g * 17) % _SC_GATE == 0
    span_len = 1 + (F.col("doc_id") * 13 + g * 11) % _SC_MAXLEN
    toks = toks.select(
        "doc_id", "p", "tok", g.alias("g"),
        (gate & (F.col("p") < g + span_len)).alias("covered"))

    spans = (toks.filter((F.col("p") == F.col("g")) & F.col("covered"))
                 .select("doc_id", "g",
                         (F.row_number().over(
                             Window.partitionBy("doc_id").orderBy("g")) - 1)
                         .alias("k")))
    t = (toks.join(spans, ["doc_id", "g"], "left")
             .withColumn("sent", F.concat(F.lit("<extra_id_"),
                                          F.col("k").cast("string"),
                                          F.lit(">"))))
    piece_in = (F.when(~F.col("covered"), F.col("tok"))
                 .when(F.col("p") == F.col("g"), F.col("sent")))
    piece_tg = F.when(
        F.col("covered"),
        F.when(F.col("p") == F.col("g"),
               F.concat(F.col("sent"), F.lit(" "), F.col("tok")))
         .otherwise(F.col("tok")))

    def joined(piece):
        return F.array_join(
            F.expr("transform(array_sort(collect_list(CASE WHEN piece "
                   "IS NOT NULL THEN struct(p, piece) END)), x -> x.piece)"),
            " ")

    agg = (t.select("doc_id", "p", "covered", "k",
                    piece_in.alias("piece"), piece_tg.alias("piece_tg"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 (F.coalesce(F.max("k"), F.lit(-1)) + 1).alias("n_spans"),
                 F.sum(F.col("covered").cast("long"))
                  .alias("n_corrupted_tokens"),
                 joined("piece").alias("inp"),
                 F.array_join(
                     F.expr("transform(array_sort(collect_list(CASE WHEN "
                            "piece_tg IS NOT NULL THEN struct(p, piece_tg) "
                            "END)), x -> x.piece_tg)"), " ").alias("tgb")))
    final_sent = F.concat(F.lit("<extra_id_"),
                          F.col("n_spans").cast("string"), F.lit(">"))
    target = F.when(F.col("tgb") == "", final_sent) \
              .otherwise(F.concat(F.col("tgb"), F.lit(" "), final_sent))
    return (agg.select("doc_id", "n_tokens", "n_spans",
                       "n_corrupted_tokens",
                       F.md5(F.col("inp")).alias("input_md5"),
                       F.md5(target).alias("target_md5"))
               .orderBy("doc_id"))


def t_span_corruption(spark: SparkSession, sf: str) -> DataFrame:
    from .training import _spread

    return span_corrupt(_spread(load(spark, sf, "documents")
                                .select("doc_id", "text")))


SQL_SPAN_CORRUPTION = f"""
WITH raw AS (
  SELECT doc_id, tok, sub
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS sub
        FROM documents)
  WHERE tok <> ''),
toks AS MATERIALIZED (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY sub) - 1 AS p
  FROM raw),
tk AS (
  SELECT doc_id, p, tok, p - p % {_SC_STRIDE} AS g,
         ((doc_id * 31 + (p - p % {_SC_STRIDE}) * 17) % {_SC_GATE} = 0
          AND p < (p - p % {_SC_STRIDE})
                  + 1 + (doc_id * 13 + (p - p % {_SC_STRIDE}) * 11)
                        % {_SC_MAXLEN}) AS covered
  FROM toks),
spans AS (
  SELECT doc_id, g,
         row_number() OVER (PARTITION BY doc_id ORDER BY g) - 1 AS k
  FROM tk WHERE p = g AND covered),
t AS MATERIALIZED (
  SELECT tk.doc_id, tk.p, tk.tok, tk.g, tk.covered, s.k,
         '<extra_id_' || s.k || '>' AS sent
  FROM tk LEFT JOIN spans s ON s.doc_id = tk.doc_id AND s.g = tk.g),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         coalesce(max(k), -1) + 1 AS n_spans,
         sum(CASE WHEN covered THEN 1 ELSE 0 END) AS n_corrupted_tokens,
         string_agg(CASE WHEN NOT covered THEN tok
                         WHEN p = g THEN sent END, ' ' ORDER BY p) AS inp,
         string_agg(CASE WHEN covered AND p = g THEN sent || ' ' || tok
                         WHEN covered THEN tok END,
                    ' ' ORDER BY p) AS tgb
  FROM t GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(n_corrupted_tokens AS BIGINT) AS n_corrupted_tokens,
       md5(coalesce(inp, '')) AS input_md5,
       md5(CASE WHEN tgb IS NULL OR tgb = ''
                THEN '<extra_id_' || n_spans || '>'
                ELSE tgb || ' <extra_id_' || n_spans || '>' END)
         AS target_md5
FROM agg ORDER BY doc_id
"""


QUERIES = {
    "train_span_corruption": (t_span_corruption, SQL_SPAN_CORRUPTION),
}
