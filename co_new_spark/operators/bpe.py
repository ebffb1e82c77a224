"""Distributed BPE tokenizer training (byte-pair encoding merge rounds),
exact across engines and partitionings.

Public method (Gage 1994; Sennrich et al. 2016 subword NMT): start from
characters, repeatedly count adjacent token pairs, merge the most frequent
pair corpus-wide, repeat.  This is THE tokenizer-training step of an LLM
data pipeline, here as a native DataFrame computation.

Representation: a position table (doc_id, pos, tok) where ``pos`` is the
ORIGINAL character index of the token's first char — stable under merges,
so every round is pure windowed relational algebra (no arrays mutated in
place, no UDFs):

* pair counts — lead(tok) over (doc, pos), one map-side-combined
  groupBy(tok, next) — the only corpus-sized exchange of the round.
* best pair — ORDER BY (count DESC, left, right) LIMIT 1: a distributed
  TakeOrderedAndProject, broadcast back; ties are total, so the merge
  table is deterministic.
* merge — greedy LEFT-TO-RIGHT non-overlapping, the reference BPE rule.
  Overlaps only arise in runs of candidates at consecutive sequence
  positions (possible only when left == right, e.g. "aaaa" under (a,a)):
  gaps-and-islands chains (row_number - cumulative-candidate-count) give
  each run an id, and within a run exactly the 1st, 3rd, ... candidates
  merge (offset parity).  For left != right every chain is a singleton,
  so ONE uniform rule covers both cases.
* rows consumed by their predecessor's merge drop out via lag(merged).

All windows are partitioned by doc_id (bounded by document length — never
a global sort); rounds are UNROLLED (fixed T, the kmeans/pagerank
precedent) with a localCheckpoint per round to keep the stacked-window
plan flat.  Everything is integer/string arithmetic — bit-identical in
any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_chars(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, pos, tok) single-character rows."""
    return (docs.select("doc_id",
                        F.posexplode(F.split(F.col(text_col), ""))
                         .alias("pos", "tok"))
                .filter(F.col("tok") != ""))


def pair_counts(seq: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies: (left, right, cnt)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (seq.withColumn("nxt", F.lead("tok").over(w))
               .filter(F.col("nxt").isNotNull())
               .groupBy(F.col("tok").alias("lhs"),
                        F.col("nxt").alias("rhs"))
               .agg(F.count("*").alias("cnt")))


def best_pair(counts: DataFrame) -> DataFrame:
    """The merge winner under the total order (cnt DESC, lhs, rhs)."""
    return (counts.orderBy(F.col("cnt").desc(), "lhs", "rhs").limit(1)
                  .select("lhs", "rhs", "cnt"))


def merge_pair(seq: DataFrame, best: DataFrame) -> DataFrame:
    """Apply one greedy left-to-right non-overlapping merge of ``best``."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = (seq.crossJoin(F.broadcast(best))
            .withColumn("nxt", F.lead("tok").over(w))
            .withColumn("isc", F.coalesce(
                (F.col("tok") == F.col("lhs"))
                & (F.col("nxt") == F.col("rhs")), F.lit(False)))
            .withColumn("r", F.row_number().over(w))
            .withColumn("rc", F.sum(F.col("isc").cast("int")).over(cum)))
    # candidate chains: consecutive candidate rows share r - rc
    s = s.withColumn("chain", F.when(F.col("isc"), F.col("r") - F.col("rc")))
    wc = Window.partitionBy("doc_id", "chain")
    s = s.withColumn(
        "merged", F.col("isc")
        & ((F.col("rc") - F.min(F.when(F.col("isc"), F.col("rc"))).over(wc))
           % 2 == 0))
    s = s.withColumn("consumed",
                     F.coalesce(F.lag("merged").over(w), F.lit(False)))
    return (s.filter(~F.col("consumed"))
             .select("doc_id", "pos",
                     F.when(F.col("merged"),
                            F.concat(F.col("lhs"), F.col("rhs")))
                      .otherwise(F.col("tok")).alias("tok")))


def bpe_train(docs: DataFrame, rounds: int,
              text_col: str = "text") -> DataFrame:
    """T merge rounds; returns the learned merge table
    (rnd, lhs, rhs, cnt, n_tokens_after), one row per round."""
    seq = explode_chars(docs, text_col).localCheckpoint(eager=True)
    out = None
    for r in range(rounds):
        best = best_pair(pair_counts(seq)).localCheckpoint(eager=True)
        seq = merge_pair(seq, best).localCheckpoint(eager=True)
        n_after = seq.agg(F.count("*").alias("n_tokens_after"))
        row = (best.withColumn("rnd", F.lit(r))
                   .crossJoin(F.broadcast(n_after))
                   .select("rnd", "lhs", "rhs", "cnt", "n_tokens_after"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("rnd")
