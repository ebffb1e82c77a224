"""Training-pipeline surface, part 5: membership-sketch incremental dedup.

``train_dedup_bloom`` computes EXACTLY what ``train_dedup_incremental``
computes — the rows of a new ingest batch whose fingerprint is absent from
the historical store, window-deduped within the batch — through the
physical strategy that survives a store 1000x the batch (the relationship
between the two entries is the same as train_knn_brute vs train_knn_ivf:
identical answer, correctness-scale vs production-scale plan).

Plan, and where every byte moves:

1. store fingerprints -> bucket-partitioned Bloom filters
   (operators/bloom.py): the store crosses the wire ONCE, as two pruned
   64-bit hash columns; the sketch stays partitioned by bucket, never on
   the driver.
2. batch rows cogroup with their bucket's bloom: rows the filter rejects
   are PROVABLY new (no false negatives) and skip verification entirely.
3. only the "maybe" sliver (true dups + ~1% FPR) is verified exactly.
   In the expected regime (mostly-novel batches) the sliver is tiny, AQE
   broadcasts it at runtime, and the store side of the verification never
   shuffles: a left-semi scan of the store driven by the candidate
   fingerprints, then the matched set back into a left-anti over the
   candidates.  The broadcast is AQE-sized, not hinted — the sliver grows
   with the batch's dup ratio, which is unbounded in principle, so an
   all-duplicate batch degrades to one bounded pruned-column shuffle
   instead of a forced batch-sized broadcast.
4. within-batch dedup is the standard per-fingerprint window, running on
   batch-sized data only.

The Bloom pass is invisible in the output (false positives are verified
away, misses are exact), so the DuckDB oracle is plain relational SQL —
any sketch bug that costs an output row breaks the hash.  The
no-false-negative invariant and the actual filtering power are pytest-gated
separately (tests/test_bloom.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.bloom import bloom_flag
from ..sources.tables import load

# deterministic ingest split: one fifth of the corpus is "the new batch"
_BATCH_MOD, _BATCH_REM = 5, 0
# bounded bucket cardinality (same invariant the lineage ledger enforces):
# at 100 TB this scales with the cluster, not the data
_N_BUCKETS = 32


def t_dedup_bloom(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    fp = F.md5(F.col("text"))
    store = (docs.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM)
                 .select(fp.alias("fp")))
    batch = (docs.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM)
                 .select("doc_id", fp.alias("fp"), "lang", "source"))

    flagged = bloom_flag(batch, store, "fp", n_buckets=_N_BUCKETS)
    definite_new = flagged.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
    candidates = flagged.filter(F.col("bloom_maybe")).drop("bloom_maybe")

    # exact verification: in the expected regime the candidate sliver is
    # small (true dups + ~1% FPR of the batch), so AQE sizes BOTH joins as
    # broadcasts at runtime and the store is only ever scanned map-side.
    # Deliberately NO F.broadcast hint: the sliver's size is bounded by the
    # batch's dup ratio, which an ingest pipeline does not control — a
    # pathological all-duplicate batch would make a forced broadcast
    # batch-sized (driver/executor OOM at 100 TB), whereas AQE degrades
    # that tail to one bounded shuffle of the pruned fp columns and keeps
    # the common case identical to the hinted plan.
    cand_fps = candidates.select("fp").distinct()
    dup_fps = (store.join(cand_fps, "fp", "left_semi")
                    .select("fp").distinct())
    verified_new = candidates.join(dup_fps, "fp", "left_anti")

    w = Window.partitionBy("fp").orderBy("doc_id")
    return (definite_new.unionByName(verified_new)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "fp", "lang", "source"))


SQL_DEDUP_BLOOM = f"""
WITH store AS (
  SELECT DISTINCT md5(text) AS fp FROM documents
  WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REM}
), batch AS (
  SELECT doc_id, md5(text) AS fp, lang, source
  FROM documents WHERE doc_id % {_BATCH_MOD} = {_BATCH_REM}
), fresh AS (
  SELECT b.*, row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id) AS rn
  FROM batch b WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.fp = b.fp)
)
SELECT doc_id, fp, lang, source FROM fresh WHERE rn = 1
"""


QUERIES = {
    "train_dedup_bloom": (t_dedup_bloom, SQL_DEDUP_BLOOM),
}
