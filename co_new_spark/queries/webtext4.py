"""Storage-layer dedup surface: content-defined chunking.

``web_cdc_chunks`` — CDC (the LBFS / rsync / restic / borg primitive,
Muthitacharoen et al. SOSP 2001): cut a byte stream at positions where a
hash of the trailing fixed-width window hits a target value, so chunk
boundaries move WITH the content — an insertion early in a page re-aligns
at the next content-defined cut instead of shifting every downstream
fixed-size block.  Chunk-level sharing across documents is the storage /
transfer dedup win (WARC re-crawl storage, page-version archives).

Boundary rule here: window w = 8 chars, cut after position i when
``md5(window)`` ends in hex '0' (expected chunk 16 bytes).  The md5-hex
window hash is deliberately engine-neutral (identical in Spark and
DuckDB); production Rabin/Gear polynomials are a constant-factor swap
inside the same plan.  The min/max chunk-size guards real CDC deployments
add are inherently sequential (a cut's survival depends on the previous
surviving cut) and are documented out of the declarative form — the pure
predicate form is LBFS's own base definition.

Plan shape (the serialization-audit discipline): boundary detection is
ARRAY-NATIVE — one codegen projection per document builds the cut list
with higher-order functions (transform/filter over sequence), so the full
text is never carried into a per-position row explosion.  Only the
already-cut chunks (16-byte strings) explode.  The two fact-sized
exchanges are the chunk-hash groupBy and the share-count equi-join —
at 100 TB the (chunk_md5, ndocs) side IS the chunk store of a dedup
archive, bounded by unique content, and the join key is uniform by
construction (md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

_CDC_W = 8  # window width (chars)


def cdc_chunks(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, chunk_idx, chunk_len, chunk_md5).

    The per-position window scan is the one place on this surface where a
    native formulation genuinely loses: higher-order functions evaluate
    interpreted (~25 µs/element — measured 92 s for 500 docs with the
    detection array inlined into the lambda, 26 s with it hoisted to
    zip_with arguments), while an Arrow-batched python pass does the same
    250k window hashes in 0.2 s.  So this is a mapInPandas operator by
    the codebase's own UDF rule (vectorized batch, partition-parallel,
    zero shuffle, chunk-sized output rows — the full text never explodes).
    The boundary rule stays engine-neutral: hashlib.md5 of the UTF-8
    window == SQL md5, byte for byte."""
    import hashlib

    from collections.abc import Iterator

    import pandas as pd

    w = _CDC_W

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "chunk_idx": [], "chunk_len": [],
                   "chunk_md5": []}
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                n = len(b)
                # cut AFTER 1-based position i when the md5 of the 8-byte
                # window ending at i ends in hex '0' (and i < n)
                bounds = [0] + [i for i in range(w, n)
                                if hashlib.md5(b[i - w:i]).hexdigest()
                                .endswith("0")] + [n]
                for k in range(len(bounds) - 1):
                    piece = b[bounds[k]:bounds[k + 1]]
                    out["doc_id"].append(int(did))
                    out["chunk_idx"].append(k)
                    out["chunk_len"].append(len(piece))
                    out["chunk_md5"].append(hashlib.md5(piece).hexdigest())
            yield pd.DataFrame(out)

    schema = "doc_id long, chunk_idx int, chunk_len long, chunk_md5 string"
    return docs.select("doc_id", text_col).mapInPandas(batches, schema)


def w_cdc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    from .training import _spread

    # spread compact doc rows across slots BEFORE the Arrow pass (the
    # single-split serialization audit): the window scan is the entry's
    # dominant cost and is embarrassingly parallel per document
    ch = cdc_chunks(_spread(load(spark, sf, "documents")
                            .select("doc_id", "text")))
    share = ch.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").alias("ndocs"))
    return (ch.join(share, "chunk_md5")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_chunks"),
                   F.sum("chunk_len").alias("n_bytes"),
                   F.max("chunk_len").alias("max_chunk_len"),
                   F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
                    .alias("n_chunks_shared"))
              .orderBy("doc_id"))


SQL_CDC_CHUNKS = f"""
WITH s AS (  -- 4096 comfortably bounds the corpus's max text length
  SELECT i FROM generate_series(1, 4096) t(i)),
pos AS MATERIALIZED (
  SELECT d.doc_id, s.i, substr(d.text, s.i, 1) AS c,
         CASE WHEN s.i >= {_CDC_W} AND s.i < length(d.text)
              AND substr(md5(substr(d.text, s.i - {_CDC_W - 1}, {_CDC_W})),
                         32, 1) = '0'
              THEN 1 ELSE 0 END AS isc
  FROM documents d JOIN s ON s.i <= length(d.text)),
chpos AS (
  SELECT doc_id, i, c,
         coalesce(sum(isc) OVER (PARTITION BY doc_id ORDER BY i
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS cidx
  FROM pos),
ch AS MATERIALIZED (
  SELECT doc_id, cidx, string_agg(c, '' ORDER BY i) AS chunk
  FROM chpos GROUP BY doc_id, cidx),
hs AS MATERIALIZED (
  SELECT doc_id, cidx, length(chunk) AS chunk_len, md5(chunk) AS h
  FROM ch),
share AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM hs GROUP BY h)
SELECT hs.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(hs.chunk_len) AS BIGINT) AS n_bytes,
       CAST(max(hs.chunk_len) AS BIGINT) AS max_chunk_len,
       CAST(sum(CASE WHEN share.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_chunks_shared
FROM hs JOIN share ON share.h = hs.h
GROUP BY hs.doc_id ORDER BY hs.doc_id
"""


QUERIES = {
    "web_cdc_chunks": (w_cdc_chunks, SQL_CDC_CHUNKS),
}
