"""WARC container scan — Common Crawl's on-disk format, end to end.

The north-rule corpus is "Common-Crawl-style web pages", and Common Crawl
ships WARC files (ISO 28500): concatenated records, each a CRLF-header
block + ``Content-Length`` payload bytes.  ``web_warc_scan`` exercises the
full container path on real bytes:

* build: one WARC blob per shard (shard = the WARC *file* unit; 8 here,
  one per applyInPandas group) from the documents table, records in doc_id
  order via ``functions/warc.build_record``.
* harden: every 5th payload gets a leading decoy ``WARC/1.0\\r\\n`` line —
  a parser that splits on the magic string instead of walking
  ``Content-Length`` mis-frames the stream and breaks the offset sums.
* parse: ``functions/warc.parse_warc`` — strictly length-driven, returns
  per-record byte offsets, header/payload lengths, and the Target-URI.

The oracle (DuckDB) never sees the bytes: it reconstructs every header
LENGTH arithmetically from the same strings (``strlen`` — bytes, not
chars), derives each record's byte offset with a windowed running sum, and
aggregates the identical per-shard stats — so a single mis-framed record
shifts every later offset and fails the hash.

Scale: build+parse happen inside ONE applyInPandas (one shuffle on the
file key, one Arrow crossing — blob bytes never become a shuffled column);
in production the builder drops out and ``parse_warc`` runs as mapInPandas
over (path, blob) rows straight off the object store, one task per WARC
file — the classic CC ingest layout (files are ~1 GB, so per-task memory
is bounded by file size, not corpus size).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import warc
from ..sources.tables import load

_N_SHARDS = 8
_URI_PREFIX = "https://example.org/d"
_DECOY = "WARC/1.0\r\n"


def t_warc_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Per-shard WARC file stats from a real build->parse round trip:
    (shard, n_records, payload_bytes, header_bytes, sum_offsets,
    sum_uri_ids, file_bytes)."""

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        parts = []
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            payload = ((_DECOY if did % 5 == 0 else "") + text).encode("utf-8")
            parts.append(warc.build_record(f"{_URI_PREFIX}{did}", payload))
        recs = warc.parse_warc(b"".join(parts))
        if len(recs) != len(pdf):  # a mis-framed stream must not pass silently
            raise ValueError(
                f"parsed {len(recs)} records from {len(pdf)} inputs")
        shard = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            [(shard, r["offset"], r["content_length"], r["header_length"],
              int(r["uri"].removeprefix(_URI_PREFIX))) for r in recs],
            columns=["shard", "offset", "content_length", "header_length",
                     "uri_id"])

    docs = (load(spark, sf, "documents")
            .select("doc_id", "text",
                    (F.col("doc_id") % _N_SHARDS).alias("shard")))
    rec = docs.groupBy("shard").applyInPandas(
        per_shard,
        "shard long, offset long, content_length long, header_length long, "
        "uri_id long")
    return (rec.groupBy("shard")
            .agg(F.count("*").alias("n_records"),
                 F.sum("content_length").alias("payload_bytes"),
                 F.sum("header_length").alias("header_bytes"),
                 F.sum("offset").alias("sum_offsets"),
                 F.sum("uri_id").alias("sum_uri_ids"),
                 F.sum(F.col("header_length") + F.col("content_length") + 4)
                  .alias("file_bytes"))
            .orderBy("shard"))


_CRLF_SQL = "chr(13) || chr(10)"

SQL_WARC_SCAN = f"""
WITH d AS (
  SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
         CASE WHEN doc_id % 5 = 0
              THEN 'WARC/1.0' || {_CRLF_SQL} ELSE '' END || text AS payload
  FROM documents
), r AS (
  SELECT shard, doc_id, CAST(strlen(payload) AS BIGINT) AS clen,
         CAST(strlen(
           'WARC/1.0' || {_CRLF_SQL} ||
           'WARC-Type: response' || {_CRLF_SQL} ||
           'WARC-Target-URI: {_URI_PREFIX}' || CAST(doc_id AS VARCHAR)
             || {_CRLF_SQL} ||
           'Content-Length: ' || CAST(strlen(payload) AS VARCHAR)
             || {_CRLF_SQL} || {_CRLF_SQL}) AS BIGINT) AS hlen
  FROM d
), o AS (
  SELECT shard, doc_id, clen, hlen,
         COALESCE(sum(hlen + clen + 4) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM r
)
SELECT shard, CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(clen) AS BIGINT) AS payload_bytes,
       CAST(sum(hlen) AS BIGINT) AS header_bytes,
       CAST(sum(off) AS BIGINT) AS sum_offsets,
       CAST(sum(doc_id) AS BIGINT) AS sum_uri_ids,
       CAST(sum(hlen + clen + 4) AS BIGINT) AS file_bytes
FROM o GROUP BY shard ORDER BY shard
"""


QUERIES = {
    "web_warc_scan": (t_warc_scan, SQL_WARC_SCAN),
}
