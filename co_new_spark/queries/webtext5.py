"""Web-text surface, part 5: HTTP/1.1 response-message parsing — the layer a
Common-Crawl-style pipeline crosses between the WARC container (web_warc_scan)
and content processing (web_extract_parity): every ``response`` record's
payload is a full RFC 9112 message whose status line and header fields decide
what happens to the body (keep / redirect-follow / drop, which decoder, which
charset).

One driver-oracle-checked entry:

* ``web_http_headers`` — build a deterministic HTTP/1.1 response per document
  (status line, four headers in doc-dependent ORDER, CRLF framing, body =
  the document text; one in five responses declares a short Content-Length,
  the classic truncated-transfer defect), then PARSE it back with a generic
  header-field search (not fixed positions): status code, media type and
  charset from Content-Type, declared vs actual body length, header count.

Both the construction and the parse are pure native string functions
(``split_part`` / ``split`` / ``substr`` — no regex, so no Java-vs-RE2
dialect drift; no UDF), and the oracle restates BOTH sides in DuckDB SQL, so
a parse bug and a construction bug are both caught.  Per-row, embarrassingly
parallel: the only exchange in the plan is the final presentation sort.

Scale notes (100 TB): header parsing is a projection — it pipelines inside
whole-stage codegen over the scan with zero shuffles; the explode over header
lines stays bounded (4 lines/doc) and collapses back row-local via the
doc-keyed aggregate, whose partial combine runs map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

_CRLF = "\r\n"

# status distribution: 200-heavy like real crawl captures
_CODES = [200, 200, 200, 301, 404, 503, 200, 206]
_REASONS = ["OK", "OK", "OK", "Moved Permanently", "Not Found",
            "Service Unavailable", "OK", "Partial Content"]
_CTYPES = ["text/html; charset=UTF-8", "text/plain; charset=iso-8859-1",
           "application/json", "image/png"]


def _built(docs: DataFrame) -> DataFrame:
    """(doc_id, msg) — deterministic HTTP/1.1 response per document."""
    i8 = F.pmod(F.col("doc_id"), F.lit(8)) + 1
    code = F.element_at(F.array(*[F.lit(c) for c in _CODES]), i8.cast("int"))
    reason = F.element_at(F.array(*[F.lit(r) for r in _REASONS]),
                          i8.cast("int"))
    ct = F.element_at(F.array(*[F.lit(c) for c in _CTYPES]),
                      (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"))
    n = F.length("text")
    clen = F.when(F.pmod(F.col("doc_id"), F.lit(5)) == 0,
                  F.greatest(n - 7, F.lit(0))).otherwise(n)
    h_ct = F.concat(F.lit("Content-Type: "), ct)
    h_cl = F.concat(F.lit("Content-Length: "), clen.cast("string"))
    h_sv = F.concat(F.lit("Server: srv"),
                    F.pmod(F.col("doc_id"), F.lit(7)).cast("string"))
    h_xc = F.concat(F.lit("X-Cache: "),
                    F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0,
                           F.lit("HIT")).otherwise(F.lit("MISS")))
    # header ORDER varies by parity so the parser must search, not index
    head = F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0,
                  F.concat_ws(_CRLF, h_sv, h_ct, h_cl, h_xc)) \
            .otherwise(F.concat_ws(_CRLF, h_ct, h_cl, h_xc, h_sv))
    msg = F.concat(F.lit("HTTP/1.1 "), code.cast("string"), F.lit(" "),
                   reason, F.lit(_CRLF), head, F.lit(_CRLF + _CRLF),
                   F.col("text"))
    return docs.select("doc_id", msg.alias("msg"))


def parse_http(raw: DataFrame) -> DataFrame:
    """Parse (doc_id, msg) HTTP/1.1 responses — generic header-field search,
    not fixed positions (header order is not significant per RFC 9112).

    The field search is a row-local array ``filter`` (a native Catalyst
    higher-order expression over the handful of header lines, NOT a Python
    UDF and NOT an explode+re-aggregate) so the whole parse is one codegen
    projection with zero exchanges before the presentation sort.
    """
    head = F.split_part(F.col("msg"), F.lit(_CRLF + _CRLF), F.lit(1))
    parsed = raw.select(
        "doc_id",
        head.alias("head"),
        F.substr(F.col("msg"), F.length(head) + 5).alias("body"))
    lines = F.split(F.col("head"), _CRLF)
    status = F.split_part(F.element_at(lines, 1), F.lit(" "), F.lit(2)) \
              .cast("long")
    hdrs = F.slice(lines, 2, F.size(lines) - 1)

    def _find(name: str):
        """Value of the first header field named ``name`` (lowercased)."""
        line = F.element_at(
            F.filter(hdrs, lambda l: F.lower(
                F.split_part(l, F.lit(": "), F.lit(1))) == name), 1)
        return F.substr(line,
                        F.length(F.split_part(line, F.lit(": "),
                                              F.lit(1))) + 3)

    agg = parsed.select(
        "doc_id", status.alias("status"),
        F.length("body").alias("body_len"),
        (F.size(lines) - 1).alias("n_headers"),
        _find("content-type").alias("ct"),
        _find("content-length").cast("long").alias("clen_declared"))
    mime = F.split_part(F.col("ct"), F.lit(";"), F.lit(1))
    charset = F.when(F.col("ct").contains("charset="),
                     F.lower(F.split_part(F.col("ct"), F.lit("charset="),
                                          F.lit(2)))) \
               .otherwise(F.lit(""))
    return (agg.select(
                "doc_id", "status", mime.alias("mime"),
                charset.alias("charset"), "clen_declared", "body_len",
                (F.col("clen_declared") == F.col("body_len"))
                 .cast("long").alias("clen_ok"),
                "n_headers")
            .orderBy("doc_id"))


def t_http_headers(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    return parse_http(_built(docs))


def _sql_http_headers() -> str:
    codes = ", ".join(str(c) for c in _CODES)
    reasons = ", ".join(f"'{r}'" for r in _REASONS)
    ctypes = ", ".join(f"'{c}'" for c in _CTYPES)
    return f"""
WITH crlf AS (SELECT chr(13) || chr(10) AS c),
built AS (
  SELECT doc_id,
         'HTTP/1.1 ' ||
         ([{codes}])[CAST(doc_id % 8 AS INT) + 1] || ' ' ||
         ([{reasons}])[CAST(doc_id % 8 AS INT) + 1] || c ||
         CASE WHEN doc_id % 2 = 0
           THEN 'Server: srv' || (doc_id % 7) || c ||
                'Content-Type: ' ||
                ([{ctypes}])[CAST(doc_id % 4 AS INT) + 1] || c ||
                'Content-Length: ' ||
                (CASE WHEN doc_id % 5 = 0
                      THEN greatest(length(text) - 7, 0)
                      ELSE length(text) END) || c ||
                'X-Cache: ' || (CASE WHEN doc_id % 3 = 0
                                     THEN 'HIT' ELSE 'MISS' END)
           ELSE 'Content-Type: ' ||
                ([{ctypes}])[CAST(doc_id % 4 AS INT) + 1] || c ||
                'Content-Length: ' ||
                (CASE WHEN doc_id % 5 = 0
                      THEN greatest(length(text) - 7, 0)
                      ELSE length(text) END) || c ||
                'X-Cache: ' || (CASE WHEN doc_id % 3 = 0
                                     THEN 'HIT' ELSE 'MISS' END) || c ||
                'Server: srv' || (doc_id % 7)
         END || c || c || text AS msg
  FROM documents, crlf WHERE text IS NOT NULL),
parsed AS (
  SELECT doc_id,
         split_part(msg, c || c, 1) AS head,
         substr(msg, length(split_part(msg, c || c, 1)) + 5) AS body
  FROM built, crlf),
lined AS (
  SELECT doc_id,
         CAST(split_part(string_split(head, c)[1], ' ', 2) AS BIGINT)
           AS status,
         length(body) AS body_len,
         len(string_split(head, c)) - 1 AS n_headers,
         unnest(string_split(head, c)[2:]) AS line
  FROM parsed, crlf),
hs AS (
  SELECT doc_id, status, body_len, n_headers,
         lower(split_part(line, ': ', 1)) AS hname,
         substr(line, length(split_part(line, ': ', 1)) + 3) AS hval
  FROM lined),
agg AS (
  SELECT doc_id, status, body_len, n_headers,
         max(CASE WHEN hname = 'content-type' THEN hval END) AS ct,
         max(CASE WHEN hname = 'content-length'
                  THEN CAST(hval AS BIGINT) END) AS clen_declared
  FROM hs GROUP BY doc_id, status, body_len, n_headers)
SELECT doc_id, status,
       split_part(ct, ';', 1) AS mime,
       CASE WHEN contains(ct, 'charset=')
            THEN lower(split_part(ct, 'charset=', 2)) ELSE '' END AS charset,
       clen_declared,
       CAST(body_len AS BIGINT) AS body_len,
       CAST(clen_declared = body_len AS BIGINT) AS clen_ok,
       CAST(n_headers AS BIGINT) AS n_headers
FROM agg ORDER BY doc_id
"""


QUERIES = {
    "web_http_headers": (t_http_headers, _sql_http_headers()),
}
