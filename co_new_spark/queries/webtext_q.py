"""Web-text pipeline surface over the COMMITTED pages fixture
(tests/fixtures/pages2k.parquet, tools/make_fixtures.py): because the oracle
can read the very same parquet bytes, the Common-Crawl-shaped operators —
html extraction, URL canonicalization, coordinate-precision scrubbing, the
geoparse grammar itself — get full driver hash checks instead of rows-only.

Every regex here stays in the Java-regex ∩ RE2 common subset (see
functions/text.py's single-source grammar note); replacements are written
per-dialect ($1 vs \\1) against the same pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tx

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE_PAGES = os.path.join(_REPO, "tests", "fixtures", "pages2k.parquet")


def _fixture(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(FIXTURE_PAGES)


# ---------------------------------------------------------------------------
# A28 html -> text extraction, oracle-checked byte identity per url
# ---------------------------------------------------------------------------


def w_extract_parity(spark: SparkSession, sf: str) -> DataFrame:
    pg = _fixture(spark)
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    latest = pg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    ext = latest.withColumn("extracted", tx.extract_text(F.col("html")))
    return ext.groupBy("lang").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.when(F.col("extracted") == F.col("text"), 1).otherwise(0))
        .cast("long").alias("n_bytes_identical"),
    )


def _sql_extract_expr(src: str) -> str:
    """The FULL pinned extraction spec (functions/text.extract_text) as one
    DuckDB expression, entity list generated from the same _ENTITIES table —
    so a regression in ANY spec stage (script/style strip, tag strip, every
    entity, ws collapse) diverges from the oracle, not only the stages the
    fixture happens to exercise.  RE2 has no backreferences, so the one
    script|style alternation becomes two sequential passes (equivalent for
    non-cross-nested blocks)."""
    e = (f"regexp_replace(regexp_replace({src},"
         f" '(?is)<script\\b.*?</script\\s*>', ' ', 'g'),"
         f" '(?is)<style\\b.*?</style\\s*>', ' ', 'g')")
    e = f"regexp_replace({e}, '<[^>]*>', '', 'g')"
    for ent, ch in tx._ENTITIES:  # noqa: SLF001
        e = f"replace({e}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"


SQL_EXTRACT_PARITY = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN extracted = text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bytes_identical
FROM (
  SELECT lang, text,
         {_sql_extract_expr('decode(html)')} AS extracted,
         row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
  FROM read_parquet('{FIXTURE_PAGES}')
) WHERE rn = 1 GROUP BY lang
"""

# ---------------------------------------------------------------------------
# URL canonicalization: messy variant -> canon must round-trip to the original
# ---------------------------------------------------------------------------

_TRACK_Q = "?utm_source=feed&utm_medium=rss&utm_campaign=x"
_FRAG = "#sec-2"


def _messy(url):
    """Deterministic messy variant: md5 hex digits gate (a) tracking params,
    (b) a fragment, (c) an uppercased scheme+host — same construction in the
    oracle, so canon(messy) == url is an end-to-end checked invariant."""
    h = F.md5(url)
    pre = F.regexp_extract(url, "^[A-Za-z]+://[^/]*", 0)
    rest = url.substr(F.length(pre) + 1, F.length(url))
    u = F.when(F.substring(h, 3, 1) < "8", F.concat(F.upper(pre), rest)) \
         .otherwise(url)
    u = F.when(F.substring(h, 1, 1) < "8", F.concat(u, F.lit(_TRACK_Q))).otherwise(u)
    u = F.when(F.substring(h, 2, 1) < "8", F.concat(u, F.lit(_FRAG))).otherwise(u)
    return u


def canonicalize_url(u):
    """Strip fragment, drop utm_* params (keep the rest, order preserved),
    lowercase scheme+host, drop a bare trailing '?'."""
    u = F.regexp_replace(u, "#.*", "")
    base = F.regexp_replace(u, r"\?.*", "")
    q = F.regexp_extract(u, r"\?(.*)", 1)
    kept = F.array_join(
        F.filter(F.split(q, "&"), lambda p: ~p.startswith("utm_")), "&")
    pre = F.regexp_extract(base, "^[A-Za-z]+://[^/]*", 0)
    rest = base.substr(F.length(pre) + 1, F.length(base))
    canon_base = F.concat(F.lower(pre), rest)
    return F.when(kept == "", canon_base) \
            .otherwise(F.concat(canon_base, F.lit("?"), kept))


def w_url_canon(spark: SparkSession, sf: str) -> DataFrame:
    pg = _fixture(spark).select("url")
    out = pg.withColumn("messy", _messy(F.col("url"))) \
            .withColumn("canon", canonicalize_url(F.col("messy")))
    host = F.regexp_extract("url", "^https?://([^/]*)", 1)
    return out.groupBy(host.alias("host")).agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("canon") == F.col("url"), 1).otherwise(0))
        .cast("long").alias("n_roundtrip_ok"),
        F.sum(F.when(F.col("messy") != F.col("url"), 1).otherwise(0))
        .cast("long").alias("n_mutated"),
    )


SQL_URL_CANON = f"""
WITH pg AS (
  SELECT url, md5(url) AS h,
         regexp_extract(url, '^[A-Za-z]+://[^/]*', 0) AS pre
  FROM read_parquet('{FIXTURE_PAGES}')
), messy AS (
  SELECT url,
    (CASE WHEN substring(h, 3, 1) < '8'
          THEN upper(pre) || substring(url, length(pre) + 1) ELSE url END)
    || (CASE WHEN substring(h, 1, 1) < '8' THEN '{_TRACK_Q}' ELSE '' END)
    || (CASE WHEN substring(h, 2, 1) < '8' THEN '{_FRAG}' ELSE '' END) AS m
  FROM pg
), canon AS (
  SELECT url, m,
         regexp_extract(nf, '^[A-Za-z]+://[^/]*', 0) AS cpre,
         regexp_replace(nf, '\\?.*', '') AS base,
         array_to_string(list_filter(string_split(regexp_extract(nf, '\\?(.*)', 1), '&'),
                                     p -> NOT starts_with(p, 'utm_')), '&') AS kept
  FROM (SELECT url, m, regexp_replace(m, '#.*', '') AS nf FROM messy)
)
SELECT regexp_extract(url, '^https?://([^/]*)', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN lower(cpre) || substring(base, length(cpre) + 1)
                          || (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END)
                     = url THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
       CAST(sum(CASE WHEN m <> url THEN 1 ELSE 0 END) AS BIGINT) AS n_mutated
FROM canon GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Coordinate-precision scrub (location privacy: truncate to ~1 km)
# ---------------------------------------------------------------------------

_COORD_PAT = r"(-?[0-9]{1,3}\.[0-9]{2})[0-9]+"


def w_coord_scrub(spark: SparkSession, sf: str) -> DataFrame:
    pg = _fixture(spark)
    scrubbed = F.regexp_replace(F.col("text"), _COORD_PAT, "$1")
    return (pg.select(
                "lang", "text", scrubbed.alias("scrub"),
                F.regexp_count(F.col("text"), F.lit(_COORD_PAT)).alias("nc"))
              .groupBy("lang").agg(
                  F.count("*").alias("n_docs"),
                  F.sum(F.when(F.col("scrub") != F.col("text"), 1).otherwise(0))
                  .cast("long").alias("n_scrubbed_docs"),
                  F.sum("nc").cast("long").alias("n_coords"),
                  F.sum(F.length("text") - F.length("scrub"))
                  .cast("long").alias("chars_removed")))


SQL_COORD_SCRUB = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN scrub <> text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_scrubbed_docs,
       CAST(sum(len(regexp_extract_all(text, '{_COORD_PAT}'))) AS BIGINT)
         AS n_coords,
       CAST(sum(length(text) - length(scrub)) AS BIGINT) AS chars_removed
FROM (
  SELECT lang, text,
         regexp_replace(text, '{_COORD_PAT}', '\\1', 'g') AS scrub
  FROM read_parquet('{FIXTURE_PAGES}')
) GROUP BY lang
"""

# ---------------------------------------------------------------------------
# Geoparse grammar parity (A27): row-level lat/lon via the single-source regex
# ---------------------------------------------------------------------------


def w_geoparse(spark: SparkSession, sf: str) -> DataFrame:
    pg = _fixture(spark)
    return pg.select("url",
                     tx.parse_lat(F.col("text")).alias("lat"),
                     tx.parse_lon(F.col("text")).alias("lon"))


SQL_GEOPARSE = f"""
SELECT url,
       coalesce(CAST(nullif(regexp_extract(text, '{tx.GEO_URI_RE}', 1), '') AS DOUBLE),
                CAST(nullif(regexp_extract(text, '{tx.PLAIN_PAIR_RE}', 1), '') AS DOUBLE))
         AS lat,
       coalesce(CAST(nullif(regexp_extract(text, '{tx.GEO_URI_RE}', 2), '') AS DOUBLE),
                CAST(nullif(regexp_extract(text, '{tx.PLAIN_PAIR_RE}', 2), '') AS DOUBLE))
         AS lon
FROM read_parquet('{FIXTURE_PAGES}')
"""


def w_host_stats(spark: SparkSession, sf: str) -> DataFrame:
    """B19's parse_url surface: per-host crawl stats (pages, distinct paths,
    language mix) — host extraction via the native ``parse_url`` expression;
    the oracle restates it as the authority regex, exact on the fixture's
    scheme://host/path URLs (no userinfo/port).  Schemeless/malformed URLs
    are NULL-host in Spark but ''-match in DuckDB's regexp_extract, so the
    oracle wraps the extract in nullif(..., '') to align the two."""
    pg = _fixture(spark)
    return (pg.withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
              .groupBy("host")
              .agg(F.count("*").alias("n_pages"),
                   F.countDistinct("url").alias("n_urls"),
                   F.countDistinct("lang").alias("n_langs"),
                   F.min("url").alias("first_url")))


SQL_HOST_STATS = f"""
SELECT nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '') AS host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       min(url) AS first_url
FROM read_parquet('{FIXTURE_PAGES}')
GROUP BY 1
"""


QUERIES = {
    "web_extract_parity": (w_extract_parity, SQL_EXTRACT_PARITY),
    "web_host_stats": (w_host_stats, SQL_HOST_STATS),
    "web_url_canon": (w_url_canon, SQL_URL_CANON),
    "web_coord_scrub": (w_coord_scrub, SQL_COORD_SCRUB),
    "web_geoparse": (w_geoparse, SQL_GEOPARSE),
}
