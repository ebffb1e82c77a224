"""Crawl-discovery surface: canonical-URL dedup clusters
(``web_canonical_dedup``) and sitemap frontier discovery
(``web_sitemap_frontier``).

Why they exist: the two standard *declared-metadata* signals a crawl
pipeline consumes beyond links are (a) ``<link rel="canonical">`` — the
site-declared duplicate-cluster key; canonical-URL grouping is the FIRST
dedup pass in production crawls because it is exact, cheap, and removes
the URL-parameter duplicates (?sess=..., ?utm=...) BEFORE any content
hashing (Google's own dedup pipeline consumes it; cf. the exact/near-dup
entries in queries/training*.py which handle what canonical tags miss) —
and (b) sitemaps (sitemaps.org protocol): the site-declared URL inventory,
whose anti-join against the crawled set yields the *discovery frontier*
(listed-but-never-fetched urls) that seeds the next crawl cycle.

Fixture: a deterministic 2k-page corpus over 20 hosts (native expressions
only — xxhash64 uniforms + format_string, the webgraph._link_pages
discipline).  Page ids group into canonical clusters of up to 3 same-host
slots; ~3/4 of pages declare the cluster head (param-free) as canonical,
the rest self-represent.  Each host additionally publishes one sitemap XML
doc listing its param-free urls plus a per-host-varying tail of ids beyond
the crawled range (the planted frontier).  Both frames are materialized
via queries/mat.py so the DuckDB oracle re-derives extraction, clustering,
and the frontier join from the very same parquet bytes.

Scale design:
* Canonical dedup is ONE regexp projection over html (JVM codegen, no
  Python) + ONE map-side-combined groupBy(canonical_url) — no joins, no
  windows.  A canonical target claimed by millions of aliases (the hot-key
  case) still combines map-side; min(url)/count are associative.
* The frontier is a url-keyed LEFT equi-join of the sitemap's exploded
  ``<loc>`` list against the distinct param-stripped crawled set, then one
  map-side-combined per-host count.  No broadcast hint: BOTH sides are
  corpus-proportional (README rule #2) — AQE sizes the exchange.
* At 10^12 pages the only fact-sized shuffles are the two groupBys and the
  join's two exchanges, all key-local; nothing collects to the driver.

Reference tie-in: canonical clustering is the URL-space twin of the
reference's cell-parent rollup (many child codes -> one canonical parent,
/root/reference/README.md:49); the sitemap frontier mirrors its
grid-coverage completeness asserts (declared inventory vs materialized
cells, src/assert/gridLib.sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mat import mat_glob, materialize

_CW_N = 2000        # crawled pages
_CW_HOSTS = 20      # distinct hosts; page id = slot * HOSTS + host
_CW_GROUP = 3       # canonical cluster span (consecutive same-host slots)
_CW_PARAMS = 7      # ?sess= values (the duplicate-generating params)
_SM_BASE = _CW_N // _CW_HOSTS   # crawled slots per host
_SM_EXTRA_MOD = 15  # per-host frontier tail size = xxhash64(host) % this

# Java-regex ∩ RE2 common subset (functions/text.py grammar note)
_CANON_PAT = '<link rel="canonical" href="([^"]+)"'
_LOC_PAT = "<loc>([^<]+)</loc>"


def _crawl_pages(spark: SparkSession) -> DataFrame:
    """(url, html): session-parameterized urls; ~3/4 of pages declare the
    param-free cluster head as canonical."""
    df = spark.range(_CW_N)
    rid = F.col("id")
    h = F.pmod(rid, F.lit(_CW_HOSTS))
    slot = F.expr(f"id div {_CW_HOSTS}")
    host = F.format_string("site%02d.example.org", h)
    url = F.format_string(
        "https://%s/p%d?sess=%d", host, rid,
        F.pmod(F.xxhash64(rid, F.lit(7)), F.lit(_CW_PARAMS)))
    head_id = (slot - F.pmod(slot, F.lit(_CW_GROUP))) * _CW_HOSTS + h
    canon = F.format_string("https://%s/p%d", host, head_id)
    tag = F.when(
        F.pmod(F.xxhash64(rid, F.lit(11)), F.lit(4)) > 0,
        F.format_string('<link rel="canonical" href="%s">', canon)
    ).otherwise(F.lit(""))
    html = F.format_string(
        "<html><head>%s</head><body><p>Pagina %d del sitio %s.</p></body>"
        "</html>", tag, rid, host)
    return df.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))


def _sitemaps(spark: SparkSession) -> DataFrame:
    """(host, xml): one sitemap per host listing every crawled slot's
    param-free url plus a per-host tail of never-crawled ids."""
    df = spark.range(_CW_HOSTS)
    h = F.col("id")
    host = F.format_string("site%02d.example.org", h)
    n_slots = F.lit(_SM_BASE) + F.pmod(F.xxhash64(h, F.lit(3)),
                                       F.lit(_SM_EXTRA_MOD))
    entries = F.transform(
        F.sequence(F.lit(0), (n_slots - 1).cast("int")),
        lambda k: F.format_string("<url><loc>https://%s/p%d</loc></url>",
                                  host, k.cast("long") * _CW_HOSTS + h))
    xml = F.concat(F.lit("<urlset>"), F.concat_ws("", entries),
                   F.lit("</urlset>"))
    return df.select(host.alias("host"), F.encode(xml, "UTF-8").alias("xml"))


def w_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-URL dedup clusters: (canonical_url, cluster_size, rep_url,
    n_aliases) — rep_url is the lexicographic min crawled member, n_aliases
    counts members whose crawled url differs from the declared canonical."""
    pg = materialize(_crawl_pages(spark), "crawlpages", key=sf)
    canon = F.regexp_extract(F.decode(F.col("html"), "UTF-8"),
                             _CANON_PAT, 1)
    tgt = F.coalesce(F.nullif(canon, F.lit("")), F.col("url"))
    return (pg.select(tgt.alias("canonical_url"), "url")
            .groupBy("canonical_url")
            .agg(F.count("*").alias("cluster_size"),
                 F.min("url").alias("rep_url"),
                 F.sum((F.col("url") != F.col("canonical_url")).cast("long"))
                  .alias("n_aliases"))
            .orderBy("canonical_url"))


SQL_CANONICAL_DEDUP = f"""
WITH pg AS (
  SELECT url, decode(html) AS h FROM read_parquet('{mat_glob("crawlpages")}')
), c AS (
  SELECT url,
         coalesce(nullif(regexp_extract(h, '{_CANON_PAT}', 1), ''), url)
           AS canonical_url
  FROM pg
)
SELECT canonical_url, CAST(count(*) AS BIGINT) AS cluster_size,
       min(url) AS rep_url,
       CAST(sum(CASE WHEN url <> canonical_url THEN 1 ELSE 0 END) AS BIGINT)
         AS n_aliases
FROM c GROUP BY 1 ORDER BY 1
"""


def w_sitemap_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host sitemap coverage: urls listed, listed-and-crawled, and the
    discovery frontier (listed, never fetched)."""
    pg = materialize(_crawl_pages(spark), "crawlpages", key=sf)
    sm = materialize(_sitemaps(spark), "sitemaps", key=sf)
    locs = (sm.select(
        "host",
        F.explode(F.regexp_extract_all(F.decode(F.col("xml"), "UTF-8"),
                                       F.lit(_LOC_PAT), F.lit(1)))
         .alias("loc")).distinct())
    crawled = (pg.select(F.regexp_replace("url", r"\?.*$", "").alias("curl"))
               .distinct())
    j = locs.join(crawled, locs["loc"] == crawled["curl"], "left")
    return (j.groupBy("host")
            .agg(F.count("*").alias("n_listed"),
                 F.sum(F.col("curl").isNotNull().cast("long"))
                  .alias("n_crawled"),
                 F.sum(F.col("curl").isNull().cast("long"))
                  .alias("n_frontier"))
            .orderBy("host"))


SQL_SITEMAP_FRONTIER = f"""
WITH sm AS (
  SELECT host, decode(xml) AS x FROM read_parquet('{mat_glob("sitemaps")}')
), locs AS (
  SELECT DISTINCT host, unnest(regexp_extract_all(x, '{_LOC_PAT}', 1)) AS loc
  FROM sm
), crawled AS (
  SELECT DISTINCT regexp_replace(url, '\\?.*$', '') AS curl
  FROM read_parquet('{mat_glob("crawlpages")}')
)
SELECT host, CAST(count(*) AS BIGINT) AS n_listed,
       CAST(sum(CASE WHEN c.curl IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crawled,
       CAST(sum(CASE WHEN c.curl IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_frontier
FROM locs LEFT JOIN crawled c ON c.curl = locs.loc
GROUP BY host ORDER BY host
"""


QUERIES = {
    "web_canonical_dedup": (w_canonical_dedup, SQL_CANONICAL_DEDUP),
    "web_sitemap_frontier": (w_sitemap_frontier, SQL_SITEMAP_FRONTIER),
}
