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
from .webtext_q import host_sql

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


# ---------------------------------------------------------------------------
# Pay-level-domain (registrable domain) extraction — Mozilla Public Suffix
# List semantics: the PLD is one label plus the LONGEST matching public
# suffix ("example.com.co" under suffixes {co, com.co} registers at
# "example.com.co", not "com.co").  Crawl pipelines quota, dedup, and rank
# by PLD rather than host because subdomains are free to mint (host-level
# caps are gameable; PLD-level are not — the reason CC's own stats group by
# registered domain).
#
# Scale design: candidate suffixes (the last 1..K labels of each host,
# K=3, REQUIRING at least one extra label for the registrable part) are
# generated IN-ROW by array slicing — a bounded <= K-row explode per
# distinct host, not a string self-join — then equi-joined against the
# suffix dim with an EXPLICIT broadcast (a FIXED, corpus-independent dim:
# README rule #2's broadcast case), and the longest match is a map-side-
# combined max-struct argmax, no window.  Hosts matching no suffix fall
# back to their last label (the PSL "*" default rule).  The per-PLD rollup
# combines map-side; a mega-PLD (blogspot-style) is one hot key in ONE
# groupBy — the operators/salt two-phase form applies if it ever outgrows
# a reducer.
#
# The suffix dim is a small embedded excerpt (Colombian-flavored: the .co
# second-level registrations are exactly the multi-label case that makes
# naive "last two labels" wrong); a production run swaps in the full PSL —
# same plan, the dim stays broadcast-sized (~9k rules).
# ---------------------------------------------------------------------------

_PSL = ["com", "org", "net", "co", "com.co", "gov.co", "edu.co", "org.co",
        "uk", "co.uk", "org.uk"]
# corpus TLD pool = PSL + one UNKNOWN TLD so the "*" default-rule fallback
# (suffix = last label, PLD = last two) is exercised and pytest-pinned
_PLD_TLDS = _PSL + ["de"]
_PLD_K = 3          # max suffix labels considered
_PLD_N = 600        # corpus urls
_PLD_DOMS = 40      # distinct second-level names
_PLD_SUBS = ["", "www.", "m.", "blog.", "portal.archivo."]


def _pld_pages(spark: SparkSession) -> DataFrame:
    """(url): hosts spanning every suffix family, with 0-2 subdomain
    labels, so longest-match beats both "last label" and "last two
    labels" somewhere in the corpus."""
    df = spark.range(_PLD_N)
    rid = F.col("id")
    suf = F.element_at(
        F.array(*[F.lit(s) for s in _PLD_TLDS]),
        (F.pmod(F.xxhash64(rid, F.lit(21)), F.lit(len(_PLD_TLDS))) + 1)
        .cast("int"))
    dom = F.format_string("dom%02d",
                          F.pmod(F.xxhash64(rid, F.lit(22)), F.lit(_PLD_DOMS)))
    sub = F.element_at(
        F.array(*[F.lit(s) for s in _PLD_SUBS]),
        (F.pmod(F.xxhash64(rid, F.lit(23)), F.lit(len(_PLD_SUBS))) + 1)
        .cast("int"))
    url = F.format_string("https://%s%s.%s/p%d", sub, dom, suf, rid)
    return df.select(url.alias("url"))


def w_domain_pld(spark: SparkSession, sf: str) -> DataFrame:
    """Per-PLD rollup: (pld, public_suffix, n_urls, n_hosts)."""
    pg = materialize(_pld_pages(spark), "pldpages", key=sf)
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # candidate (k, suffix) pairs, k suffix labels, needing n > k
    cands = F.filter(
        F.array(*[
            F.when(n > k, F.struct(
                F.lit(k).alias("k"),
                F.concat_ws(".", F.slice(labels, n - k + 1, k))
                 .alias("suffix"),
                F.element_at(labels, n - k).alias("reg")))
            for k in range(1, _PLD_K + 1)]),
        lambda s: s.isNotNull())
    ex = (pg.select(host.alias("host"), F.explode(cands).alias("c"))
          .select("host", "c.k", "c.suffix", "c.reg"))
    dim = spark.createDataFrame([(s,) for s in _PSL], "suffix string")
    hit = (ex.join(F.broadcast(dim), "suffix")
           .groupBy("host")
           .agg(F.max(F.struct("k", "suffix", "reg")).alias("m"))
           .select("host", F.col("m.suffix").alias("public_suffix"),
                   F.concat_ws(".", F.col("m.reg"), F.col("m.suffix"))
                    .alias("pld")))
    hosts = pg.select(host.alias("host"), "url")
    hl = F.split(F.col("host"), r"\.")
    lab1 = F.element_at(hl, -1)
    # PSL "*" default rule: an unknown TLD is itself a public suffix, so
    # the fallback PLD is the last TWO labels (bare-TLD hosts degenerate
    # to the host itself)
    fb_pld = F.when(F.size(hl) >= 2,
                    F.concat_ws(".", F.element_at(hl, -2),
                                F.element_at(hl, -1))).otherwise(F.col("host"))
    j = (hosts.join(hit, "host", "left")
         .select("url", "host",
                 F.coalesce("public_suffix", lab1).alias("public_suffix"),
                 F.coalesce("pld", fb_pld).alias("pld")))
    return (j.groupBy("pld", "public_suffix")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct("host").alias("n_hosts"))
            .orderBy("pld"))


SQL_DOMAIN_PLD = f"""
WITH pg AS (
  SELECT url, {host_sql('url')} AS host
  FROM read_parquet('{mat_glob("pldpages")}')
), lab AS (
  SELECT url, host, string_split(host, '.') AS ls,
         len(string_split(host, '.')) AS n
  FROM pg
), cand AS (
  SELECT url, host, k.k AS k,
         array_to_string(ls[n - k.k + 1 : n], '.') AS suffix,
         ls[n - k.k] AS reg
  FROM lab CROSS JOIN (SELECT unnest(range(1, {_PLD_K + 1})) AS k) k
  WHERE n > k.k
), hit AS (
  SELECT host, suffix AS public_suffix, reg || '.' || suffix AS pld,
         row_number() OVER (PARTITION BY host ORDER BY k DESC) AS rn
  FROM cand
  WHERE suffix IN ({', '.join("'" + s + "'" for s in _PSL)})
), best AS (
  SELECT host, public_suffix, pld FROM hit WHERE rn = 1
), j AS (
  SELECT lab.url, lab.host,
         coalesce(b.public_suffix, ls[n]) AS public_suffix,
         coalesce(b.pld, CASE WHEN n >= 2 THEN ls[n - 1] || '.' || ls[n]
                              ELSE lab.host END) AS pld
  FROM lab LEFT JOIN best b ON b.host = lab.host
)
SELECT pld, public_suffix, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM j GROUP BY 1, 2 ORDER BY pld
"""


QUERIES = {
    "web_canonical_dedup": (w_canonical_dedup, SQL_CANONICAL_DEDUP),
    "web_sitemap_frontier": (w_sitemap_frontier, SQL_SITEMAP_FRONTIER),
    "web_domain_pld": (w_domain_pld, SQL_DOMAIN_PLD),
}
