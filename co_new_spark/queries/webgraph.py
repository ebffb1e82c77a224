"""Web link-graph analytics: the canonical Common-Crawl computations the
input contract implies but no previous entry exercised — hyperlink
extraction from raw ``html`` bytes, the host-level link graph, PageRank
over it, and anchor-text aggregation per target host.

Why it exists: the engine's input (BASELINE.json input_hint) is a table of
web pages with an ``html:binary`` column.  Every large-scale crawl pipeline
derives the *web graph* from exactly that column (CC's own hostgraph
release does); host PageRank is then the standard quality prior for
curation (OPIC/harmonic-centrality stand-ins), and anchor-text aggregation
is the standard external-description signal per target.  These entries make
the link-graph surface first-class rather than implied.

Graph construction is two native steps over the fact table — one regex
extraction (``regexp_extract_all``, JVM codegen, no Python) and one
explode+distinct — so the only fact-sized shuffle is the edge dedup, which
combines map-side.  Everything after runs on the HOST graph (orders of
magnitude smaller than pages; CC has ~90M hosts for ~3B pages), where the
iteration is the registry's shared integer-exact PageRank
(queries/geo_graph.pagerank_int — same micro-unit protocol, same unrolled
CTE oracle scheme, T fixed rounds in ONE lazy plan, no driver convergence
probes).  Skew note: real host graphs are power-law (wikipedia-like hubs
receive a large share of in-links); the fixture plants a 4-host hub set
receiving ~25% of links so the aggregation paths are exercised under skew.
The per-(v) contribution aggregate combines map-side, which is exactly the
mitigation that holds at 10^12 pages; a hot *edge-dedup* key would
additionally take the operators/salt two-phase form.

Fixture: the synthetic pages table carries no anchors (changing its html
would move the byte-identical-extraction contract), so these entries build
their own deterministic link corpus — native expressions only, 3 outlinks
per page embedded as ``<a href>`` tags — and materialize it via
queries/mat.py so the DuckDB oracle re-derives extraction, graph, and all
PageRank rounds from the very same parquet bytes.

Reference tie-in: the reference models importance surfaces over its grid
(density hotspots, /root/reference/README.md); host PageRank is the
web-payload twin of geo_cell_pagerank's cell-importance surface, sharing
its engine code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .geo_graph import _PR_ITERS, _PR_SCALE, _iter_cte, pagerank_int
from .mat import mat_glob, materialize
from .webtext_q import FIXTURE_PAGES, host_sql

_LP_N = 1500       # pages in the link corpus
_LP_HOSTS = 40     # distinct hosts (page -> host by id mod)
_LP_LINKS = 3      # outlinks embedded per page
_LP_HUBS = 4       # hot target hosts (pages 0..3): ~25% of links land here
_LP_VOCAB = ["inicio", "mapa", "informe", "datos", "contacto", "censo",
             "region", "portal", "archivo", "ayuda", "nota", "indice"]

# Java-regex ∩ RE2 common subset (functions/text.py grammar note); group 1 =
# href, group 2 = anchor text.
_LINK_PAT = '<a href="([^"]+)">([^<]+)</a>'


def _link_pages(spark: SparkSession) -> DataFrame:
    """Deterministic link corpus: (url, html) with 3 absolute-url anchors
    per page.  Pure JVM expressions (xxhash64 uniforms + format_string),
    same generator discipline as sources/pages.py."""
    df = spark.range(_LP_N)
    rid = F.col("id")
    host = F.format_string("hub%02d.example.net", F.pmod(rid, F.lit(_LP_HOSTS)))
    url = F.format_string("https://%s/doc%d", host, rid)
    vocab = F.array(*[F.lit(w) for w in _LP_VOCAB])
    anchors = []
    for k in range(_LP_LINKS):
        tgt = F.pmod(F.xxhash64(rid, F.lit(100 + k)), F.lit(_LP_N))
        hub = F.pmod(F.xxhash64(rid, F.lit(200 + k)), F.lit(_LP_HUBS))
        tgt = F.when(
            F.pmod(F.xxhash64(rid, F.lit(300 + k)), F.lit(100)) < 25, hub
        ).otherwise(tgt)
        thost = F.format_string("hub%02d.example.net",
                                F.pmod(tgt, F.lit(_LP_HOSTS)))
        turl = F.format_string("https://%s/doc%d", thost, tgt)
        word = F.element_at(
            vocab,
            (F.pmod(F.xxhash64(rid, F.lit(400 + k)), F.lit(len(_LP_VOCAB)))
             + 1).cast("int"))
        anchors.append(F.format_string('<a href="%s">%s</a>', turl, word))
    html = F.format_string(
        "<html><body><p>Documento %d.</p>\n<p>Enlaces: %s %s</p>\n<p>%s</p>"
        "</body></html>",
        rid, anchors[0], anchors[1], anchors[2])
    return df.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))


def _links(spark: SparkSession, sf: str) -> DataFrame:
    """(u=src_host, href, term, v=dst_host) — one row per anchor tag.

    The href/anchor extraction is ONE pass over html (two group-extracts of
    the same pattern, zipped positionally — both engines enumerate
    non-overlapping matches left-to-right, so position i of group 1 and
    group 2 belong to the same match)."""
    pg = materialize(_link_pages(spark), "linkpages", key=sf)
    h = F.decode(F.col("html"), "UTF-8")
    lk = pg.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("u"),
        F.explode(F.arrays_zip(
            F.regexp_extract_all(h, F.lit(_LINK_PAT), F.lit(1)).alias("href"),
            F.regexp_extract_all(h, F.lit(_LINK_PAT), F.lit(2)).alias("term"),
        )).alias("lk"))
    return lk.select(
        "u", F.col("lk.href").alias("href"), F.col("lk.term").alias("term"),
        F.parse_url(F.col("lk.href"), F.lit("HOST")).alias("v"))


def w_link_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Host-level PageRank over the hyperlink graph extracted from html.

    Nodes = endpoints of the deduped, self-loop-free host->host edge set;
    ranks per queries/geo_graph.pagerank_int (integer micro-units, T=3
    fixed rounds, bit-identical across engines/partitionings).  Output also
    carries each host's out-degree (0 for pure sinks)."""
    # The edge dedup is the ONE fact-sized shuffle — checkpoint it eagerly so
    # the pagerank job and the out-degree join both reuse the deduped edge
    # blocks instead of re-running extraction+dedup from parquet (ed is
    # host-graph-sized; blocks are freed by the ContextCleaner on release).
    ed = (_links(spark, sf).filter(F.col("u") != F.col("v"))
          .select("u", "v").distinct().localCheckpoint(eager=True))
    nodes = (ed.select(F.col("u").alias("cell"))
               .union(ed.select(F.col("v").alias("cell"))).distinct())
    ranks = pagerank_int(nodes, ed)
    deg = ed.groupBy("u").agg(F.count("*").alias("out_deg"))
    return (ranks.join(deg.withColumnRenamed("u", "cell"), "cell", "left")
            .select(F.col("cell").alias("host"),
                    F.coalesce(F.col("out_deg"), F.lit(0)).cast("long")
                     .alias("out_deg"),
                    "rank"))


def w_anchor_topterms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 anchor-text terms per TARGET host (the external-description
    signal: what the web calls a site).  Same-host links are excluded —
    like the pagerank entry's self-loops — because a site's own navigation
    boilerplate would otherwise dominate every host's top terms and defeat
    the external signal.  One fact-sized (v, term) count with map-side
    combine, then a per-host window over the tiny per-host term histogram —
    partitioned by v, so no global sort anywhere."""
    lk = _links(spark, sf).filter(F.col("u") != F.col("v"))
    counts = lk.groupBy("v", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("v").orderBy(F.col("n").desc(), F.col("term"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select(F.col("v").alias("host"), "term", "n", "rn"))


def w_fuzzy_url_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate URL pairs by PATH edit distance (<= 2) within a host —
    the fuzzy twin of web_url_canon (which only catches *rewritable*
    variants; typo/counter variants like /doc17 vs /doc217 need edit
    distance).

    Scale design: the join key is the HOST (the natural blocking key — URL
    near-dups across hosts are not the dedup target), so the quadratic term
    is bounded per host, and hosts are already bounded upstream by the
    host-quota curation stage (web_host_quota caps pages/host); a
    length-band filter (abs diff <= 2, a necessary condition for distance
    <= 2) prunes before the levenshtein evaluation, which runs with Spark's
    bounded-threshold form (early-exits the DP once the band is exceeded).
    For unbounded hosts the next refinement is PassJoin segment blocking
    (d+1 substring pigeonhole); not needed while the host cap holds.
    """
    urls = spark.read.parquet(FIXTURE_PAGES).select("url").distinct()
    p = urls.select(
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"))
    a, b = p.alias("a"), p.alias("b")
    pair = (a.join(b, (F.col("a.host") == F.col("b.host"))
                   & (F.col("a.url") < F.col("b.url"))
                   & (F.abs(F.length("a.path") - F.length("b.path")) <= 2))
            .withColumn("dist",
                        F.levenshtein(F.col("a.path"), F.col("b.path"), 2))
            .filter(F.col("dist") >= 0))
    return pair.select(F.col("a.host").alias("host"),
                       F.col("a.url").alias("url_a"),
                       F.col("b.url").alias("url_b"),
                       F.col("dist").cast("long").alias("dist"))


_LK_CTES = f"""pg AS (
  SELECT url, decode(html) AS h FROM read_parquet('{mat_glob("linkpages")}')
), lk AS (
  SELECT {host_sql("url")} AS u,
         unnest(regexp_extract_all(h, '{_LINK_PAT}', 1)) AS href,
         unnest(regexp_extract_all(h, '{_LINK_PAT}', 2)) AS term
  FROM pg
), lkv AS (
  SELECT u, href, term, {host_sql("href")} AS v FROM lk
)"""

SQL_LINK_PAGERANK = f"""
WITH {_LK_CTES}, ed AS (
  SELECT DISTINCT u, v FROM lkv WHERE u <> v
), nodes AS (
  SELECT u AS cell FROM ed UNION SELECT v FROM ed
), deg AS (
  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY u
), pr0 AS (
  SELECT cell, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes
), {', '.join(_iter_cte(k) for k in range(1, _PR_ITERS + 1))}
SELECT nd.cell AS host, coalesce(d.deg, 0) AS out_deg, p.rank
FROM nodes nd
JOIN pr{_PR_ITERS} p ON p.cell = nd.cell
LEFT JOIN deg d ON d.u = nd.cell
"""

SQL_ANCHOR_TOPTERMS = f"""
WITH {_LK_CTES}
SELECT v AS host, term, CAST(count(*) AS BIGINT) AS n,
       row_number() OVER (PARTITION BY v ORDER BY count(*) DESC, term) AS rn
FROM lkv
WHERE u <> v
GROUP BY v, term
QUALIFY rn <= 3
"""


def w_url_templates(spark: SparkSession, sf: str) -> DataFrame:
    """URL template mining (sitemap-structure discovery): generalize each
    path by collapsing digit runs to ``#`` and count urls per (host,
    template) — the crawl-analytics verb behind per-site sampling caps and
    crawler-trap detection (a template with millions of urls is a calendar
    or session-id trap, not content).

    The fixture's paths are uniform ``/pageN``, so a deterministic in-query
    enrichment (pure integer math on the page number, re-derived identically
    by the oracle — the web_redact_pii protocol) first diversifies them into
    four realistic shapes.  Scale: one projection + one map-side-combined
    (host, template) count; no joins, no windows."""
    urls = spark.read.parquet(FIXTURE_PAGES).select("url").distinct()
    pno = F.regexp_extract("url", "/page([0-9]+)$", 1).cast("long")
    e = urls.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        pno.alias("pno"))
    s = F.col("pno").cast("string")
    m = F.pmod(F.col("pno"), F.lit(4))
    path = (F.when(m == 0, F.concat(F.lit("/art/"), s, F.lit("/view")))
             .when(m == 1, F.concat(F.lit("/p"), s, F.lit(".html")))
             .when(m == 2, F.concat(F.lit("/cat"),
                                    F.pmod(F.col("pno"), F.lit(7))
                                     .cast("string"),
                                    F.lit("/item"), s))
             .otherwise(F.concat(F.lit("/page"), s)))
    return (e.select("host", F.regexp_replace(path, "[0-9]+", "#")
                     .alias("template"))
             .groupBy("host", "template")
             .agg(F.count("*").alias("n_urls")))


SQL_URL_TEMPLATES = f"""
WITH u AS (SELECT DISTINCT url FROM read_parquet('{FIXTURE_PAGES}')),
e AS (
  SELECT {host_sql("url")} AS host,
         CAST(regexp_extract(url, '/page([0-9]+)$', 1) AS BIGINT) AS pno
  FROM u
), p AS (
  SELECT host,
         CASE pno % 4
           WHEN 0 THEN '/art/' || pno || '/view'
           WHEN 1 THEN '/p' || pno || '.html'
           WHEN 2 THEN '/cat' || (pno % 7) || '/item' || pno
           ELSE '/page' || pno
         END AS path
  FROM e
)
SELECT host, regexp_replace(path, '[0-9]+', '#', 'g') AS template,
       CAST(count(*) AS BIGINT) AS n_urls
FROM p GROUP BY 1, 2
"""


_HITS_T = 2  # fixed mutual-recursion rounds (values stay small-integer)


def w_hits_scores(spark: SparkSession, sf: str) -> DataFrame:
    """HITS hubs & authorities over the host link graph — the OTHER classic
    link-analysis iteration, structurally distinct from PageRank: two
    MUTUALLY-recursive score families (authority = sum of pointing hubs,
    hub = sum of pointed-to authorities), alternating directions over the
    same edge set.

    Integer-exact without normalization: the textbook L2 renormalize is
    float and order-sensitive, so the T=2 unnormalized power rounds keep
    raw BIGINT sums — rankings are identical to the normalized variant
    (normalization is a positive scalar per round) and the values are
    bit-identical across engines and partitionings.  Each half-round is one
    equi-join + one map-side-combined sum on the HOST graph (the fact table
    was left behind at edge extraction, shared with web_link_pagerank via
    the linkpages materialization)."""
    ed = (_links(spark, sf).filter(F.col("u") != F.col("v"))
          .select("u", "v").distinct().localCheckpoint(eager=True))
    nodes = (ed.select(F.col("u").alias("host"))
               .union(ed.select(F.col("v").alias("host"))).distinct())
    hub = nodes.select("host", F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(_HITS_T):
        s = (ed.join(hub.withColumnRenamed("host", "u"), "u")
               .groupBy("v").agg(F.sum("h").alias("s")))
        auth = (nodes.join(s.withColumnRenamed("v", "host"), "host", "left")
                .select("host", F.coalesce("s", F.lit(0)).cast("long")
                        .alias("a")))
        t = (ed.join(auth.withColumnRenamed("host", "v"), "v")
               .groupBy("u").agg(F.sum("a").alias("t")))
        hub = (nodes.join(t.withColumnRenamed("u", "host"), "host", "left")
               .select("host", F.coalesce("t", F.lit(0)).cast("long")
                       .alias("h")))
    return (auth.join(hub, "host")
            .select("host", F.col("a").alias("auth"),
                    F.col("h").alias("hub")))


def _hits_cte(k: int) -> str:
    return f"""a{k} AS (
  SELECT n.host, CAST(coalesce(s.s, 0) AS BIGINT) AS a
  FROM hnodes n LEFT JOIN (
    SELECT e.v AS host, sum(h.h) AS s
    FROM h{k - 1} h JOIN ed e ON e.u = h.host GROUP BY e.v
  ) s ON s.host = n.host
), h{k} AS (
  SELECT n.host, CAST(coalesce(t.t, 0) AS BIGINT) AS h
  FROM hnodes n LEFT JOIN (
    SELECT e.u AS host, sum(a.a) AS t
    FROM a{k} a JOIN ed e ON e.v = a.host GROUP BY e.u
  ) t ON t.host = n.host
)"""


# Path grammar: everything after the authority, stopped at ? / # — the
# DuckDB restatement of parse_url(url, 'PATH') for the fixture's clean
# scheme://host/path URLs (no query/fragment present, so the stop set is
# belt-and-braces).
_PATH_SQL = ("regexp_extract(url, "
             "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)")

SQL_FUZZY_URL_PAIRS = f"""
WITH u AS (SELECT DISTINCT url FROM read_parquet('{FIXTURE_PAGES}')),
p AS (
  SELECT url, {host_sql("url")} AS host, {_PATH_SQL} AS path FROM u
)
SELECT a.host, a.url AS url_a, b.url AS url_b,
       CAST(levenshtein(a.path, b.path) AS BIGINT) AS dist
FROM p a JOIN p b
  ON a.host = b.host AND a.url < b.url
 AND abs(len(a.path) - len(b.path)) <= 2
WHERE levenshtein(a.path, b.path) <= 2
"""


SQL_HITS_SCORES = f"""
WITH {_LK_CTES}, ed AS (
  SELECT DISTINCT u, v FROM lkv WHERE u <> v
), hnodes AS (
  SELECT u AS host FROM ed UNION SELECT v FROM ed
), h0 AS (
  SELECT host, CAST(1 AS BIGINT) AS h FROM hnodes
), {', '.join(_hits_cte(k) for k in range(1, _HITS_T + 1))}
SELECT n.host, a.a AS auth, h.h AS hub
FROM hnodes n
JOIN a{_HITS_T} a ON a.host = n.host
JOIN h{_HITS_T} h ON h.host = n.host
"""


QUERIES = {
    "web_link_pagerank": (w_link_pagerank, SQL_LINK_PAGERANK),
    "web_anchor_topterms": (w_anchor_topterms, SQL_ANCHOR_TOPTERMS),
    "web_fuzzy_url_pairs": (w_fuzzy_url_pairs, SQL_FUZZY_URL_PAIRS),
    "web_hits_scores": (w_hits_scores, SQL_HITS_SCORES),
    "web_url_templates": (w_url_templates, SQL_URL_TEMPLATES),
}
