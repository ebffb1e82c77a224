"""Crawl-operations surface over the committed pages fixture: recrawl
snapshot diffing (``web_recrawl_diff``) and politeness-scheduled frontier
assignment (``web_crawl_schedule``).

Why they exist: the input contract (BASELINE.json input_hint) is a
Common-Crawl-style table keyed by (url, warc_ts) — i.e. a *snapshot
history*, not a set — and the two crawl-side questions every pipeline asks
of that history are (a) which urls changed between fetches (recrawl
scheduling, freshness-weighted sampling; the per-url invariant "extracted
text is byte-identical per url" is exactly the unchanged case) and (b) in
what order and on which worker to fetch a host's urls without violating
per-host politeness (the frontier problem; Mercator-style per-host FIFO
queues with a fixed inter-request delay).

Scale design:
* Recrawl diff is pure aggregation — one groupBy(url) whose measures
  (count, count-distinct content hash, min/max ts) ALL combine map-side;
  no window, no join, one shuffle at url granularity.  Change detection is
  ``n_versions > 1`` on the md5 of the extracted text (both engines hash
  the same committed bytes), not a lag() comparison — same answer, and the
  agg form keeps hot urls (ones recrawled thousands of times) inside a
  single combiner instead of a window partition sort.
* The frontier schedule is one window PARTITIONED by host (registry rule:
  no unpartitioned windows) ranking by (md5(url), url) — deterministic,
  RNG-free, partitioning-invariant.  Slot -> fetch offset is a projection;
  the worker assignment is a pure hash of the host so every url of a host
  lands on the same worker (politeness is per-host state, so the host MUST
  be the sharding key — Mercator's front/back-queue invariant).  A host
  hotter than a reducer takes the operators/salt two-phase form; the
  politeness delay makes such hosts wall-clock-bound anyway (a 10^6-url
  host at 5 s/fetch is 58 days of crawl — the schedule, not the window,
  is the bottleneck by construction).

Reference tie-in: the reference's grid fabric answers "what changed"
by cell-version comparison (README.md:23's 1-D reduction philosophy);
these entries apply the same integer-exact aggregate protocol to the
crawl-history key instead of the cell key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as tx
from .webtext_q import FIXTURE_PAGES, _fixture, host_sql

_POLITE_S = 5   # fixed per-host inter-request delay (seconds)
_N_WORKERS = 8  # crawler shards; host -> worker is a pure hash


def recrawl_diff(pg: DataFrame) -> DataFrame:
    """The recrawl-diff aggregation over any pages-shaped frame (url,
    warc_ts, text): snapshot count, distinct content versions (md5 of
    extracted text), first/last fetch timestamps and the span between
    them, plus the unchanged flag (n_versions == 1 — the input contract's
    byte-identical-per-url case).  Pure map-side-combinable aggregation;
    see module docstring.  Split from the registry entry so tests can
    plant a *changed* url (the fixture, honoring the contract, has none)."""
    return (pg.groupBy("url")
            .agg(F.count("*").alias("n_snaps"),
                 F.countDistinct(F.md5(F.col("text"))).alias("n_versions"),
                 F.min("warc_ts").alias("first_ts"),
                 F.max("warc_ts").alias("last_ts"))
            .filter(F.col("n_snaps") >= 2)
            .select("url", "n_snaps", "n_versions", "first_ts", "last_ts",
                    (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts"))
                    .cast("long").alias("span_s"),
                    (F.col("n_versions") == 1).alias("unchanged")))


def w_recrawl_diff(spark: SparkSession, sf: str) -> DataFrame:
    return recrawl_diff(_fixture(spark))


SQL_RECRAWL_DIFF = f"""
SELECT url, n_snaps, n_versions, first_ts, last_ts,
       CAST(epoch(last_ts) - epoch(first_ts) AS BIGINT) AS span_s,
       (n_versions = 1) AS unchanged
FROM (
  SELECT url, CAST(count(*) AS BIGINT) AS n_snaps,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_versions,
         min(warc_ts) AS first_ts, max(warc_ts) AS last_ts
  FROM read_parquet('{FIXTURE_PAGES}')
  GROUP BY url
) WHERE n_snaps >= 2
"""


def w_crawl_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """Politeness-scheduled crawl frontier: each distinct url gets a
    per-host FIFO slot (rank by (md5(url), url) — deterministic, RNG-free),
    a fetch offset of slot * {_POLITE_S} s, and a worker shard that is a
    pure hash of the HOST (all urls of a host share a worker — per-host
    politeness state must not be split across shards)."""
    urls = _fixture(spark).select("url").distinct()
    hosted = urls.withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
    w = Window.partitionBy("host").orderBy(F.md5(F.col("url")), F.col("url"))
    return (hosted
            .withColumn("slot", (F.row_number().over(w) - 1).cast("long"))
            .select(
                "host", "url", "slot",
                (F.col("slot") * _POLITE_S).cast("long").alias("fetch_offset_s"),
                F.pmod(F.ascii(F.substring(F.md5(F.col("host")), 1, 1)),
                       F.lit(_N_WORKERS)).cast("long").alias("worker")))


SQL_CRAWL_SCHEDULE = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{FIXTURE_PAGES}')
), h AS (
  SELECT url, {host_sql("url")} AS host FROM u
)
SELECT host, url,
       CAST(row_number() OVER (
         PARTITION BY host ORDER BY md5(url), url) - 1 AS BIGINT) AS slot,
       CAST((row_number() OVER (
         PARTITION BY host ORDER BY md5(url), url) - 1) * {_POLITE_S}
         AS BIGINT) AS fetch_offset_s,
       CAST(ascii(substr(md5(host), 1, 1)) % {_N_WORKERS} AS BIGINT) AS worker
FROM h
"""


# ---------------------------------------------------------------------------
# Trending-term burst detection (Kleinberg-style burst RATIO against the
# uniform-over-weeks expectation — the monitoring query every crawl pipeline
# runs over its (warc_ts, text) history).  Scale design: the (term, week)
# count combines map-side; the per-term marginal is a re-aggregate of those
# partials and joins back by TERM-KEYED equi-join (at web scale the term
# marginal table is vocabulary-sized — NOT broadcastable — and both sides
# arrive already hashed on term, so AQE plans it without a new fact
# shuffle); the distinct-week total is a 1-row broadcast.  Top-K is
# orderBy().limit() (TakeOrderedAndProject).  Float discipline: burst =
# (c_tw * n_weeks) / c_t from integer counts, identical double expression
# both engines, rounded to 6 dp, ordering on the emitted rounded value
# with (term, week) tie-breaks.
# ---------------------------------------------------------------------------

_TREND_MINCT = 40  # a term must be corpus-established before it can "burst"
_TREND_TOPK = 30


def w_trending_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-``_TREND_TOPK`` (term, week) cells by burst ratio — the factor by
    which a term's weekly count exceeds its uniform-over-weeks expectation."""
    pg = _fixture(spark)
    # cast to DATE: Spark's date_trunc returns TIMESTAMP, DuckDB's returns
    # DATE — the driver compare stringifies them differently
    tw = pg.select(F.date_trunc("week", F.col("warc_ts")).cast("date")
                   .alias("week"),
                   F.explode(tx.word_tokens(F.col("text"))).alias("term"))
    ctw = tw.groupBy("term", "week").agg(F.count("*").alias("c_tw"))
    ct = ctw.groupBy("term").agg(F.sum("c_tw").alias("c_t"))
    wk = pg.agg(F.countDistinct(F.date_trunc("week", F.col("warc_ts")))
                .alias("n_weeks"))
    return (ctw.join(ct, "term").crossJoin(F.broadcast(wk))
            .filter(F.col("c_t") >= _TREND_MINCT)
            .withColumn("burst", F.round(
                (F.col("c_tw").cast("double") * F.col("n_weeks"))
                / F.col("c_t"), 6))
            .select("term", "week", "c_tw", "c_t", "burst")
            .orderBy(F.col("burst").desc(), "term", "week")
            .limit(_TREND_TOPK))


_TOKS_SQL = ("list_filter(regexp_split_to_array(lower(text),"
             " '[^\\p{L}\\p{N}]+'), x -> x <> '')")

SQL_TRENDING_TERMS = f"""
WITH tw AS (
  SELECT CAST(date_trunc('week', warc_ts) AS DATE) AS week,
         unnest({_TOKS_SQL}) AS term
  FROM read_parquet('{FIXTURE_PAGES}')
), ctw AS (
  SELECT term, week, CAST(count(*) AS BIGINT) AS c_tw
  FROM tw GROUP BY term, week
), ct AS (
  SELECT term, CAST(sum(c_tw) AS BIGINT) AS c_t FROM ctw GROUP BY term
), wk AS (
  SELECT CAST(count(DISTINCT date_trunc('week', warc_ts)) AS BIGINT)
    AS n_weeks
  FROM read_parquet('{FIXTURE_PAGES}')
)
SELECT term, week, c_tw, c_t,
       round((CAST(c_tw AS DOUBLE) * n_weeks) / c_t, 6) AS burst
FROM ctw JOIN ct USING (term) CROSS JOIN wk
WHERE c_t >= {_TREND_MINCT}
ORDER BY burst DESC, term, week LIMIT {_TREND_TOPK}
"""


# ---------------------------------------------------------------------------
# Robots-style URL filtering: RFC 9309's longest-prefix-match rule —
# the most specific (longest) matching path prefix decides allow/deny.
# The rule table is synthesized deterministically IN-QUERY from the host
# set (the web_redact_pii protocol: the fixture carries no robots data, so
# the oracle re-derives the same rules AND the same match independently —
# a regression in either the synthesis or the matcher breaks the hash).
#
# Scale design (the longest_prefix_match operator): prefix match is NOT a
# join Spark has natively — the rewrite is (a) collect the DISTINCT RULE
# PREFIX LENGTHS (bounded by max path length — single-digit cardinality in
# any real robots corpus; driver-probe-sized BY CONSTRUCTION, asserted), (b)
# explode each url into one substring candidate per rule length, (c) plain
# equi-join on (host, prefix) — broadcastable when the rule table is
# dimension-sized, hash-join otherwise (not forced: a web-scale rules table
# is host-cardinality-sized), (d) winner per url via ONE map-side-combined
# max(struct(len, ...)) argmax — no window at all.  Same family as the
# engine's interval->prefix join rewrite (B8), applied to path strings.
# ---------------------------------------------------------------------------

_LPM_MAX_LENS = 64  # distinct-rule-length collect guard (see docstring)


def longest_prefix_match(facts: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, host, path) x (host, prefix, allow) -> (url, host, prefix,
    allow) under longest-prefix-wins.  ``rules`` prefixes per host must be
    distinct (RFC 9309 rule sets are).  See module comment for the plan."""
    lens = sorted(r.l for r in
                  rules.select(F.length("prefix").alias("l"))
                  .distinct().collect())
    assert 0 < len(lens) <= _LPM_MAX_LENS, (
        f"rule-length cardinality {len(lens)} outside (0, {_LPM_MAX_LENS}]: "
        "the length collect is driver-probe-sized only while rule prefixes "
        "share a bounded set of lengths")
    cand = facts.withColumn(
        "prefix",
        F.explode(F.array_distinct(F.array(
            *[F.substring(F.col("path"), 1, l) for l in lens]))))
    return (cand.join(rules, ["host", "prefix"])
            .groupBy("url", "host")
            .agg(F.max(F.struct(F.length("prefix").alias("l"),
                                F.col("allow").alias("allow"),
                                F.col("prefix").alias("prefix"))).alias("m"))
            .select("url", "host",
                    F.col("m.prefix").alias("prefix"),
                    F.col("m.allow").alias("allow")))


_PATH_RE = "^[a-z]+://[^/]+(/.*)$"


def _synth_rules(hosts: DataFrame) -> DataFrame:
    """Deterministic robots rule set per host: '/' allow everywhere; hosts
    whose md5 first hex char is even-ascii deny '/page1'; of those, hosts
    with even-ascii second char re-allow '/page12' (the longest-match
    override the operator exists for)."""
    g1 = F.pmod(F.ascii(F.substring(F.md5(F.col("host")), 1, 1)), F.lit(2)) == 0
    g2 = F.pmod(F.ascii(F.substring(F.md5(F.col("host")), 2, 1)), F.lit(2)) == 0
    root = hosts.select("host", F.lit("/").alias("prefix"),
                        F.lit(True).alias("allow"))
    deny = (hosts.filter(g1)
            .select("host", F.lit("/page1").alias("prefix"),
                    F.lit(False).alias("allow")))
    over = (hosts.filter(g1 & g2)
            .select("host", F.lit("/page12").alias("prefix"),
                    F.lit(True).alias("allow")))
    return root.unionByName(deny).unionByName(over)


def w_robots_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Per-url allow/deny verdict under the synthesized robots rules, with
    the winning (longest) prefix carried for audit."""
    urls = _fixture(spark).select("url").distinct()
    facts = urls.select(
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.regexp_extract(F.col("url"), _PATH_RE, 1).alias("path"))
    rules = _synth_rules(facts.select("host").distinct())
    return longest_prefix_match(facts, rules)


SQL_ROBOTS_FILTER = f"""
WITH u AS (
  SELECT DISTINCT url FROM read_parquet('{FIXTURE_PAGES}')
), h AS (
  SELECT url, {host_sql("url")} AS host,
         regexp_extract(url, '{_PATH_RE}', 1) AS path
  FROM u
), hosts AS (
  SELECT DISTINCT host FROM h
), rules AS (
  SELECT host, '/' AS prefix, TRUE AS allow FROM hosts
  UNION ALL
  SELECT host, '/page1', FALSE FROM hosts
  WHERE ascii(substr(md5(host), 1, 1)) % 2 = 0
  UNION ALL
  SELECT host, '/page12', TRUE FROM hosts
  WHERE ascii(substr(md5(host), 1, 1)) % 2 = 0
    AND ascii(substr(md5(host), 2, 1)) % 2 = 0
)
SELECT url, host, prefix, allow FROM (
  SELECT h.url, h.host, r.prefix, r.allow,
         row_number() OVER (
           PARTITION BY h.url ORDER BY len(r.prefix) DESC) AS rn
  FROM h JOIN rules r
    ON r.host = h.host AND starts_with(h.path, r.prefix)
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# k-anonymity release (Sweeney 2002 / Samarati's generalization ladder) —
# the privacy gate a crawl-derived dataset passes before publication: a
# (host, lang, week) cell may be released only if >= k rows share it;
# smaller cells climb the generalization lattice ((host, lang) -> (host) ->
# full suppression) and are released at the first level whose MERGED
# population reaches k.  Suppress-then-generalize: a level aggregates only
# rows NOT already released below it.
#
# Scale design: a pure aggregation ladder — level 0 is the only fact-sized
# groupBy (map-side combined); each later level re-aggregates the SUB-k
# remainder of the previous one (strictly shrinking, at most k-1 rows per
# surviving key by construction), so three levels cost one fact shuffle
# plus two remainder-sized ones.  No windows, no joins.
# ---------------------------------------------------------------------------

_KANON_K = 8  # the fixture's ~10-page hosts make 8 split levels 1-3 nontrivially


def kanon_release(cells: DataFrame, k: int = _KANON_K) -> DataFrame:
    """The generalization ladder over a pre-counted (host, lang, week, n)
    cell frame; split from the registry entry so tests can plant cell
    populations that exercise every release level."""
    c0 = cells
    rel0 = (c0.filter(F.col("n") >= k)
            .select("host", "lang", "week", F.lit(0).alias("level"), "n"))
    c1 = (c0.filter(F.col("n") < k)
          .groupBy("host", "lang").agg(F.sum("n").alias("n")))
    rel1 = (c1.filter(F.col("n") >= k)
            .select("host", "lang", F.lit(None).cast("timestamp").alias("week"),
                    F.lit(1).alias("level"), "n"))
    c2 = (c1.filter(F.col("n") < k)
          .groupBy("host").agg(F.sum("n").alias("n")))
    rel2 = (c2.filter(F.col("n") >= k)
            .select("host", F.lit(None).cast("string").alias("lang"),
                    F.lit(None).cast("timestamp").alias("week"),
                    F.lit(2).alias("level"), "n"))
    rel3 = (c2.filter(F.col("n") < k)
            .agg(F.sum("n").alias("n")).filter(F.col("n").isNotNull())
            .select(F.lit(None).cast("string").alias("host"),
                    F.lit(None).cast("string").alias("lang"),
                    F.lit(None).cast("timestamp").alias("week"),
                    F.lit(3).alias("level"), F.col("n").cast("long")))
    return (rel0.unionByName(rel1).unionByName(rel2).unionByName(rel3)
            .select("host", "lang", "week", "level",
                    F.col("n").cast("long").alias("n")))


def w_kanon_release(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymous release of the fixture's (host, lang, week) population
    counts; ``level`` records where each count was released (0 = full
    cell ... 3 = global suppression bucket)."""
    pg = _fixture(spark)
    cells = (pg.select(F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
                       "lang",
                       F.date_trunc("week", F.col("warc_ts")).alias("week"))
             .groupBy("host", "lang", "week").agg(F.count("*").alias("n")))
    return kanon_release(cells)


SQL_KANON_RELEASE = f"""
WITH c0 AS (
  SELECT {host_sql("url")} AS host, lang,
         date_trunc('week', warc_ts) AS week,
         CAST(count(*) AS BIGINT) AS n
  FROM read_parquet('{FIXTURE_PAGES}')
  GROUP BY 1, 2, 3
), c1 AS (
  SELECT host, lang, CAST(sum(n) AS BIGINT) AS n
  FROM c0 WHERE n < {_KANON_K} GROUP BY 1, 2
), c2 AS (
  SELECT host, CAST(sum(n) AS BIGINT) AS n
  FROM c1 WHERE n < {_KANON_K} GROUP BY 1
)
SELECT host, lang, week, 0 AS level, n FROM c0 WHERE n >= {_KANON_K}
UNION ALL
SELECT host, lang, NULL, 1, n FROM c1 WHERE n >= {_KANON_K}
UNION ALL
SELECT host, NULL, NULL, 2, n FROM c2 WHERE n >= {_KANON_K}
UNION ALL
SELECT NULL, NULL, NULL, 3, CAST(sum(n) AS BIGINT)
FROM c2 WHERE n < {_KANON_K}
HAVING sum(n) IS NOT NULL
"""


QUERIES = {
    "web_recrawl_diff": (w_recrawl_diff, SQL_RECRAWL_DIFF),
    "web_crawl_schedule": (w_crawl_schedule, SQL_CRAWL_SCHEDULE),
    "web_trending_terms": (w_trending_terms, SQL_TRENDING_TERMS),
    "web_robots_filter": (w_robots_filter, SQL_ROBOTS_FILTER),
    "web_kanon_release": (w_kanon_release, SQL_KANON_RELEASE),
}
