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


QUERIES = {
    "web_recrawl_diff": (w_recrawl_diff, SQL_RECRAWL_DIFF),
    "web_crawl_schedule": (w_crawl_schedule, SQL_CRAWL_SCHEDULE),
}
