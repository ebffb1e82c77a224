"""Web crawl-frontier analytics, part 3: HTTP redirect-chain resolution by
pointer doubling.

Why it exists: a crawler's URL table is full of 301/302 hops — short
chains (http->https, apex->www, tracking shims) plus the occasional
redirect LOOP that must be detected, not followed.  Canonicalizing every
URL to its final destination (and counting hops) is a standard crawl
post-pass (CDX ``R`` records; Common Crawl resolves chains before
indexing).  Algorithmically it is NEW for the registry: *path doubling*
(pointer jumping), the classic O(log L) parallel list-ranking technique —
after round r every URL knows the node exactly min(dist, 2^r) steps down
its chain AND the exact hop count, so chains of length <= 2^R resolve in R
rounds of shuffle-equi-joins.  That is structurally different from the
registry's other iterative kernels: CC is min-propagation (unordered),
PageRank/TrustRank are sum-propagation, BFS hops is frontier expansion —
doubling is FUNCTION COMPOSITION (state composes with the state of the
node it points at), the only one that squares its reach per round.

Corpus (built natively in BOTH engines from a 2 600-row range; no stored
data): URLs form 200 groups of 13 positions; position p redirects to p-1;
position 0 is the terminal 200-OK page EXCEPT in every 40th group, where
it redirects back up to position 4, closing a 5-cycle that poisons every
chain feeding it; and position 6 of every 3rd group redirects CROSS-GROUP
into the next group's position 2 (chains spanning shard boundaries — the
reason resolution needs a shuffle join at all).  Longest terminal distance
is 12 hops, so R = 4 doubling rounds (reach 16) is exact, and any URL
still unresolved after round 4 is provably on/feeding a cycle.

Scale design (10^12 URLs): each round is ONE self-equi-join on the current
pointer — 2^R-step reach for R shuffles, vs R-step reach for naive
iteration (a 30-hop chain costs 5 joins, not 30).  State rows are constant
width (url, cur, hops, term); terminal rows act as join-absorbing fixed
points, so saturated chains stop growing immediately.  Hot redirect
TARGETS (everything funnels into apex hosts) skew the join key; AQE skew
split applies as usual, and the composition trick itself is the main skew
relief — hot targets absorb in round 1 and later rounds join against the
already-resolved state.  No windows, no driver loops: the round count is a
compile-time constant derived from the corpus's documented max chain
length (the production knob: pick R = ceil(log2(max_hops_policy))).

Reference tie-in: same 1-D reduction philosophy as the grid entries
(/root/reference/README.md:23) — the chain relation is reduced to integer
group/position arithmetic both engines restate independently, and the
oracle walks the chains step-by-step (recursive CTE) while the engine
doubles, so agreement proves the doubling algebra, not shared code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NG = 200   # groups
_G = 13     # positions per group
_N = _NG * _G
_R = 4      # doubling rounds: reach 2^4 = 16 >= max terminal distance 12
_CAP = 1 << _R
_FMT = "https://r%04d.example.org/p%02d"


def _next_gp(gid, p):
    """(next_gid, next_p) Columns, or (None, None) marker via is_term."""
    # cycle groups: p0 -> p4; jump groups: p6 -> next group's p2
    ngid = (
        F.when((p == 6) & (gid % 3 == 0), (gid + 1) % _NG)
        .otherwise(gid))
    np_ = (
        F.when((p == 0) & (gid % 40 == 7), F.lit(4))
        .when((p == 6) & (gid % 3 == 0), F.lit(2))
        .otherwise(p - 1))
    return ngid, np_


def _state0(spark: SparkSession) -> DataFrame:
    """Initial doubling state: (url, cur, hops, term) where cur is the node
    reached after `hops` chain steps (0 for terminals, 1 otherwise) and
    term says whether cur is terminal."""
    df = spark.range(_N)
    gid = F.expr(f"id DIV {_G}")
    p = F.pmod(F.col("id"), F.lit(_G))
    url = F.format_string(_FMT, gid, p)
    is_term = (p == 0) & (gid % 40 != 7)
    ngid, np_ = _next_gp(gid, p)
    nxt = F.format_string(_FMT, ngid, np_)
    nxt_term = (np_ == 0) & (ngid % 40 != 7)
    return df.select(
        url.alias("url"),
        F.when(is_term, url).otherwise(nxt).alias("cur"),
        F.when(is_term, F.lit(0)).otherwise(F.lit(1))
         .cast("long").alias("hops"),
        F.when(is_term, F.lit(True)).otherwise(nxt_term).alias("term"),
    )


def w_redirect_chains(spark: SparkSession, sf: str) -> DataFrame:
    """Resolve every URL to (final_url, hops) or flag it as on/feeding a
    redirect cycle, in _R pointer-doubling rounds (exact for all chains of
    length <= 2^_R; the corpus's max is 12)."""
    st = _state0(spark).localCheckpoint(eager=True)
    for _ in range(_R):
        s2 = st.select(F.col("url").alias("cur"),
                       F.col("cur").alias("cur2"),
                       F.col("hops").alias("h2"),
                       F.col("term").alias("t2"))
        st = (st.join(s2, "cur")
              .select(
                  "url",
                  F.when(F.col("term"), F.col("cur"))
                   .otherwise(F.col("cur2")).alias("cur"),
                  F.when(F.col("term"), F.col("hops"))
                   .otherwise(F.col("hops") + F.col("h2")).alias("hops"),
                  F.when(F.col("term"), F.lit(True))
                   .otherwise(F.col("t2")).alias("term"))
              .localCheckpoint(eager=True))
    return (st.select(
                "url",
                F.when(F.col("term"), F.col("cur")).alias("final_url"),
                F.when(F.col("term"), F.col("hops"))
                 .cast("long").alias("hops"),
                (~F.col("term")).alias("is_cycle"))
            .orderBy("url"))


SQL_REDIRECT_CHAINS = f"""
WITH RECURSIVE nodes AS (
  SELECT printf('{_FMT}', gid, p) AS url,
         CASE
           WHEN p = 0 AND gid % 40 <> 7 THEN NULL
           WHEN p = 0 THEN printf('{_FMT}', gid, 4)
           WHEN p = 6 AND gid % 3 = 0
             THEN printf('{_FMT}', (gid + 1) % {_NG}, 2)
           ELSE printf('{_FMT}', gid, p - 1)
         END AS nxt
  FROM (SELECT range // {_G} AS gid, range % {_G} AS p FROM range({_N}))
), walk AS (
  SELECT url, url AS cur, 0 AS hops FROM nodes
  UNION ALL
  SELECT w.url, n.nxt, w.hops + 1
  FROM walk w JOIN nodes n ON n.url = w.cur
  WHERE n.nxt IS NOT NULL AND w.hops < {_CAP}
), fin AS (
  SELECT w.url, w.cur, w.hops
  FROM walk w JOIN nodes n ON n.url = w.cur
  WHERE n.nxt IS NULL
)
SELECT n.url,
       f.cur AS final_url,
       CAST(f.hops AS BIGINT) AS hops,
       f.url IS NULL AS is_cycle
FROM nodes n LEFT JOIN fin f ON f.url = n.url
ORDER BY n.url
"""


QUERIES = {
    "web_redirect_chains": (w_redirect_chains, SQL_REDIRECT_CHAINS),
}
