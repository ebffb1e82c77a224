"""Web link-graph structure analytics: triangle counting (clustering
structure) and label-propagation communities over the host graph.

Why they exist: after centrality (web_link_pagerank, web_hits_scores) the
two remaining classic link-graph computations a crawl pipeline runs are
*motif counting* — triangles / local clustering coefficients separate
organic link neighborhoods from link farms (spam graphs are famously
triangle-poor for their degree; Becchetti et al. 2008 use exactly this
signal) — and *community detection* — grouping hosts into link communities
for per-community sampling caps and topic mixing (label propagation,
Raghavan et al. 2007, is the standard linear-time choice).  Both are new
algorithm families for the registry: bounded motif enumeration and
majority-vote label iteration (structurally distinct from the sum-
propagation of PageRank/HITS and the min-propagation of BFS/CC).

Scale design:
* The fact table is left behind at edge extraction (webgraph._links, shared
  ``linkpages`` materialization — the edge dedup is the only fact-sized
  shuffle, map-side combined).  Everything below runs on the HOST graph.
* Triangles use the degree-ordered orientation (the MapReduce-classic
  Suri & Vassilvitskii 2011 / Cohen 2009 scheme): orient every undirected
  edge from the (degree, host)-smaller endpoint to the larger, making the
  graph a DAG where each triangle appears EXACTLY once as wedge
  (a->b, a->c) + closing edge (b->c).  Wedge generation is bounded by
  sum(out_deg^2) = O(m^1.5) — a hub of degree d contributes its SQUARE only
  if it keeps high out-degree, which orientation prevents (hubs sort last,
  so their edges point AT them and their out-degree stays ~sqrt(m)).  Both
  joins are host-keyed equi-joins; the per-host triangle count combines
  map-side.  No all-pairs anywhere.
* Label propagation runs T fixed unrolled rounds (registry rule: no driver
  convergence probes).  One round = one equi-join of the neighbor relation
  with the current label frame + ONE map-side-combined (host, label) count
  + an order-independent argmax via min(struct(-n, label)) — most-frequent
  label, ties to the lexicographically smallest, so the result is
  deterministic and partitioning-invariant (plain LPA's random tie-break
  famously isn't; the min-tie-break variant trades a little convergence
  speed for reproducibility).  No windows over anything fact-sized; the
  final community-size join is community-keyed.

Reference tie-in: the reference's grid asks the same two questions of its
cell fabric — adjacency clustering (geo_grid_cluster) and region formation;
these are the host-graph twins, sharing the lattice entries' integer-exact
unrolled-rounds oracle protocol (/root/reference/README.md:23's 1-D
reduction philosophy applied to graph keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .webgraph import _LK_CTES, _links

_LPA_T = 3  # fixed label-propagation rounds


def _und_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected, deduped, self-loop-free host edge set (a < b)."""
    lk = _links(spark, sf).filter(F.col("u") != F.col("v"))
    return (lk.select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
            .distinct())


def w_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host triangle participation + degree over the undirected host
    graph (the local-clustering numerator: cc_i = tri_i / C(deg_i, 2)).

    Degree-ordered orientation makes every triangle a unique
    (min -> mid -> max) wedge-plus-closure; see module docstring for the
    O(m^1.5) bound."""
    und = _und_edges(spark, sf).localCheckpoint(eager=True)
    deg = (und.select(F.col("a").alias("host"))
           .union(und.select(F.col("b").alias("host")))
           .groupBy("host").agg(F.count("*").alias("deg")))
    # (deg, host) total order -> DAG orientation src -> dst
    e = (und
         .join(deg.select(F.col("host").alias("a"), F.col("deg").alias("da")),
               "a")
         .join(deg.select(F.col("host").alias("b"), F.col("deg").alias("db")),
               "b"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ori = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("da")).otherwise(F.col("db")).alias("ds"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dd"),
    ).localCheckpoint(eager=True)
    # wedges from the order-minimal vertex: (src -> b), (src -> c) with
    # (deg_b, b) < (deg_c, c); close with oriented edge (b -> c)
    w1 = ori.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                    F.col("dd").alias("db_"))
    w2 = ori.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                    F.col("dd").alias("dc_"))
    wedge = w1.join(w2, "a").filter(
        (F.col("db_") < F.col("dc_")) | (
            (F.col("db_") == F.col("dc_")) & (F.col("b") < F.col("c"))))
    close = ori.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedge.join(close, ["b", "c"]).select("a", "b", "c")
    per_host = (tri.select(F.explode(F.array("a", "b", "c")).alias("host"))
                .groupBy("host").agg(F.count("*").alias("tri")))
    return (deg.join(per_host, "host", "left")
            .select("host", "deg",
                    F.coalesce("tri", F.lit(0)).cast("long").alias("tri"))
            .orderBy("host"))


def w_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    """Label-propagation communities (min-tie-break LPA, T fixed rounds)
    over the undirected host graph; output carries the community label and
    its member count."""
    und = _und_edges(spark, sf).localCheckpoint(eager=True)
    nb = (und.select(F.col("a").alias("x"), F.col("b").alias("y"))
          .union(und.select(F.col("b").alias("x"), F.col("a").alias("y"))))
    nodes = nb.select(F.col("x").alias("host")).distinct()
    lbl = nodes.select("host", F.col("host").alias("label"))
    for _ in range(_LPA_T):
        cnt = (nb.join(lbl.withColumnRenamed("host", "y"), "y")
               .groupBy("x", "label").agg(F.count("*").alias("n")))
        best = (cnt.groupBy("x")
                .agg(F.min(F.struct((-F.col("n")).alias("nn"),
                                    F.col("label"))).alias("m"))
                .select(F.col("x").alias("host"),
                        F.col("m.label").alias("new_label")))
        lbl = (lbl.join(best, "host", "left")
               .select("host", F.coalesce("new_label", "label")
                       .alias("label")))
    size = lbl.groupBy("label").agg(F.count("*").alias("community_size"))
    return (lbl.join(size, "label")
            .select("host", F.col("label").alias("community"),
                    "community_size")
            .orderBy("host"))


_UND_CTES = f"""{_LK_CTES}, und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM lkv WHERE u <> v
)"""

SQL_TRIANGLE_COUNT = f"""
WITH {_UND_CTES}, deg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS host FROM und UNION ALL SELECT b FROM und
  ) GROUP BY host
), ori AS (
  SELECT CASE WHEN (da.deg, a) < (db.deg, b) THEN a ELSE b END AS src,
         CASE WHEN (da.deg, a) < (db.deg, b) THEN b ELSE a END AS dst,
         CASE WHEN (da.deg, a) < (db.deg, b) THEN db.deg ELSE da.deg END
           AS dd
  FROM und
  JOIN deg da ON da.host = und.a
  JOIN deg db ON db.host = und.b
), tri AS (
  SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
  FROM ori w1
  JOIN ori w2 ON w2.src = w1.src
             AND (w1.dd, w1.dst) < (w2.dd, w2.dst)
  JOIN ori cl ON cl.src = w1.dst AND cl.dst = w2.dst
), per_host AS (
  SELECT host, CAST(count(*) AS BIGINT) AS tri FROM (
    SELECT a AS host FROM tri UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY host
)
SELECT d.host, d.deg, coalesce(p.tri, 0) AS tri
FROM deg d LEFT JOIN per_host p ON p.host = d.host
ORDER BY d.host
"""


def _lpa_cte(k: int) -> str:
    return f"""cnt{k} AS (
  SELECT nb.x, l.label, CAST(count(*) AS BIGINT) AS n
  FROM nb JOIN lbl{k - 1} l ON l.host = nb.y
  GROUP BY nb.x, l.label
), lbl{k} AS (
  SELECT p.host, coalesce(c.label, p.label) AS label
  FROM lbl{k - 1} p
  LEFT JOIN (
    SELECT x, label,
           row_number() OVER (PARTITION BY x ORDER BY n DESC, label) AS rn
    FROM cnt{k}
  ) c ON c.x = p.host AND c.rn = 1
)"""


SQL_LABEL_PROP = f"""
WITH {_UND_CTES}, nb AS (
  SELECT a AS x, b AS y FROM und UNION ALL SELECT b, a FROM und
), lbl0 AS (
  SELECT DISTINCT x AS host, x AS label FROM nb
), {', '.join(_lpa_cte(k) for k in range(1, _LPA_T + 1))}
SELECT l.host, l.label AS community, s.community_size
FROM lbl{_LPA_T} l
JOIN (
  SELECT label, CAST(count(*) AS BIGINT) AS community_size
  FROM lbl{_LPA_T} GROUP BY label
) s ON s.label = l.label
ORDER BY l.host
"""


# ---------------------------------------------------------------------------
# k-core peeling (Batagelj & Zaveršnik 2003; Seidman 1983 coreness) — the
# third classic link-graph decomposition after motifs and communities: the
# k-core is the maximal subgraph where every host keeps degree >= k, the
# standard dense-nucleus / link-farm-candidate extractor.  Registry rule: T
# FIXED synchronous peel rounds (every round removes ALL current deg < k
# hosts at once — deterministic, partitioning-invariant), no driver
# convergence probes; the pytest asserts the fixture converges within T
# against a python fixpoint.  One round = two alive-set equi-joins on the
# HOST edge table + one map-side-combined degree count; round T's survivor
# degrees are recomputed on the surviving subgraph.  At real scale rounds
# cost one host-keyed shuffle each and the edge set only SHRINKS.
# ---------------------------------------------------------------------------

_KCORE_K = 2  # core threshold
_KCORE_T = 3  # fixed synchronous peel rounds


def kcore_peel(und: DataFrame, k: int = _KCORE_K,
               t: int = _KCORE_T) -> DataFrame:
    """``t`` synchronous deg >= ``k`` peel rounds over an undirected (a, b)
    edge frame; returns surviving hosts with their degree inside the
    surviving subgraph.  Split from the registry entry so tests can plant a
    graph the peel actually bites (the fixture host graph is dense enough
    that its 2-core is the whole graph)."""

    def _deg(alive: DataFrame) -> DataFrame:
        e = (und.join(alive.withColumnRenamed("host", "a"), "a")
             .join(alive.withColumnRenamed("host", "b"), "b"))
        return (e.select(F.col("a").alias("host"))
                .union(e.select(F.col("b").alias("host")))
                .groupBy("host").agg(F.count("*").alias("deg")))

    alive = (und.select(F.col("a").alias("host"))
             .union(und.select(F.col("b").alias("host"))).distinct())
    for _ in range(t):
        alive = (_deg(alive).filter(F.col("deg") >= k)
                 .select("host").localCheckpoint(eager=True))
    return _deg(alive).orderBy("host")


def w_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """Hosts surviving ``_KCORE_T`` synchronous deg >= ``_KCORE_K`` peel
    rounds over the host graph, with their in-subgraph degree."""
    return kcore_peel(_und_edges(spark, sf).localCheckpoint(eager=True))


def _kcore_cte(k: int) -> str:
    return f"""e{k} AS (
  SELECT a, b FROM und
  JOIN alive{k - 1} x ON x.host = und.a
  JOIN alive{k - 1} y ON y.host = und.b
), alive{k} AS (
  SELECT host FROM (
    SELECT host, count(*) AS deg FROM (
      SELECT a AS host FROM e{k} UNION ALL SELECT b FROM e{k}
    ) GROUP BY host
  ) WHERE deg >= {_KCORE_K}
)"""


SQL_KCORE = f"""
WITH {_UND_CTES}, alive0 AS (
  SELECT DISTINCT a AS host FROM und
  UNION SELECT DISTINCT b FROM und
), {', '.join(_kcore_cte(k) for k in range(1, _KCORE_T + 1))}, ef AS (
  SELECT a, b FROM und
  JOIN alive{_KCORE_T} x ON x.host = und.a
  JOIN alive{_KCORE_T} y ON y.host = und.b
)
SELECT host, CAST(count(*) AS BIGINT) AS deg FROM (
  SELECT a AS host FROM ef UNION ALL SELECT b FROM ef
) GROUP BY host ORDER BY host
"""


# ---------------------------------------------------------------------------
# Co-citation similarity (Small 1973; the base relation of SimRank /
# "related sites"): two hosts are similar when the same sources link to
# both.  Scale design: the pair join is the classic C(fan_in, 2) blowup —
# a target cited by d sources contributes d^2 pairs — so sources are CAPPED
# per target BEFORE the join (deterministic (md5(u), u) rank partitioned by
# v, keep <= _COCITE_CAP), the exact per-bucket-cap-before-join discipline
# of train_minhash_lsh (training.py).  After the cap the self-equi-join on
# v is bounded by C(cap, 2) per target and the (a, b) pair count combines
# map-side.  The cap is a documented recall trade (hub targets contribute a
# deterministic sample of their citers), not a silent truncation.
# ---------------------------------------------------------------------------

_COCITE_CAP = 30  # max sources kept per target (C(30,2) = 435 pairs/target)
_COCITE_MIN = 2   # pairs must share >= 2 targets


def w_cocitation(spark: SparkSession, sf: str) -> DataFrame:
    """Host pairs co-cited by >= ``_COCITE_MIN`` common targets, counted on
    the fan-in-capped directed edge set."""
    ed = (_links(spark, sf).filter(F.col("u") != F.col("v"))
          .select("u", "v").distinct())
    wv = Window.partitionBy("v").orderBy(F.md5(F.col("u")), F.col("u"))
    capped = (ed.withColumn("rn", F.row_number().over(wv))
              .filter(F.col("rn") <= _COCITE_CAP).drop("rn")
              .localCheckpoint(eager=True))
    a = capped.select(F.col("v"), F.col("u").alias("host_a"))
    b = capped.select(F.col("v"), F.col("u").alias("host_b"))
    return (a.join(b, "v").filter(F.col("host_a") < F.col("host_b"))
            .groupBy("host_a", "host_b").agg(F.count("*").alias("cocite"))
            .filter(F.col("cocite") >= _COCITE_MIN)
            .orderBy(F.col("cocite").desc(), "host_a", "host_b"))


SQL_COCITATION = f"""
WITH {_LK_CTES}, ed AS (
  SELECT DISTINCT u, v FROM lkv WHERE u <> v
), capped AS (
  SELECT u, v FROM (
    SELECT u, v,
           row_number() OVER (PARTITION BY v ORDER BY md5(u), u) AS rn
    FROM ed
  ) WHERE rn <= {_COCITE_CAP}
)
SELECT a.u AS host_a, b.u AS host_b, CAST(count(*) AS BIGINT) AS cocite
FROM capped a JOIN capped b ON b.v = a.v AND a.u < b.u
GROUP BY 1, 2
HAVING count(*) >= {_COCITE_MIN}
ORDER BY cocite DESC, host_a, host_b
"""


# ---------------------------------------------------------------------------
# TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): biased PageRank
# whose teleport mass goes ONLY to a curated trusted seed set, so trust
# decays with link distance from the seeds and link-farm hosts (far from any
# seed) score near zero — the standard whole-graph anti-spam prior.
#
# Integer-exact protocol (same micro-unit discipline as
# geo_graph.pagerank_int; float trust is not order-associative):
#     trust0(v)   = SCALE            if v is a seed, else 0
#     trust_k(v)  = base(v) + (85 * sum_{u->v} trust_{k-1}(u) div deg(u))
#                             div 100,   base(v) = BASE if seed else 0
# (the unnormalized per-seed variant: each seed injects BASE teleport mass
# instead of BASE/|S| — same ranking, documented, division-free).  The seed
# predicate must evaluate identically in BOTH engines, so it is an md5
# nibble gate (md5 is the engines' shared deterministic hash — xxhash64
# does not exist in DuckDB): substr(md5(host),1,1) IN ('0','1','2') picks
# ~3/16 of hosts as the "curated" set; a pytest asserts the fixture yields
# a non-trivial seed set and that trust concentrates on/near seeds.
#
# Scale design: identical to web_link_pagerank — the fact table is left
# behind at edge extraction (shared linkpages materialization), T fixed
# unrolled rounds on the HOST graph, each round one u-keyed equi-join plus
# one map-side-combined v aggregation, no driver convergence probes.
# ---------------------------------------------------------------------------

_TRUST_T = 3
_TRUST_SCALE = 1_000_000
_TRUST_BASE = 150_000
_TRUST_SEED_SQL = "substr(md5({h}), 1, 1) IN ('0', '1', '2')"


def w_trustrank(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host TrustRank over the extracted host graph: (host, is_seed,
    trust) after ``_TRUST_T`` integer-exact rounds from the md5-gated seed
    set."""
    ed = (_links(spark, sf).filter(F.col("u") != F.col("v"))
          .select("u", "v").distinct().localCheckpoint(eager=True))
    deg = ed.groupBy("u").agg(F.count("*").alias("deg"))
    edd = ed.join(deg, "u").localCheckpoint(eager=True)
    seed = F.substring(F.md5(F.col("host")), 1, 1).isin("0", "1", "2")
    nodes = (ed.select(F.col("u").alias("host"))
             .union(ed.select(F.col("v").alias("host"))).distinct()
             .withColumn("is_seed", seed))
    trust = nodes.select(
        "host", "is_seed",
        F.when(F.col("is_seed"), F.lit(_TRUST_SCALE)).otherwise(F.lit(0))
         .cast("long").alias("trust"))
    base = (F.when(F.col("is_seed"), F.lit(_TRUST_BASE)).otherwise(F.lit(0))
            .cast("long"))
    for _ in range(_TRUST_T):
        contrib = (edd.join(trust.select(F.col("host").alias("u"), "trust"),
                            "u")
                   .select("v", F.expr("trust div deg").alias("c")))
        s = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        trust = (nodes.join(s.withColumnRenamed("v", "host"), "host", "left")
                 .select("host", "is_seed",
                         (base + F.expr(
                             "(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"))
                         .cast("long").alias("trust")))
    return trust.orderBy("host")


def _trust_cte(k: int) -> str:
    return f"""tr{k} AS (
  SELECT nd.host, nd.is_seed,
         CAST(CASE WHEN nd.is_seed THEN {_TRUST_BASE} ELSE 0 END
              + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS trust
  FROM nodes nd LEFT JOIN (
    SELECT e.v AS host, sum(r.trust // d.deg) AS s
    FROM tr{k - 1} r JOIN ed e ON e.u = r.host JOIN deg d ON d.u = e.u
    GROUP BY e.v
  ) s ON s.host = nd.host
)"""


SQL_TRUSTRANK = f"""
WITH {_LK_CTES}, ed AS (
  SELECT DISTINCT u, v FROM lkv WHERE u <> v
), nodes AS (
  SELECT host, {_TRUST_SEED_SQL.format(h='host')} AS is_seed FROM (
    SELECT u AS host FROM ed UNION SELECT v FROM ed
  )
), deg AS (
  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY u
), tr0 AS (
  SELECT host, is_seed,
         CAST(CASE WHEN is_seed THEN {_TRUST_SCALE} ELSE 0 END AS BIGINT)
           AS trust
  FROM nodes
), {', '.join(_trust_cte(k) for k in range(1, _TRUST_T + 1))}
SELECT host, is_seed, trust FROM tr{_TRUST_T} ORDER BY host
"""


QUERIES = {
    "web_triangle_count": (w_triangle_count, SQL_TRIANGLE_COUNT),
    "web_label_prop": (w_label_prop, SQL_LABEL_PROP),
    "web_kcore": (w_kcore, SQL_KCORE),
    "web_cocitation": (w_cocitation, SQL_COCITATION),
    "web_trustrank": (w_trustrank, SQL_TRUSTRANK),
}
