"""Pages-pipeline geospatial entries over the COMMITTED fixtures — the
round-2 VERDICT ask #1: geo_pages_l0_histogram / geo_cover_lookup /
geo_knn_ring move from rows-only to full DuckDB hash checks.

Mechanism: the Spark side reads tests/fixtures/pages2k.parquet and runs the
LIVE kernels end to end (regex geoparse -> fused TM projection + Grid B
encode -> cover join / ring kNN).  The oracle reads the same fixture PLUS
tests/fixtures/pages2k_xy.parquet — the per-url parsed lat/lon and forward
EPSG:9377 projection frozen at fixture-generation time (tools/
make_fixtures.py) — and restates everything else in SQL: the geoparse regex
(same single-source grammar as web_geoparse), the grid-spec encode
(/root/reference/conf.yaml:21-26 via queries.sql_grid), the citycover.csv
prefix-cover join (decoded in SQL, queries.geo_cover_sql), and the lattice
ring-1 kNN.  The one link the oracle takes from the frozen fixture — the TM
series itself — is pinned separately by the reference's assert vectors
(geo_gridlib_asserts, hash-checked) and tests/test_grid_golden.py, so a
regression in ANY stage (parse, projection, encode, join, ranking) breaks
either this hash or that one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells_sql, geo
from ..functions import text as txf
from ..grid import grids
from ..operators.cover import cover_lookup_best
from ..operators.knn import knn_ring
from ..sources.reference_data import load_citycover
from .geo_cover_sql import _sql_csv_decode
from .sql_grid import l0_case, morton_ref
from .webtext_q import FIXTURE_PAGES

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FIXTURE_XY = os.path.join(_REPO, "tests", "fixtures", "pages2k_xy.parquet")

_X0 = grids.L0_ORIGIN_X
_Y0 = grids.L0_ORIGIN_Y
_SIDE = grids.L0_SIDE
_L0_CASE = l0_case()


def _fixture(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(FIXTURE_PAGES)


def _sql_xy_cells(r: int, id_col: str = "url") -> str:
    """CTE chain: the xy fixture -> depth-(4 + r) packed Grid B cell, the
    straight SQL restatement of grids.grid_b_encode_xy."""
    ny, nx = (r + 1) // 2, r // 2
    return f"""
xy AS (SELECT {id_col}, x, y FROM read_parquet('{FIXTURE_XY}')),
fr AS (
  SELECT {id_col}, x, y,
         CAST(floor((x - {_X0!r}) / {_SIDE!r}) AS BIGINT) AS i,
         CAST(floor((y - {_Y0!r}) / {_SIDE!r}) AS BIGINT) AS j,
         (x - {_X0!r}) / {_SIDE!r} - floor((x - {_X0!r}) / {_SIDE!r}) AS u,
         (y - {_Y0!r}) / {_SIDE!r} - floor((y - {_Y0!r}) / {_SIDE!r}) AS v
  FROM xy),
dg AS (
  SELECT {id_col}, x, y, i, j, {_L0_CASE} AS digit,
         CAST(floor(u * {1 << nx}) AS BIGINT) AS ix,
         CAST(floor(v * {1 << ny}) AS BIGINT) AS iy
  FROM fr),
cells AS (
  SELECT {id_col}, x, y, i, j, digit, ix, iy,
         CASE WHEN digit >= 0
              THEN ((digit * {1 << r} + {morton_ref(r)}) * 64 + {4 + r})
              ELSE -1 END AS cell
  FROM dg)
"""


# ---------------------------------------------------------------------------
# geo_pages_l0_histogram — flagship shape: pages -> geoparse -> encode -> L0 agg
# ---------------------------------------------------------------------------


def g_pages_l0_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture pages -> live geoparse -> live geocode (depth-16 cell) ->
    per-L0 page/url counts; off-grid geocodes land in the l0 = -1 bucket."""
    pg = _fixture(spark)
    parsed = pg.select(
        "url",
        txf.parse_lat(F.col("text")).alias("lat"),
        txf.parse_lon(F.col("text")).alias("lon"),
    ).filter(F.col("lat").isNotNull())
    cells = parsed.withColumn("cell", geo.encode_b_cell(F.col("lat"), F.col("lon"), 12))
    return (
        cells.withColumn("l0", cells_sql.cell_l0_digit(F.col("cell")))
        .groupBy("l0")
        .agg(F.count("*").alias("n_pages"), F.countDistinct("url").alias("n_urls"))
    )


# The l0 digit needs no refinement bits: it is the L0 CASE on the lattice
# (i, j), -1 off-grid — exactly what cell_l0_digit(encode(..)) reduces to.
SQL_PAGES_L0 = f"""
WITH parsed AS (
  SELECT url,
         coalesce(nullif(regexp_extract(text, '{txf.GEO_URI_RE}', 1), ''),
                  nullif(regexp_extract(text, '{txf.PLAIN_PAIR_RE}', 1), '')) AS plat
  FROM read_parquet('{FIXTURE_PAGES}')
), pp AS (
  SELECT url FROM parsed WHERE plat IS NOT NULL
), pts AS (
  SELECT pp.url, xy.x, xy.y
  FROM pp JOIN read_parquet('{FIXTURE_XY}') xy USING (url)
), lat AS (
  SELECT url,
         CAST(floor((x - {_X0!r}) / {_SIDE!r}) AS BIGINT) AS i,
         CAST(floor((y - {_Y0!r}) / {_SIDE!r}) AS BIGINT) AS j
  FROM pts
)
SELECT CAST(CASE WHEN {_L0_CASE} >= 0 THEN {_L0_CASE} ELSE -1 END AS BIGINT) AS l0,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls
FROM lat GROUP BY 1
"""


# ---------------------------------------------------------------------------
# geo_cover_lookup — pages -> depth-30 cell -> municipality (prefix cover join)
# ---------------------------------------------------------------------------

_CV_R = 26  # refinement bits -> point depth 30 (> max cover depth 22)


def g_cover_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture pages -> fused geoparse+geocode kernel -> the prefix-rewritten
    broadcast cover join -> top-50 municipalities by page count."""
    cover = load_citycover(spark)
    pg = _fixture(spark)
    pts = pg.select(
        "url", geo.encode_b_cell_from_text(F.col("text"), _CV_R).alias("cell")
    ).filter(F.col("cell") >= 0)
    hit = cover_lookup_best(pts, cover, keep=["url", "cell"])
    return hit.groupBy("isolabel_ext").agg(F.count("*").alias("n_pages")) \
              .orderBy(F.col("n_pages").desc(), "isolabel_ext").limit(50)


SQL_COVER_LOOKUP = f"""
WITH {_sql_xy_cells(_CV_R)},
{_sql_csv_decode("cover", "covbits")},
pcell AS (
  SELECT DISTINCT url, cell >> 6 AS pbits FROM cells WHERE cell >= 0
),
deps AS (SELECT DISTINCT cdepth FROM covbits),
panc AS (
  SELECT url, cdepth, pbits >> ({4 + _CV_R} - cdepth) AS anc
  FROM pcell CROSS JOIN deps
),
hits AS (
  SELECT p.url, c.isolabel_ext
  FROM panc p JOIN covbits c ON p.cdepth = c.cdepth AND p.anc = c.cbits
),
best AS (
  SELECT url, min(isolabel_ext) AS isolabel_ext FROM hits GROUP BY url
)
SELECT isolabel_ext, CAST(count(*) AS BIGINT) AS n_pages
FROM best GROUP BY 1
ORDER BY n_pages DESC, isolabel_ext LIMIT 50
"""


# ---------------------------------------------------------------------------
# geo_knn_ring — ring-expansion kNN of page points around the 50 first urls
# ---------------------------------------------------------------------------

_KNN_R = 10   # depth 14 cells
_KNN_NQ = 50
_KNN_K = 5


def g_knn_ring(spark: SparkSession, sf: str) -> DataFrame:
    """kNN over the fixture's geocoded page points via cell-ring expansion;
    queries = the 50 lexicographically-first grid-valid urls.

    Projection+encode fused in one pandas UDF per the round-1 lesson; the
    grid-valid filter keys on the struct's cell field only."""
    pg = _fixture(spark).select("url", "text").distinct()
    parsed = pg.select(
        "url",
        txf.parse_lat(F.col("text")).alias("lat"),
        txf.parse_lon(F.col("text")).alias("lon"),
    ).filter(F.col("lat").isNotNull())
    s = parsed.select(
        "url", geo.latlon_to_xy_cell(F.col("lat"), F.col("lon"), _KNN_R).alias("s"))
    pts = s.select("url", F.col("s.x").alias("x"), F.col("s.y").alias("y"),
                   F.col("s.cell").alias("cell")).filter(F.col("cell") >= 0)
    q = pts.orderBy("url").limit(_KNN_NQ).select(
        F.col("url").alias("qid"), "x", "y", "cell")
    c = pts.select(F.col("url").alias("cid"), "x", "y", "cell")
    return knn_ring(q, c, k=_KNN_K, ring=1, exclude_self=True)


def _sql_knn_ring_pages() -> str:
    ny = nx = _KNN_R // 2
    return f"""
WITH {_sql_xy_cells(_KNN_R)},
cc AS (
  SELECT url, x, y, j * {1 << ny} + iy AS gy, i * {1 << nx} + ix AS gx
  FROM cells WHERE cell >= 0),
q AS (SELECT * FROM cc ORDER BY url LIMIT {_KNN_NQ}),
pairs AS (
  SELECT q.url AS qid, c.url AS cid,
         sqrt((q.x - c.x) * (q.x - c.x) + (q.y - c.y) * (q.y - c.y)) AS dist
  FROM q JOIN cc c
    ON abs(q.gy - c.gy) <= 1 AND abs(q.gx - c.gx) <= 1
   AND q.url <> c.url)
SELECT qid, cid, round(dist, 3) AS dist, rn FROM (
  SELECT qid, cid, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
  FROM pairs) WHERE rn <= {_KNN_K}
"""


# ---------------------------------------------------------------------------
# web_geo_lang_mix — the geo x webtext fusion row: language mixture per
# jurisdiction (pages -> live lang-ID -> live geocode -> cover join -> shares)
# ---------------------------------------------------------------------------


def g_lang_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Per-municipality language mixture of geocoded pages: the composition a
    geo-aware curation pipeline runs to pick per-region language quotas.
    Everything LIVE: stopword-ratio lang-ID (functions/text.py), fused
    geoparse+TM+encode kernel, per-depth broadcast cover join.  ``share`` is
    one double division of two BIGINTs, rounded — hash-stable."""
    from pyspark.sql import Window

    cover = load_citycover(spark)
    pg = _fixture(spark).select("url", "text").distinct()  # url-unique (byte-identical text per url)
    pts = pg.select(
        "url",
        txf.lang_guess(F.col("text")).alias("lang"),
        geo.encode_b_cell_from_text(F.col("text"), _CV_R).alias("cell"),
    ).filter(F.col("cell") >= 0)
    hit = cover_lookup_best(pts, cover, keep=["url", "lang"])
    g = hit.groupBy("isolabel_ext", "lang").agg(F.count("*").alias("n_urls"))
    w = Window.partitionBy("isolabel_ext")
    return g.select(
        "isolabel_ext", "lang", "n_urls",
        F.round(F.col("n_urls").cast("double")
                / F.sum("n_urls").over(w).cast("double"), 6).alias("share"))


def _sql_tok_ratio(lang: str) -> str:
    """Stopword ratio over the word_tokens grammar (lower + split on
    non-letter/digit runs, empties dropped) — the pages-text restatement;
    SQL_LANG's plain-space split only holds for pre-normalized documents."""
    words = ",".join(f"'{w}'" for w in txf._STOPWORDS[lang])  # noqa: SLF001
    toks = r"list_filter(string_split_regex(lower(text), '[^\pL\pN]+'), x -> x <> '')"
    return (f"CASE WHEN len({toks}) > 0 THEN"
            f" CAST(len(list_filter({toks}, t -> list_contains([{words}], t)))"
            f" AS DOUBLE) / len({toks}) ELSE 0.0 END")


SQL_LANG_MIX = f"""
WITH {_sql_xy_cells(_CV_R)},
{_sql_csv_decode("cover", "covbits")},
pgu AS (SELECT DISTINCT url, text FROM read_parquet('{FIXTURE_PAGES}')),
lg AS (
  SELECT url,
         CASE WHEN best > 0 THEN
           (CASE WHEN r_es = best THEN 'es' WHEN r_pt = best THEN 'pt'
                 ELSE 'en' END)
         ELSE 'und' END AS lang
  FROM (
    SELECT url, r_es, r_en, r_pt, greatest(r_es, r_en, r_pt) AS best FROM (
      SELECT url, {_sql_tok_ratio('es')} AS r_es,
             {_sql_tok_ratio('en')} AS r_en,
             {_sql_tok_ratio('pt')} AS r_pt
      FROM pgu
    )
  )
),
pcell AS (
  SELECT DISTINCT url, cell >> 6 AS pbits FROM cells WHERE cell >= 0
),
deps AS (SELECT DISTINCT cdepth FROM covbits),
panc AS (
  SELECT url, cdepth, pbits >> ({4 + _CV_R} - cdepth) AS anc
  FROM pcell CROSS JOIN deps
),
hits AS (
  SELECT p.url, c.isolabel_ext
  FROM panc p JOIN covbits c ON p.cdepth = c.cdepth AND p.anc = c.cbits
),
best AS (
  SELECT url, min(isolabel_ext) AS isolabel_ext FROM hits GROUP BY url
),
g AS (
  SELECT b.isolabel_ext, lg.lang, CAST(count(*) AS BIGINT) AS n_urls
  FROM best b JOIN lg ON lg.url = b.url
  GROUP BY 1, 2
)
SELECT isolabel_ext, lang, n_urls,
       round(CAST(n_urls AS DOUBLE)
             / CAST(sum(n_urls) OVER (PARTITION BY isolabel_ext) AS DOUBLE),
             6) AS share
FROM g
"""


_NG_RBITS = 26


def g_native_geocode(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship geocode with ZERO Python crossings (functions/geo_native):
    native regexp geoparse -> native Karney/Krueger TM forward -> native
    lattice/Morton encode -> per-L0 rollup with cell extrema.

    Oracle split (mat.py protocol): the transcendental part — the projected
    (url, x, y) — is materialized, and the oracle re-derives the ENTIRE
    depth-30 encode from those bytes through the SQL grid fragments
    (l0_case/morton_ref — IEEE-exact ops only, so bit-identical by
    construction).  The TM floats themselves are gated by the pytest parity
    vs the Arrow kernel (0 mismatches measured on 1M synthetic pages) whose
    projection is reference-verified (gridLib golden vectors)."""
    from ..functions import geo_native
    from ..functions import text as tx
    from .mat import materialize

    pg = _fixture(spark).select("url", "text").distinct()
    d = pg.withColumns({"lat": tx.parse_lat(F.col("text")),
                        "lon": tx.parse_lon(F.col("text"))})
    d = geo_native.with_tm_forward(d, "lat", "lon", "x", "y") \
                  .select("url", "x", "y")
    d = materialize(d, "native_geocode_xy", key=sf)
    d = geo_native.with_cell_from_xy(d, "x", "y", _NG_RBITS, "cell") \
                  .filter(F.col("cell") >= 0)
    return (d.groupBy(cells_sql.cell_l0_digit(F.col("cell")).alias("l0"))
             .agg(F.count("*").alias("n_pages"),
                  F.min("cell").alias("min_cell"),
                  F.max("cell").alias("max_cell"))
             .orderBy("l0"))


def _sql_native_geocode() -> str:
    from .mat import mat_glob

    r = _NG_RBITS
    ny, nx = (r + 1) // 2, r // 2
    return f"""
WITH xy AS (
  -- bounds tested on DOUBLES before any cast, mirroring with_cell_from_xy's
  -- inb guard: an extreme-but-finite projected coordinate must MISMATCH as
  -- an absent row (Spark yields -1), never crash the oracle's BIGINT cast.
  -- The guard tests the DERIVED (x-X0)/SIDE — the exact expression Spark's
  -- fi/fj check uses — so both engines share the same IEEE rounding at the
  -- cell-matrix edge (raw-x bounds could round across the boundary within
  -- ~1 ulp and admit a row on one side only)
  SELECT url, x, y FROM read_parquet('{mat_glob("native_geocode_xy")}')
  WHERE isfinite(x) AND isfinite(y)
    AND (x - {_X0!r}) / {_SIDE!r} >= 0.0
    AND (x - {_X0!r}) / {_SIDE!r} < 4.0
    AND (y - {_Y0!r}) / {_SIDE!r} >= 0.0
    AND (y - {_Y0!r}) / {_SIDE!r} < 5.0
), fr AS (
  SELECT url,
         CAST(floor((x - {_X0!r}) / {_SIDE!r}) AS BIGINT) AS i,
         CAST(floor((y - {_Y0!r}) / {_SIDE!r}) AS BIGINT) AS j,
         (x - {_X0!r}) / {_SIDE!r} - floor((x - {_X0!r}) / {_SIDE!r}) AS u,
         (y - {_Y0!r}) / {_SIDE!r} - floor((y - {_Y0!r}) / {_SIDE!r}) AS v
  FROM xy),
dg AS (
  SELECT url, {_L0_CASE} AS digit,
         least(CAST(floor(u * {1 << nx}) AS BIGINT), {(1 << nx) - 1}) AS ix,
         least(CAST(floor(v * {1 << ny}) AS BIGINT), {(1 << ny) - 1}) AS iy
  FROM fr),
cells AS (
  SELECT url, digit,
         (digit * {1 << r} + {morton_ref(r)}) * 64 + {4 + r} AS cell
  FROM dg WHERE digit >= 0)
SELECT digit AS l0, CAST(count(*) AS BIGINT) AS n_pages,
       min(cell) AS min_cell, max(cell) AS max_cell
FROM cells GROUP BY digit ORDER BY l0
"""


QUERIES = {
    "geo_pages_l0_histogram": (g_pages_l0_histogram, SQL_PAGES_L0),
    "geo_native_geocode": (g_native_geocode, _sql_native_geocode()),
    "geo_cover_lookup": (g_cover_lookup, SQL_COVER_LOOKUP),
    "geo_knn_ring": (g_knn_ring, _sql_knn_ring_pages()),
    "web_geo_lang_mix": (g_lang_mix, SQL_LANG_MIX),
}
