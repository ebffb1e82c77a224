"""Geospatial surface: silhouette / max-height envelope over intervals.

Why it exists: the "skyline-of-buildings" problem — given rectangles
(footprint interval x height), produce the outline: the height profile's
CHANGE POINTS.  Production shapes: elevation envelopes along a corridor,
max-concurrent-load profiles over time windows, coverage-depth outlines.
The textbook solution is a sequential sweep line; this entry shows the
two distributed kernels that replace it:
  1. interval -> breakpoint cover as 1-D PBSM: intervals explode to the
     fixed-width buckets they overlap (bounded by len/width), breakpoints
     carry their bucket, ONE equi-join + range filter replaces the
     quadratic interval x breakpoint join,
  2. DISTRIBUTED LAG: the change-point test needs each breakpoint's
     predecessor height.  In-bucket that is a window PARTITIONED BY
     BUCKET; across buckets the predecessor of a bucket's FIRST
     breakpoint is the LAST breakpoint of the previous NON-EMPTY bucket —
     a per-bucket (last height) aggregate, chained with a lag over the
     limit-bounded bucket dim and broadcast back.  No global window
     touches the breakpoint table.

Semantics: cover is the half-open [x1, x2); profile height at breakpoint
b = max h over covering intervals, 0 where nothing covers (gaps emit
explicit 0 rows when the height changes to 0); output rows are exactly
the breakpoints whose height differs from the previous breakpoint's
(the first breakpoint always emits).  All integers.

Scale design (10^12 intervals): explode bounded by interval-length /
bucket-width; cover join keyed by bucket (AQE-splittable hot buckets);
the max per breakpoint combines map-side; the only ordered windows are
bucket-partitioned or over the <=NB-row bucket dim.  Output is the
change-point set — typically << breakpoints.

Oracle: DuckDB runs the sequential sweep directly — global max-per-
breakpoint via a range join (no bucketing) and a single global lag.

Corpus (native in BOTH engines): 300 md5 intervals, starts in [0, 4096),
lengths 1..256 (<= 2 buckets at width 256), heights 1..100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_NI = 300    # intervals
_BX = 4096   # start range
_LEN = 256   # max length
_BW = 256    # bucket width
# bucket-count bound DERIVED from the knobs (starts span _BX, intervals
# overhang by up to _LEN) so tuning _BW/_LEN/_BX keeps the limit safe —
# an undersized limit on the unordered dim would silently DROP whole
# buckets through the inner join (pytest pins the arithmetic)
_NB = (_BX + _LEN) // _BW + 2


def _ivals(spark: SparkSession) -> DataFrame:
    df = spark.range(_NI)

    def hx(sfx: str, start: int, length: int):
        h = F.md5(F.concat_ws("_", F.lit("sil"), F.col("id"), F.lit(sfx)))
        return F.conv(F.substring(h, start, length), 16, 10).cast("long")

    x1 = F.pmod(hx("p", 1, 3), F.lit(_BX))
    return df.select(
        x1.alias("x1"),
        (x1 + 1 + F.pmod(hx("p", 4, 2), F.lit(_LEN))).alias("x2"),
        (1 + F.pmod(hx("h", 1, 2), F.lit(100))).alias("h"))


def g_silhouette(spark: SparkSession, sf: str) -> DataFrame:
    """Envelope change points: (x, h) where the max-height profile moves."""
    iv = _ivals(spark)
    bp = (iv.select(F.col("x1").alias("b"))
          .union(iv.select(F.col("x2").alias("b")))
          .distinct()
          .withColumn("g", F.expr(f"b DIV {_BW}")))

    # 1-D PBSM cover join: intervals explode to overlapped buckets
    cov = iv.select(
        "x1", "x2", "h",
        F.explode(F.sequence(F.expr(f"x1 DIV {_BW}"),
                             F.expr(f"(x2 - 1) DIV {_BW}"))).alias("g"))
    # the range predicate must be IN the join condition: a breakpoint whose
    # bucket has covering intervals but none covering IT must still
    # null-extend (a filter after the left join would drop it)
    c = cov.select(F.col("g").alias("cg"), "x1", "x2", "h")
    prof = (bp.join(c, (F.col("g") == F.col("cg"))
                    & (F.col("x1") <= F.col("b"))
                    & (F.col("b") < F.col("x2")), "left")
            .groupBy("g", "b")
            .agg(F.coalesce(F.max("h"), F.lit(0)).alias("ph"))
            .localCheckpoint(eager=True))  # two consumers below (the
    # boundary dim and the final join) — uncached, the cover join and
    # per-breakpoint agg would run twice

    # distributed lag: in-bucket window + previous-non-empty-bucket boundary
    wb = Window.partitionBy("g").orderBy("b")
    prof = prof.withColumn("prev_in", F.lag("ph").over(wb))
    last = (prof.groupBy("g")
            .agg(F.max_by("ph", "b").alias("last_h"))
            .limit(_NB))
    # the last height of the previous NON-EMPTY bucket: the dim's rows ARE
    # the non-empty buckets, so a lag(1) over the limit-bounded dim is it
    bound = last.select(
        "g", F.lag("last_h").over(Window.orderBy("g")).alias("prev_b"))
    out = (prof.join(F.broadcast(bound), "g")
           .withColumn("prev", F.coalesce("prev_in", "prev_b"))
           .filter(F.col("prev").isNull() | (F.col("ph") != F.col("prev")))
           .select(F.col("b").alias("x"), F.col("ph").alias("h"))
           .orderBy("x"))
    return out


SQL_SILHOUETTE = f"""
WITH iv AS MATERIALIZED (
  SELECT CAST(concat('0x', substring(md5(
           concat('sil_', CAST(range AS VARCHAR), '_p')), 1, 3)) AS BIGINT)
           % {_BX} AS x1,
         CAST(concat('0x', substring(md5(
           concat('sil_', CAST(range AS VARCHAR), '_p')), 1, 3)) AS BIGINT)
           % {_BX}
         + 1 + CAST(concat('0x', substring(md5(
             concat('sil_', CAST(range AS VARCHAR), '_p')), 4, 2)) AS BIGINT)
           % {_LEN} AS x2,
         1 + CAST(concat('0x', substring(md5(
             concat('sil_', CAST(range AS VARCHAR), '_h')), 1, 2)) AS BIGINT)
           % 100 AS h
  FROM range({_NI})
), bp AS MATERIALIZED (
  SELECT DISTINCT b FROM (SELECT x1 AS b FROM iv UNION SELECT x2 FROM iv)
), prof AS MATERIALIZED (
  -- sequential sweep shape: global range join, max per breakpoint
  SELECT bp.b, coalesce(max(iv.h), 0) AS ph
  FROM bp LEFT JOIN iv ON iv.x1 <= bp.b AND bp.b < iv.x2
  GROUP BY bp.b
), lagd AS (
  SELECT b, ph, lag(ph) OVER (ORDER BY b) AS prev FROM prof
)
SELECT b AS x, ph AS h FROM lagd
WHERE prev IS NULL OR ph <> prev
ORDER BY x
"""


QUERIES = {
    "geo_silhouette": (g_silhouette, SQL_SILHOUETTE),
}
