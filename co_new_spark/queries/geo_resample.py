"""Uniform-time trajectory resampling (``geo_resample``) — linear
interpolation of each user's track onto a fixed tick grid, the
preprocessing step every trajectory-ML pipeline needs (DTW, map-matching,
and dwell analysis all assume comparable time bases; raw event tracks are
irregular).

Shape: one window shuffle on user_id (lag to form legs — the
geo_trajectory_stats partitioning), then ticks are generated PER LEG with
``sequence(floor(t1/Δ)+1, floor(t2/Δ))`` and exploded — no time-grid
cross-join, no driver involvement; a leg only materializes the ticks it
covers, so the output is bounded by span/Δ per user regardless of event
count.  Guards: Spark's ``sequence(a, b)`` produces a DESCENDING sequence
when a > b (it does not return empty!), so tickless legs are masked to an
empty array explicitly; zero-duration legs (t2 == t1) are filtered before
the division.

Exactness: positions are integer-valued doubles (the _XENG/_YENG lattice)
cast to long; interpolation is
``x1 + ((x2-x1)*(T-t1) + K*(t2-t1)) div (t2-t1) - K`` with K = 4e6 — the
offset makes the numerator NON-NEGATIVE so integer-division truncation
equals floor in BOTH engines (Spark ``div`` truncates toward zero; a
negative (x2-x1) would otherwise round differently), and magnitudes stay
under 6e13.  Timestamps cross engines as Spark ``unix_timestamp`` vs
DuckDB ``floor(epoch(ts))`` — the floor matters: ts carries fractional
seconds and unix_timestamp TRUNCATES where a bare BIGINT cast of epoch()
would round (caught by the oracle diff as ±1 s leg shifts).

Oracle: the same legs, tick ranges (generate_series), and offset-div
interpolation in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .geospatial import _XENG, _YENG, _event_points

_RS_USERS = 50
_RS_DT = 86_400          # tick every day
_RS_K = 4_000_000        # floor-division offset (> max |dx| and |dy|)


def g_resample(spark: SparkSession, sf: str) -> DataFrame:
    ev = (_event_points(spark, sf, extra=("user_id", "ts"))
          .filter(F.col("user_id") < _RS_USERS)
          .select("user_id", "event_id",
                  F.unix_timestamp("ts").cast("long").alias("t"),
                  F.col("x").cast("long").alias("x"),
                  F.col("y").cast("long").alias("y")))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    legs = (ev.select("user_id",
                      F.lag("t").over(w).alias("t1"),
                      F.lag("x").over(w).alias("x1"),
                      F.lag("y").over(w).alias("y1"),
                      F.col("t").alias("t2"), F.col("x").alias("x2"),
                      F.col("y").alias("y2"))
              .filter(F.col("t1").isNotNull() & (F.col("t2") > F.col("t1"))))
    k1 = F.floor(F.col("t1") / _RS_DT) + 1
    k2 = F.floor(F.col("t2") / _RS_DT)
    ks = F.when(k1 <= k2, F.sequence(k1, k2)) \
          .otherwise(F.array().cast("array<bigint>"))
    ticks = legs.select("*", F.explode(ks).alias("k"))
    T = F.col("k") * _RS_DT

    def interp(c1, c2):
        return (F.col(c1) + F.expr(
            f"(({c2} - {c1}) * (k * {_RS_DT} - t1) + {_RS_K} * (t2 - t1))"
            f" div (t2 - t1)") - _RS_K)

    return (ticks.select("user_id", T.alias("tick"),
                         interp("x1", "x2").alias("xi"),
                         interp("y1", "y2").alias("yi"))
                 .orderBy("user_id", "tick"))


SQL_RESAMPLE = f"""
WITH pts AS (
  -- floor, not CAST(epoch(..)): ts carries fractional seconds, and Spark's
  -- unix_timestamp TRUNCATES where a direct BIGINT cast would round
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST({_XENG} AS BIGINT) AS x, CAST({_YENG} AS BIGINT) AS y
  FROM events WHERE user_id < {_RS_USERS}
), legs AS (
  SELECT user_id,
         lag(t) OVER w AS t1, lag(x) OVER w AS x1, lag(y) OVER w AS y1,
         t AS t2, x AS x2, y AS y2
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), lg AS (
  SELECT * FROM legs WHERE t1 IS NOT NULL AND t2 > t1
), ticks AS (
  SELECT user_id, t1, x1, y1, t2, x2, y2,
         unnest(generate_series(CAST(floor(t1 / {_RS_DT}) + 1 AS BIGINT),
                                CAST(floor(t2 / {_RS_DT}) AS BIGINT))) AS k
  FROM lg
)
SELECT user_id, k * {_RS_DT} AS tick,
       x1 + ((x2 - x1) * (k * {_RS_DT} - t1) + {_RS_K} * (t2 - t1))
            // (t2 - t1) - {_RS_K} AS xi,
       y1 + ((y2 - y1) * (k * {_RS_DT} - t1) + {_RS_K} * (t2 - t1))
            // (t2 - t1) - {_RS_K} AS yi
FROM ticks
ORDER BY user_id, tick
"""


QUERIES = {
    "geo_resample": (g_resample, SQL_RESAMPLE),
}
