"""Gradient-boosted regression stumps (``train_boost_stumps``) — boosting
as T unrolled relational rounds (Friedman 2001 squared-loss boosting with
depth-1 trees; public algorithm, independently coded as DataFrame ops).

Why it exists: the trainer family now spans iterative-geometric (k-means),
counting (NB), spectral (PCA power iteration), and closed-form (OLS); the
missing paradigm is STAGEWISE ADDITIVE fitting — the GBDT shape that
dominates tabular ML.  Each round is two fact-sized aggregates and a
broadcast join: (1) candidate split scan — residuals cross the 82-row
(feature, threshold) dim and collapse mapper-side to per-split sums, (2)
arg-best split via one struct-min over the 82 candidates, (3) residual
update via the broadcast 1-row stump.  T is fixed (3), so the whole fit is
a linear chain of narrow plans with one localCheckpoint per round — at
100 TB each round costs one scan + one 82-group aggregate, the same
map-side-combine shape as the OLS entry but repeated stagewise.

Exactness protocol: targets scale to integer MILLI-units (SCALE = 1000);
split gain is compared as the exact int64 numerator ``SL²·nR + SR²·nL``
(<= 1.6e18, bound documented) over denominator ``nL·nR`` via ONE
int64->double cast + division — identical in both engines — with (f, θ)
tie-break in the struct-min; leaf predictions are floor(S/n) in milli-units
via the +K offset trick (numerator made non-negative so trunc == floor
cross-engine, the geo_resample protocol); residuals and SSE stay exact
int64 end to end.  The per-round SSE column is emitted and its strict
decrease is pytest-gated (boosting must actually boost).

Oracle: the T rounds unrolled as chained MATERIALIZED CTEs (the
Douglas-Peucker re-inlining lesson) over the same feature/threshold
arithmetic.  Features are single-sourced with train_linreg
(training18._features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .training18 import (_LR_CAP, _LR_DOCS, _LR_NOISE_MOD,
                         _LR_NOISE_MUL, _SQL_FEATURES, _features)

_BS_T = 3            # boosting rounds
_BS_SCALE = 1000     # target milli-units
_BS_K = 10 ** 9      # floor-division offset (> max |leaf sum|)


def g_boost_stumps(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") < _LR_DOCS)
    x1, x2, y = _features(F.col("text"), F.col("doc_id"))
    resid = d.select("doc_id", x1.alias("x1"), x2.alias("x2"),
                     (y * _BS_SCALE).alias("r"))
    thr = (spark.range(2).select(F.col("id").alias("f"))
           .crossJoin(spark.range(_LR_CAP + 1).select(F.col("id").alias("th"))))
    out_rows = []
    for t in range(_BS_T):
        xf = F.when(F.col("f") == 0, F.col("x1")).otherwise(F.col("x2"))
        side = xf <= F.col("th")
        cand = (resid.crossJoin(F.broadcast(thr))
                .groupBy("f", "th")
                .agg(F.sum(F.when(side, F.col("r")).otherwise(0)).alias("sl"),
                     F.sum(F.when(side, 1).otherwise(0)).cast("long")
                      .alias("nl"),
                     F.sum("r").alias("s"), F.count("*").alias("n")))
        cand = (cand.select("f", "th", "sl", "nl",
                            (F.col("s") - F.col("sl")).alias("sr"),
                            (F.col("n") - F.col("nl")).alias("nr"))
                    .filter((F.col("nl") > 0) & (F.col("nr") > 0)))
        gain_num = (F.col("sl") * F.col("sl") * F.col("nr")
                    + F.col("sr") * F.col("sr") * F.col("nl"))
        negg = -(gain_num.cast("double")
                 / (F.col("nl") * F.col("nr")).cast("double"))
        sel = cand.groupBy().agg(F.min(F.struct(
            negg.alias("negg"), F.col("f").alias("f"), F.col("th").alias("th"),
            F.col("sl").alias("sl"), F.col("nl").alias("nl"),
            F.col("sr").alias("sr"), F.col("nr").alias("nr"))).alias("s")) \
            .select("s.f", "s.th", "s.sl", "s.nl", "s.sr", "s.nr")
        sel = sel.select(
            "f", "th",
            (F.expr(f"(sl + {_BS_K} * nl) div nl") - _BS_K).alias("pl"),
            (F.expr(f"(sr + {_BS_K} * nr) div nr") - _BS_K).alias("pr"))
        xf2 = F.when(F.col("f") == 0, F.col("x1")).otherwise(F.col("x2"))
        resid = (resid.crossJoin(F.broadcast(sel))
                 .select("doc_id", "x1", "x2",
                         (F.col("r") - F.when(xf2 <= F.col("th"),
                                              F.col("pl"))
                          .otherwise(F.col("pr"))).alias("r"),
                         "f", "th", "pl", "pr")).localCheckpoint(eager=True)
        row = (resid.groupBy("f", "th", "pl", "pr")
               .agg(F.sum(F.col("r") * F.col("r")).alias("sse"))
               .select(F.lit(t).cast("long").alias("round"), "f", "th",
                       "pl", "pr", "sse"))
        out_rows.append(row)
        resid = resid.select("doc_id", "x1", "x2", "r")
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.union(r)
    return out.orderBy("round")


def _round_ctes(k: int) -> str:
    return f"""cand{k} AS (
  SELECT f, th, sl, nl, s - sl AS sr, n - nl AS nr FROM (
    SELECT t.f, t.th,
           sum(CASE WHEN (CASE WHEN t.f = 0 THEN r.x1 ELSE r.x2 END) <= t.th
                    THEN r.r ELSE 0 END) AS sl,
           sum(CASE WHEN (CASE WHEN t.f = 0 THEN r.x1 ELSE r.x2 END) <= t.th
                    THEN 1 ELSE 0 END) AS nl,
           sum(r.r) AS s, count(*) AS n
    FROM resid{k} r, thr t GROUP BY t.f, t.th)
  WHERE nl > 0 AND n - nl > 0
), sel{k} AS MATERIALIZED (
  SELECT s.f AS f, s.th AS th,
         (s.sl + {_BS_K} * s.nl) // s.nl - {_BS_K} AS pl,
         (s.sr + {_BS_K} * s.nr) // s.nr - {_BS_K} AS pr
  FROM (
    SELECT min(struct_pack(
        negg := -(CAST(sl * sl * nr + sr * sr * nl AS DOUBLE)
                  / CAST(nl * nr AS DOUBLE)),
        f := f, th := th, sl := sl, nl := nl, sr := sr, nr := nr)) AS s
    FROM cand{k})
), resid{k + 1} AS MATERIALIZED (
  SELECT r.doc_id, r.x1, r.x2,
         r.r - CASE WHEN (CASE WHEN s.f = 0 THEN r.x1 ELSE r.x2 END) <= s.th
                    THEN s.pl ELSE s.pr END AS r
  FROM resid{k} r, sel{k} s
), row{k} AS (
  SELECT CAST({k} AS BIGINT) AS round, s.f, s.th, s.pl, s.pr,
         (SELECT sum(r * r) FROM resid{k + 1}) AS sse
  FROM sel{k} s
)"""


SQL_BOOST_STUMPS = f"""
WITH f0 AS ({_SQL_FEATURES}
), resid0 AS MATERIALIZED (
  SELECT doc_id, x1, x2,
         (3 * x1 - 2 * x2
          + (doc_id * {_LR_NOISE_MUL}) % {_LR_NOISE_MOD} - 10)
         * {_BS_SCALE} AS r
  FROM f0
), thr AS (
  SELECT fv.f, t.th
  FROM (VALUES (0), (1)) AS fv(f),
       unnest(generate_series(0, {_LR_CAP})) AS t(th)
), {', '.join(_round_ctes(k) for k in range(_BS_T))}
SELECT * FROM ({' UNION ALL '.join(f'SELECT * FROM row{k}'
                                   for k in range(_BS_T))})
ORDER BY round
"""


QUERIES = {
    "train_boost_stumps": (g_boost_stumps, SQL_BOOST_STUMPS),
}
