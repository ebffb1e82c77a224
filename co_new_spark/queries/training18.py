"""Closed-form linear regression (``train_linreg``) — model fitting as ONE
map-side-combined aggregate (normal equations + integer Cramer solve).

Why it exists: the registry's trainer family covers k-means (iterative),
Naive Bayes (counting), PCA (power iteration), and the PQ/IVF codebooks —
all either iterative or count-based.  Ordinary least squares is the one
classic trainer with a CLOSED FORM: X'X and X'y are plain sums of products,
so the entire fit is a single aggregation pass over the corpus (the ideal
100 TB shape — partial aggregation collapses everything mapper-side to 9
numbers), followed by a 3x3 Cramer solve that never touches the driver.

Exactness: features and targets are small integers (token count and
'e'-count, both capped at 40; the target is a planted linear signal
y = 3*x1 - 2*x2 + hash-noise in [-10, 10]), so every normal-equation sum
and every Cramer determinant is an exact int64 — bounds: sums <= 4.8e5,
dets <= 6 * (4.8e5)^2 * 2.4e6 ~ 3.3e18 < 2^63 (the doc cap and feature
caps exist precisely to keep Cramer inside int64; Spark wraps silently on
overflow where DuckDB errors, so the margin is load-bearing).  The model is
reported as exact RATIONALS (det + three numerators) — no float crosses
engines; the coefficient-recovery pytest divides on the python side.

Oracle: the same sums and the same Cramer expansion in SQL — the normal
equations are the spec; the 3x3 determinant expansion is arithmetic either
engine can restate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

_LR_DOCS = 300
_LR_CAP = 40
_LR_NOISE_MUL, _LR_NOISE_MOD = 2654435761, 21


def _features(textcol, did):
    x1 = F.least(F.size(F.split(textcol, " ")), F.lit(_LR_CAP)).cast("long")
    ecount = (F.length(textcol)
              - F.length(F.regexp_replace(textcol, "e", ""))).cast("long")
    x2 = F.least(ecount, F.lit(_LR_CAP))
    y = (3 * x1 - 2 * x2
         + (did * _LR_NOISE_MUL) % _LR_NOISE_MOD - 10).cast("long")
    return x1, x2, y


def g_linreg(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") < _LR_DOCS)
    x1, x2, y = _features(F.col("text"), F.col("doc_id"))
    f = d.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    s = f.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"))

    def det3(a, b, c, d_, e, f_, g, h, i):
        return (a * (e * i - f_ * h) - b * (d_ * i - f_ * g)
                + c * (d_ * h - e * g))

    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    # X'X = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]; X'y = [sy, s1y, s2y]
    det = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    return s.select(n.alias("n"), det.alias("det"),
                    b0.alias("b0_num"), b1.alias("b1_num"),
                    b2.alias("b2_num"))


_SQL_DET = ("{a} * ({e} * {i} - {f} * {h}) - {b} * ({d} * {i} - {f} * {g})"
            " + {c} * ({d} * {h} - {e} * {g})")


def _sqldet(a, b, c, d, e, f, g, h, i):
    return _SQL_DET.format(a=a, b=b, c=c, d=d, e=e, f=f, g=g, h=h, i=i)


_SQL_FEATURES = f"""
  SELECT doc_id,
         least(len(string_split(text, ' ')), {_LR_CAP}) AS x1,
         least(length(text) - length(replace(text, 'e', '')), {_LR_CAP})
           AS x2
  FROM documents WHERE doc_id < {_LR_DOCS}"""

SQL_LINREG = f"""
WITH f0 AS ({_SQL_FEATURES}
), f AS (
  SELECT x1, x2,
         3 * x1 - 2 * x2
           + (doc_id * {_LR_NOISE_MUL}) % {_LR_NOISE_MOD} - 10 AS y
  FROM f0
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM f
)
SELECT n,
       {_sqldet('n', 's1', 's2', 's1', 's11', 's12', 's2', 's12', 's22')}
         AS det,
       {_sqldet('sy', 's1', 's2', 's1y', 's11', 's12', 's2y', 's12', 's22')}
         AS b0_num,
       {_sqldet('n', 'sy', 's2', 's1', 's1y', 's12', 's2', 's2y', 's22')}
         AS b1_num,
       {_sqldet('n', 's1', 'sy', 's1', 's11', 's1y', 's2', 's12', 's2y')}
         AS b2_num
FROM s
"""


QUERIES = {
    "train_linreg": (g_linreg, SQL_LINREG),
}
