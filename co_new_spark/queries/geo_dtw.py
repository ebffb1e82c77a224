"""Geospatial surface: trajectory similarity — Dynamic Time Warping.

Why it exists: DTW is the canonical trajectory-similarity measure
(map-matching's companion: matching aligns one track to a network, DTW
aligns two tracks to each other — recurring-route detection, anomaly
flagging, trip dedup).  Algorithmic family: a row-local 2-D DP executed
as NESTED CATALYST FOLDS — the outer `F.aggregate` walks DP rows carrying
the previous row as ARRAY STATE, the inner `F.aggregate` walks cells
left-to-right (each cell needs its left neighbor, so the inner fold's
accumulator is the growing row).  Contrast with the registry's other DP
kernels: Viterbi (geo_match) distributes ONE chain over joins because its
state space is the candidate set; DTW's whole table is per-PAIR local, so
the scalable axis is pair parallelism — 10^12 pairs each fold in place,
zero shuffles beyond assembling the two point arrays per pair.

Semantics: classic unconstrained DTW over the planted cell walks of
geo_match's corpus; pair k aligns trajectory k's first _TP cells (A)
against ITS OWN cells shifted by _SH time steps (B) — a lagged replay of
the same route, the regime DTW exists for: the optimal warp re-slips the
_SH-step offset and beats lockstep alignment on most pairs (pytest-
gated), while independent walks would make the diagonal trivially
optimal.  Cell cost = squared euclidean distance, recurrence dp[i][j] =
cost + min(up, left, diag), boundary +inf except dp[0][0].  All int64.

Exactness: both engines restate the identical recurrence; the oracle
walks rows through a recursive CTE whose SELECT computes the _TP cells
with the left neighbor's expression INLINED (linear growth — each cell
embeds its predecessor once); lateral aliases are avoided because the
recursive table's same-named columns shadow them.

Output: (pair, dtw), 60 rows — one per trajectory.

Scale design: per-pair arrays bounded by the GPS batch window (the same
_T bound geo_match unrolls over); the only shuffle is the per-trajectory
collect_list groupBy (map-side combined into sorted arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geo_match import _T, _obs

_BIG = 1 << 40
_SH = 2           # B = the same walk shifted _SH steps
_TP = _T - _SH    # aligned length per side


def _paired(spark: SparkSession) -> DataFrame:
    """(pair, ax, ay, bx, by) — walk cells t<_TP vs the same walk
    shifted _SH (t>=_SH), per trajectory."""
    cells = _obs(spark).select(F.col("traj").alias("pair"), "t", "cx", "cy")
    arr = (cells.groupBy("pair")
           .agg(F.array_sort(F.collect_list(
               F.struct("t", "cx", "cy"))).alias("s"))
           .select("pair",
                   F.col("s.cx").alias("xs"), F.col("s.cy").alias("ys")))
    return arr.select(
        "pair",
        F.slice("xs", 1, _TP).alias("ax"), F.slice("ys", 1, _TP).alias("ay"),
        F.slice("xs", _SH + 1, _TP).alias("bx"),
        F.slice("ys", _SH + 1, _TP).alias("by"))


def _dp_col(combine):
    """Generic 2-D alignment DP over (ax, ay, bx, by) as nested Catalyst
    folds — pure codegen.  ``combine(cost, best)`` is the semiring step:
    DTW uses cost + best (min-sum), discrete Fréchet uses
    greatest(cost, best) (min-max / bottleneck).  Everything else — the
    fold walk, the BIG boundary sentinels, the left/up/diag plumbing — is
    identical, so the two entries share this one implementation."""
    def cost(i, j):
        dx = F.element_at("ax", i + 1) - F.element_at("bx", j + 1)
        dy = F.element_at("ay", i + 1) - F.element_at("by", j + 1)
        return dx * dx + dy * dy

    idx = F.sequence(F.lit(0), F.lit(_TP - 1))

    def next_row(prev, i):
        # inner fold: cells left to right; acc = the growing new row.
        # up = prev[j], diag = prev[j-1] (inf at j=0), left = last(acc)
        def cell(acc, j):
            up = F.element_at(prev, j + 1)
            diag = F.when(j == 0,
                          F.when(i == 0, F.lit(0)).otherwise(F.lit(_BIG))) \
                    .otherwise(F.element_at(prev, j))
            left = F.when(j == 0, F.lit(_BIG)) \
                    .otherwise(F.element_at(acc, F.size(acc)))
            best = F.least(up, diag, left)
            return F.array_append(acc, combine(cost(i, j), best))

        return F.aggregate(idx, F.array().cast("array<bigint>"), cell)

    # row -1: virtual boundary of +inf (diag handled at i=0,j=0 above)
    row_m1 = F.array_repeat(F.lit(_BIG).cast("bigint"), _TP)
    final = F.aggregate(idx, row_m1, next_row)
    return F.element_at(final, _TP)


def _dtw_col():
    return _dp_col(lambda c, b: c + b)


def _frechet_col():
    return _dp_col(F.greatest)


def g_dtw_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return (_paired(spark)
            .select("pair", _dtw_col().alias("dtw"))
            .orderBy("pair"))


def g_frechet_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete Fréchet distance per pair — the BOTTLENECK member of the
    alignment-DP semiring family: min over monotone warps of the MAX
    per-step cost (Eiter-Mannila 1994, public algorithm), vs DTW's min of
    the SUM and Viterbi's min-plus chain.  The dog-leash trajectory metric
    that is robust to a few bad legs (one outlier leg bounds the score
    instead of accumulating into it).  Same corpus, same nested fold, one
    combiner swap — and frechet <= dtw per pair by construction (a warp's
    max never exceeds its sum of non-negative costs), pytest-gated."""
    return (_paired(spark)
            .select("pair", _frechet_col().alias("frechet"))
            .orderBy("pair"))


def _sql_costs() -> str:
    """Per-pair cost matrix columns dx{i}_{j} from the pivoted walks."""
    cols = []
    for i in range(_TP):
        for j in range(_TP):
            cols.append(
                f"(a.x{i} - b.x{j}) * (a.x{i} - b.x{j})"
                f" + (a.y{i} - b.y{j}) * (a.y{i} - b.y{j}) AS dx{i}_{j}")
    return ", ".join(cols)


def _sql_walk(shift: int) -> str:
    """Pivot walk cells t in [shift, shift+_TP) into x0.. / y0.. columns."""
    xs = ", ".join(
        f"max(CASE WHEN t = {t + shift} THEN cx END) AS x{t}, "
        f"max(CASE WHEN t = {t + shift} THEN cy END) AS y{t}"
        for t in range(_TP))
    return f"""
  SELECT traj AS pair, {xs}
  FROM cells WHERE t >= {shift} AND t < {shift + _TP} GROUP BY traj"""


def _sql_anchor(comb) -> str:
    # dp[0][0] = cost; dp[0][j] = comb(cost, left).  The left neighbor is
    # INLINED (each cell's expression embeds the previous once — linear
    # growth): a bare lateral alias would be shadowed by the recursive
    # table's same-named column in the step, silently computing a
    # different recurrence (caught by the oracle diff).
    exprs = ["dx0_0"]
    for j in range(1, _TP):
        exprs.append(comb(f"dx0_{j}", f"({exprs[j - 1]})"))
    return ", ".join(f"{e} AS c{j}" for j, e in enumerate(exprs))


def _sql_step(comb) -> str:
    # dp[i][0] = comb(cost, up); dp[i][j] = comb(cost, least(up, diag, left))
    def cost(j):
        branches = " ".join(
            f"WHEN {i} THEN o.dx{i}_{j}" for i in range(1, _TP))
        return f"CASE p.i + 1 {branches} END"

    exprs = [comb(cost(0), "p.c0")]
    for j in range(1, _TP):
        exprs.append(comb(
            cost(j), f"least(p.c{j}, p.c{j - 1}, ({exprs[j - 1]}))"))
    return ", ".join(f"{e} AS c{j}" for j, e in enumerate(exprs))


def _comb_sum(c: str, b: str) -> str:
    return f"{c} + {b}"


def _comb_max(c: str, b: str) -> str:
    return f"greatest({c}, {b})"


_SQL_PAIR_CTES = f"""raw AS (
  SELECT range // {_T} AS traj, range % {_T} AS t,
         CASE WHEN range % {_T} = 0
              THEN 64 + CAST(concat('0x', substring(md5(
                concat(CAST(range // {_T} AS VARCHAR), '_sx')), 1, 4))
                AS BIGINT) % 128
              ELSE CAST(concat('0x', substring(md5(
                concat(CAST(range // {_T} AS VARCHAR), '_',
                       CAST(range % {_T} AS VARCHAR), '_mx')), 1, 4))
                AS BIGINT) % 3 - 1 END AS dcx,
         CASE WHEN range % {_T} = 0
              THEN 64 + CAST(concat('0x', substring(md5(
                concat(CAST(range // {_T} AS VARCHAR), '_sy')), 1, 4))
                AS BIGINT) % 128
              ELSE CAST(concat('0x', substring(md5(
                concat(CAST(range // {_T} AS VARCHAR), '_',
                       CAST(range % {_T} AS VARCHAR), '_my')), 1, 4))
                AS BIGINT) % 3 - 1 END AS dcy
  FROM range({60 * _T})
), cells AS MATERIALIZED (
  SELECT traj, t,
         sum(dcx) OVER (PARTITION BY traj ORDER BY t) AS cx,
         sum(dcy) OVER (PARTITION BY traj ORDER BY t) AS cy
  FROM raw
), wa AS MATERIALIZED ({_sql_walk(0)}
), wb AS MATERIALIZED ({_sql_walk(_SH)}
), costs AS MATERIALIZED (
  SELECT a.pair, {_sql_costs()}
  FROM wa a JOIN wb b USING (pair)
)"""


def _sql_dp(comb, outname: str) -> str:
    return f"""
WITH RECURSIVE {_SQL_PAIR_CTES}, dp AS (
  SELECT pair, 0 AS i, {_sql_anchor(comb)} FROM costs
  UNION ALL
  SELECT o.pair, p.i + 1 AS i, {_sql_step(comb)}
  FROM dp p JOIN costs o ON o.pair = p.pair WHERE p.i + 1 < {_TP}
)
SELECT pair, CAST(c{_TP - 1} AS BIGINT) AS {outname}
FROM dp WHERE i = {_TP - 1} ORDER BY pair
"""


SQL_DTW_PAIRS = _sql_dp(_comb_sum, "dtw")
SQL_FRECHET_PAIRS = _sql_dp(_comb_max, "frechet")


QUERIES = {
    "geo_dtw_pairs": (g_dtw_pairs, SQL_DTW_PAIRS),
    "geo_frechet_pairs": (g_frechet_pairs, SQL_FRECHET_PAIRS),
}
