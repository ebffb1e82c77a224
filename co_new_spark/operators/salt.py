"""Skew handling: two-phase salted aggregation + AQE configuration (north rule).

The pages fixture is intentionally Bogotá-hot (>=35% of rows land in L0 cell
``c``, 10% within 30 km of one point — FIXTURES.md §1).  Where salting is and
is not needed:

* algebraic aggs (count/sum/min/max): Spark's map-side partial aggregation
  already compresses each hot key to one row per map task — NO salt needed;
* holistic aggs (collect_list/set, exact ranks) and **window functions**
  partitioned by a hot key: all rows of the key land on one reducer — salt;
* joins on hot keys: AQE skew-join splitting (plans.session enables
  spark.sql.adaptive.skewJoin) splits oversized partitions at runtime.

The helpers here implement the two-phase (key, salt) -> key pattern for the
holistic cases; phase-1/phase-2 aggregate pairs are explicit so only
decomposable aggregates can be expressed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int = 16, salt_col: str = "__salt",
              cols: list[str] | None = None) -> DataFrame:
    """Deterministic row salt in [0, n_salt) — spreads hot keys over reducers.

    Salt derives from a hash of ROW CONTENT (``cols``, default all columns) —
    never from monotonically_increasing_id/rand, which change under task
    retry/speculation and silently corrupt shuffle outputs (SPARK-23207
    pattern: recomputed map tasks re-salt rows differently while reducers
    keep already-fetched data).  Fully duplicate rows share a salt; that
    only matters for pathological all-identical-row keys.
    """
    cols = cols or df.columns
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    phase1: dict[str, Column],
    phase2: dict[str, Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys+salt) -> groupBy(keys).

    ``phase1``: output_name -> aggregate over raw rows.
    ``phase2``: output_name -> aggregate over phase-1 outputs (refer to
    phase-1 names).  Example::

        salted_agg(df, ["cell"],
                   {"n": F.count("*"), "s": F.sum("v")},
                   {"n": F.sum("n"), "s": F.sum("s")})
    """
    salted = with_salt(df, n_salt)
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in phase1.items()])
    return p1.groupBy(*keys).agg(*[c.alias(n) for n, c in phase2.items()])


def salted_count(df: DataFrame, keys: list[str], n_salt: int = 16) -> DataFrame:
    return salted_agg(df, keys,
                      {"n": F.count("*")}, {"n": F.sum("n")}, n_salt)


def salted_topk(df: DataFrame, keys: list[str], order: Column, k: int,
                n_salt: int = 16) -> DataFrame:
    """Top-k rows per key without a single-reducer window over hot keys.

    Phase 1 ranks within (key, salt) — hot keys split across n_salt reducers;
    phase 2 ranks the surviving k*n_salt rows per key (tiny).  Output carries
    the final ``rn`` (1..k) per key.  ``order`` must be deterministic (add a
    tiebreak column) for exact parity with a direct window.
    """
    from pyspark.sql import Window

    order_cols = list(order) if isinstance(order, (list, tuple)) else [order]
    salted = with_salt(df, n_salt)
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order_cols)
    p1 = salted.withColumn("__rn1", F.row_number().over(w1)) \
               .filter(F.col("__rn1") <= k)
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return (p1.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= k)
            .drop("__salt", "__rn1"))
