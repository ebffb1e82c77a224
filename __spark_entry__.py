"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship pipeline smoke check (sf0.001-scale synthetic pages).
queries()       — every implemented operator (SURVEY.md §2) as (spark, sf_dir) -> DF.
oracle_sql()    — matching DuckDB SQL for the oracle-checkable subset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic pages -> geoparse -> Grid B geocode -> per-L0 agg.

    The driver's documents table carries no coordinates (TESTDATA/FIXTURES),
    so the pages fact table is self-generated (seeded, deterministic —
    co_new_spark.sources.pages) per FIXTURES.md §1; grid semantics per
    /root/reference/conf.yaml:21-26.
    """
    from pyspark.sql import functions as F

    from co_new_spark.functions import cells_sql, geo
    from co_new_spark.functions import text as txf
    from co_new_spark.sources.pages import stored_pages

    pg = stored_pages(spark, 5_000)
    parsed = pg.select(
        "url", "lang",
        txf.parse_lat(F.col("text")).alias("lat"),
        txf.parse_lon(F.col("text")).alias("lon"),
    ).filter(F.col("lat").isNotNull())
    cells = parsed.withColumn("cell", geo.encode_b_cell(F.col("lat"), F.col("lon"), 12))
    return (
        cells.withColumn("l0", cells_sql.cell_l0_digit(F.col("cell")))
        .groupBy("l0")
        .agg(F.count("*").alias("n_pages"), F.countDistinct("url").alias("n_urls"))
        .orderBy("l0")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from co_new_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from co_new_spark.queries import oracle_sqls

    return oracle_sqls()
