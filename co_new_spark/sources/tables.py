"""Loaders for the driver-generated parquet tables (TESTDATA.md).

At scale these reads are the engine's B1 source: plain columnar parquet with
predicate pushdown + column pruning via the DSv2 scan.  (Iceberg catalogs slot
in behind the same call when a runtime jar is present — sandbox has none, see
SURVEY.md §7 R4.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
