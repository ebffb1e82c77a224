"""Regenerate the committed deterministic pages fixture.

tests/fixtures/pages2k.parquet is the synthetic Common-Crawl-style pages
table (sources/pages.py, 2,000 rows) written ONCE and committed, so that
DuckDB oracle SQL can read the exact same bytes the Spark queries read —
pages-based entries become driver-hash-checkable instead of rows-only.
Content is a pure function of row id; rerunning this script reproduces the
same rows (row order inside the single parquet file included, since the
generator is a narrow projection over spark.range).

    python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures")
PAGES_2K = os.path.join(FIXTURE_DIR, "pages2k.parquet")
N = 2_000


def main() -> None:
    from co_new_spark.plans.session import get_spark
    from co_new_spark.sources.pages import pages

    spark = get_spark(app="make-fixtures", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    df = pages(spark, N, partitions=1)
    df.coalesce(1).write.mode("overwrite").parquet(PAGES_2K + ".tmp")
    # keep a single stable .parquet file (no _SUCCESS/part-* clutter in git)
    import glob
    import shutil

    part = glob.glob(os.path.join(PAGES_2K + ".tmp", "part-*.parquet"))[0]
    if os.path.exists(PAGES_2K):
        os.remove(PAGES_2K)
    shutil.move(part, PAGES_2K)
    shutil.rmtree(PAGES_2K + ".tmp")

    import duckdb

    n, h = duckdb.sql(
        f"SELECT count(*), sum(hash(url || text || lang)) "
        f"FROM read_parquet('{PAGES_2K}')").fetchone()
    print(f"wrote {PAGES_2K}: {n} rows, content hash {h}")


if __name__ == "__main__":
    main()
