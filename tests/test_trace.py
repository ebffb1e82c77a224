"""Segment -> cell trace (operators/trace.py)."""

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_endpoint_cells_always_included(spark):
    from co_new_spark.functions import geo
    from co_new_spark.queries.geospatial import _event_points, g_segment_cells

    out = g_segment_cells(spark, SF_DIR)
    cells = {(r["event_id"], r["cell"]) for r in out.collect()}
    pts = _event_points(spark, SF_DIR).filter(F.col("event_id") < 100) \
        .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 8))
    for r in pts.filter(F.col("cell") >= 0).collect():
        assert (r["event_id"], r["cell"]) in cells


def test_degenerate_segment_is_single_cell(spark):
    from co_new_spark.operators.trace import segment_cells

    # centre of L0 cell ji=22 (the 'c' cell) — guaranteed on-grid
    df = spark.createDataFrame([(1, 3678500.0 + 2.5 * 524288, 970000.0 + 2.5 * 524288)],
                               "sid long, x double, y double")
    out = segment_cells(df, F.col("x"), F.col("y"), F.col("x"), F.col("y"),
                        rbits=8, keep=["sid"])
    assert out.count() == 1


def test_cell_count_bounded_by_samples(spark):
    from co_new_spark.queries.geospatial import g_segment_cells

    per_seg = (g_segment_cells(spark, SF_DIR)
               .groupBy("event_id").agg(F.count("*").alias("n")).collect())
    assert per_seg
    for r in per_seg:
        assert 1 <= r["n"] <= 65


def test_power_of_two_guard():
    from co_new_spark.operators.trace import segment_cells

    with pytest.raises(ValueError):
        segment_cells(None, None, None, None, None, rbits=8, n_samples=60)
