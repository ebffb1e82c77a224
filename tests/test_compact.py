"""Cover compaction (operators/compact.py): quad-merge semantics and
leaf-count preservation."""

from pyspark.sql import functions as F

from conftest import SF_DIR


def _pack(bits, nbits):
    return (bits << 6) | nbits


def _compact(spark, cells, min_depth=4):
    from co_new_spark.operators.compact import compact_cover

    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    return sorted(r["cell"] for r in compact_cover(df, min_depth=min_depth).collect())


def test_complete_quad_merges(spark):
    parent = _pack(0b101101, 6)
    kids = [_pack((0b101101 << 2) | k, 8) for k in range(4)]
    assert _compact(spark, kids) == [parent]


def test_partial_quad_untouched(spark):
    kids = [_pack((0b101101 << 2) | k, 8) for k in range(3)]
    assert _compact(spark, kids) == sorted(kids)


def test_cascade_two_levels(spark):
    gp = _pack(0b1011, 4 + 2)  # depth-6 grandparent
    grandkids = [_pack((0b1011 << 4) | k, 10) for k in range(16)]
    assert _compact(spark, grandkids) == [gp]


def test_min_depth_floor_respected(spark):
    # 4 complete depth-6 siblings would merge to depth 4, but min_depth=6 stops it
    kids = [_pack((0b10 << 2) | k, 6) for k in range(4)]
    assert _compact(spark, kids, min_depth=6) == sorted(kids)


def test_mixed_depth_and_duplicates(spark):
    parent = _pack(0b111111, 6)
    kids = [_pack((0b111111 << 2) | k, 8) for k in range(4)]
    lone = _pack(0b0001, 4)
    got = _compact(spark, kids + kids + [lone])  # duplicates collapse first
    assert got == sorted([parent, lone])


def test_leaf_count_preserved_on_events(spark):
    """Compaction must repartition the SAME leaf set: sum of 4^((12-d)/2)
    over the compacted cover == number of distinct depth-12 input cells."""
    from co_new_spark.operators.compact import compact_cover
    from co_new_spark.functions import geo
    from co_new_spark.queries.geospatial import _event_points

    for rbits, must_merge in ((8, False), (4, True)):
        cells = _event_points(spark, SF_DIR).select(
            geo.xy_to_cell_b(F.col("x"), F.col("y"), rbits).alias("cell"))
        n_leaves = cells.filter(F.col("cell") >= 0).distinct().count()
        out = compact_cover(cells, min_depth=4)
        top = 4 + rbits
        got = out.select(
            F.pow(F.lit(4.0), (F.lit(top) - F.col("depth")) / 2).cast("long")
            .alias("w")).agg(F.sum("w")).first()[0]
        assert got == n_leaves
        if must_merge:  # at rbits=4 the 1k-event set saturates its quads
            assert out.count() < n_leaves


def test_dilate_adds_shell_and_keeps_core(spark):
    from co_new_spark.queries.geo_algebra import g_cover_dilate
    from co_new_spark.queries.geospatial import _event_points
    from co_new_spark.functions import geo

    out = {r["cell"]: r["is_core"] for r in g_cover_dilate(spark, SF_DIR).collect()}
    core = {r["cell"] for r in
            _event_points(spark, SF_DIR)
            .withColumn("cell", geo.xy_to_cell_b(F.col("x"), F.col("y"), 4))
            .filter(F.col("cell") >= 0).select("cell").distinct().collect()}
    assert core <= set(out)                       # dilation is a superset
    assert all(out[c] for c in core)              # core flagged
    shell = {c for c, k in out.items() if not k}
    assert shell and shell.isdisjoint(core)       # a real shell was added


def test_region_centroid_inside_cell_and_snap_consistent(spark):
    from co_new_spark.functions import cells_sql
    from co_new_spark.queries.geospatial import g_region_centroid

    out = g_region_centroid(spark, SF_DIR)
    # the centroid of a convex cell's members lies inside the cell, so the
    # depth-12 snap cell must be a descendant of the depth-8 source cell
    bad = out.filter(
        (F.col("snap_cell") < 0)
        | ~cells_sql.cell_contains(F.col("cell"), F.col("snap_cell")))
    assert bad.count() == 0
    assert out.count() > 0
