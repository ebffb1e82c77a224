"""Spark-surface tests: UDF wrappers, native cell algebra, pages source."""

import numpy as np
from pyspark.sql import functions as F

from co_new_spark.functions import cells_sql, geo, text as tx
from co_new_spark.grid import cells as ncells
from co_new_spark.sources.pages import pages

ASSERTS = [
    ("geo:3.46103000261,-76.57770034945", "GF1ZDW6NY"),
    ("geo:3.46103208489,-76.57391243547", "GF1ZSNQV7"),
    ("geo:3.45834677198,-76.57390575999", "GF1ZLKNU4"),
    ("geo:3.45834677198,-76.57770076667", "GF1Z6T4KC"),
    ("geo:4.711111,-74.072222", "HX7VGYKPW"),
]


def test_encode_a_udf(spark):
    df = spark.createDataFrame([(u,) for u, _ in ASSERTS], ["uri"])
    out = df.select(
        geo.encode_a(geo.geo_uri_lat(F.col("uri")), geo.geo_uri_lon(F.col("uri"))).alias("c1"),
        geo.encode_a_from_uri(F.col("uri")).alias("c2"),
    ).collect()
    exp = [c for _, c in ASSERTS]
    assert [r.c1 for r in out] == exp
    assert [r.c2 for r in out] == exp


def test_cell_b_udf_and_native_algebra(spark):
    df = spark.createDataFrame(
        [(-4.21528, -69.94056), (5.5353, -73.3678), (40.0, -3.7)], ["lat", "lon"]
    )
    out = df.select(
        geo.encode_b_cell(F.col("lat"), F.col("lon"), 12).alias("cell")
    ).withColumn("code", geo.cell_b_code(F.col("cell"))) \
     .withColumn("parent", cells_sql.cell_parent(F.col("cell"), 4)) \
     .withColumn("pcode", geo.cell_b_code(F.col("parent"))) \
     .withColumn("half", geo.cell_b_code(cells_sql.cell_parent(F.col("cell"), 2))) \
     .withColumn("l0", cells_sql.cell_l0_digit(F.col("cell"))) \
     .withColumn("contained", cells_sql.cell_contains(F.col("parent"), F.col("cell"))) \
     .collect()
    assert out[0].code == "a0ec" and out[0].pcode == "a0e" and out[0].l0 == 0xA
    assert out[0].half == "a0eV"  # 2-bit drop = half-cell, suffix V=0b11
    assert out[1].code == "c358" and out[1].l0 == 0xC
    assert out[0].contained and out[1].contained
    assert out[2].cell == -1 and out[2].code is None and out[2].l0 == -1


def test_native_interval_matches_numpy(spark):
    codes = ["a0ec", "8Z", "c358G", "67d9fM", "0"]
    df = spark.createDataFrame([(c,) for c in codes], ["code"])
    lo, hi = cells_sql.cell_interval(F.col("cell"))
    out = (df.withColumn("cell", geo.cell_b_from_code(F.col("code")))
             .withColumn("lo", lo).withColumn("hi", hi).collect())
    cell_np = ncells.cell_b_from_code(np.array(codes))
    lo_np, hi_np = ncells.interval(cell_np)
    assert [r.lo for r in out] == lo_np.tolist()
    assert [r.hi for r in out] == hi_np.tolist()
    # children native == numpy
    ch = df.withColumn("cell", geo.cell_b_from_code(F.col("code"))) \
           .select(cells_sql.cell_children(F.col("cell"), 2).alias("ch")).collect()
    ch_np = ncells.children(cell_np, 2)
    assert [r.ch for r in ch] == ch_np.tolist()


def test_pages_source_contracts(spark):
    df = pages(spark, 4000, with_truth=True).cache()
    n = df.count()
    assert n == 4000
    # dedup contract: identical html bytes per url
    grp = df.groupBy("url").agg(
        F.countDistinct(F.md5(F.col("html"))).alias("nh"),
        F.count("*").alias("cnt"),
    )
    assert grp.filter(F.col("nh") > 1).count() == 0
    assert grp.filter(F.col("cnt") > 1).count() > 0
    # extraction invariant: extract_text(html) == text byte-identically
    bad = df.withColumn("ex", tx.extract_text(F.col("html"))) \
            .filter(F.col("ex") != F.col("text")).count()
    assert bad == 0
    # language mix
    langs = {r.lang: r.cnt for r in df.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert langs["es"] > langs["en"] > langs["pt"]
    # point distribution: geocode truth, >=30% in L0 'c', some NULLs
    g = df.withColumn("cell", geo.encode_b_cell(F.col("true_lat"), F.col("true_lon"), 12))
    stats = g.agg(
        F.sum(F.when(cells_sql.cell_l0_digit(F.col("cell")) == 0xC, 1).otherwise(0)).alias("in_c"),
        F.sum(F.when(F.col("cell") == -1, 1).otherwise(0)).alias("off"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert stats.in_c / stats.n >= 0.30
    assert 0.005 <= stats.off / stats.n <= 0.05
    df.unpersist()


def test_geoparse_pipeline(spark):
    df = pages(spark, 2000, with_truth=True)
    parsed = df.select(
        "true_lat", "true_lon",
        tx.parse_lat(F.col("text")).alias("lat"),
        tx.parse_lon(F.col("text")).alias("lon"),
    )
    got = parsed.filter(F.col("lat").isNotNull())
    # ~90% of pages carry coordinates in one of the two formats
    assert got.count() / df.count() > 0.80
    err = got.select(
        F.max(F.abs(F.col("lat") - F.col("true_lat"))).alias("e1"),
        F.max(F.abs(F.col("lon") - F.col("true_lon"))).alias("e2"),
    ).collect()[0]
    assert err.e1 < 1e-6 and err.e2 < 1e-6


def test_text_analysis_native(spark):
    df = spark.createDataFrame(
        [("El informe de la ciudad es claro y los datos son buenos",),
         ("The report of the city is clear and the data is good",),
         ("",)],
        ["text"],
    )
    out = df.select(
        tx.token_count(F.col("text")).alias("tc"),
        tx.lang_guess(F.col("text")).alias("lg"),
        tx.quality_score(F.col("text")).alias("q"),
    ).collect()
    assert out[0].tc == 12 and out[0].lg == "es"
    assert out[1].lg == "en"
    assert out[2].tc == 0 and out[2].lg == "und"
    assert 0.0 <= out[0].q <= 1.0


def test_sql_registered_functions_bit_exact(spark):
    """The SQL surface (reference entry-point shape) hits the same kernels:
    osmcode_encode over gridLib.sql's own assert vectors, via spark.sql."""
    from co_new_spark.plans.register import register_functions

    register_functions(spark)
    rows = [("geo:3.46103000261,-76.57770034945", "GF1ZDW6NY"),
            ("geo:4.711111,-74.072222", "HX7VGYKPW")]
    spark.createDataFrame(rows, ["uri", "expected"]).createOrReplaceTempView("v_assert")
    got = spark.sql("SELECT uri, osmcode_encode(uri) AS code, expected FROM v_assert").collect()
    for r in got:
        assert r.code == r.expected, (r.uri, r.code)
    # decode round-trip through SQL
    back = spark.sql(
        "SELECT osmcode_decode(osmcode_encode(uri)) AS c FROM v_assert").collect()
    assert abs(back[0].c.lat - 3.46103000261) < 1e-5


def test_sql_pipeline_matches_dataframe_pipeline(spark):
    from co_new_spark.plans.register import example_sql_pipeline

    out = example_sql_pipeline(spark, 2_000).collect()
    assert len(out) >= 10  # most L0 cells hit
    assert all(len(r.l0_code) == 1 for r in out)  # single base16h digit
    assert sum(r.n_pages for r in out) > 1500


def test_flagship_deterministic_across_runs(spark):
    """Run-twice determinism (SURVEY §5.2.6): identical results, identical
    ordering-insensitive content, across different partitionings."""
    from co_new_spark.queries.geo_pages import g_cover_lookup

    a = sorted(map(tuple, g_cover_lookup(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, g_cover_lookup(spark, "/root/testdata/sf0.001").collect()))
    assert a == b and len(a) > 0


def test_parse_all_geo_uris_multi_hit(spark):
    """A27: every geo: URI in a document is extracted, in order."""
    from co_new_spark.functions.text import parse_all_geo_uris

    txt = ("ver geo:4.711111,-74.072222 y también geo:6.2442,-75.5812 "
           "y coordenadas sueltas 3.451, -76.532 al final")
    df = spark.createDataFrame([(txt,), ("sin coordenadas",)], ["text"])
    got = df.select(parse_all_geo_uris(F.col("text")).alias("hits")).collect()
    hits = got[0].hits
    assert len(hits) == 2
    assert abs(hits[0].lat - 4.711111) < 1e-9 and abs(hits[1].lon + 75.5812) < 1e-9
    assert got[1].hits == []


def test_seat_cells_match_known_seats(spark):
    """A22: decoded overlay centers land near the real municipality seats."""
    from co_new_spark.queries.geo_algebra import g_seat_cells

    from co_new_spark.grid import proj

    out = g_seat_cells(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) >= 334  # all non-empty overlays
    assert out.roundtrip_ok.all()  # inverse->forward TM closes within 1e-6 m
    lat, lon = proj.inverse(out.cx.to_numpy(), out.cy.to_numpy())
    out = out.assign(seat_lat=lat, seat_lon=lon)
    let = out[out.isolabel_ext == "CO-AMA-Leticia"].iloc[0]
    assert abs(let.seat_lat - (-4.215)) < 0.2 and abs(let.seat_lon - (-69.94)) < 0.2
    med = out[out.isolabel_ext == "CO-ANT-Medellin"]
    if len(med):
        assert abs(med.iloc[0].seat_lat - 6.244) < 0.3


def test_geoparse_grammar_parity_native_vs_fused(spark):
    """The native (Java regex) and fused (RE2) geoparse paths must agree,
    including on the pinned [ \\t] pair separator — \\s engines disagree on
    vertical tab / NBSP, so those must parse in NEITHER path."""
    from co_new_spark.functions import geo
    from co_new_spark.functions import text as txf

    rows = [
        ("geo:4.711111,-74.072222 x",),       # geo URI
        ("las 4.711111, -74.072222 aqui",),   # space separator
        ("las 4.711111,\t-74.072222 aqui",),  # tab separator
        ("las 4.711111,\x0b-74.072222 no",),  # vertical tab: must NOT parse
        ("las 4.711111, -74.072222 no",),  # NBSP: must NOT parse
        ("sin coordenadas",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    native = df.select(
        geo.encode_b_cell(txf.parse_lat(F.col("text")),
                          txf.parse_lon(F.col("text")), 12).alias("cell")).collect()
    fused = df.select(
        geo.encode_b_cell_from_text(F.col("text"), 12).alias("cell")).collect()
    n = [r.cell for r in native]
    f = [r.cell for r in fused]
    assert n == f, (n, f)
    assert n[0] >= 0 and n[1] >= 0 and n[2] >= 0
    assert n[3] == -1 and n[4] == -1 and n[5] == -1


def test_materialize_pages_roundtrip(spark, tmp_path):
    """Stored pages == generated pages (same rows), and re-materializing is
    an idempotent no-op (marker short-circuit)."""
    import os

    from pyspark.sql import functions as F

    from co_new_spark.sources.pages import materialize_pages, pages

    p = str(tmp_path / "pages_rt")
    path = materialize_pages(spark, 1_000, path=p, partitions=4)
    stored = spark.read.parquet(path)
    gen = pages(spark, 1_000, partitions=4)
    assert stored.count() == 1_000
    # order-insensitive equality on the full row set
    h = lambda df: df.select(F.expr("bit_xor(xxhash64(url, text, lang))")).collect()[0][0]
    assert h(stored) == h(gen)
    mtime = os.path.getmtime(os.path.join(path, "_co_pages_meta.json"))
    assert materialize_pages(spark, 1_000, path=p) == path
    assert os.path.getmtime(os.path.join(path, "_co_pages_meta.json")) == mtime


def test_bench_headline_names_resolve():
    """Every bench-suite entry must exist in the query registry — a rename
    in queries/ without a bench.py update would crash the driver's
    per-round bench run."""
    import bench
    from co_new_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dup timings
