"""Query registry: name -> (spark_fn, oracle_sql | None).

Consumed by __spark_entry__.py (driver contract) and bench.py.
"""

from __future__ import annotations

from . import (
    csv_q, grep_q, json_q,
    geo_algebra, geo_cover_sql, geo_graph, geo_index, geo_pages, geo_wkb,
    geospatial,
    geo_1d, geo_contour, geo_dtw, geo_envelope, geo_resample, geo_hull, geo_match, geo_mst, geo_pack, geo_simplify, geo_sjoin, geo_skyline, geospatial2, media_q,
    pipeline_q, relational, relational2, e2e_q, scale_ops, streaming_q,
    training,
    training2, training3,
    training4, training5, training6, training7, training8, training9,
    training10, training11, training12, training13, training14, training15,
    training16, training17, training18, training19,
    warc2_q, warc_q, webgraph,
    webgraph2, webgraph3, webtext_q, webtext2, webtext3, webtext4, webtext5,
    webtext6, webtext7, webtext8,
)

REGISTRY: dict = {}
for _mod in (relational, relational2, training, geospatial, geospatial2,
             geo_algebra, geo_graph,
             geo_cover_sql, geo_index, geo_pages, geo_wkb, geo_1d,
             geo_contour, geo_dtw, geo_envelope, geo_resample, geo_hull, geo_match, geo_mst, geo_pack, geo_simplify, geo_sjoin, geo_skyline, csv_q, grep_q, json_q, training2,
             training3,
             training4, training5, training6, training7, training8,
             training9, training10, training11, training12, training13,
             training14, training15, training16, training17, training18, training19, webgraph,
             warc_q, warc2_q, webgraph2, webgraph3, webtext_q, webtext2,
             webtext3, webtext4,
             webtext5, webtext6, webtext7, webtext8, e2e_q,
             scale_ops,
             streaming_q, pipeline_q, media_q):
    REGISTRY.update(_mod.QUERIES)


def spark_queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sqls():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
