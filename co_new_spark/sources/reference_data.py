"""Loaders for the reference's dimension fixtures (read-only inputs).

* citycover — /root/reference/data/citycover.csv: per-municipality grid-cell
  cover lists in base16h (1,116 rows, 14,165 cells).  Parser requirements
  (FIXTURES.md §4): tolerate the literal ``NULL`` token inside the cover list
  (line 325, CO-BOY-Tunja, the only status=1 row); accept the full suffix
  grammar.
* synonym — /root/reference/data/synonym.csv: abbreviation dimension
  (7,660 rows; 1,116 default DANE abbrevs).
* admin polygons — /root/reference/data/grid256L0coverage.geojson: Colombia
  land+sea clip per L0 cell (16 features, 40,405 vertices), pre-projected to
  EPSG:9377 for planar point-in-polygon.

These are broadcast-sized dimensions: loaded via pandas on the driver, handed
to Spark as small DataFrames, and always joined with ``F.broadcast``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import cells as ncells
from ..grid import proj

REF_DIR = os.environ.get("CO_REFERENCE_DIR", "/root/reference")


def _cover_pdf() -> pd.DataFrame:
    """citycover.csv -> exploded pandas (isolabel_ext, kind, code, cell, depth)."""
    raw = pd.read_csv(os.path.join(REF_DIR, "data", "citycover.csv"),
                      dtype=str, keep_default_na=False)
    rows: list[tuple[str, str, str]] = []
    for _, r in raw.iterrows():
        for kind in ("cover", "overlay"):
            for code in (r[kind] or "").split():
                if code == "NULL":  # literal token, citycover.csv:325
                    continue
                rows.append((r["isolabel_ext"], kind, code))
    pdf = pd.DataFrame(rows, columns=["isolabel_ext", "kind", "code"])
    cell = ncells.cell_b_from_code(pdf["code"].to_numpy(dtype=object))
    pdf["cell"] = cell
    pdf["depth"] = (cell & 63).astype(np.int64)
    assert (pdf["cell"] >= 0).all(), "unparseable cover code"
    return pdf


def load_citycover(spark: SparkSession) -> DataFrame:
    """Exploded cover fact: (isolabel_ext, kind, code, cell, depth, lo, hi)."""
    pdf = _cover_pdf()
    lo, hi = ncells.interval(pdf["cell"].to_numpy())
    pdf = pdf.assign(lo=lo, hi=hi)
    return spark.createDataFrame(pdf)


def load_synonym(spark: SparkSession) -> DataFrame:
    pdf = pd.read_csv(os.path.join(REF_DIR, "data", "synonym.csv"),
                      dtype=str, keep_default_na=False)
    pdf["selected"] = pdf["selected"] == "t"
    pdf["default_abbrev"] = pdf["default_abbrev"] == "t"
    pdf["abbrevref_id"] = pdf["abbrevref_id"].astype(int)
    return spark.createDataFrame(pdf)


def load_synonym_ref(spark: SparkSession) -> DataFrame:
    """synonym_ref.csv — abbreviation-provenance dim (5 rows): who registered
    each abbreviation family, with a JSON ``info`` column parsed via
    from_json (the reference's only JSON-in-CSV fixture).
    Source: /root/reference/data/synonym_ref.csv:1.
    """
    pdf = pd.read_csv(os.path.join(REF_DIR, "data", "synonym_ref.csv"),
                      dtype=str, keep_default_na=False)
    pdf["abbrevref_id"] = pdf["abbrevref_id"].astype(int)
    df = spark.createDataFrame(pdf)
    return df.withColumn(
        "info_map", F.from_json(F.col("info"), "map<string,string>"))


def load_admin_polygons() -> list[dict]:
    """grid256L0coverage features with rings pre-projected to EPSG:9377.

    Returns a plain python list (driver-side; broadcast via closure/SparkContext
    broadcast into the PIP pandas UDF).  Each: {feature_id, l0_digit,
    rings: [np.ndarray (n,2) in 9377]}.
    """
    with open(os.path.join(REF_DIR, "data", "grid256L0coverage.geojson")) as f:
        gj = json.load(f)
    out = []
    for feat in gj["features"]:
        geom = feat["geometry"]
        polys = geom["coordinates"] if geom["type"] == "MultiPolygon" else [geom["coordinates"]]
        rings = []
        for poly in polys:
            for ring in poly:
                arr = np.asarray(ring, dtype=np.float64)
                x, y = proj.forward(arr[:, 1], arr[:, 0])
                rings.append(np.stack([x, y], axis=1))
        props = feat.get("properties", {})
        out.append({
            "feature_id": str(props.get("code", props.get("id", len(out)))),
            "properties": props,
            "rings": rings,
        })
    return out
