"""Linear-sketch frequency estimation (queries/training15.py).

The oracle gate proves cross-engine identity; these tests pin the sketch
SEMANTICS against an independent pure-python sketch built from the same
token stream (both engines could in principle share a mirrored hashing
bug — python's hashlib breaks that symmetry), plus the two estimator
guarantees: CMS never undercounts, and Count-Sketch's median is the true
median of the five signed per-row estimates.
"""

import hashlib

from pyspark.sql import functions as F

from co_new_spark.queries.training15 import (_D_CMS, _D_CS, _W, _toks,
                                             t_count_min, t_count_sketch)
from co_new_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _b(d: int, tok: str) -> int:
    return int(hashlib.md5(f"{d}#{tok}".encode()).hexdigest()[:6], 16) % _W


def _s(d: int, tok: str) -> int:
    return 1 if hashlib.md5(f"s{d}#{tok}".encode()).hexdigest()[0] < "8" \
        else -1


def _py_tokens(spark):
    rows = load(spark, SF, "documents").select("text").collect()
    out = []
    for r in rows:
        out.extend(r.text.split(" "))
    return out


def test_count_min_matches_python_sketch(spark):
    toks = _py_tokens(spark)
    sk = {}
    for t in toks:
        for d in range(_D_CMS):
            k = (d, _b(d, t))
            sk[k] = sk.get(k, 0) + 1
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    got = t_count_min(spark, SF).collect()
    assert got, "no candidates"
    for r in got:
        assert r.exact == exact[r.token]
        assert r.cms_est == min(sk[(d, _b(d, r.token))]
                                for d in range(_D_CMS))
        assert r.overcount == r.cms_est - r.exact
        assert r.overcount >= 0  # the CMS guarantee


def test_count_sketch_matches_python_sketch(spark):
    toks = _py_tokens(spark)
    sk = {}
    for t in toks:
        for d in range(_D_CS):
            k = (d, _b(d, t))
            sk[k] = sk.get(k, 0) + _s(d, t)
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    got = t_count_sketch(spark, SF).collect()
    assert got
    for r in got:
        ests = sorted(_s(d, r.token) * sk[(d, _b(d, r.token))]
                      for d in range(_D_CS))
        assert r.cs_est == ests[_D_CS // 2]
        assert r.exact == exact[r.token]


def test_sketch_is_fixed_size(spark):
    """The sketch never exceeds D*W cells regardless of stream size —
    the property that makes it a sketch."""
    toks = _toks(spark, SF)
    d = F.explode(F.array(*[F.lit(i) for i in range(_D_CMS)])).alias("d")
    from co_new_spark.queries.training15 import _bucket
    n = (toks.select(d, "tok")
         .select("d", _bucket(F.col("d"), F.col("tok")).alias("b"))
         .groupBy("d", "b").count().count())
    assert n <= _D_CMS * _W
