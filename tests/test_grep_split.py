"""Overlap-split pattern search vs python re.finditer (external anchor)."""

import hashlib
import re

import pytest

from co_new_spark.queries.grep_q import _CH, _L, _NSH, _NT, _PATS


def _blob(sh):
    toks = []
    for r in range(_NT):
        h = hashlib.md5(f"{sh}_{r}_t".encode()).hexdigest()
        if r % 5 == 0:
            toks.append(_PATS[0] + h[:9])
        elif r % 7 == 0:
            toks.append(_PATS[1] + h[:9])
        elif r % 11 == 0:
            toks.append(_PATS[2] + h[:9])
        else:
            toks.append(h[:16])
    return "".join(toks)


@pytest.fixture(scope="module")
def blobs():
    return {sh: _blob(sh) for sh in range(_NSH)}


def test_engine_matches_re_finditer(spark, blobs):
    from co_new_spark.queries.grep_q import g_grep_split

    want = sorted(
        (sh, p, m.start())
        for sh, blob in blobs.items()
        for p, pat in enumerate(_PATS)
        for m in re.finditer(re.escape(pat), blob))
    got = sorted((r.shard, r.pat, r.off) for r in
                 g_grep_split(spark, "/root/testdata/sf0.001").collect())
    assert got == want


def test_some_matches_straddle_chunk_edges(blobs):
    # the overlap must be load-bearing: at least one planted pattern spans
    # a chunk boundary
    straddles = sum(
        1
        for blob in blobs.values()
        for pat in _PATS
        for m in re.finditer(re.escape(pat), blob)
        if m.start() // _CH != (m.start() + _L - 1) // _CH)
    assert straddles > 0


def test_scan_phase_is_udf_free(spark):
    # only the fixture chunker crosses into python; the match enumeration
    # itself is a Catalyst HOF inside codegen
    from co_new_spark.queries.grep_q import g_grep_split

    plan = g_grep_split(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1  # the chunker only
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
