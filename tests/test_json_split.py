"""Splittable JSON-array parse vs python's stdlib json (external anchor)."""

import hashlib
import json

import pytest

from co_new_spark.queries.json_q import _CH, _NR, _NSH


def _obj(sh, r):
    a6 = hashlib.md5(f"{sh}_{r}_a6".encode()).hexdigest()[:6]
    b4 = hashlib.md5(f"{sh}_{r}_b4".encode()).hexdigest()[:4]
    c4 = hashlib.md5(f"{sh}_{r}_c4".encode()).hexdigest()[:4]
    if r % 5 == 0:
        A, cls, val = f'{a6}\\"{b4}', 1, f'{a6}"{b4}'
    elif r % 7 == 0:
        A, cls, val = a6 + "{,}" + b4, 2, a6 + "{,}" + b4
    elif r % 11 == 0:
        A, cls, val = f"{c4}\\\\{b4}", 3, f"{c4}\\{b4}"
    else:
        A, cls, val = a6, 0, a6
    n = 1000 + int(hashlib.md5(f"{sh}_{r}_n".encode()).hexdigest()[:4], 16) % 9000
    return '{"id":"r%04d","a":"%s","b":%d}' % (r, A, n), cls, val, n


@pytest.fixture(scope="module")
def blobs():
    return {sh: "[" + ",".join(_obj(sh, r)[0] for r in range(_NR)) + "]"
            for sh in range(_NSH)}


def test_stdlib_json_agrees_with_construction(blobs):
    for sh, blob in blobs.items():
        rows = json.loads(blob)
        assert len(rows) == _NR
        for r, o in enumerate(rows):
            _, _, val, n = _obj(sh, r)
            assert (o["id"], o["a"], o["b"]) == (f"r{r:04d}", val, n)


def test_engine_offsets_slice_the_blob_exactly(spark, blobs):
    from co_new_spark.queries.json_q import g_json_split

    rows = g_json_split(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _NSH * _NR
    for row in rows:
        blob = blobs[row.shard]
        text = blob[row.start:row.start + row.len]
        want, cls, _, _ = _obj(row.shard, row.rid)
        assert text == want, (row.shard, row.rid)
        assert blob[row.start + row.len] in ",]"
        assert (row.n_keys, row.quoted_class) == (3, cls)
        assert row.esc == (1 if cls in (1, 3) else 0)


def test_corpus_exercises_boundary_states(blobs):
    # both the in-string state AND the pending-escape state must cross
    # chunk edges, or the transfer-table composition is never load-bearing
    strad_str = strad_esc = 0
    for blob in blobs.values():
        st, open_at = 0, None
        for i, ch in enumerate(blob):
            if st == 0:
                if ch == '"':
                    st, open_at = 1, i
            elif st == 1:
                if ch == "\\":
                    st = 2
                elif ch == '"':
                    st = 0
                    if open_at // _CH != i // _CH:
                        strad_str += 1
            else:
                if (i - 1) // _CH != i // _CH:
                    strad_esc += 1
                st = 1
    assert strad_str > 0 and strad_esc > 0, (strad_str, strad_esc)
