"""Splittable-CSV parse vs python's stdlib csv module (external anchor)."""

import csv
import hashlib
import io

import pytest

from co_new_spark.queries.csv_q import _CH, _NR, _NSH


def _f2(sh, r):
    a6 = hashlib.md5(f"{sh}_{r}_f2a".encode()).hexdigest()[:6]
    b4 = hashlib.md5(f"{sh}_{r}_f2b".encode()).hexdigest()[:4]
    c4 = hashlib.md5(f"{sh}_{r}_f2c".encode()).hexdigest()[:4]
    if r % 5 == 0:
        return f'"{a6},{b4}"', 1, f"{a6},{b4}"
    if r % 7 == 0:
        return f'"{a6}\n{b4}"', 2, f"{a6}\n{b4}"
    if r % 11 == 0:
        return f'"{c4}""{b4}"', 3, f'{c4}"{b4}'
    return a6, 0, a6


def _blob(sh):
    out = []
    for r in range(_NR):
        f2, _, _ = _f2(sh, r)
        out.append(
            f"r{r:04d},{hashlib.md5(f'{sh}_{r}_f1'.encode()).hexdigest()[:8]}"
            f",{f2},{hashlib.md5(f'{sh}_{r}_f3'.encode()).hexdigest()[:4]}\n")
    return "".join(out)


@pytest.fixture(scope="module")
def blobs():
    return {sh: _blob(sh) for sh in range(_NSH)}


def test_stdlib_csv_reader_agrees_with_construction(blobs):
    # external anchor: python's RFC 4180 parser sees exactly the planted
    # records — 4 fields each, unescaped f2 values at the right residues
    for sh, blob in blobs.items():
        rows = list(csv.reader(io.StringIO(blob)))
        assert len(rows) == _NR
        for r, row in enumerate(rows):
            assert len(row) == 4
            _, _, want = _f2(sh, r)
            assert row[2] == want, (sh, r)


def test_engine_offsets_slice_the_blob_exactly(spark, blobs):
    from co_new_spark.queries.csv_q import g_csv_split

    rows = g_csv_split(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == _NSH * _NR
    for row in rows:
        blob = blobs[row.shard]
        text = blob[row.start:row.start + row.len]
        f2, cls, _ = _f2(row.shard, row.rid)
        assert blob[row.start + row.len] == "\n"
        assert text.startswith(f"r{row.rid:04d},")
        assert f",{f2}," in text
        assert (row.n_fields, row.quoted_class) == (4, cls), (row, text)


def test_corpus_exercises_cross_chunk_quoted_state(blobs):
    # at least one planted quote region must straddle a chunk boundary —
    # otherwise the parity seeding is never load-bearing
    straddles = 0
    for blob in blobs.values():
        inq = False
        open_at = None
        for i, ch in enumerate(blob):
            if ch == '"':
                inq = not inq
                open_at = i if inq else open_at
                if not inq and open_at // _CH != i // _CH:
                    straddles += 1
    assert straddles > 0
