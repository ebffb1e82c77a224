"""Content-defined chunking (queries/webtext4.py): boundary determinism,
the shift-resilience property that defines CDC, and edge cases."""

import hashlib
import random

from co_new_spark.queries.webtext4 import _CDC_W, cdc_chunks, w_cdc_chunks


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _ref_chunks(text: str) -> list:
    b = text.encode()
    n = len(b)
    bounds = [0] + [i for i in range(_CDC_W, n)
                    if hashlib.md5(b[i - _CDC_W:i]).hexdigest()
                    .endswith("0")] + [n]
    return [b[bounds[k]:bounds[k + 1]].decode()
            for k in range(len(bounds) - 1)]


def test_cdc_matches_reference_and_covers_text(spark):
    rng = random.Random(5)
    texts = ["".join(rng.choice("abcdefgh ") for _ in range(ln))
             for ln in (0, 3, 8, 47, 200, 515)]
    rows = cdc_chunks(_df(spark, texts)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, text in enumerate(texts):
        got = sorted(by_doc[did], key=lambda r: r.chunk_idx)
        ref = _ref_chunks(text)
        assert [r.chunk_len for r in got] == [len(c) for c in ref]
        assert [r.chunk_md5 for r in got] == [
            hashlib.md5(c.encode()).hexdigest() for c in ref]
        assert sum(r.chunk_len for r in got) == len(text)


def test_cdc_shift_resilience(spark):
    """THE content-defined property: prepending bytes re-aligns at the
    next content-defined cut, so almost all of the original document's
    chunks survive byte-identical (a fixed-size chunker would share 0)."""
    rng = random.Random(11)
    base = "".join(rng.choice("abcdefghijklmnop ") for _ in range(3000))
    shifted = "XY" + base
    rows = cdc_chunks(_df(spark, [base, shifted])).collect()
    sets = {0: set(), 1: set()}
    for r in rows:
        sets[r.doc_id].add(r.chunk_md5)
    shared = sets[0] & sets[1]
    # everything after the first re-aligned boundary is shared
    assert len(shared) >= 0.8 * len(sets[0])
    assert sets[0] != sets[1]  # the head chunk did change


def test_cdc_entry_invariants(spark):
    from tests.conftest import SF_DIR

    out = w_cdc_chunks(spark, SF_DIR).collect()
    assert len(out) == 500
    for r in out:
        assert r.n_chunks >= 1
        assert r.max_chunk_len <= r.n_bytes
        assert 0 <= r.n_chunks_shared <= r.n_chunks
