"""T5-style span corruption (queries/training11.py): python-mirror parity,
no-overlap guarantee, sentinel conventions, partitioning invariance."""

import hashlib

from co_new_spark.queries.training11 import (
    _SC_GATE, _SC_MAXLEN, _SC_STRIDE, span_corrupt)


def _mirror(doc_id: int, text: str):
    toks = [t for t in text.split(" ") if t]
    spans = []
    for g in range(0, len(toks), _SC_STRIDE):
        if (doc_id * 31 + g * 17) % _SC_GATE == 0:
            ln = 1 + (doc_id * 13 + g * 11) % _SC_MAXLEN
            spans.append((g, min(g + ln, len(toks))))
    inp, tgt, covered = [], [], 0
    for k, (s, e) in enumerate(spans):
        covered += e - s
    k = 0
    pos = 0
    while pos < len(toks):
        span = next(((s, e) for s, e in spans if s == pos), None)
        if span:
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> " + " ".join(toks[span[0]:span[1]]))
            pos = span[1]
            k += 1
        else:
            inp.append(toks[pos])
            pos += 1
    tgt.append(f"<extra_id_{len(spans)}>")
    return (len(toks), len(spans), covered,
            hashlib.md5(" ".join(inp).encode()).hexdigest(),
            hashlib.md5(" ".join(tgt).encode()).hexdigest())


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_corruption_matches_python_mirror(spark):
    rows = [(did, " ".join(f"w{did}x{i}" for i in range(n)))
            for did, n in [(0, 0), (1, 1), (2, 4), (3, 23), (7, 60),
                           (14, 101), (21, 17), (35, 12)]]
    got = {r.doc_id: r for r in span_corrupt(_docs(spark, rows)).collect()}
    n_with_spans = 0
    for did, text in rows:
        if not text:
            continue  # zero-token doc has no rows post-explosion
        exp = _mirror(did, text)
        r = got[did]
        assert (r.n_tokens, r.n_spans, r.n_corrupted_tokens,
                r.input_md5, r.target_md5) == exp, did
        n_with_spans += r.n_spans > 0
    assert n_with_spans >= 2  # the gate actually fires in this corpus


def test_span_corruption_stride_prevents_overlap():
    assert _SC_STRIDE > _SC_MAXLEN  # the structural no-overlap guarantee


def test_span_corruption_partitioning_invariant(spark):
    rows = [(d, " ".join(f"t{d}q{i}" for i in range(40))) for d in range(9)]
    a = span_corrupt(_docs(spark, rows)).collect()
    b = span_corrupt(_docs(spark, rows).repartition(5)) \
        .orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
