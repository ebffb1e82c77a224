"""MaxSim late-interaction retrieval (queries/training14.py): python mirror
parity on the real fixture, exact-token self-match property, tie-break."""

import hashlib

from co_new_spark.queries.training14 import (_DIM, _NTOK, _QUERIES, _TOPK,
                                             maxsim_topk)


def _vec(tok):
    h = hashlib.md5(tok.encode()).hexdigest()
    return [2 * int(h[j], 16) - 15 for j in range(_DIM)]


def _mirror(rows):
    docvecs = {}
    for d, text in rows:
        if text is None:
            continue
        toks = text.split(" ")[:_NTOK]
        docvecs[d] = [_vec(t) for t in set(toks)]
    out = {}
    for qid, qtoks in _QUERIES.items():
        scores = []
        for d, vecs in docvecs.items():
            s = 0
            for qt in qtoks:
                qv = _vec(qt)
                s += max(sum(a * b for a, b in zip(qv, dv)) for dv in vecs)
            scores.append((-s, d))
        scores.sort()
        out[qid] = [(rn + 1, d, -negs)
                    for rn, (negs, d) in enumerate(scores[:_TOPK])]
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = maxsim_topk(df, spark).collect()
    out = {}
    for r in got:
        out.setdefault(r.qid, []).append((r.rn, r.doc_id, r.score))
    return out


def test_mirror_parity_on_fixture(spark):
    rows = [(r.doc_id, r.text) for r in
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").collect()]
    assert _run(spark, rows) == _mirror(rows)


def test_exact_token_match_dominates(spark):
    """A doc holding all three query tokens outscores docs holding none:
    each exact match contributes the full squared norm of the token vector,
    the maximum possible MaxSim term for that query token."""
    rows = [(0, "sort merge join extra words here pad pad"),
            (1, "completely unrelated vocabulary entirely elsewhere pad pad x"),
            (2, "zz yy xx ww vv uu tt ss")]
    got = _run(spark, rows)
    (top_doc,) = [d for rn, d, s in got[1] if rn == 1]
    assert top_doc == 0
    self_score = sum(sum(v * v for v in _vec(t)) for t in _QUERIES[1])
    assert [s for rn, d, s in got[1] if d == 0] == [self_score]


def test_tie_break_on_doc_id(spark):
    rows = [(7, "alpha beta"), (3, "alpha beta"), (5, "alpha beta")]
    got = _run(spark, rows)
    for qid in _QUERIES:
        assert [d for _, d, _ in got[qid]] == [3, 5, 7]
