"""Kneser-Ney bigram LM (queries/training12.py) and HTTP/1.1 response parse
(queries/webtext5.py): python-mirror parity, model properties, spec vectors."""

import math

from co_new_spark.queries.training12 import _KN_D_DEN, _KN_D_NUM, kn_score
from co_new_spark.queries.webtext5 import parse_http


# ---------------------------------------------------------------- KN bigram

def _kn_mirror(rows):
    """Exact mirror of the rational KN formula over (doc_id, text) rows."""
    from collections import Counter, defaultdict

    bgc = Counter()
    for did, text in rows:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            bgc[(did, a, b)] += 1
    cvw = Counter()
    for (_, v, w), c in bgc.items():
        cvw[(v, w)] += c
    bb = len(cvw)
    cv, n1f, n1b = Counter(), Counter(), Counter()
    for (v, w), c in cvw.items():
        cv[v] += c
        n1f[v] += 1
        n1b[w] += 1
    p = {}
    for (v, w), c in cvw.items():
        num = max(_KN_D_DEN * c - _KN_D_NUM, 0) * bb \
            + _KN_D_NUM * n1f[v] * n1b[w]
        den = _KN_D_DEN * cv[v] * bb
        p[(v, w)] = math.floor(1e6 * (num / den) + 0.5)
    out = defaultdict(lambda: [0, 0, None])
    for (did, v, w), c in bgc.items():
        s = out[did]
        s[0] += c
        s[1] += c * p[(v, w)]
        s[2] = p[(v, w)] if s[2] is None else min(s[2], p[(v, w)])
    return {d: tuple(s) for d, s in out.items()}


_CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
    (3, "a cat and a dog"),
    (4, "single"),          # <2 tokens: no bigrams, no output row
    (5, "the the the the"),  # within-doc repeats exercise cnt > 1
]


def _docs(spark, rows=_CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kn_bigram_matches_python_mirror(spark):
    got = {r.doc_id: (r.n_bigrams, r.sum_p_micro, r.min_p_micro)
           for r in kn_score(_docs(spark)).collect()}
    exp = _kn_mirror(_CORPUS)
    assert got == exp
    assert 4 not in got  # the 1-token doc contributes no bigrams


def test_kn_bigram_discount_properties(spark):
    rows = kn_score(_docs(spark)).collect()
    # every observed bigram gets positive probability (the continuation
    # term never lets an observed transition hit zero)
    assert all(r.min_p_micro > 0 for r in rows)
    # no probability exceeds 1
    assert all(r.min_p_micro <= 1_000_000 for r in rows)
    # the all-repeat doc's single bigram ("the","the") dominates its
    # context less than certainty: mass was discounted away
    r5 = next(r for r in rows if r.doc_id == 5)
    assert r5.n_bigrams == 3 and r5.min_p_micro < 1_000_000


def test_kn_bigram_frequent_beats_rare(spark):
    # "sat on" occurs twice, "ate the" once, both contexts comparable:
    # within one context, a more frequent continuation scores higher
    rows = [(0, "x a x b x a x a")]  # c(x,a)=3 c(x,b)=1
    got = {r.doc_id: r for r in kn_score(_docs(spark, rows)).collect()}
    # min is the rare continuation; mean > min proves ordering
    r = got[0]
    assert r.sum_p_micro / r.n_bigrams > r.min_p_micro


# ------------------------------------------------------------- HTTP parse

def _raw(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, msg string")


def test_http_parse_spec_vector(spark):
    msg = ("HTTP/1.1 200 OK\r\n"
           "Content-Type: text/html; charset=UTF-8\r\n"
           "Content-Length: 12\r\n"
           "Server: srv0\r\n"
           "X-Cache: MISS\r\n"
           "\r\n"
           "hello\r\nworld")  # body contains CRLF: framing must not re-split
    r = parse_http(_raw(spark, [(1, msg)])).collect()[0]
    assert (r.status, r.mime, r.charset) == (200, "text/html", "utf-8")
    assert (r.clen_declared, r.body_len, r.clen_ok) == (12, 12, 1)
    assert r.n_headers == 4


def test_http_parse_header_order_irrelevant(spark):
    a = ("HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n"
         "Content-Length: 3\r\n\r\nabc")
    b = ("HTTP/1.1 404 Not Found\r\nContent-Length: 3\r\n"
         "Content-Type: text/plain\r\n\r\nabc")
    ra, rb = parse_http(_raw(spark, [(1, a), (2, b)])) \
        .orderBy("doc_id").collect()
    assert (ra.status, ra.mime, ra.charset, ra.clen_ok, ra.n_headers) \
        == (rb.status, rb.mime, rb.charset, rb.clen_ok, rb.n_headers) \
        == (404, "text/plain", "", 1, 2)


def test_http_parse_truncation_flagged(spark):
    msg = ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n"
           "Content-Length: 99\r\n\r\n{}")
    r = parse_http(_raw(spark, [(1, msg)])).collect()[0]
    assert (r.clen_declared, r.body_len, r.clen_ok) == (99, 2, 0)
    assert r.mime == "application/json" and r.charset == ""
