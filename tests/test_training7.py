"""Naive Bayes curation classifier (queries/training7.py): learning on a
planted-vocabulary corpus, tie/holdout semantics, determinism."""

import random

from co_new_spark.queries.training7 import nb_classify


def _planted_docs(spark, n_per_class=60, noise=6, markers=4):
    """Classes with disjoint marker vocabularies plus shared noise tokens —
    a corpus where the label IS lexically predictable (unlike the sf
    tables, whose text is label-independent)."""
    rng = random.Random(13)
    shared = [f"noise{i}" for i in range(20)]
    rows = []
    did = 0
    for cls in ("alpha", "beta", "gamma"):
        vocab = [f"{cls}_tok{i}" for i in range(8)]
        for _ in range(n_per_class):
            toks = (rng.choices(vocab, k=markers)
                    + rng.choices(shared, k=noise))
            rng.shuffle(toks)
            rows.append((did, cls, " ".join(toks)))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nb_learns_planted_vocabulary(spark):
    docs = _planted_docs(spark)
    out = nb_classify(docs).collect()
    assert len(out) == 180
    hold = [r for r in out if r["is_holdout"]]
    tr = [r for r in out if not r["is_holdout"]]
    assert len(hold) == 36  # doc_id % 5 == 0
    assert all(r["correct"] for r in hold)   # disjoint markers -> perfect
    assert all(r["correct"] for r in tr)
    assert all(r["correct"] == (r["pred"] == r["lang"]) for r in out)


def test_nb_deterministic_and_partitioning_invariant(spark):
    docs = _planted_docs(spark)
    a = [tuple(r) for r in nb_classify(docs).collect()]
    b = [tuple(r) for r in nb_classify(docs.repartition(7)).collect()]
    assert a == b


def test_nb_empty_text_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "alpha", "alpha_tok0 alpha_tok1"),
         (1, "beta", ""),          # zero tokens -> no evidence rows
         (2, "beta", "   "),       # whitespace-only -> zero tokens too
         (3, "alpha", "alpha_tok0")],
        "doc_id long, lang string, text string")
    out = nb_classify(docs).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 3]


def test_bm25_reference_parity(spark):
    """train_bm25_topk's scoring against an independent python BM25 with
    the same per-term micro-rounding, on a corpus where doc 0 is a probe
    (doc_id % 100 == 0) with known best matches."""
    import math
    from collections import Counter

    from co_new_spark.queries.training7 import _BM_B, _BM_K1
    from co_new_spark.queries import training7 as t7

    texts = {
        0: "grid cell encode decode colombia",          # probe
        1: "grid cell encode decode colombia bogota",   # near-copy: best
        2: "grid cell encode",                          # partial
        3: "totally unrelated words here now",          # no overlap
        4: "cell cell cell cell cell",                  # tf saturation
        5: "colombia decode encode cell grid",          # permuted copy
    }
    docs = spark.createDataFrame(
        [(i, "xx", t) for i, t in texts.items()],
        "doc_id long, lang string, text string")

    # independent reference
    post = {i: Counter(t.split()) for i, t in texts.items()}
    dl = {i: sum(c.values()) for i, c in post.items()}
    n, avg = len(post), sum(dl.values()) / len(post)
    df = Counter(t for c in post.values() for t in c)
    idf = {t: round(math.log((n - d + 0.5) / (d + 0.5) + 1.0) * 1_000_000)
           for t, d in df.items()}
    want = {}
    for d, c in post.items():
        if d == 0:
            continue
        s = 0
        for t in post[0]:
            if t in c:
                tf = c[t]
                s += round(idf[t] * (tf * (_BM_K1 + 1.0))
                           / (tf + _BM_K1 * (1.0 - _BM_B
                                             + _BM_B * dl[d] / avg)))
        if s:
            want[d] = s

    # drive the registry function via a patched loader
    orig = t7.load
    t7.load = lambda spark, sf, name: docs
    try:
        got = {r["doc_id"]: r["score_micro"]
               for r in t7.t_bm25_topk(spark, "pytest-bm25").collect()}
    finally:
        t7.load = orig
    assert got == want
    order = sorted(want, key=lambda d: (-want[d], d))
    assert order[0] in (1, 5) and 3 not in got
