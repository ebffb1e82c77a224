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
