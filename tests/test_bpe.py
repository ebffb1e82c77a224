"""Distributed BPE training (operators/bpe.py): python-reference parity
(including the same-token run overlap rule and tie-breaks), partitioning
invariance."""

from collections import Counter

from co_new_spark.operators.bpe import bpe_train


def _ref_bpe(texts, rounds):
    """Independent greedy reference: list-of-tokens per doc, count pairs,
    merge best (cnt DESC, lhs, rhs) left-to-right non-overlapping."""
    seqs = [list(t) for t in texts]
    out = []
    for r in range(rounds):
        cnt = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] += 1
        (lhs, rhs), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        new_seqs = []
        for s in seqs:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            new_seqs.append(ns)
        seqs = new_seqs
        out.append((r, lhs, rhs, c, sum(len(s) for s in seqs)))
    return out


def _run(spark, texts, rounds):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    return [tuple(r) for r in bpe_train(docs, rounds=rounds).collect()]


def test_bpe_matches_reference_on_runs_and_ties(spark):
    # 'aaaa' exercises the overlap parity rule: (a,a) merges at 0-1 and
    # 2-3 only; 'abab' merges both disjoint (a,b) sites; ties resolved
    # (cnt DESC, lhs, rhs)
    texts = ["aaaa", "abab", "aabb", "banana banana", "aa aa aa"]
    assert _run(spark, texts, 4) == _ref_bpe(texts, 4)


def test_bpe_single_run_greedy_parity(spark):
    # one doc of 7 identical chars: round 0 merges 3 non-overlapping
    # pairs (greedy), leaving aa aa aa a
    texts = ["aaaaaaa"]
    got = _run(spark, texts, 2)
    assert got == _ref_bpe(texts, 2)
    assert got[0][1:] == ("a", "a", 6, 4)  # 6 adjacent pairs, 4 tokens left


def test_bpe_partitioning_invariant(spark):
    texts = [f"doc {i} the quick brown fox " * 3 for i in range(40)]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(docs, rounds=3).collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(7), rounds=3).collect()]
    assert a == b == _ref_bpe(texts, 3)
