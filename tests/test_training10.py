"""BPE application + RRF fusion (queries/training10.py): merge-chain
semantics on planted sequences, fused-rank arithmetic."""

from co_new_spark.queries.training10 import _RRF_C, bpe_apply


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _tokens(spark, text, merges):
    """Tokenize one string and recover the token list from the op's own
    byte-exact output by re-running the reference chain in Python."""
    out = bpe_apply(_docs(spark, [text]), merges).collect()[0]
    sep = "\x1f"
    s = sep.join(text)
    for lhs, rhs in merges:
        s = s.replace(lhs + sep + rhs, lhs + rhs)
    toks = s.split(sep) if s else []
    # the op's count and md5 must agree with the reference chain
    import hashlib

    assert out.n_tokens == len(toks)
    assert out.seq_md5 == hashlib.md5(s.encode()).hexdigest()
    return toks


def test_bpe_apply_greedy_left_to_right_runs(spark):
    # "aaaa" under (a,a): greedy non-overlapping -> [aa, aa]
    assert _tokens(spark, "aaaa", [("a", "a")]) == ["aa", "aa"]
    # odd run: [aa, aa, a]
    assert _tokens(spark, "aaaaa", [("a", "a")]) == ["aa", "aa", "a"]


def test_bpe_apply_merge_order_chains(spark):
    # second merge consumes the first merge's outputs
    assert _tokens(spark, "aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]
    # merge absent from the text is a no-op
    assert _tokens(spark, "abab", [("x", "y"), ("a", "b")]) == ["ab", "ab"]


def test_bpe_apply_counts_and_chars(spark):
    out = {r.doc_id: r for r in
           bpe_apply(_docs(spark, ["abcab", ""]), [("a", "b")]).collect()}
    assert out[0].n_chars == 5 and out[0].n_tokens == 3  # ab c ab
    assert out[1].n_chars == 0 and out[1].n_tokens == 0


def test_rrf_fused_scores_are_achievable_sums(spark):
    """Every fused score must be a sum of per-list 1/(C+rank) micro
    contributions, descending within each probe, with membership flags."""
    from co_new_spark.queries.training10 import _RRF_K, t_rrf_fusion
    from tests.conftest import SF_DIR

    rows = t_rrf_fusion(spark, SF_DIR).collect()
    assert rows
    contrib = {r: round(1_000_000.0 / (_RRF_C + r)) for r in range(1, 21)}
    achievable = set(contrib.values()) | {
        a + b for a in contrib.values() for b in contrib.values()}
    by_qid = {}
    for r in rows:
        assert r.in_lex or r.in_sem
        single = r.rrf_micro in set(contrib.values())
        assert (r.in_lex and r.in_sem) == (not single)
        assert r.rrf_micro in achievable
        by_qid.setdefault(r.qid, []).append(r)
    for rs in by_qid.values():
        assert len(rs) <= _RRF_K
        ranks = [r.fused_rank for r in sorted(rs, key=lambda x: x.fused_rank)]
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r.rrf_micro for r in sorted(rs, key=lambda x: x.fused_rank)]
        assert scores == sorted(scores, reverse=True)


def test_bpe_apply_is_partitioning_invariant(spark):
    texts = ["banana band bandana", "an apple and an anvil", "nan" * 7]
    merges = [("a", "n"), ("an", "an"), ("b", "an")]
    base = bpe_apply(_docs(spark, texts), merges).collect()
    re = bpe_apply(_docs(spark, texts).repartition(7), merges) \
        .orderBy("doc_id").collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in re]
