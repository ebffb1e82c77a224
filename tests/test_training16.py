"""Unigram-LM Viterbi fold (queries/training16.py): brute segmentation
parity, python mirror, piece-usage proof."""

import random

import duckdb

from conftest import SF_DIR

from co_new_spark.queries.training16 import (
    _CHAR_BASE,
    _CHAR_MOD,
    _CHAR_MUL,
    _ULM_CHARS,
    _ULM_MINLEN,
    _ULM_VOCAB,
    g_unigram_lm,
)


def _char_cost(ch: str) -> int:
    return _CHAR_BASE + (ord(ch) * _CHAR_MUL) % _CHAR_MOD


def _py_dp(s: str):
    """Python mirror of the combined-key DP -> (cost, tokens)."""
    best = [0] + [None] * len(s)
    for i in range(1, len(s) + 1):
        cands = [best[i - 1] + _char_cost(s[i - 1]) * 64 + 1]
        for p, c in _ULM_VOCAB:
            ln = len(p)
            if i >= ln and s[i - ln:i] == p:
                cands.append(best[i - ln] + c * 64 + 1)
        best[i] = min(cands)
    return best[len(s)] // 64, best[len(s)] % 64


def _brute(s: str):
    """Exponential enumeration of ALL segmentations (single chars + vocab
    pieces), lexicographic (cost, tokens) min — independent of the DP."""
    pieces = dict(_ULM_VOCAB)
    memo = {}

    def rec(i):
        if i == len(s):
            return [(0, 0)]
        if i in memo:
            return memo[i]
        outs = []
        outs += [(c + _char_cost(s[i]), t + 1) for c, t in rec(i + 1)]
        for p, pc in pieces.items():
            if s.startswith(p, i):
                outs += [(c + pc, t + 1) for c, t in rec(i + len(p))]
        memo[i] = outs
        return outs

    return min(rec(0))


def test_dp_equals_brute_enumeration():
    rng = random.Random(16)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(40):
        s = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 11)))
        assert _py_dp(s) == _brute(s), s
    # planted piece-rich strings
    for s in ("thefast", "sparkquery", "joinagg", "thethethe"):
        assert _py_dp(s) == _brute(s), s


def test_pieces_are_load_bearing():
    # a matched multi-char piece must sometimes beat its per-char sum:
    # 'the' as one piece vs t+h+e chars, and tokens drops below len(s)
    cost, tokens = _py_dp("thefast")
    char_cost = sum(_char_cost(ch) for ch in "thefast")
    assert cost < char_cost
    assert tokens < len("thefast")


def test_entry_matches_python_mirror(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id,
               substring(regexp_replace(lower(text), '[^a-z]', '', 'g'),
                         1, {_ULM_CHARS}) AS s
        FROM read_parquet('{SF_DIR}/documents.parquet')""").fetchall()
    want = {d: _py_dp(s) for d, s in rows if len(s) >= _ULM_MINLEN}
    got = {r.doc_id: (r.cost, r.tokens)
           for r in g_unigram_lm(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 100
