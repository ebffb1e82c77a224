"""Punycode fold (queries/webtext7.py): stdlib anchor, mirror parity,
adapt-loop load-bearing guard."""

import codecs
import hashlib

from conftest import SF_DIR

from co_new_spark.queries.webtext7 import (
    _ADAPT_UNROLL,
    _PNY_BASIC,
    _PNY_DOCS,
    _PNY_EXT,
    g_punycode,
)

_ADAPT_ITERS = []   # instrumented iteration counts


def _adapt(delta, numpoints, first):
    delta = delta // 700 if first else delta // 2
    delta += delta // numpoints
    k = it = 0
    while delta > 455:
        delta //= 35
        k += 36
        it += 1
    _ADAPT_ITERS.append(it)
    return k + (36 * delta) // (delta + 38)


def _decode(basic, ext):
    """Python mirror of the generalized Bootstring decode (full RFC digit
    alphabet — the engine corpus only uses letters)."""
    out = [ord(c) for c in basic]
    n, i, bias, iold, first = 128, 0, 72, 0, True
    w, k, pend = 1, 36, False
    for c in ext:
        digit = ord(c) - 97 if c >= "a" else ord(c) - 48 + 26
        i += digit * w
        t = 1 if k <= bias + 1 else (26 if k >= bias + 26 else k - bias)
        if digit < t:
            nlen = len(out) + 1
            bias = _adapt(i - iold, nlen, first)
            n += i // nlen
            i %= nlen
            out = out[:i] + [n] + out[i:]
            i += 1
            iold = i
            w, k, first, pend = 1, 36, False, False
        else:
            w *= 36 - t
            k += 36
            pend = True
    return out, not pend


def _corpus():
    tr = {c: ("a" if int(c, 16) < 8 else chr(ord("a") + int(c, 16)))
          for c in "0123456789abcdef"}
    trp = {c: chr(ord("i") + int(c, 16) % 8) for c in "0123456789abcdef"}
    labels = {}
    for d in range(_PNY_DOCS):
        basic = hashlib.md5(f"puny_b{d}".encode()).hexdigest()[:_PNY_BASIC]
        raw = hashlib.md5(f"puny_e{d}".encode()).hexdigest()
        if d % 7 == 3:
            ext = "".join(trp[c] for c in raw[:2])
        else:
            ext = ("pppppa" if d % 5 == 0 else "") \
                + "".join(tr[c] for c in raw[:_PNY_EXT]) + "a"
        labels[d] = (basic, ext)
    return labels


def test_mirror_round_trips_stdlib_codec():
    for s in ["bücher", "mañana", "παράδειγμα", "ひとつ", "דוגמה",
              "点心和烤鸭", "a‑b—c", "ü", "αβγδεζ", "ёжик-и-лось"]:
        enc = codecs.encode(s, "punycode").decode("ascii")
        basic, ext = enc.rsplit("-", 1) if "-" in enc else ("", enc)
        got, ok = _decode(basic, ext)
        assert ok and "".join(map(chr, got)) == s, (s, enc)


def test_entry_matches_python_mirror(spark):
    labels = _corpus()
    want = {}
    for d, (basic, ext) in labels.items():
        out, ok = _decode(basic, ext)
        digest = hashlib.md5(",".join(map(str, out)).encode()).hexdigest()
        want[d] = (1 if ok else 0, len(out), max(out), digest)
    got = {r.doc_id: (r.valid, r.out_len, r.cp_max, r.digest)
           for r in g_punycode(spark, SF_DIR).collect()}
    assert got == want
    # planted classes actually fire
    assert sum(1 for v in got.values() if v[0] == 0) > 10      # pending head
    # every pppppa label decoded its 18915 head cluster (deep insert: the
    # inserted point is far beyond the basic range)
    assert all(got[d][2] > 2048 for d in got
               if d % 5 == 0 and d % 7 != 3)
    assert sum(1 for v in got.values() if v[0] == 1) > 200


def test_adapt_loop_theorem_and_astral_anchor():
    # corpus theorem (module docstring): with digits <= 15 the divide-loop
    # NEVER fires — clusters cap at 3 digits, deltas at 18915 < 455*700
    _ADAPT_ITERS.clear()
    for basic, ext in _corpus().values():
        _decode(basic, ext)
    assert max(_ADAPT_ITERS) == 0
    # ...but the loop is real semantics: a single astral code point makes
    # it iterate exactly once, and the stdlib codec round-trips through it
    _ADAPT_ITERS.clear()
    for s in ["\U0010fff0", "\U00100001", "\U0010ffff"]:
        enc = codecs.encode(s, "punycode").decode("ascii")
        basic, ext = enc.rsplit("-", 1) if "-" in enc else ("", enc)
        got, ok = _decode(basic, ext)
        assert ok and "".join(map(chr, got)) == s
    assert max(_ADAPT_ITERS) == 1
    assert max(_ADAPT_ITERS) <= _ADAPT_UNROLL
